"""Metadata notes CRUD (reference api/routes/metadata.py)."""

from __future__ import annotations

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import (
    json_error, require_user, tail_path,
)
from voitta_rag_tpu.services.metadata import get_metadata_service


async def get_metadata(request: web.Request) -> web.Response:
    rel = tail_path(request)
    data = get_metadata_service().get(rel)
    if data is None:
        return web.json_response({"path": rel, "metadata": None})
    return web.json_response(data)


@require_user
async def put_metadata(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    body = await request.json()
    text = body.get("metadata")
    data = get_metadata_service().set(rel, text, user.name)
    return web.json_response(data)


@require_user
async def delete_metadata(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    if not get_metadata_service().delete(rel):
        return json_error(404, "no metadata for path")
    return web.json_response({"deleted": rel})


def setup(app: web.Application) -> None:
    app.router.add_get("/api/metadata/{path:.*}", get_metadata)
    app.router.add_put("/api/metadata/{path:.*}", put_metadata)
    app.router.add_delete("/api/metadata/{path:.*}", delete_metadata)
