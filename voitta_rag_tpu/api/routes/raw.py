"""Raw file download (reference api/routes/raw.py: unauthenticated,
path-guarded; for wget/curl via get_file_uri)."""

from __future__ import annotations

import mimetypes

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import json_error, tail_path


async def raw(request: web.Request) -> web.Response:
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    rel = tail_path(request)
    fs = get_filesystem_service()
    try:
        p = fs.resolve(rel)
    except PermissionError:
        return json_error(400, "invalid path")
    if not p.exists() or not p.is_file():
        return json_error(404, "file not found")
    mime, _ = mimetypes.guess_type(str(p))
    return web.FileResponse(p, headers={
        "Content-Type": mime or "application/octet-stream"})


def setup(app: web.Application) -> None:
    app.router.add_get("/api/raw/{path:.*}", raw)
    app.router.add_get("/raw/{path:.*}", raw)
