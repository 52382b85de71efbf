"""API route registration (reference api/routes/__init__.py:7-26 mounts 13
route modules: auth, pages, raw, files, folders, metadata, settings, index,
details, projects, sync, websocket — plus a native /api/search)."""

from __future__ import annotations

from aiohttp import web

from voitta_rag_tpu.api.routes import (
    auth, details, files, folders, index, metadata, pages, projects, raw,
    search, settings, sync, websocket,
)

MODULES = (auth, pages, raw, files, folders, metadata, settings, index,
           details, projects, sync, websocket, search)


def register_routes(app: web.Application) -> None:
    for mod in MODULES:
        mod.setup(app)
