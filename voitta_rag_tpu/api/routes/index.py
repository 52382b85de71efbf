"""Index trigger endpoints.

The reference's api/routes/index.py:38-43 is a placeholder returning
"queued (placeholder)" — the real path is the settings toggle + worker. Kept
for API parity, but here the endpoints actually enqueue the folder."""

from __future__ import annotations

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import require_user, tail_path
from voitta_rag_tpu.db.database import get_db


@require_user
async def trigger_index(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    get_db().set_index_status(rel, "pending")
    from voitta_rag_tpu.services.indexing_worker import get_indexing_worker

    get_indexing_worker().kick()
    return web.json_response({"status": "queued", "folder": rel})


def setup(app: web.Application) -> None:
    app.router.add_post("/api/index/trigger/{path:.*}", trigger_index)
    app.router.add_post("/api/index/reindex/{path:.*}", trigger_index)
