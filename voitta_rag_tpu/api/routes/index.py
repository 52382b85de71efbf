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


@require_user
async def optimize_index(request: web.Request, user) -> web.Response:
    """Build/rebuild the read-optimized snapshots: the sparse inverted
    postings, plus (when requested or configured) the IVF dense partition."""
    import asyncio

    from voitta_rag_tpu.config import get_settings
    from voitta_rag_tpu.index.store import get_vector_store

    body = await request.json() if request.can_read_body else {}
    loop = asyncio.get_running_loop()
    store = get_vector_store()
    stats = {}
    if body.get("compact"):
        try:
            stats.update(await loop.run_in_executor(None, store.compact))
        except ValueError as e:
            return web.json_response({"detail": str(e)}, status=400)
    # The store opens lazily; cold_tier_active is only meaningful after the
    # segments are loaded (and the device budget enforced).
    await loop.run_in_executor(None, store.count)
    if store.cold_tier_active:
        # Beyond-HBM store: cold segments already serve sparse queries from
        # host inverted postings (index/host_postings.py) and the resident
        # tail is slot-scanned exactly — there is no postings snapshot to
        # build. The IVF build below composes with the cold tier
        # (index/ivf_bq.py), so fall through to it.
        stats["postings"] = "cold tier (host postings per segment)"
    else:
        try:
            stats.update(await loop.run_in_executor(
                None, store.build_postings))
        except ValueError as e:
            return web.json_response({"detail": str(e)}, status=400)
    if body.get("n_cells") or get_settings().ivf_cells:
        try:
            stats.update(await loop.run_in_executor(
                None, lambda: store.build_ivf(
                    n_cells=body.get("n_cells"), nprobe=body.get("nprobe"))))
        except ValueError as e:
            # Postings may have succeeded — report the partial result but
            # surface the IVF failure instead of claiming it was built.
            if not stats:
                return web.json_response({"detail": str(e)}, status=400)
            stats["ivf_error"] = str(e)
    return web.json_response({"status": "optimized", **stats})


async def engine_stats(request: web.Request) -> web.Response:
    """Engine observability: collection info + per-stage latency stats."""
    from voitta_rag_tpu.index.store import get_vector_store
    from voitta_rag_tpu.utils.profiling import stats as prof_stats

    store = get_vector_store()
    return web.json_response({
        "collection": store.get_collection_info(),
        "ivf_active": store.ivf_active,
        "postings_active": store.postings_active,
        "latency": prof_stats(),
    })


def setup(app: web.Application) -> None:
    app.router.add_post("/api/index/trigger/{path:.*}", trigger_index)
    app.router.add_post("/api/index/reindex/{path:.*}", trigger_index)
    app.router.add_post("/api/index/optimize", optimize_index)
    app.router.add_get("/api/stats", engine_stats)
