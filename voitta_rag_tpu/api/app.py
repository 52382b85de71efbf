"""Application shell: aiohttp app mirroring the reference's FastAPI app.

Behavior contract (reference main.py:49-128 + SURVEY.md §3.1): on startup
init the metadata DB, load filesystem mappings, start the watcher thread and
the indexing-worker thread, mount static files + Jinja2 templates (with the
``compact`` number filter, main.py:102-116), include the API routes, and
mount the MCP sub-app at ``/mcp``. Deletion events from the watcher remove
index entries synchronously; new directories inherit settings from their
closest configured ancestor.
"""

from __future__ import annotations

import asyncio
import logging
from pathlib import Path

import jinja2
from aiohttp import web

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.db.database import get_db, init_db
from voitta_rag_tpu.mcp.server import create_mcp_app

logger = logging.getLogger(__name__)

WEB_DIR = Path(__file__).resolve().parent.parent / "web"


def compact(value) -> str:
    """Compact number filter (reference main.py:102-116)."""
    try:
        n = float(value)
    except (TypeError, ValueError):
        return str(value)
    for div, suffix in ((1e9, "B"), (1e6, "M"), (1e3, "k")):
        if abs(n) >= div:
            return f"{n / div:.1f}{suffix}".replace(".0", "")
    return str(int(n))


def setup_logging() -> None:
    """File logging, wiped per restart (reference main.py:23-46); dedicated
    per-subsystem logs like the reference's logs/indexing.log
    (services/indexing.py:23-39)."""
    logs = Path("logs")
    logs.mkdir(exist_ok=True)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    handler = logging.FileHandler(logs / "app.log", mode="w")
    handler.setFormatter(fmt)
    root = logging.getLogger()
    root.addHandler(handler)
    if root.level > logging.INFO:
        root.setLevel(logging.INFO)
    idx_handler = logging.FileHandler(logs / "indexing.log", mode="w")
    idx_handler.setFormatter(fmt)
    logging.getLogger("voitta.indexing").addHandler(idx_handler)


def _inherit_settings_for_new_dir(rel_path: str) -> None:
    """Closest-ancestor settings inheritance (reference watcher.py:185-249)."""
    db = get_db()
    parts = rel_path.strip("/").split("/")
    ancestors = ["/".join(parts[:i]) for i in range(len(parts) - 1, 0, -1)]
    for user in db.list_users():
        for anc in ancestors:
            s = db.folder_setting(user.id, anc)
            if s is not None:
                db.upsert_folder_setting(
                    user.id, rel_path, enabled=s.enabled,
                    search_active=s.search_active)
                break


async def _on_startup(app: web.Application) -> None:
    from voitta_rag_tpu.services.filesystem import get_filesystem_service
    from voitta_rag_tpu.services.indexing import get_indexing_service
    from voitta_rag_tpu.services.indexing_worker import get_indexing_worker
    from voitta_rag_tpu.services.watcher import file_watcher

    init_db()
    fs = get_filesystem_service()
    fs.load_mappings(get_db().list_sync_sources())

    loop = asyncio.get_running_loop()

    def on_delete(rel_path: str, is_dir: bool) -> None:
        svc = get_indexing_service()
        try:
            if is_dir:
                svc.remove_folder_index(rel_path)
            else:
                svc.remove_file_index(rel_path)
        except Exception:
            logger.exception("index removal failed for %s", rel_path)

    file_watcher.on_delete = on_delete
    file_watcher.on_dir_created = _inherit_settings_for_new_dir
    file_watcher.start(loop)
    get_indexing_worker().start(loop)

    async def autosave():
        from voitta_rag_tpu.index.store import get_vector_store

        while True:
            await asyncio.sleep(300)
            try:
                if await loop.run_in_executor(
                        None, get_vector_store().save_if_dirty):
                    logger.info("index autosaved")
            except Exception:
                logger.exception("index autosave failed")

    app["autosave_task"] = loop.create_task(autosave())
    logger.info("voitta-rag-tpu app started")


async def _on_cleanup(app: web.Application) -> None:
    from voitta_rag_tpu.index.store import get_vector_store
    from voitta_rag_tpu.services.indexing_worker import get_indexing_worker
    from voitta_rag_tpu.services.watcher import file_watcher

    task = app.get("autosave_task")
    if task is not None:
        task.cancel()
    file_watcher.stop()
    get_indexing_worker().stop()
    try:
        get_vector_store().save_if_dirty()
    except Exception:
        logger.exception("index save on shutdown failed")


def create_app(start_services: bool = True) -> web.Application:
    settings = get_settings()
    app = web.Application(client_max_size=512 * 1024 * 1024)
    app["settings"] = settings
    app["jinja"] = jinja2.Environment(
        loader=jinja2.FileSystemLoader(WEB_DIR / "templates"),
        autoescape=True)
    app["jinja"].filters["compact"] = compact

    from voitta_rag_tpu.api.routes import register_routes

    register_routes(app)
    static_dir = WEB_DIR / "static"
    if static_dir.exists():
        app.router.add_static("/static", static_dir)
    app.add_subapp("/mcp", create_mcp_app())
    # Root-level SSE aliases: the reference's MCP process serves GET /sse and
    # POST /messages/ at its root (MCP_SSE_TESTING.md:9, 110-123).
    from voitta_rag_tpu.mcp.server import handle_sse_get, handle_sse_messages

    app.router.add_get("/sse", handle_sse_get)
    app.router.add_post("/messages/", handle_sse_messages)
    app.router.add_post("/messages", handle_sse_messages)

    if start_services:
        app.on_startup.append(_on_startup)
        app.on_cleanup.append(_on_cleanup)
    return app


def main() -> None:
    setup_logging()
    settings = get_settings()
    app = create_app()
    web.run_app(app, host=settings.host, port=settings.port)


if __name__ == "__main__":
    main()
