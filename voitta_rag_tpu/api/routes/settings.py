"""Folder settings (reference api/routes/settings.py:39-338): search-active
toggle with recursive cascade + project-scoped storage, indexing enable →
FolderIndexStatus 'pending', forced reindex."""

from __future__ import annotations

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import require_user, tail_path
from voitta_rag_tpu.db.database import get_db


def _subfolders_of(rel: str) -> list[str]:
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    fs = get_filesystem_service()
    out = [rel]
    try:
        base = fs.resolve(rel)
    except PermissionError:
        return out
    if base.exists():
        for p in base.rglob("*"):
            if p.is_dir() and not any(
                    part.startswith(".") for part in p.relative_to(base).parts):
                sub = str(p.relative_to(base)).replace("\\", "/")
                out.append(f"{rel}/{sub}" if rel else sub)
    return out


@require_user
async def list_folder_settings(request: web.Request, user) -> web.Response:
    db = get_db()
    project = db.get_active_project(user)
    rows = db.query(
        "SELECT folder_path, enabled, search_active FROM user_folder_settings "
        "WHERE user_id=?", (user.id,))
    out = {}
    for r in rows:
        out[r["folder_path"]] = {
            "enabled": bool(r["enabled"]),
            "search_active": bool(r["search_active"]),
        }
    if not project.is_default:
        for r in db.query(
                "SELECT folder_path, search_active FROM project_folder_settings "
                "WHERE project_id=?", (project.id,)):
            out.setdefault(r["folder_path"], {"enabled": False})[
                "search_active"] = bool(r["search_active"])
    return web.json_response({"settings": out, "project": project.name})


@require_user
async def set_search_active(request: web.Request, user) -> web.Response:
    """Recursive search-active cascade (reference settings.py:84-168)."""
    rel = tail_path(request)
    body = await request.json()
    active = bool(body.get("search_active"))
    db = get_db()
    project = db.get_active_project(user)
    folders = _subfolders_of(rel)
    for f in folders:
        if project.is_default:
            db.upsert_folder_setting(user.id, f, search_active=active)
        else:
            db.set_project_folder_active(project.id, f, active)
    return web.json_response({
        "folder": rel, "search_active": active,
        "subfolders_updated": len(folders) - 1})


@require_user
async def set_indexing(request: web.Request, user) -> web.Response:
    """Indexing enable/disable (reference settings.py:171-235): enabling
    marks the folder 'pending' for the worker; disabling sets 'disabled'
    (chunks preserved, excluded from search)."""
    rel = tail_path(request)
    body = await request.json()
    enabled = bool(body.get("enabled"))
    db = get_db()
    db.upsert_folder_setting(user.id, rel, enabled=enabled)
    if enabled:
        db.set_index_status(rel, "pending")
        from voitta_rag_tpu.services.indexing_worker import get_indexing_worker

        get_indexing_worker().kick()
    else:
        status = db.get_index_status(rel)
        if status and status.status in ("indexed", "pending", "indexing"):
            db.set_index_status(rel, "disabled")
    return web.json_response({"folder": rel, "enabled": enabled})


@require_user
async def force_reindex(request: web.Request, user) -> web.Response:
    """Forced reindex (reference settings.py:281-338): purge and re-queue."""
    rel = tail_path(request)
    db = get_db()
    from voitta_rag_tpu.index.store import get_vector_store

    import asyncio

    def purge():
        # Executor: the store lock can be held for a whole search or
        # compaction — inline acquisition would stall the event loop.
        get_vector_store().delete_by_index_folder(rel)
        for rec in db.indexed_files_in("index_folder", rel):
            db.delete_indexed_file(rec.file_path)

    await asyncio.get_running_loop().run_in_executor(None, purge)
    db.set_index_status(rel, "pending")
    from voitta_rag_tpu.services.indexing_worker import get_indexing_worker

    get_indexing_worker().kick()
    return web.json_response({"folder": rel, "status": "pending"})


def setup(app: web.Application) -> None:
    app.router.add_get("/api/settings/folders", list_folder_settings)
    app.router.add_post("/api/settings/folders/{path:.*}/search-active",
                        set_search_active)
    app.router.add_post("/api/settings/folders/{path:.*}/indexing",
                        set_indexing)
    app.router.add_post("/api/settings/folders/{path:.*}/reindex",
                        force_reindex)
