"""Web pages: landing with user picker, select-user cookie, file browser.

Behavior contract: reference api/routes/pages.py — landing (163-228),
select-user cookie (229-247), /browse full page (268-380), /api/browse-list
JSON/fragment for AJAX refresh (381-402), with the per-folder aggregation of
search state, index status, chunk/size stats, and sync badges
(_gather_file_list_data, 14-160).
"""

from __future__ import annotations

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import USER_COOKIE, current_user
from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.db.database import get_db


def _ancestor_sync_type(db, rel_path: str) -> str | None:
    """Nearest ancestor folder's sync source type (reference pages.py keeps a
    ``current_sync_type`` so items INSIDE a synced tree show its badge)."""
    parts = rel_path.split("/") if rel_path else []
    for i in range(len(parts), 0, -1):
        src = db.get_sync_source("/".join(parts[:i]))
        if src:
            return src.source_type
    return None


def gather_file_list_data(rel_path: str, user) -> dict:
    """Aggregate the browser-row data (reference pages.py:14-160):
    per-folder SUBTREE roll-ups of indexed files/chunks/bytes, index status,
    sync badges (own or inherited from an ancestor source), per-user search/
    indexing toggles, file extensions."""
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    fs = get_filesystem_service()
    db = get_db()
    entries = fs.list_dir(rel_path)
    project = db.get_active_project(user) if user else None

    # One query scoped to this subtree; each leaf folder group is bucketed
    # ONCE by its first path segment below rel_path — O(groups), not
    # O(groups x listed dirs) (this runs on every WS-debounced refresh).
    # LIKE wildcards must be escaped: an unescaped '_' in a folder name
    # would match siblings ("my_app/%" matching "myxapp/...") and inflate
    # this listing's roll-ups with their rows.
    from voitta_rag_tpu.db.database import like_prefix
    prefix = rel_path + "/" if rel_path else ""
    like = like_prefix(rel_path) if rel_path else "%"
    groups = db.query(
        "SELECT folder_path, COUNT(*) AS n, SUM(chunk_count) AS chunks, "
        "SUM(file_size) AS bytes FROM indexed_files WHERE chunk_count > 0 "
        "AND (folder_path = ? OR folder_path LIKE ? ESCAPE '\\') "
        "GROUP BY folder_path",
        (rel_path, like))
    dir_paths = [e.path for e in entries if e.is_dir]
    stats = {p: {"indexed_files": 0, "total_chunks": 0, "indexed_bytes": 0}
             for p in dir_paths}
    for r in groups:
        fp = r["folder_path"]
        if fp == rel_path:
            continue  # files directly in the listed dir are rows themselves
        child = prefix + fp[len(prefix):].split("/", 1)[0]
        s = stats.get(child)
        if s is not None:
            s["indexed_files"] += r["n"]
            s["total_chunks"] += r["chunks"] or 0
            s["indexed_bytes"] += r["bytes"] or 0

    inherited_sync = _ancestor_sync_type(db, rel_path)

    items = []
    for e in entries:
        item = {
            "name": e.name, "path": e.path, "is_dir": e.is_dir,
            "size": e.size, "modified_at": e.modified_at,
        }
        if e.is_dir:
            status = db.get_index_status(e.path)
            item["index_status"] = status.status if status else "none"
            st = stats[e.path]
            item["chunks"] = st["total_chunks"]
            item["stats"] = st
            src = db.get_sync_source(e.path)
            if src:
                item["sync"] = {"source_type": src.source_type,
                                "sync_status": src.sync_status,
                                "last_synced_at": src.last_synced_at}
            elif inherited_sync:
                item["sync_type_inherited"] = inherited_sync
            if user:
                if project and not project.is_default:
                    item["search_active"] = db.project_folder_active(
                        project.id, e.path)
                else:
                    s = db.folder_setting(user.id, e.path)
                    item["search_active"] = bool(s and s.search_active)
                s = db.folder_setting(user.id, e.path)
                item["indexing_enabled"] = bool(s and s.enabled)
        else:
            rec = db.get_indexed_file(e.path)
            item["indexed"] = rec is not None and rec.chunk_count > 0
            item["chunks"] = rec.chunk_count if rec else 0
            dot = e.name.rfind(".")
            item["extension"] = e.name[dot:] if dot > 0 else ""
            if inherited_sync:
                item["sync_type_inherited"] = inherited_sync
        items.append(item)
    return {
        "path": rel_path,
        "breadcrumbs": fs.breadcrumbs(rel_path),
        "items": items,
    }


async def landing(request: web.Request) -> web.Response:
    settings = get_settings()
    db = get_db()
    tpl = request.app["jinja"].get_template("landing.html")
    html = tpl.render(
        users=db.list_users(),
        ms_auth_enabled=settings.ms_auth_enabled,
        google_auth_enabled=settings.google_auth_enabled,
    )
    return web.Response(text=html, content_type="text/html")


async def select_user(request: web.Request) -> web.Response:
    data = await request.post()
    name = (data.get("username") or "").strip()
    if not name:
        raise web.HTTPBadRequest(text="username required")
    get_db().get_or_create_user(name)
    resp = web.HTTPFound("/browse")
    resp.set_cookie(USER_COOKIE, name, max_age=86400 * 365, httponly=True)
    raise resp


async def logout(request: web.Request) -> web.Response:
    resp = web.HTTPFound("/")
    resp.del_cookie(USER_COOKIE)
    raise resp


async def browse(request: web.Request) -> web.Response:
    user = current_user(request)
    if user is None:
        raise web.HTTPFound("/")
    rel = request.match_info.get("path") or request.query.get("path", "")
    data = gather_file_list_data(rel, user)
    db = get_db()
    tpl = request.app["jinja"].get_template("browser.html")
    html = tpl.render(
        user=user, projects=db.list_projects(user.id),
        active_project=db.get_active_project(user), **data)
    return web.Response(text=html, content_type="text/html")


async def browse_list(request: web.Request) -> web.Response:
    """Rendered file-list rows for AJAX refresh (reference pages.py:381-402
    returns the _file_list_items.html fragment); ``?format=json`` returns the
    raw aggregation instead."""
    user = current_user(request)
    rel = request.match_info.get("path") or request.query.get("path", "")
    try:
        data = gather_file_list_data(rel, user)
    except (FileNotFoundError, NotADirectoryError, PermissionError):
        return web.Response(text="", content_type="text/html")
    if request.query.get("format") == "json":
        return web.json_response(data)
    tpl = request.app["jinja"].get_template("_file_list_items.html")
    return web.Response(text=tpl.render(**data), content_type="text/html")


def setup(app: web.Application) -> None:
    app.router.add_get("/", landing)
    app.router.add_post("/select-user", select_user)
    app.router.add_get("/logout", logout)
    app.router.add_get("/browse", browse)
    # Path-suffixed aliases for reference-style deep links
    # (reference pages.py: /browse/{path}, /api/browse-list/{path}).
    app.router.add_get("/browse/{path:.*}", browse)
    app.router.add_get("/api/browse-list", browse_list)
    app.router.add_get("/api/browse-list/{path:.*}", browse_list)
