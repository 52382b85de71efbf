"""Folder CRUD (reference api/routes/folders.py:38-209): create with
Anamnesis/sync-folder guards, delete with full cascade (sync source, index
status, indexed_files rows, settings, store chunks, disk, watcher
suppression), list."""

from __future__ import annotations

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import json_error, require_user, tail_path
from voitta_rag_tpu.db.database import get_db
from voitta_rag_tpu.index.store import get_vector_store
from voitta_rag_tpu.services.anamnesis import ANAMNESIS_DIR


@require_user
async def create_folder(request: web.Request, user) -> web.Response:
    data = await request.json()
    parent = (data.get("path") or "").strip("/")
    name = (data.get("name") or "").strip()
    if not name:
        return json_error(400, "folder name required")
    if name == ANAMNESIS_DIR and not parent:
        return json_error(400, "reserved folder name")
    db = get_db()
    if db.get_sync_source(parent):
        return json_error(400, "cannot create folders inside a sync folder")
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    try:
        created = get_filesystem_service().create_folder(parent, name)
    except FileExistsError:
        return json_error(409, "folder already exists")
    except PermissionError as e:
        return json_error(400, str(e))
    return web.json_response({"path": created}, status=201)


@require_user
async def delete_folder(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    if not rel:
        return json_error(400, "cannot delete root")
    db = get_db()
    from voitta_rag_tpu.services.filesystem import get_filesystem_service
    from voitta_rag_tpu.services.watcher import file_watcher

    fs = get_filesystem_service()
    if not fs.exists(rel) or not fs.is_dir(rel):
        return json_error(404, "folder not found")

    # Full cascade (reference folders.py:79-157). Runs in the executor:
    # delete_by_folder acquires the store lock, which can be held for a
    # whole search or compaction — blocking inline would stall the event
    # loop (and every other request) for that long.
    def cascade():
        from voitta_rag_tpu.services.indexing import get_indexing_service

        file_watcher.suppress_path(rel)
        # folder_lock: an in-flight index_file on this tree finishes its
        # delete->store sequence first, so the cascade can't be interleaved
        # into ghost chunks for deleted files.
        try:
            with get_indexing_service().folder_lock(rel):
                _cascade_locked()
        finally:
            file_watcher.unsuppress_path(rel)

    def _cascade_locked():
        db.delete_sync_source(rel)
        db.delete_index_status(rel)
        for rec in db.indexed_files_under(rel):
            db.delete_indexed_file(rec.file_path)
        # LIKE wildcards escaped: '_'/'%' in a folder name must not
        # widen the delete to sibling folders' settings.
        from voitta_rag_tpu.db.database import like_prefix
        like = like_prefix(rel)
        db.execute("DELETE FROM user_folder_settings WHERE folder_path=? "
                   "OR folder_path LIKE ? ESCAPE '\\'", (rel, like))
        db.execute("DELETE FROM project_folder_settings WHERE "
                   "folder_path=? OR folder_path LIKE ? ESCAPE '\\'",
                   (rel, like))
        get_vector_store().delete_by_folder(rel)
        fs.delete(rel)

    import asyncio
    await asyncio.get_running_loop().run_in_executor(None, cascade)
    file_watcher.broadcast({"type": "deleted", "path": rel,
                            "is_directory": True})
    return web.json_response({"deleted": rel})


@require_user
async def list_folders(request: web.Request, user) -> web.Response:
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    rel = request.query.get("path", "")
    fs = get_filesystem_service()
    folders = [e.path for e in fs.list_dir(rel) if e.is_dir]
    return web.json_response({"folders": folders})


@require_user
async def list_folder_contents(request: web.Request, user) -> web.Response:
    """Folder item listing (reference folders.py:160-209 list_folder)."""
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    rel = tail_path(request)
    fs = get_filesystem_service()
    if not fs.exists(rel) or not fs.is_dir(rel):
        return json_error(404, "folder not found")
    return web.json_response({"items": [
        {"name": e.name, "path": e.path, "is_dir": e.is_dir,
         "size": e.size, "modified_at": e.modified_at}
        for e in fs.list_dir(rel)]})


def setup(app: web.Application) -> None:
    app.router.add_post("/api/folders", create_folder)
    app.router.add_delete("/api/folders/{path:.*}", delete_folder)
    app.router.add_get("/api/folders", list_folders)
    app.router.add_get("/api/folders/{path:.*}", list_folder_contents)
