"""File upload + info (reference api/routes/files.py:22-86)."""

from __future__ import annotations

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import json_error, require_user, tail_path
from voitta_rag_tpu.db.database import get_db
from voitta_rag_tpu.services.anamnesis import ANAMNESIS_DIR


@require_user
async def upload(request: web.Request, user) -> web.Response:
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    fs = get_filesystem_service()
    reader = await request.multipart()
    target = ""
    saved = []
    while True:
        part = await reader.next()
        if part is None:
            break
        if part.name == "path":
            target = (await part.text()).strip("/")
            if target.split("/")[0] == ANAMNESIS_DIR:
                return json_error(400, "cannot upload into Anamnesis")
            if fs.mapping_for(target):
                return json_error(400, "cannot upload into a mapped folder")
        elif part.name == "files" and part.filename:
            data = await part.read(decode=False)
            saved.append(fs.write_file(target, part.filename, data))
    return web.json_response({"uploaded": saved}, status=201)


async def file_info(request: web.Request) -> web.Response:
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    rel = tail_path(request)
    fs = get_filesystem_service()
    try:
        p = fs.resolve(rel)
    except PermissionError:
        return json_error(400, "invalid path")
    if not p.exists() or not p.is_file():
        return json_error(404, "file not found")
    st = p.stat()
    rec = get_db().get_indexed_file(rel)
    return web.json_response({
        "path": rel, "name": p.name, "size": st.st_size,
        "modified_at": st.st_mtime,
        "indexed": rec is not None and rec.chunk_count > 0,
        "chunk_count": rec.chunk_count if rec else 0,
        "parse_error": rec.parse_error if rec else None,
    })


@require_user
async def delete_file(request: web.Request, user) -> web.Response:
    """Delete a single file; the watcher event purges its index entries."""
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    rel = tail_path(request)
    fs = get_filesystem_service()
    try:
        p = fs.resolve(rel)
    except PermissionError:
        return json_error(400, "invalid path")
    if fs.mapping_for(rel):
        return json_error(400, "cannot delete from a mapped folder")
    if not p.exists() or not p.is_file():
        return json_error(404, "file not found")
    p.unlink()
    return web.json_response({"deleted": rel})


def setup(app: web.Application) -> None:
    app.router.add_post("/api/files/upload", upload)
    app.router.add_get("/api/files/info/{path:.*}", file_info)
    # Reference-shaped alias (reference files.py:68-85 get_file_info);
    # /api/files/info/... is registered first and wins for that prefix.
    app.router.add_get("/api/files/{path:.*}", file_info)
    app.router.add_delete("/api/files/{path:.*}", delete_file)
