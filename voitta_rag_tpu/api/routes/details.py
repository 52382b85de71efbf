"""Sidebar details aggregate (reference api/routes/details.py:50-218):
metadata, toggles, index status, sync info, per-extension file-type stats."""

from __future__ import annotations

from collections import Counter

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import current_user, json_error, tail_path
from voitta_rag_tpu.db.database import get_db
from voitta_rag_tpu.services.metadata import get_metadata_service


async def details(request: web.Request) -> web.Response:
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    rel = tail_path(request)
    fs = get_filesystem_service()
    try:
        p = fs.resolve(rel)
    except PermissionError:
        return json_error(400, "invalid path")
    if not p.exists():
        return json_error(404, "not found")

    db = get_db()
    user = current_user(request)
    out: dict = {"path": rel, "is_dir": p.is_dir()}
    meta = get_metadata_service().get(rel)
    out["metadata"] = meta

    if p.is_dir():
        status = db.get_index_status(rel)
        out["index_status"] = status.status if status else "none"
        out["index_error"] = status.error_message if status else None
        src = db.get_sync_source(rel)
        if src:
            out["sync"] = {
                "source_type": src.source_type,
                "sync_status": src.sync_status,
                "sync_error": src.sync_error,
                "last_synced_at": src.last_synced_at,
            }
        recs = db.indexed_files_under(rel)
        out["indexed_files"] = len(recs)
        out["total_chunks"] = sum(max(r.chunk_count, 0) for r in recs)
        out["counts"] = fs.file_counts(rel)
        # Per-extension stats joined with index state (reference
        # details.py:160-218: total_count / indexed_count / chunk_count per
        # extension, sorted by total descending).
        def ext_of(name: str) -> str:
            base = name.rsplit("/", 1)[-1]
            dot = base.rfind(".")
            return base[dot:].lower() if dot > 0 else "(no extension)"

        ext_counter: Counter = Counter()
        for f in fs.walk_files(rel):
            ext_counter[ext_of(f)] += 1
        indexed_by_ext: dict[str, list[int]] = {}
        for r in recs:
            if r.chunk_count <= 0:
                # chunk_count < 0 is the interrupted-indexing marker
                # (reference db/models.py:238); those files are NOT indexed.
                continue
            e = ext_of(r.file_path)
            agg = indexed_by_ext.setdefault(e, [0, 0])
            agg[0] += 1
            agg[1] += r.chunk_count
        out["file_types"] = [
            {
                "extension": ext,
                "total_count": total,
                "indexed_count": indexed_by_ext.get(ext, [0, 0])[0],
                "chunk_count": indexed_by_ext.get(ext, [0, 0])[1],
            }
            for ext, total in ext_counter.most_common()
        ]
        if user:
            project = db.get_active_project(user)
            if project.is_default:
                s = db.folder_setting(user.id, rel)
                out["search_active"] = bool(s and s.search_active)
            else:
                out["search_active"] = db.project_folder_active(project.id, rel)
            s = db.folder_setting(user.id, rel)
            out["indexing_enabled"] = bool(s and s.enabled)
    else:
        st = p.stat()
        out["size"] = st.st_size
        out["modified_at"] = st.st_mtime
        rec = db.get_indexed_file(rel)
        out["indexed"] = rec is not None and rec.chunk_count > 0
        out["chunk_count"] = rec.chunk_count if rec else 0
        out["content_hash"] = rec.content_hash if rec else None
        out["parse_error"] = rec.parse_error if rec else None
    return web.json_response(out)


def setup(app: web.Application) -> None:
    app.router.add_get("/api/details/{path:.*}", details)
