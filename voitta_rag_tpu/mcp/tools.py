"""The 15 MCP tools (behavior contract: reference mcp_server.py:373-1439).

Each tool is a plain function taking ``user_name`` (resolved by the server's
auth middleware from X-User-Name / validated OAuth tokens) plus the tool
arguments, returning a pydantic model or list thereof. The search hot path
routes through the fused device program (search/service.py).
"""

from __future__ import annotations

import logging
import os
import mimetypes
import re
from datetime import datetime, timezone

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.db.database import get_db
from voitta_rag_tpu.index.store import get_vector_store
from voitta_rag_tpu.mcp.models import (
    ChunkRangeResult, FileContent, FileUriResult, FolderActiveState,
    IndexedFolderInfo, MemoryListResult, MemoryResult, ResolveUrlResult,
    SearchResult, SetFolderActiveResult,
)
from voitta_rag_tpu.search.service import get_search_service
from voitta_rag_tpu.services import anamnesis
from voitta_rag_tpu.services.parsers import get_registry

logger = logging.getLogger(__name__)


def _parse_date_to_epoch(value: str) -> int:
    """ISO 8601 or YYYY-MM-DD → epoch (bare dates = midnight UTC;
    reference mcp_server.py:358-370)."""
    dt = datetime.fromisoformat(value)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _extract_memory_id(file_path: str) -> str | None:
    parts = file_path.split("/")
    if len(parts) >= 3 and parts[0] == "Anamnesis" and parts[-1].endswith(".md"):
        return parts[-1][:-3]
    return None


def _expand_active_folders(active: list[str], all_folders: list[str]) -> set[str]:
    """Subfolder expansion (mcp_server.py:433-441)."""
    out = set(active)
    for folder in all_folders:
        fn = folder.rstrip("/")
        for a in active:
            an = a.rstrip("/")
            if fn == an or fn.startswith(an + "/"):
                out.add(folder)
                break
    return out


def _user_effective_folders(user_name: str | None,
                            include_folders: list[str] | None):
    """Resolve user → active project → active folders → effective include
    set (mcp_server.py:408-462). Returns (include_list | None, disabled,
    empty_result: bool)."""
    db = get_db()
    disabled = [s.folder_path for s in db.folders_with_status("disabled")]
    if not user_name:
        return include_folders, disabled, False

    user = db.get_or_create_user(user_name)
    project = db.get_active_project(user)
    if project.is_default:
        rows = db.query(
            "SELECT folder_path FROM user_folder_settings "
            "WHERE user_id=? AND search_active=1", (user.id,))
        active = [r["folder_path"] for r in rows]
    else:
        active = db.active_folders_for_project(project.id)
    if not active:
        return None, disabled, True

    all_indexed = get_vector_store().payloads.distinct("folder_path")
    effective = _expand_active_folders(active, all_indexed)
    if include_folders:
        filtered = set()
        for f in effective:
            fn = f.rstrip("/")
            for req in include_folders:
                rn = req.rstrip("/")
                if fn == rn or fn.startswith(rn + "/"):
                    filtered.add(f)
                    break
        if not filtered:
            return None, disabled, True
        effective = filtered
    return list(effective), disabled, False


# ---------------------------------------------------------------------------
# search (mcp_server.py:373-526)
# ---------------------------------------------------------------------------

def search(user_name: str | None, query: str, limit: int | None = None,
           include_folders: list[str] | None = None,
           exclude_folders: list[str] | None = None,
           sparse_weight: float | None = None,
           date_start: str | None = None, date_end: str | None = None,
           date_field: str | None = None,
           fusion: str = "weighted") -> list[SearchResult]:
    # ``fusion`` ("weighted" | "rrf") is an HTTP-API extra; the MCP tool
    # schema stays on the reference's 8-argument contract. Validated here
    # because it becomes a jit STATIC argument downstream — an unvalidated
    # string would compile (and cache) one program per distinct value.
    if fusion not in ("weighted", "rrf"):
        raise ValueError(f"unknown fusion mode: {fusion!r} "
                         "(expected 'weighted' or 'rrf')")
    settings = get_settings()
    limit = limit or settings.mcp_search_limit
    if sparse_weight is None:
        sparse_weight = settings.sparse_weight

    effective_include, disabled, empty = _user_effective_folders(
        user_name, include_folders)
    if empty:
        return []

    chunks = get_search_service().search(
        query, limit=limit,
        include_folders=effective_include,
        exclude_folders=exclude_folders,
        exclude_index_folders=disabled or None,
        sparse_weight=sparse_weight,
        date_start=_parse_date_to_epoch(date_start) if date_start else None,
        date_end=_parse_date_to_epoch(date_end) if date_end else None,
        date_field=date_field, fusion=fusion)

    db = get_db()
    meta_map = db.file_metadata_for_paths(
        list({c.metadata.file_path for c in chunks}))

    def fmt_ts(epoch):
        if not epoch:
            return None
        return datetime.fromtimestamp(epoch, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M UTC")

    return [
        SearchResult(
            text=c.text, score=c.score or 0.0,
            file_path=c.metadata.file_path, file_name=c.metadata.file_name,
            folder_path=c.metadata.folder_path,
            index_folder=c.metadata.index_folder,
            chunk_index=c.metadata.chunk_index,
            total_chunks=c.metadata.total_chunks,
            file_metadata=meta_map.get(c.metadata.file_path),
            source_created_at=fmt_ts(c.metadata.source_created_at),
            source_modified_at=fmt_ts(c.metadata.source_modified_at),
            memory_id=_extract_memory_id(c.metadata.file_path),
            source_url=c.metadata.source_url,
        )
        for c in chunks
    ]


# ---------------------------------------------------------------------------
# folders / files (mcp_server.py:529-853)
# ---------------------------------------------------------------------------

def list_indexed_folders(user_name: str | None) -> list[IndexedFolderInfo]:
    db = get_db()
    active = None
    if user_name:
        user = db.get_or_create_user(user_name)
        project = db.get_active_project(user)
        if project.is_default:
            rows = db.query(
                "SELECT folder_path FROM user_folder_settings "
                "WHERE user_id=? AND search_active=1", (user.id,))
            active = [r["folder_path"] for r in rows]
        else:
            active = db.active_folders_for_project(project.id)
        if not active:
            return []

    statuses = {s.folder_path: s.status for s in db.all_index_statuses()}
    stats: dict[str, dict] = {}
    for r in db.query("SELECT index_folder, folder_path, chunk_count FROM indexed_files"):
        idx = r["index_folder"] or r["folder_path"]
        s = stats.setdefault(idx, {"file_count": 0, "total_chunks": 0})
        s["file_count"] += 1
        s["total_chunks"] += r["chunk_count"]

    all_paths = list(set(statuses) | set(stats))
    meta = db.file_metadata_for_paths(all_paths)

    def is_active(folder):
        if active is None:
            return True
        fn = folder.rstrip("/")
        return any(fn == a.rstrip("/") or fn.startswith(a.rstrip("/") + "/")
                   for a in active)

    return [
        IndexedFolderInfo(
            folder_path=f, status=statuses.get(f, "none"),
            file_count=stats.get(f, {}).get("file_count", 0),
            total_chunks=stats.get(f, {}).get("total_chunks", 0),
            metadata=meta.get(f))
        for f in all_paths if is_active(f)
    ]


def get_file(user_name: str | None, file_path: str) -> FileContent:
    db = get_db()
    rec = db.get_indexed_file(file_path)
    if not rec:
        raise ValueError(f"File is not indexed: {file_path}")
    meta = db.get_file_metadata(file_path)
    abs_path = get_settings().root_path / file_path
    if not abs_path.exists():
        raise ValueError(f"File not found on disk: {file_path}")
    result = get_registry().parse_file(abs_path)
    if not result.success:
        raise ValueError(f"Failed to parse file: {result.error}")
    return FileContent(
        file_path=file_path, file_name=abs_path.name, content=result.content,
        chunk_count=rec.chunk_count,
        metadata=meta.metadata_text if meta else None)


MAX_RANGE_CHUNKS = 20  # mcp_server.py get_chunk_range cap


def _merge_chunks_with_overlap(chunks, chunk_overlap: int) -> str:
    """Overlap-removing merge (mcp_server.py:1442-1472)."""
    if not chunks:
        return ""
    merged = chunks[0].text
    for c in chunks[1:]:
        if chunk_overlap > 0 and len(c.text) > chunk_overlap:
            merged += c.text[chunk_overlap:]
        else:
            merged += c.text
    return merged


def get_chunk_range(user_name: str | None, file_path: str, first_chunk: int,
                    last_chunk: int) -> ChunkRangeResult:
    store = get_vector_store()
    overlap = get_settings().chunk_overlap

    def fail(error, total=0, trunc_limit=False, trunc_file=False):
        return ChunkRangeResult(
            success=False, file_path=file_path, merged_text="",
            first_chunk=first_chunk, last_chunk=last_chunk,
            actual_first_chunk=0, actual_last_chunk=0,
            total_chunks_in_file=total, chunks_returned=0,
            truncated_to_limit=trunc_limit, truncated_beyond_file=trunc_file,
            error=error)

    if first_chunk < 0:
        return fail("first_chunk must be >= 0")
    if last_chunk < first_chunk:
        return fail("last_chunk must be >= first_chunk")

    truncated_to_limit = False
    effective_last = last_chunk
    if (last_chunk - first_chunk + 1) > MAX_RANGE_CHUNKS:
        effective_last = first_chunk + MAX_RANGE_CHUNKS - 1
        truncated_to_limit = True

    chunks = store.get_chunk_range(file_path, first_chunk, effective_last)
    if not chunks:
        total = store.count_chunks_for_file(file_path)
        if total == 0:
            return fail(f"File not found or not indexed: {file_path}",
                        trunc_limit=truncated_to_limit)
        return fail(
            f"Requested chunk range {first_chunk}-{last_chunk} is beyond "
            f"file size ({total} chunks, indices 0-{total - 1})",
            total=total, trunc_limit=truncated_to_limit, trunc_file=True)

    total_in_file = chunks[0].metadata.total_chunks
    actual_first = chunks[0].metadata.chunk_index
    actual_last = chunks[-1].metadata.chunk_index
    return ChunkRangeResult(
        success=True, file_path=file_path,
        merged_text=_merge_chunks_with_overlap(chunks, overlap),
        first_chunk=first_chunk, last_chunk=last_chunk,
        actual_first_chunk=actual_first, actual_last_chunk=actual_last,
        total_chunks_in_file=total_in_file, chunks_returned=len(chunks),
        truncated_to_limit=truncated_to_limit,
        truncated_beyond_file=actual_last < effective_last, error=None)


def get_file_uri(user_name: str | None, file_path: str,
                 server_host: str | None = None) -> FileUriResult:
    settings = get_settings()
    root = settings.root_path
    if not file_path or file_path == "/":
        raise ValueError("File path required")
    clean = file_path.lstrip("/")
    full = (root / clean).resolve()
    if full != root and not str(full).startswith(str(root) + os.sep):
        raise ValueError("Invalid file path")
    if not full.exists():
        raise ValueError(f"File not found: {file_path}")
    if full.is_dir():
        raise ValueError("Cannot get URI for a directory")
    mime, _ = mimetypes.guess_type(str(full))
    base = server_host or settings.base_url
    if base and not base.startswith(("http://", "https://")):
        base = f"http://{base}"
    base = (base or "http://localhost:8000").rstrip("/")
    return FileUriResult(
        uri=f"{base}/api/raw/{clean}", file_path=clean, file_name=full.name,
        size=full.stat().st_size, mime_type=mime or "application/octet-stream")


# ---------------------------------------------------------------------------
# resolve_url (mcp_server.py:856-972)
# ---------------------------------------------------------------------------

_URL_PATTERNS = [
    (re.compile(
        r"https?://docs\.google\.com/(?:document|spreadsheets|presentation)/d/([^/?#]+)"),
     "google"),
]


def _normalize_source_url(url: str) -> str | None:
    for pattern, provider in _URL_PATTERNS:
        m = pattern.search(url)
        if not m:
            continue
        doc_id = m.group(1)
        if provider == "google":
            if "/document/" in url:
                return f"https://docs.google.com/document/d/{doc_id}/edit"
            if "/spreadsheets/" in url:
                return f"https://docs.google.com/spreadsheets/d/{doc_id}/edit"
            if "/presentation/" in url:
                return f"https://docs.google.com/presentation/d/{doc_id}/edit"
    return None


def resolve_url(user_name: str | None, url: str) -> ResolveUrlResult:
    normalized = _normalize_source_url(url)
    if not normalized:
        return ResolveUrlResult(
            success=False, url=url,
            error="URL pattern not recognized. Supported: Google Docs, "
                  "Sheets, Slides.")
    chunks = get_vector_store().find_by_source_url(normalized)
    if not chunks:
        return ResolveUrlResult(
            success=False, url=url, normalized_url=normalized,
            error="No indexed content found for this URL. The document may "
                  "not be indexed yet.")
    files: dict[str, list] = {}
    for c in chunks:
        files.setdefault(c.metadata.file_path, []).append(c)
    best = max(files, key=lambda fp: len(files[fp]))
    best_chunks = sorted(files[best], key=lambda c: c.metadata.chunk_index)
    abs_path = get_settings().root_path / best
    content = None
    if abs_path.exists():
        parsed = get_registry().parse_file(abs_path)
        if parsed.success:
            content = parsed.content
    if content is None:
        content = "\n".join(c.text for c in best_chunks)
    return ResolveUrlResult(
        success=True, url=url, normalized_url=normalized, file_path=best,
        file_name=best_chunks[0].metadata.file_name, content=content,
        chunk_count=len(best_chunks))


# ---------------------------------------------------------------------------
# folder active state (mcp_server.py:992-1159)
# ---------------------------------------------------------------------------

def set_folder_active(user_name: str | None, folder_path: str,
                      is_active: bool) -> SetFolderActiveResult:
    def fail(error):
        return SetFolderActiveResult(
            success=False, folder_path=folder_path, is_active=is_active,
            subfolders_updated=0, error=error)

    if not user_name:
        return fail("X-User-Name header required for this operation")
    settings = get_settings()
    root = settings.root_path
    clean = (folder_path or "").lstrip("/")
    target = (root / clean).resolve() if clean else root
    if target != root and not str(target).startswith(str(root) + os.sep):
        return fail("Invalid folder path")
    if not target.exists() or not target.is_dir():
        return fail(f"Folder not found: {folder_path}")

    folders = [folder_path]
    try:
        for item in target.rglob("*"):
            if item.is_dir() and not item.name.startswith("."):
                folders.append(str(item.relative_to(root)))
    except OSError:
        pass

    db = get_db()
    user = db.get_or_create_user(user_name)
    project = db.get_active_project(user)
    for f in folders:
        if project.is_default:
            db.upsert_folder_setting(user.id, f, search_active=is_active)
        else:
            db.set_project_folder_active(project.id, f, is_active)
    return SetFolderActiveResult(
        success=True, folder_path=folder_path, is_active=is_active,
        subfolders_updated=len(folders) - 1, error=None)


def get_folder_active_states(user_name: str | None) -> list[FolderActiveState]:
    db = get_db()
    settings_map: dict[str, bool] = {}
    if user_name:
        user = db.get_or_create_user(user_name)
        project = db.get_active_project(user)
        if project.is_default:
            rows = db.query(
                "SELECT folder_path, search_active FROM user_folder_settings "
                "WHERE user_id=?", (user.id,))
        else:
            rows = db.query(
                "SELECT folder_path, search_active FROM project_folder_settings "
                "WHERE project_id=?", (project.id,))
        settings_map = {r["folder_path"]: bool(r["search_active"]) for r in rows}
    return [
        FolderActiveState(
            folder_path=s.folder_path,
            is_active=settings_map.get(s.folder_path, False) if user_name
            else True)
        for s in db.all_index_statuses()
    ]


# ---------------------------------------------------------------------------
# Anamnesis memory tools (mcp_server.py:1218-1439)
# ---------------------------------------------------------------------------

def _trigger_anamnesis_reindex(user_name: str) -> None:
    folder = anamnesis.anamnesis_folder_path(user_name)
    get_db().set_index_status(folder, "pending")
    try:
        from voitta_rag_tpu.services.indexing_worker import get_indexing_worker

        get_indexing_worker().kick()
    except Exception:
        pass


def _memory_result(data: dict | None, error: str | None = None) -> MemoryResult:
    if data is None:
        return MemoryResult(success=False, error=error or "Memory not found")
    return MemoryResult(
        success=True, memory_id=data.get("memory_id"),
        content=data.get("content"), created_at=data.get("created_at"),
        modified_at=data.get("modified_at"), likes=data.get("likes"),
        dislikes=data.get("dislikes"))


def _require_user(user_name):
    if not user_name:
        return MemoryResult(success=False,
                            error="X-User-Name header required")
    return None


def create_memory(user_name: str | None, content: str) -> MemoryResult:
    err = _require_user(user_name)
    if err:
        return err
    data = anamnesis.write_memory(user_name, content)
    _trigger_anamnesis_reindex(user_name)
    return _memory_result(data)


def get_memory(user_name: str | None, memory_id: str) -> MemoryResult:
    err = _require_user(user_name)
    if err:
        return err
    return _memory_result(anamnesis.read_memory(user_name, memory_id),
                          f"Memory not found: {memory_id}")


def update_memory(user_name: str | None, memory_id: str,
                  content: str) -> MemoryResult:
    err = _require_user(user_name)
    if err:
        return err
    if anamnesis.read_memory(user_name, memory_id) is None:
        return MemoryResult(success=False,
                            error=f"Memory not found: {memory_id}")
    data = anamnesis.write_memory(user_name, content, memory_id=memory_id)
    _trigger_anamnesis_reindex(user_name)
    return _memory_result(data)


def delete_memory(user_name: str | None, memory_id: str) -> MemoryResult:
    err = _require_user(user_name)
    if err:
        return err
    if not anamnesis.delete_memory(user_name, memory_id):
        return MemoryResult(success=False,
                            error=f"Memory not found: {memory_id}")
    get_vector_store().delete_by_file(
        anamnesis.memory_rel_path(user_name, memory_id))
    get_db().delete_indexed_file(
        anamnesis.memory_rel_path(user_name, memory_id))
    return MemoryResult(success=True, memory_id=memory_id)


def like_memory(user_name: str | None, memory_id: str) -> MemoryResult:
    err = _require_user(user_name)
    if err:
        return err
    return _memory_result(
        anamnesis.adjust_feedback(user_name, memory_id, likes_delta=1),
        f"Memory not found: {memory_id}")


def dislike_memory(user_name: str | None, memory_id: str) -> MemoryResult:
    err = _require_user(user_name)
    if err:
        return err
    return _memory_result(
        anamnesis.adjust_feedback(user_name, memory_id, dislikes_delta=1),
        f"Memory not found: {memory_id}")


def list_memories(user_name: str | None) -> MemoryListResult:
    if not user_name:
        return MemoryListResult(success=False,
                                error="X-User-Name header required")
    return MemoryListResult(
        success=True,
        memories=[_memory_result(d) for d in anamnesis.list_memories(user_name)])
