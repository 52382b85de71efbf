"""Indexing service: parse → chunk → embed (dense+sparse) → store.

Behavior contract (reference services/indexing.py:177-959):
- SHA-256 content-hash change detection (42-48) with skip/repair logic
  (231-277): unchanged + complete + store-count-consistent → skip;
  ``chunk_count < 0`` (interrupted) or count mismatch → re-index,
- delete-before-reindex so stale chunks never linger (281-288),
- bucketed PDF path: stream chunks per page bucket with progressive
  negative-chunk-count checkpoints (304-471),
- folder indexing smallest-file-first (639-650), per-file commits — a crash
  loses at most one file (588),
- ``sync_folder`` reconciler: remove DB/index entries for missing files,
  (re)index new/changed files, purge orphan store chunks from renames
  (777-908).

TPU-native difference: embeddings are batched across a file's chunks and
encoded in one device dispatch per batch bucket; store writes are donated
scatter updates into device segments (index/segment.py).
"""

from __future__ import annotations

import hashlib
import logging
import threading
from datetime import datetime, timezone
from pathlib import Path

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.core_types import ChunkMetadata
from voitta_rag_tpu.db.database import get_db
from voitta_rag_tpu.db.models import IndexedFile
from voitta_rag_tpu.index.store import get_vector_store
from voitta_rag_tpu.search.sparse_text import get_sparse_embedding_service
from voitta_rag_tpu.services import sidecars
from voitta_rag_tpu.services.chunking import get_chunking_service
from voitta_rag_tpu.services.embedding import get_embedding_service
from voitta_rag_tpu.services.filesystem import get_filesystem_service
from voitta_rag_tpu.services.parsers import get_registry
from voitta_rag_tpu.services.parsers.pdf_parser import PdfParser

logger = logging.getLogger("voitta.indexing")


def compute_file_hash(path: Path) -> str:
    """SHA-256 of file contents (reference indexing.py:42-48)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


class IndexingService:
    def __init__(self, vector_store=None, embedder=None, sparse=None,
                 chunker=None, fs=None):
        self.store = vector_store or get_vector_store()
        self.embedder = embedder or get_embedding_service()
        self.sparse = sparse or get_sparse_embedding_service()
        self.chunker = chunker or get_chunking_service()
        self.fs = fs or get_filesystem_service()
        # Per-tree mutation serialization, keyed on the TOP-LEVEL path
        # segment (so nested index folders "a" and "a/b" share a lock —
        # both can touch a/b/f.txt). Scope is PER OPERATION (one
        # index_file / one record removal), not per folder pass: the
        # worker and a sync reconciling the same tree interleave file-by-
        # file (each file's delete-before-reindex sequence atomic, so no
        # duplicate chunks), and the watcher's synchronous on_delete waits
        # at most one file op, not a whole folder index. RLock: nested
        # same-thread entry stays reentrant.
        self._folder_locks: dict[str, threading.RLock] = {}
        self._folder_locks_guard = threading.Lock()

    def folder_lock(self, path: str) -> threading.RLock:
        """Lock guarding index mutations under ``path``'s top-level tree
        (shared with the watcher delete path and the folder-delete
        cascade)."""
        key = path.strip("/").split("/", 1)[0]
        with self._folder_locks_guard:
            lock = self._folder_locks.get(key)
            if lock is None:
                lock = self._folder_locks[key] = threading.RLock()
            return lock

    # ------------------------------------------------------------------ file
    def index_file(self, file_path: str, index_folder: str,
                   force: bool = False) -> dict:
        """Index one file (path relative to root). Returns a stats dict."""
        with self.folder_lock(file_path):
            return self._index_file_locked(file_path, index_folder, force)

    def _index_file_locked(self, file_path: str, index_folder: str,
                           force: bool) -> dict:
        db = get_db()
        abs_path = self.fs.resolve(file_path)
        if not abs_path.exists() or not abs_path.is_file():
            return {"status": "error", "error": "file not found",
                    "file": file_path}
        registry = get_registry()
        if not registry.can_parse(abs_path):
            return {"status": "skipped", "reason": "unsupported",
                    "file": file_path}

        content_hash = compute_file_hash(abs_path)
        file_size = abs_path.stat().st_size
        rec = db.get_indexed_file(file_path)

        # Skip/repair decision (reference indexing.py:231-277).
        if rec and not force:
            if (rec.content_hash == content_hash and rec.chunk_count == 0
                    and rec.parse_error):
                # Same bytes already failed to parse (e.g. scanned PDF
                # awaiting an OCR worker) — don't re-parse every pass.
                return {"status": "error", "error": rec.parse_error,
                        "reason": "parse_error", "file": file_path}
            if rec.content_hash == content_hash and rec.chunk_count > 0:
                store_count = self.store.count_chunks_for_file(file_path)
                if store_count == rec.chunk_count:
                    return {"status": "skipped", "reason": "unchanged",
                            "file": file_path}
                logger.info("[INDEX] count mismatch for %s (db=%d store=%d); "
                            "repairing", file_path, rec.chunk_count,
                            store_count)
            elif rec.content_hash == content_hash and rec.chunk_count < 0:
                logger.info("[INDEX] %s was interrupted (chunk_count=%d); "
                            "re-indexing", file_path, rec.chunk_count)

        # Delete stale chunks before re-adding (indexing.py:281-288).
        self.store.delete_by_file(file_path)

        folder_path = str(Path(file_path).parent).replace("\\", "/")
        if folder_path == ".":
            folder_path = ""
        created, modified = sidecars.load_source_timestamps(abs_path)
        acl = sidecars.load_acl(abs_path)
        source_url = sidecars.load_source_url(abs_path)

        base_rec = IndexedFile(
            file_path=file_path, folder_path=folder_path,
            index_folder=index_folder, content_hash=content_hash,
            file_size=file_size, chunk_count=-1,
            source_created_at=created, source_modified_at=modified)

        if abs_path.suffix.lower() == ".pdf":
            return self._index_pdf_bucketed(
                abs_path, base_rec, acl, source_url)
        return self._index_file_standard(abs_path, base_rec, acl, source_url)

    def _metadata_for(self, rec: IndexedFile, chunk, total, acl, source_url,
                      start_page=None, end_page=None, page_count=None):
        return ChunkMetadata(
            file_path=rec.file_path, folder_path=rec.folder_path,
            index_folder=rec.index_folder,
            file_name=Path(rec.file_path).name,
            chunk_index=chunk.index, total_chunks=total,
            start_char=chunk.start_char, end_char=chunk.end_char,
            indexed_at=datetime.now(timezone.utc).isoformat(),
            start_page=start_page, end_page=end_page,
            source_page_count=page_count,
            source_created_at=rec.source_created_at,
            source_modified_at=rec.source_modified_at,
            allowed_users=acl, source_url=source_url)

    def _record_parse_error(self, rec: IndexedFile, error: str | None) -> None:
        """Persist a parse failure on the file record so the UI/details can
        show an actionable status (e.g. "OCR required") instead of a file
        that silently indexed to zero chunks. chunk_count=0 + parse_error
        also short-circuits re-parsing the same content every folder pass."""
        rec.chunk_count = 0
        rec.parse_error = (error or "parse failed")[:500]
        get_db().upsert_indexed_file(rec)

    def _embed_and_store(self, texts, metas):
        dense = self.embedder.embed_texts_array(texts)
        sparse = self.sparse.embed(texts)
        self.store.store_chunks(texts, dense, metas, sparse)

    def _index_file_standard(self, abs_path: Path, rec: IndexedFile,
                             acl, source_url) -> dict:
        db = get_db()
        result = get_registry().parse_file(abs_path)
        if not result.success:
            logger.warning("[INDEX] parse failed %s: %s", rec.file_path,
                           result.error)
            self._record_parse_error(rec, result.error)
            return {"status": "error", "error": result.error,
                    "file": rec.file_path}
        if not source_url:
            source_url = result.metadata.get("source_url")

        chunks = self.chunker.chunk_text(result.content)
        # Mark in progress (chunk_count = -1) for crash resume.
        db.upsert_indexed_file(rec)
        if chunks:
            texts = [c.text for c in chunks]
            metas = [self._metadata_for(rec, c, len(chunks), acl, source_url)
                     for c in chunks]
            self._embed_and_store(texts, metas)
        db.set_chunk_count(rec.file_path, len(chunks))
        logger.info("[INDEX] indexed %s (%d chunks)", rec.file_path,
                    len(chunks))
        return {"status": "indexed", "chunks": len(chunks),
                "file": rec.file_path}

    def _index_pdf_bucketed(self, abs_path: Path, rec: IndexedFile,
                            acl, source_url) -> dict:
        """Streamed PDF path (reference indexing.py:304-471): per-bucket
        parse→chunk→embed→store with negative-count checkpoints."""
        db = get_db()
        parser = PdfParser()
        db.upsert_indexed_file(rec)  # chunk_count = -1
        total = 0
        chunk_offset = 0
        image_only_pages = 0
        page_total = 0
        try:
            for result, start_page, end_page in parser.parse_in_buckets(
                    abs_path, get_settings().pdf_pages_per_bucket):
                page_total = max(page_total,
                                 int(result.metadata.get("page_count")
                                     or end_page))
                if not result.success or not result.content.strip():
                    image_only_pages += int(
                        result.metadata.get("image_only_pages") or 0)
                    continue
                page_count = result.metadata.get("page_count")
                chunks = self.chunker.chunk_text(result.content)
                for c in chunks:
                    c.index += chunk_offset
                if chunks:
                    texts = [c.text for c in chunks]
                    metas = [self._metadata_for(
                        rec, c, -1, acl, source_url, start_page, end_page,
                        page_count) for c in chunks]
                    self._embed_and_store(texts, metas)
                    total += len(chunks)
                    chunk_offset += len(chunks)
                    # Progressive checkpoint: -N chunks stored so far.
                    db.set_chunk_count(rec.file_path, -max(total, 1))
        except Exception as e:
            logger.exception("[INDEX] PDF bucketing failed for %s",
                             rec.file_path)
            return {"status": "error", "error": str(e), "file": rec.file_path}
        if total == 0 and image_only_pages:
            # Zero text anywhere but raster images present: a scanned PDF.
            # Surface "OCR needed" instead of an indexed-empty file
            # (reference quality bar: MinerU OCR path, pdf_parser.py:110-164).
            from voitta_rag_tpu.services.parsers.pdf_parser import \
                image_only_error

            err = image_only_error(image_only_pages, page_total)
            logger.warning("[INDEX] %s: %s", rec.file_path, err)
            self._record_parse_error(rec, err)
            return {"status": "error", "error": err, "file": rec.file_path}
        db.set_chunk_count(rec.file_path, total)
        logger.info("[INDEX] indexed PDF %s (%d chunks)", rec.file_path, total)
        return {"status": "indexed", "chunks": total, "file": rec.file_path}

    # ---------------------------------------------------------------- folder
    def index_folder(self, folder_path: str, force: bool = False,
                     progress_cb=None) -> dict:
        """Recursively index a folder, smallest files first (indexing.py:
        597-694). Locking is per file op (see folder_lock), so a whole
        folder pass never starves the watcher's synchronous deletes."""
        db = get_db()
        db.set_index_status(folder_path, "indexing")
        try:
            files = self.fs.walk_files(folder_path)
            sizes = []
            for f in files:
                try:
                    sizes.append((self.fs.resolve(f).stat().st_size, f))
                except OSError:
                    continue
            sizes.sort()
            stats = {"indexed": 0, "skipped": 0, "errors": 0}
            for _, f in sizes:
                r = self.index_file(f, index_folder=folder_path, force=force)
                key = {"indexed": "indexed", "skipped": "skipped"}.get(
                    r["status"], "errors")
                stats[key] += 1
                if progress_cb:
                    progress_cb(f, r)
            # Respect a concurrent re-mark to pending (indexing.py:674-679).
            cur = db.get_index_status(folder_path)
            if cur and cur.status == "indexing":
                db.set_index_status(
                    folder_path, "indexed",
                    indexed_at=datetime.now(timezone.utc).isoformat())
            logger.info("[INDEX] folder %s done: %s", folder_path, stats)
            return stats
        except Exception as e:
            logger.exception("[INDEX] folder %s failed", folder_path)
            db.set_index_status(folder_path, "error", error_message=str(e))
            return {"indexed": 0, "skipped": 0, "errors": 1, "error": str(e)}

    def sync_folder(self, folder_path: str) -> dict:
        """Reconcile an indexed folder with the file tree (indexing.py:
        777-908): drop records for missing files, (re)index new/changed
        files, purge orphan store chunks. Locking is per record op (see
        folder_lock)."""
        db = get_db()
        on_disk = set(self.fs.walk_files(folder_path))
        recs = db.indexed_files_in("index_folder", folder_path)
        stats = {"removed": 0, "reindexed": 0, "added": 0, "purged": 0}

        for rec in recs:
            if rec.file_path not in on_disk:
                with self.folder_lock(rec.file_path):
                    self.store.delete_by_file(rec.file_path)
                    db.delete_indexed_file(rec.file_path)
                stats["removed"] += 1

        for f in sorted(on_disk):
            rec = db.get_indexed_file(f)
            if rec is None:
                r = self.index_file(f, index_folder=folder_path)
                if r["status"] == "indexed":
                    stats["added"] += 1
            else:
                abs_path = self.fs.resolve(f)
                if (not abs_path.exists()
                        or compute_file_hash(abs_path) != rec.content_hash
                        or rec.chunk_count < 0):
                    r = self.index_file(f, index_folder=folder_path,
                                        force=True)
                    if r["status"] == "indexed":
                        stats["reindexed"] += 1

        # Purge store chunks whose file vanished (renames leave orphans).
        for fp in self.store.get_file_paths_for_index_folder(folder_path):
            if fp not in on_disk:
                with self.folder_lock(fp):
                    self.store.delete_by_file(fp)
                stats["purged"] += 1
        logger.info("[SYNC] reconciled %s: %s", folder_path, stats)
        return stats

    # ---------------------------------------------------------------- delete
    def remove_file_index(self, file_path: str) -> None:
        # folder_lock: a worker mid-index_file on this file must finish its
        # delete->store sequence before the removal, or the removal lands
        # first and the worker resurrects ghost chunks for a deleted file.
        with self.folder_lock(file_path):
            self.store.delete_by_file(file_path)
            get_db().delete_indexed_file(file_path)

    def remove_folder_index(self, folder_path: str) -> None:
        with self.folder_lock(folder_path):
            self.store.delete_by_folder(folder_path)
            db = get_db()
            for rec in db.indexed_files_under(folder_path):
                db.delete_indexed_file(rec.file_path)
            db.delete_index_status(folder_path)


_indexing_service: IndexingService | None = None
_create_lock = threading.Lock()


def get_indexing_service() -> IndexingService:
    global _indexing_service
    # Double-checked creation lock: executor threads can race
    # first-touch; two instances would hold independent locks
    # (and, for the store, two device copies of the index).
    if _indexing_service is None:
        with _create_lock:
            if _indexing_service is None:
                _indexing_service = IndexingService()
    return _indexing_service


def reset_indexing_service() -> None:
    global _indexing_service
    _indexing_service = None
