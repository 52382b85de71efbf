"""Indexing worker: daemon thread draining pending folder-index requests.

Behavior contract (reference services/indexing_worker.py:18-154): polls
``FolderIndexStatus.status == 'pending'`` every ``indexing_poll_interval``
seconds, runs the indexing service per folder, flips status, and broadcasts
``index_status`` / ``index_complete`` events over the watcher's pub/sub for
the WebSocket UI.
"""

from __future__ import annotations

import logging
import threading

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.db.database import get_db
from voitta_rag_tpu.services.indexing import get_indexing_service
from voitta_rag_tpu.services.watcher import file_watcher

logger = logging.getLogger(__name__)


class IndexingWorker:
    def __init__(self, poll_interval: int | None = None):
        self.poll_interval = poll_interval or get_settings().indexing_poll_interval
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._wake = threading.Event()

    def start(self, loop=None) -> None:
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="indexing-worker")
        self._thread.start()
        logger.info("indexing worker started (poll %ds)", self.poll_interval)

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread:
            self._thread.join(timeout=10)
            self._thread = None

    def kick(self) -> None:
        """Wake the worker immediately (e.g. after enqueueing a folder)."""
        self._wake.set()

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                self.process_pending()
            except Exception:
                logger.exception("indexing worker tick failed")
            self._wake.wait(self.poll_interval)
            self._wake.clear()

    def process_pending(self) -> int:
        """Index every pending folder; returns number processed."""
        db = get_db()
        pending = db.folders_with_status("pending")
        for folder in pending:
            path = folder.folder_path
            self._notify("index_status", path, "indexing")
            stats = get_indexing_service().index_folder(path)
            status = db.get_index_status(path)
            final = status.status if status else "indexed"
            self._notify("index_complete", path, final, stats=stats)
        if pending:
            self.maybe_auto_optimize()
        return len(pending)

    def maybe_auto_optimize(self) -> bool:
        """Rebuild stale read-optimized snapshots once an indexing burst
        settles. Qdrant keeps its HNSW/inverted structures fresh on every
        upsert; here snapshots invalidate on mutation and searches fall
        back to exact flat scans — correct but slower at scale. After the
        last pending folder of a burst, rebuild the sparse postings (and
        the IVF partition when VOITTA_IVF_CELLS opts in) so serving returns
        to the fast path without operator action. Skips while more work is
        queued, below the row threshold, or when disabled
        (VOITTA_AUTO_OPTIMIZE=false)."""
        settings = get_settings()
        if not settings.auto_optimize:
            return False
        db = get_db()
        if db.folders_with_status("pending"):
            return False  # another burst is queued; rebuild once at the end
        from voitta_rag_tpu.index.store import get_vector_store

        store = get_vector_store()
        if store.count() < settings.auto_optimize_min_rows:
            return False
        did = False
        try:
            if store.sharded_active is False and store.segments:
                # Reclaim tombstone-heavy segments first (no-op below the
                # waste threshold) so the snapshot builds below see the
                # packed layout.
                info = store.compact()
                if info.get("compacted"):
                    logger.info("auto-optimize: compacted (%s)", info)
                    did = True
            if not store.postings_active:
                info = store.build_postings()
                logger.info("auto-optimize: postings rebuilt (%s)", info)
                did = True
            if settings.ivf_cells and not store.ivf_active:
                info = store.build_ivf()
                logger.info("auto-optimize: IVF rebuilt (%s)", info)
                did = True
        except ValueError as e:
            logger.warning("auto-optimize skipped: %s", e)
        return did

    @staticmethod
    def _notify(event_type: str, folder: str, status: str, stats=None) -> None:
        payload = {"type": event_type, "folder": folder, "status": status}
        if stats:
            payload["stats"] = stats
        file_watcher.broadcast(payload)


_worker: IndexingWorker | None = None
_create_lock = threading.Lock()


def get_indexing_worker() -> IndexingWorker:
    global _worker
    if _worker is None:
        with _create_lock:
            if _worker is None:
                _worker = IndexingWorker()
    return _worker


def reset_indexing_worker() -> None:
    global _worker
    if _worker is not None:
        _worker.stop()
    _worker = None
