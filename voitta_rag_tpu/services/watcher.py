"""File watcher: tree-scan polling with pub/sub event fan-out.

Behavior contract (reference services/watcher.py:99-350): emits
created/modified/deleted events for files and directories under the root
(+ mapped source dirs), with
- a suppression set so API bulk deletes / sync jobs don't double-fire
  (watcher.py:116-129),
- synchronous index removal on deletions (watcher.py:149-171),
- settings inheritance for newly created directories from the closest
  configured ancestor (watcher.py:173-249),
- asyncio-queue pub/sub driving the WebSocket broadcast (watcher.py:251-293).

Implementation difference: the reference uses watchdog/inotify; this
framework polls with mtime/size diffing (dependency-free, works on network
mounts). The event contract is identical.
"""

from __future__ import annotations

import asyncio
import logging
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path

from voitta_rag_tpu.config import get_settings

logger = logging.getLogger(__name__)

POLL_INTERVAL = 2.0


@dataclass
class FileEvent:
    event_type: str  # created | modified | deleted | moved
    path: str        # relative path
    is_directory: bool = False

    def to_dict(self) -> dict:
        return {"type": self.event_type, "path": self.path,
                "is_directory": self.is_directory}


@dataclass
class _Snapshot:
    files: dict[str, tuple[float, int]] = field(default_factory=dict)
    dirs: set[str] = field(default_factory=set)


class FileWatcher:
    def __init__(self, fs=None, poll_interval: float = POLL_INTERVAL):
        self._fs = fs
        self.poll_interval = poll_interval
        self._subscribers: list[asyncio.Queue] = []
        self._suppressed: set[str] = set()
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._loop: asyncio.AbstractEventLoop | None = None
        self._snapshot: _Snapshot | None = None
        self.on_delete = None       # callback(rel_path, is_dir)
        self.on_dir_created = None  # callback(rel_path)

    @property
    def fs(self):
        if self._fs is None:
            from voitta_rag_tpu.services.filesystem import get_filesystem_service

            self._fs = get_filesystem_service()
        return self._fs

    # -- pub/sub (reference watcher.py:251-293) -----------------------------
    def subscribe(self) -> asyncio.Queue:
        q: asyncio.Queue = asyncio.Queue()
        with self._lock:
            self._subscribers.append(q)
        return q

    def unsubscribe(self, q: asyncio.Queue) -> None:
        with self._lock:
            if q in self._subscribers:
                self._subscribers.remove(q)

    def broadcast(self, event) -> None:
        """Thread-safe event fan-out (FileEvent or plain dict)."""
        if self._loop is None or self._loop.is_closed():
            return
        payload = event.to_dict() if isinstance(event, FileEvent) else event
        def _put():
            with self._lock:
                for q in list(self._subscribers):
                    q.put_nowait(payload)
        try:
            self._loop.call_soon_threadsafe(_put)
        except RuntimeError:
            pass

    # -- suppression (reference watcher.py:116-129) -------------------------
    def suppress_path(self, rel_path: str) -> None:
        with self._lock:
            self._suppressed.add(rel_path.strip("/"))

    def unsuppress_path(self, rel_path: str) -> None:
        with self._lock:
            self._suppressed.discard(rel_path.strip("/"))

    def _is_suppressed(self, rel_path: str) -> bool:
        rel = rel_path.strip("/")
        with self._lock:
            for s in self._suppressed:
                if rel == s or rel.startswith(s + "/"):
                    return True
        return False

    # -- scanning ------------------------------------------------------------
    def _scan(self) -> _Snapshot:
        snap = _Snapshot()
        root = self.fs.root
        try:
            for p in root.rglob("*"):
                try:
                    rel_parts = p.relative_to(root).parts
                except ValueError:
                    continue
                if any(part.startswith(".") for part in rel_parts):
                    continue
                rel = "/".join(rel_parts)
                if p.is_dir():
                    snap.dirs.add(rel)
                elif p.is_file():
                    try:
                        st = p.stat()
                        snap.files[rel] = (st.st_mtime, st.st_size)
                    except OSError:
                        continue
        except OSError as e:
            logger.warning("watcher scan failed: %s", e)
        return snap

    def _diff_and_emit(self, old: _Snapshot, new: _Snapshot) -> None:
        for rel in new.dirs - old.dirs:
            if self._is_suppressed(rel):
                continue
            self.broadcast(FileEvent("created", rel, is_directory=True))
            if self.on_dir_created:
                try:
                    self.on_dir_created(rel)
                except Exception:
                    logger.exception("on_dir_created failed for %s", rel)
        for rel in old.dirs - new.dirs:
            if self._is_suppressed(rel):
                continue
            self.broadcast(FileEvent("deleted", rel, is_directory=True))
            if self.on_delete:
                try:
                    self.on_delete(rel, True)
                except Exception:
                    logger.exception("on_delete failed for %s", rel)
        for rel, sig in new.files.items():
            if rel not in old.files:
                if not self._is_suppressed(rel):
                    self.broadcast(FileEvent("created", rel))
            elif old.files[rel] != sig:
                if not self._is_suppressed(rel):
                    self.broadcast(FileEvent("modified", rel))
        for rel in set(old.files) - set(new.files):
            if self._is_suppressed(rel):
                continue
            self.broadcast(FileEvent("deleted", rel))
            if self.on_delete:
                try:
                    self.on_delete(rel, False)
                except Exception:
                    logger.exception("on_delete failed for %s", rel)

    def poll_once(self) -> None:
        """One scan+diff cycle (also used directly by tests)."""
        new = self._scan()
        if self._snapshot is not None:
            self._diff_and_emit(self._snapshot, new)
        self._snapshot = new

    # -- thread lifecycle (reference watcher.py:319-350) --------------------
    def start(self, loop: asyncio.AbstractEventLoop) -> None:
        self._loop = loop
        self._stop.clear()
        self._snapshot = self._scan()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="file-watcher")
        self._thread.start()
        logger.info("file watcher started (poll %.1fs)", self.poll_interval)

    def _run(self) -> None:
        while not self._stop.wait(self.poll_interval):
            try:
                self.poll_once()
            except Exception:
                logger.exception("watcher poll failed")

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
            self._thread = None


file_watcher = FileWatcher()


def reset_file_watcher() -> None:
    global file_watcher
    file_watcher.stop()
    file_watcher = FileWatcher()
