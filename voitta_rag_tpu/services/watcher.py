"""File watcher: kernel inotify events (ctypes) with polling fallback.

Behavior contract (reference services/watcher.py:99-350): emits
created/modified/deleted events for files and directories under the root
(+ mapped source dirs), with
- a suppression set so API bulk deletes / sync jobs don't double-fire
  (watcher.py:116-129),
- synchronous index removal on deletions (watcher.py:149-171),
- settings inheritance for newly created directories from the closest
  configured ancestor (watcher.py:173-249),
- asyncio-queue pub/sub driving the WebSocket broadcast (watcher.py:251-293).

Backends: the reference uses watchdog's inotify observer; this framework
binds inotify(7) directly through libc (:mod:`voitta_rag_tpu.services
.inotify` — no O(tree) scans, millisecond latency) and falls back to
mtime/size-diff polling where inotify is unavailable (non-Linux, network
mounts with VOITTA_WATCH_BACKEND=poll). A kernel queue overflow triggers
one scan-diff rescan against an incrementally maintained snapshot, so no
deletion is ever lost. The event contract is identical in both backends.
"""

from __future__ import annotations

import asyncio
import logging
import os
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path


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
    def __init__(self, fs=None, poll_interval: float = POLL_INTERVAL,
                 backend: str | None = None):
        self._fs = fs
        self.poll_interval = poll_interval
        # "inotify" | "poll" | "auto" (env VOITTA_WATCH_BACKEND overrides).
        self.backend_pref = backend or os.environ.get(
            "VOITTA_WATCH_BACKEND", "auto")
        self.backend_active = "poll"
        self._inotify = None
        # rel path -> IN_CREATE timestamp: the creating write's trailing
        # close-write is folded into 'created' (polling parity), but only
        # within a short window — a close-write long after the create (slow
        # copy) or after a rename-in is a REAL modification.
        self._pending_creates: dict[str, float] = {}
        self._subscribers: list[asyncio.Queue] = []
        # rel path -> suppression refcount: overlapping suppressors (a
        # watch-root timer + a running sync on the same folder) must not
        # cancel each other's windows early.
        self._suppressed: dict[str, int] = {}
        # Bumped by add/remove_watch_root: a poll scan that started before
        # a roots change is diffed against the wrong tree and is discarded
        # (its snapshot would drop the seeded entries and later re-announce
        # or delete-storm the mapped folder).
        self._roots_version = 0
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
            key = rel_path.strip("/")
            self._suppressed[key] = self._suppressed.get(key, 0) + 1

    def unsuppress_path(self, rel_path: str) -> None:
        with self._lock:
            key = rel_path.strip("/")
            n = self._suppressed.get(key, 0) - 1
            if n > 0:
                self._suppressed[key] = n
            else:
                self._suppressed.pop(key, None)

    def _is_suppressed(self, rel_path: str) -> bool:
        rel = rel_path.strip("/")
        with self._lock:
            for s in self._suppressed:
                if rel == s or rel.startswith(s + "/"):
                    return True
        return False

    # -- scanning ------------------------------------------------------------
    def _watch_roots(self) -> list[tuple[str, Path]]:
        """(rel_prefix, base_dir) pairs: the root tree plus each mapped
        source dir (reference watcher.py:330-335 per-mapping watches)."""
        roots = [("", self.fs.root)]
        try:
            for folder, target in self.fs.mappings().items():
                roots.append((folder, Path(target)))
        except Exception:
            pass
        return roots

    def _scan(self) -> _Snapshot:
        snap = _Snapshot()
        for prefix, base in self._watch_roots():
            self._scan_tree(base, prefix, snap)
        return snap

    def _scan_tree(self, base: Path, prefix: str, snap: _Snapshot) -> None:
        # Prune hidden dirs and OTHER watch roots nested under this tree
        # (a mapping target inside the root would otherwise enter the
        # snapshot twice, under two rel paths).
        other_roots = {str(b.resolve()) for pfx, b in self._watch_roots()
                       if pfx != prefix}
        base_str = str(base)
        try:
            for dirpath, dirnames, filenames in os.walk(base):
                dirnames[:] = [
                    d for d in dirnames
                    if not d.startswith(".")
                    and os.path.realpath(
                        os.path.join(dirpath, d)) not in other_roots]
                sub = os.path.relpath(dirpath, base_str)
                sub = "" if sub == "." else sub.replace(os.sep, "/")
                head = (f"{prefix}/{sub}" if prefix and sub
                        else prefix or sub)
                for d in dirnames:
                    snap.dirs.add(f"{head}/{d}" if head else d)
                for f in filenames:
                    if f.startswith("."):
                        continue
                    try:
                        st = os.stat(os.path.join(dirpath, f))
                    except OSError:
                        continue
                    rel = f"{head}/{f}" if head else f
                    snap.files[rel] = (st.st_mtime, st.st_size)
        except OSError as e:
            logger.warning("watcher scan failed (%s): %s", base, e)

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

    def poll_once(self) -> bool:
        """One scan+diff cycle (also used directly by tests). Returns False
        when the scan was discarded because a watch root changed mid-scan
        (callers that MUST rescan — the inotify overflow recovery — retry
        on False; the poll loop just waits for its next tick)."""
        with self._lock:
            version = self._roots_version
        new = self._scan()
        with self._lock:
            if version != self._roots_version:
                # A watch root was added/removed mid-scan: this snapshot
                # reflects the OLD root set (and would drop the seeded
                # entries) — discard it.
                return False
            old = self._snapshot
            self._snapshot = new
            # Diff over copies captured at swap time: once published,
            # ``new`` can be seeded by an API thread's add_watch_root while
            # the (lock-free) diff iterates it.
            new_copy = _Snapshot(files=dict(new.files), dirs=set(new.dirs))
        if old is not None:
            self._diff_and_emit(old, new_copy)
        return True

    # -- inotify backend -----------------------------------------------------
    def _try_init_inotify(self) -> bool:
        if self.backend_pref == "poll":
            return False
        try:
            from voitta_rag_tpu.services.inotify import InotifyBackend

            backend = InotifyBackend()
            for _prefix, base in self._watch_roots():
                backend.add_tree(str(base))
            self._inotify = backend
            return True
        except Exception as e:
            if self.backend_pref == "inotify":
                raise
            logger.info("inotify unavailable (%s); polling fallback", e)
            return False

    def _rel_of(self, abs_path: str) -> str | None:
        """Tree-relative path (root or a mapped source dir), or None for
        out-of-tree/hidden entries. Mapping match order is FIRST-match, the
        same as FilesystemService.relative — a divergence here would index
        and delete under different rel paths for nested targets."""
        p = Path(abs_path)
        best = None
        for prefix, base in self._watch_roots()[1:]:
            try:
                best = (prefix, p.relative_to(base).parts)
                break
            except ValueError:
                continue
        if best is None:
            try:
                best = ("", p.relative_to(self.fs.root).parts)
            except ValueError:
                return None
        prefix, parts = best
        if any(part.startswith(".") for part in parts):
            return None
        if not parts:
            return prefix or None
        rel = "/".join(parts)
        return f"{prefix}/{rel}" if prefix else rel

    def add_watch_root(self, folder: str, target) -> None:
        """Watch a newly mapped source dir (no events for existing entries —
        they predate the mapping).

        The folder is suppressed for two poll cycles: a scan already in
        flight in the poll thread was diffed against a snapshot that
        predates the mapping and would otherwise announce every existing
        file as created (mass re-index).
        """
        folder = folder.strip("/")
        self.suppress_path(folder)
        with self._lock:
            self._roots_version += 1
            if self._snapshot is not None:
                self._scan_tree(Path(target), folder, self._snapshot)
        if self._inotify is not None:
            self._inotify.add_tree(str(target))
        timer = threading.Timer(2 * self.poll_interval + 0.5,
                                self.unsuppress_path, args=(folder,))
        timer.daemon = True
        timer.start()

    def remove_watch_root(self, folder: str, target) -> None:
        """Stop watching a mapped dir (mapping removed or retargeted); the
        entries leave the snapshot WITHOUT delete events — the files still
        exist at the source, only the mapping is gone."""
        folder = folder.strip("/")
        prefix = folder + "/"
        self.suppress_path(folder)  # a scan in flight may still include it
        with self._lock:
            self._roots_version += 1
            if self._snapshot is not None:
                self._snapshot.dirs = {
                    d for d in self._snapshot.dirs
                    if d != folder and not d.startswith(prefix)}
                self._snapshot.files = {
                    f: v for f, v in self._snapshot.files.items()
                    if not f.startswith(prefix)}
        if self._inotify is not None:
            self._inotify.remove_tree(str(target))
        timer = threading.Timer(2 * self.poll_interval + 0.5,
                                self.unsuppress_path, args=(folder,))
        timer.daemon = True
        timer.start()

    def _inotify_created(self, abs_path: str, rel: str, is_dir: bool) -> None:
        if is_dir:
            # Watch the subtree FIRST, reporting entries that landed between
            # mkdir and watch registration, then announce parent-to-child so
            # settings inheritance sees ancestors before descendants.
            found = self._inotify.add_tree(abs_path)
            with self._lock:
                self._snapshot.dirs.add(rel)
            if not self._is_suppressed(rel):
                self.broadcast(FileEvent("created", rel, is_directory=True))
                if self.on_dir_created:
                    try:
                        self.on_dir_created(rel)
                    except Exception:
                        logger.exception("on_dir_created failed for %s", rel)
            for child_abs, child_is_dir in found:
                child_rel = self._rel_of(child_abs)
                if child_rel is None:
                    continue
                if child_is_dir:
                    with self._lock:
                        self._snapshot.dirs.add(child_rel)
                else:
                    self._note_file(child_abs, child_rel)
                if not self._is_suppressed(child_rel):
                    self.broadcast(FileEvent("created", child_rel,
                                             is_directory=child_is_dir))
                    if child_is_dir and self.on_dir_created:
                        try:
                            self.on_dir_created(child_rel)
                        except Exception:
                            logger.exception("on_dir_created failed for %s",
                                             child_rel)
        else:
            self._note_file(abs_path, rel)
            if not self._is_suppressed(rel):
                self.broadcast(FileEvent("created", rel))

    def _note_file(self, abs_path: str, rel: str) -> None:
        try:
            st = os.stat(abs_path)
            with self._lock:
                self._snapshot.files[rel] = (st.st_mtime, st.st_size)
        except OSError:
            pass

    def _inotify_deleted(self, abs_path: str, rel: str, is_dir: bool) -> None:
        if is_dir:
            self._inotify.remove_tree(abs_path)
            with self._lock:
                snap = self._snapshot
                snap.dirs.discard(rel)
                prefix = rel + "/"
                snap.dirs = {d for d in snap.dirs if not d.startswith(prefix)}
                snap.files = {f: v for f, v in snap.files.items()
                              if not f.startswith(prefix)}
        else:
            with self._lock:
                self._snapshot.files.pop(rel, None)
            self._pending_creates.pop(rel, None)
        if self._is_suppressed(rel):
            return
        self.broadcast(FileEvent("deleted", rel, is_directory=is_dir))
        if self.on_delete:
            try:
                self.on_delete(rel, is_dir)
            except Exception:
                logger.exception("on_delete failed for %s", rel)

    def _handle_inotify(self, dirpath: str, mask: int, name: str) -> None:
        from voitta_rag_tpu.services import inotify as ino

        abs_path = os.path.join(dirpath, name) if name else dirpath
        rel = self._rel_of(abs_path)
        if rel is None:
            return
        is_dir = bool(mask & ino.IN_ISDIR)
        if mask & (ino.IN_CREATE | ino.IN_MOVED_TO):
            if mask & ino.IN_CREATE and not is_dir:
                # MOVED_TO is complete on arrival — only open→write→close
                # creations get their trailing close-write folded in.
                self._pending_creates[rel] = time.monotonic()
            self._inotify_created(abs_path, rel, is_dir)
        elif mask & (ino.IN_DELETE | ino.IN_MOVED_FROM):
            self._inotify_deleted(abs_path, rel, is_dir)
        elif mask & ino.IN_CLOSE_WRITE and not is_dir:
            created_at = self._pending_creates.pop(rel, None)
            self._note_file(abs_path, rel)
            if created_at is not None and time.monotonic() - created_at < 2.0:
                return  # tail of the creating write: already announced
            if not self._is_suppressed(rel):
                self.broadcast(FileEvent("modified", rel))

    def _run_inotify(self) -> None:
        while not self._stop.is_set():
            try:
                events = self._inotify.read_events(timeout=0.5)
            except Exception:
                logger.exception("inotify read failed; polling fallback")
                self._inotify.close()
                self._inotify = None
                self.backend_active = "poll"
                self._run()
                return
            if events is None:
                # Kernel queue overflow: one scan-diff rescan against the
                # incrementally maintained snapshot recovers lost events.
                logger.warning("inotify queue overflow; rescanning")
                try:
                    # Retry: a watch-root change mid-rescan discards the
                    # scan, but overflow recovery MUST complete or events
                    # lost in the overflow stay lost.
                    for _attempt in range(5):
                        if self.poll_once():
                            break
                    for _prefix, base in self._watch_roots():
                        self._inotify.add_tree(str(base))
                except Exception:
                    logger.exception("overflow rescan failed")
                continue
            for dirpath, mask, name in events:
                try:
                    self._handle_inotify(dirpath, mask, name)
                except Exception:
                    logger.exception("inotify event failed (%s %s)",
                                     dirpath, name)

    # -- thread lifecycle (reference watcher.py:319-350) --------------------
    def start(self, loop: asyncio.AbstractEventLoop) -> None:
        self._loop = loop
        self._stop.clear()
        # Watches register BEFORE the initial scan: a file created in the
        # scan window then has a queued kernel event (drained once the
        # thread starts; duplicate 'created' for scanned files is benign —
        # indexing hash-skips). The reverse order silently lost the file
        # until its next modification.
        use_inotify = self._try_init_inotify()
        self._snapshot = self._scan()
        self.backend_active = "inotify" if use_inotify else "poll"
        self._thread = threading.Thread(
            target=self._run_inotify if use_inotify else self._run,
            daemon=True, name="file-watcher")
        self._thread.start()
        logger.info("file watcher started (backend=%s%s)",
                    self.backend_active,
                    "" if use_inotify else f", poll {self.poll_interval:.1f}s")

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
        if self._inotify is not None:
            self._inotify.close()
            self._inotify = None


file_watcher = FileWatcher()


def reset_file_watcher() -> None:
    global file_watcher
    file_watcher.stop()
    file_watcher = FileWatcher()
