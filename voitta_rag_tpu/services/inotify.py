"""Native inotify(7) bindings via ctypes — kernel file events, no deps.

The reference watches its tree with watchdog's inotify observer
(reference services/watcher.py:12-13, 319-335). Round 1 of this framework
substituted mtime-diff polling (O(tree) scans per tick, poll latency); this
module restores the kernel-event path with raw libc ``inotify_*`` calls:

- recursive directory watches (one watch descriptor per directory, hidden
  directories skipped),
- a non-blocking fd drained with ``select`` so the watcher thread can keep
  honoring its stop flag,
- new-directory races closed by walking a freshly watched subtree and
  reporting the entries that were created before the watch landed,
- ``IN_Q_OVERFLOW`` surfaced to the caller so it can fall back to a rescan.

The consumer (:class:`voitta_rag_tpu.services.watcher.FileWatcher`) maps
these to its created/modified/deleted event contract.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import errno
import logging
import os
import select
import struct

logger = logging.getLogger(__name__)

IN_MODIFY = 0x00000002
IN_CLOSE_WRITE = 0x00000008
IN_MOVED_FROM = 0x00000040
IN_MOVED_TO = 0x00000080
IN_CREATE = 0x00000100
IN_DELETE = 0x00000200
IN_DELETE_SELF = 0x00000400
IN_MOVE_SELF = 0x00000800
IN_Q_OVERFLOW = 0x00004000
IN_IGNORED = 0x00008000
IN_ISDIR = 0x40000000

#: Events a directory watch subscribes to.
WATCH_MASK = (IN_CREATE | IN_DELETE | IN_CLOSE_WRITE | IN_MOVED_FROM
              | IN_MOVED_TO | IN_DELETE_SELF | IN_MOVE_SELF)

_EVENT_HDR = struct.Struct("iIII")  # wd, mask, cookie, len


class InotifyUnavailable(OSError):
    """Raised when the kernel/libc doesn't provide inotify."""


class InotifyBackend:
    """Recursive inotify watcher over one or more root directories."""

    def __init__(self) -> None:
        name = ctypes.util.find_library("c") or "libc.so.6"
        try:
            self._libc = ctypes.CDLL(name, use_errno=True)
            self._libc.inotify_init1
        except (OSError, AttributeError) as e:
            raise InotifyUnavailable(str(e)) from e
        # IN_NONBLOCK == O_NONBLOCK on Linux.
        self.fd = self._libc.inotify_init1(os.O_NONBLOCK)
        if self.fd < 0:
            raise InotifyUnavailable(os.strerror(ctypes.get_errno()))
        self._wd_to_path: dict[int, str] = {}
        self._path_to_wd: dict[str, int] = {}

    # -- watch management ----------------------------------------------------
    def _add_watch(self, path: str) -> bool:
        wd = self._libc.inotify_add_watch(
            self.fd, os.fsencode(path), WATCH_MASK)
        if wd < 0:
            err = ctypes.get_errno()
            if err not in (errno.ENOENT, errno.ENOTDIR):
                logger.warning("inotify_add_watch(%s): %s", path,
                               os.strerror(err))
            return False
        old = self._wd_to_path.get(wd)
        if old is not None and old != path:
            self._path_to_wd.pop(old, None)
        self._wd_to_path[wd] = path
        self._path_to_wd[path] = wd
        return True

    def add_tree(self, root: str) -> list[tuple[str, bool]]:
        """Watch ``root`` and every non-hidden subdirectory.

        Returns the entries found while walking — (abs_path, is_dir) pairs —
        so the caller can emit synthetic "created" events for files that
        landed between a directory's creation and its watch registration.
        """
        found: list[tuple[str, bool]] = []
        if not self._add_watch(root):
            return found
        try:
            with os.scandir(root) as it:
                entries = list(it)
        except OSError:
            return found
        for e in entries:
            if e.name.startswith("."):
                continue
            try:
                is_dir = e.is_dir(follow_symlinks=False)
            except OSError:
                continue
            found.append((e.path, is_dir))
            if is_dir:
                found.extend(self.add_tree(e.path))
        return found

    def remove_tree(self, root: str) -> None:
        """Drop watches under ``root`` (the kernel auto-drops deleted dirs;
        this reclaims the host-side maps)."""
        prefix = root.rstrip("/") + "/"
        for path in [p for p in self._path_to_wd
                     if p == root or p.startswith(prefix)]:
            wd = self._path_to_wd.pop(path)
            self._wd_to_path.pop(wd, None)
            self._libc.inotify_rm_watch(self.fd, wd)

    # -- event reading -------------------------------------------------------
    def read_events(
        self, timeout: float
    ) -> list[tuple[str, int, str]] | None:
        """Drain pending events; blocks up to ``timeout`` seconds.

        Returns (watched_dir_abs_path, mask, name) triples, or ``None`` when
        the kernel queue overflowed (caller should rescan).
        """
        try:
            ready, _, _ = select.select([self.fd], [], [], timeout)
        except OSError:
            return []
        if not ready:
            return []
        chunks = []
        while True:
            try:
                chunks.append(os.read(self.fd, 65536))
            except BlockingIOError:
                break
            except OSError:
                break
        out: list[tuple[str, int, str]] = []
        for data in chunks:
            off = 0
            while off + _EVENT_HDR.size <= len(data):
                wd, mask, _cookie, nlen = _EVENT_HDR.unpack_from(data, off)
                off += _EVENT_HDR.size
                name = data[off:off + nlen].split(b"\0", 1)[0]
                off += nlen
                if mask & IN_Q_OVERFLOW:
                    return None
                if mask & IN_IGNORED:
                    path = self._wd_to_path.pop(wd, None)
                    if path is not None:
                        self._path_to_wd.pop(path, None)
                    continue
                dirpath = self._wd_to_path.get(wd)
                if dirpath is None:
                    continue
                out.append((dirpath, mask, os.fsdecode(name)))
        return out

    def close(self) -> None:
        if self.fd >= 0:
            try:
                os.close(self.fd)
            except OSError:
                pass
            self.fd = -1
        self._wd_to_path.clear()
        self._path_to_wd.clear()
