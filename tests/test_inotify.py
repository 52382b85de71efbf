"""Native inotify backend + FileWatcher inotify mode (Linux CI).

The polling contract tests live in test_watcher.py; these verify the
kernel-event path emits the same created/modified/deleted stream
(reference parity: watchdog observer, services/watcher.py:319-335).
"""

import asyncio
import sys
import time

import pytest

from voitta_rag_tpu.services.filesystem import FilesystemService
from voitta_rag_tpu.services.watcher import FileWatcher

pytestmark = pytest.mark.skipif(sys.platform != "linux",
                                reason="inotify is Linux-only")


def test_backend_raw_events(tmp_path):
    from voitta_rag_tpu.services import inotify as ino

    b = ino.InotifyBackend()
    try:
        (tmp_path / "pre").mkdir()
        found = b.add_tree(str(tmp_path))
        assert (str(tmp_path / "pre"), True) in found

        (tmp_path / "a.txt").write_text("hello")
        events = b.read_events(timeout=1.0)
        masks = {(name, mask & ino.IN_CREATE != 0,
                  mask & ino.IN_CLOSE_WRITE != 0) for _, mask, name in events}
        assert ("a.txt", True, False) in masks
        assert ("a.txt", False, True) in masks

        # Events inside a pre-watched subdir arrive with that dir's path.
        (tmp_path / "pre" / "b.txt").write_text("x")
        events = b.read_events(timeout=1.0)
        assert any(d.endswith("pre") and n == "b.txt" for d, _, n in events)

        (tmp_path / "a.txt").unlink()
        events = b.read_events(timeout=1.0)
        assert any(n == "a.txt" and m & ino.IN_DELETE for _, m, n in events)
    finally:
        b.close()


@pytest.fixture
def live_watcher(temp_root):
    w = FileWatcher(fs=FilesystemService(temp_root))
    loop = asyncio.new_event_loop()
    w.start(loop)
    yield w, temp_root, loop
    w.stop()
    loop.close()


def _drain(loop, queue, settle=0.9):
    time.sleep(settle)  # let the watcher thread consume kernel events
    events = []

    async def pull():
        try:
            while True:
                events.append(queue.get_nowait())
        except asyncio.QueueEmpty:
            pass

    loop.run_until_complete(pull())
    return events


def test_watcher_inotify_lifecycle(live_watcher):
    w, root, loop = live_watcher
    assert w.backend_active == "inotify"
    q = w.subscribe()

    (root / "doc.md").write_text("body")
    events = _drain(loop, q)
    assert {"type": "created", "path": "doc.md",
            "is_directory": False} in events
    # The creating close-write is folded into "created" (polling parity).
    assert not any(e["type"] == "modified" and e["path"] == "doc.md"
                   for e in events)

    (root / "doc.md").write_text("changed body")
    events = _drain(loop, q)
    assert any(e["type"] == "modified" and e["path"] == "doc.md"
               for e in events)

    created_dirs = []
    w.on_dir_created = created_dirs.append
    (root / "sub").mkdir()
    (root / "sub" / "inner.txt").write_text("x")
    events = _drain(loop, q)
    assert {"type": "created", "path": "sub",
            "is_directory": True} in events
    assert any(e["type"] == "created" and e["path"] == "sub/inner.txt"
               for e in events)
    assert "sub" in created_dirs

    deleted = []
    w.on_delete = lambda p, d: deleted.append((p, d))
    (root / "sub" / "inner.txt").unlink()
    (root / "sub").rmdir()
    events = _drain(loop, q)
    assert ("sub/inner.txt", False) in deleted
    assert ("sub", True) in deleted
    assert {"type": "deleted", "path": "sub", "is_directory": True} in events


def test_watcher_inotify_suppression_and_hidden(live_watcher):
    w, root, loop = live_watcher
    q = w.subscribe()

    w.suppress_path("quiet")
    (root / "quiet").mkdir()
    (root / "quiet" / "f.txt").write_text("x")
    (root / ".hidden.txt").write_text("x")
    events = _drain(loop, q)
    assert not any(e["path"].startswith("quiet") for e in events)
    assert not any(e["path"].startswith(".hidden") for e in events)

    # After unsuppression new events flow again.
    w.unsuppress_path("quiet")
    (root / "quiet" / "g.txt").write_text("y")
    events = _drain(loop, q)
    assert any(e["path"] == "quiet/g.txt" and e["type"] == "created"
               for e in events)


def test_watcher_rename_maps_to_create_delete(live_watcher):
    w, root, loop = live_watcher
    q = w.subscribe()
    (root / "old.txt").write_text("x")
    _drain(loop, q)
    (root / "old.txt").rename(root / "new.txt")
    events = _drain(loop, q)
    assert any(e["type"] == "deleted" and e["path"] == "old.txt"
               for e in events)
    assert any(e["type"] == "created" and e["path"] == "new.txt"
               for e in events)

    # A renamed-in file is complete on arrival: its NEXT write is a real
    # modification and must not be swallowed as a create-tail.
    with open(root / "new.txt", "a") as f:
        f.write("more")
    events = _drain(loop, q)
    assert any(e["type"] == "modified" and e["path"] == "new.txt"
               for e in events)


def test_poll_backend_forced(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_WATCH_BACKEND", "poll")
    w = FileWatcher(fs=FilesystemService(temp_root))
    loop = asyncio.new_event_loop()
    try:
        w.start(loop)
        assert w.backend_active == "poll"
    finally:
        w.stop()
        loop.close()


def test_mapped_source_dir_watched(temp_root, tmp_path):
    """Mapped filesystem-source dirs get their own watches; events surface
    under the MAPPED rel path (reference watcher.py:330-335)."""
    ext = tmp_path / "external_src"
    ext.mkdir()
    fs = FilesystemService(temp_root)
    fs.add_mapping("proj/src", ext)
    # Short poll interval => short add_watch_root suppression window.
    w = FileWatcher(fs=fs, poll_interval=0.2)
    loop = asyncio.new_event_loop()
    try:
        w.start(loop)
        assert w.backend_active == "inotify"
        q = w.subscribe()
        (ext / "main.py").write_text("print('hi')")
        events = _drain(loop, q)
        assert any(e["type"] == "created" and e["path"] == "proj/src/main.py"
                   for e in events)

        deleted = []
        w.on_delete = lambda p, d: deleted.append((p, d))
        (ext / "main.py").unlink()
        _drain(loop, q)
        assert ("proj/src/main.py", False) in deleted

        # A mapping added at runtime: no synthetic events for pre-existing
        # files, live events for new ones.
        ext2 = tmp_path / "other_src"
        ext2.mkdir()
        (ext2 / "old.txt").write_text("existing")
        fs.add_mapping("proj/other", ext2)
        w.add_watch_root("proj/other", ext2)
        events = _drain(loop, q, settle=1.5)  # wait out suppression window
        assert not any("old.txt" in e["path"] for e in events)
        (ext2 / "fresh.txt").write_text("x")
        events = _drain(loop, q)
        assert any(e["type"] == "created" and e["path"] == "proj/other/fresh.txt"
                   for e in events)
    finally:
        w.stop()
        loop.close()


def test_mapped_dir_polling_backend(temp_root, tmp_path, monkeypatch):
    monkeypatch.setenv("VOITTA_WATCH_BACKEND", "poll")
    ext = tmp_path / "ext"
    ext.mkdir()
    fs = FilesystemService(temp_root)
    fs.add_mapping("m", ext)
    w = FileWatcher(fs=fs)
    loop = asyncio.new_event_loop()
    try:
        w._loop = loop
        q = w.subscribe()
        w._snapshot = w._scan()
        (ext / "f.txt").write_text("x")
        w.poll_once()
        loop.run_until_complete(asyncio.sleep(0))
        events = []
        try:
            while True:
                events.append(q.get_nowait())
        except asyncio.QueueEmpty:
            pass
        assert any(e["type"] == "created" and e["path"] == "m/f.txt"
                   for e in events)
    finally:
        w.stop()
        loop.close()
