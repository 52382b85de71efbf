"""Watcher: event emission, suppression, delete callbacks (poll_once-driven,
no timing dependence)."""

import asyncio

import pytest

from voitta_rag_tpu.services.filesystem import FilesystemService
from voitta_rag_tpu.services.watcher import FileWatcher


@pytest.fixture
def watcher(temp_root):
    w = FileWatcher(fs=FilesystemService(temp_root))
    yield w, temp_root
    w.stop()


def drain(loop, queue):
    events = []
    async def pull():
        while True:
            try:
                events.append(queue.get_nowait())
            except asyncio.QueueEmpty:
                return
    loop.run_until_complete(pull())
    return events


def test_create_modify_delete_events(watcher):
    w, root = watcher
    loop = asyncio.new_event_loop()
    w._loop = loop
    q = w.subscribe()
    w._snapshot = w._scan()

    (root / "a.txt").write_text("one")
    w.poll_once()
    loop.run_until_complete(asyncio.sleep(0))
    events = drain(loop, q)
    assert {"type": "created", "path": "a.txt", "is_directory": False} in events

    import os, time
    (root / "a.txt").write_text("two changed")
    os.utime(root / "a.txt", (time.time() + 5, time.time() + 5))
    w.poll_once()
    loop.run_until_complete(asyncio.sleep(0))
    events = drain(loop, q)
    assert any(e["type"] == "modified" and e["path"] == "a.txt"
               for e in events)

    deleted = []
    w.on_delete = lambda p, d: deleted.append((p, d))
    (root / "a.txt").unlink()
    w.poll_once()
    loop.run_until_complete(asyncio.sleep(0))
    events = drain(loop, q)
    assert any(e["type"] == "deleted" and e["path"] == "a.txt"
               for e in events)
    assert deleted == [("a.txt", False)]
    loop.close()


def test_directory_events_and_inherit_callback(watcher):
    w, root = watcher
    loop = asyncio.new_event_loop()
    w._loop = loop
    q = w.subscribe()
    w._snapshot = w._scan()

    created_dirs = []
    w.on_dir_created = created_dirs.append
    (root / "newdir" / "sub").mkdir(parents=True)
    w.poll_once()
    loop.run_until_complete(asyncio.sleep(0))
    events = drain(loop, q)
    assert any(e["type"] == "created" and e["is_directory"]
               and e["path"] == "newdir" for e in events)
    assert "newdir" in created_dirs and "newdir/sub" in created_dirs
    loop.close()


def test_suppression_blocks_events(watcher):
    w, root = watcher
    loop = asyncio.new_event_loop()
    w._loop = loop
    q = w.subscribe()
    w._snapshot = w._scan()

    w.suppress_path("synced")
    (root / "synced").mkdir()
    (root / "synced" / "f.txt").write_text("x")
    (root / "visible.txt").write_text("y")
    w.poll_once()
    loop.run_until_complete(asyncio.sleep(0))
    events = drain(loop, q)
    paths = [e["path"] for e in events]
    assert "visible.txt" in paths
    assert all(not p.startswith("synced") for p in paths)

    # After unsuppress, further changes emit again.
    w.unsuppress_path("synced")
    (root / "synced" / "g.txt").write_text("z")
    w.poll_once()
    loop.run_until_complete(asyncio.sleep(0))
    events = drain(loop, q)
    assert any(e["path"] == "synced/g.txt" for e in events)
    loop.close()


def test_hidden_files_ignored(watcher):
    w, root = watcher
    loop = asyncio.new_event_loop()
    w._loop = loop
    q = w.subscribe()
    w._snapshot = w._scan()
    (root / ".voitta_timestamps.json").write_text("{}")
    (root / ".hidden_dir").mkdir()
    w.poll_once()
    loop.run_until_complete(asyncio.sleep(0))
    assert drain(loop, q) == []
    loop.close()
