"""Mirror-sync contract of BaseSyncConnector (reference sync/base.py:38-124):
hash/size skip, delete-not-on-remote, rmdir empties, error counting,
timestamp/source sidecars."""

import asyncio
import hashlib
import json
from pathlib import Path
from types import SimpleNamespace

import pytest

from voitta_rag_tpu.services.sync.base import (
    BaseSyncConnector, RemoteFile, write_sidecars,
)


class FakeConnector(BaseSyncConnector):
    """Serves an in-memory dict of remote files; counts downloads."""

    def __init__(self, files: dict[str, bytes], fail: set[str] | None = None):
        self.files = files
        self.fail = fail or set()
        self.downloads: list[str] = []

    async def list_files(self, source):
        return [
            RemoteFile(
                remote_path=p,
                size=len(b),
                modified_at="2026-01-02T03:04:05Z",
                content_hash=hashlib.sha256(b).hexdigest(),
                created_at="2025-12-31T00:00:00Z",
                source_url=f"https://remote.example/{p}",
            )
            for p, b in sorted(self.files.items())
        ]

    async def download_file(self, source, remote_path, local_path):
        if remote_path in self.fail:
            raise RuntimeError("simulated download failure")
        self.downloads.append(remote_path)
        local_path.write_bytes(self.files[remote_path])


class FakeFS:
    def __init__(self, root: Path):
        self.root = root

    def resolve(self, rel: str) -> Path:
        return self.root / rel


@pytest.fixture()
def env(tmp_path):
    fs = FakeFS(tmp_path)
    source = SimpleNamespace(folder_path="mirror")
    return fs, source


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def test_fresh_sync_downloads_everything_and_writes_sidecars(env):
    fs, source = env
    conn = FakeConnector({"a.md": b"alpha", "sub/b.md": b"beta"})
    stats = run(conn.sync(source, fs))
    assert stats == {"downloaded": 2, "deleted": 0, "skipped": 0, "errors": 0}
    root = fs.resolve("mirror")
    assert (root / "a.md").read_bytes() == b"alpha"
    assert (root / "sub" / "b.md").read_bytes() == b"beta"

    ts = json.loads((root / ".voitta_timestamps.json").read_text())
    assert ts["a.md"]["modified_at"] == "2026-01-02T03:04:05Z"
    assert ts["sub/b.md"]["created_at"] == "2025-12-31T00:00:00Z"
    src = json.loads((root / ".voitta_sources.json").read_text())
    assert src["a.md"] == "https://remote.example/a.md"


def test_resync_skips_unchanged_by_hash(env):
    fs, source = env
    conn = FakeConnector({"a.md": b"alpha"})
    run(conn.sync(source, fs))
    stats = run(conn.sync(source, fs))
    assert stats["skipped"] == 1 and stats["downloaded"] == 0
    assert conn.downloads == ["a.md"]  # only the first pass downloaded


def test_changed_hash_redownloads(env):
    fs, source = env
    conn = FakeConnector({"a.md": b"alpha"})
    run(conn.sync(source, fs))
    conn.files["a.md"] = b"alpha-v2"
    stats = run(conn.sync(source, fs))
    assert stats["downloaded"] == 1
    assert fs.resolve("mirror/a.md").read_bytes() == b"alpha-v2"


def test_size_skip_when_no_hash(env):
    fs, source = env

    class NoHash(FakeConnector):
        async def list_files(self, source):
            files = await super().list_files(source)
            for f in files:
                f.content_hash = None
            return files

    conn = NoHash({"a.md": b"alpha"})
    run(conn.sync(source, fs))
    stats = run(conn.sync(source, fs))
    assert stats["skipped"] == 1


def test_removed_remote_files_are_mirrored_out(env):
    fs, source = env
    conn = FakeConnector({"a.md": b"alpha", "gone/b.md": b"beta"})
    run(conn.sync(source, fs))
    del conn.files["gone/b.md"]
    stats = run(conn.sync(source, fs))
    assert stats["deleted"] == 1
    assert not fs.resolve("mirror/gone/b.md").exists()
    assert not fs.resolve("mirror/gone").exists()  # empty dir removed
    assert fs.resolve("mirror/a.md").exists()


def test_keep_extensions_survive_mirror_delete(env):
    fs, source = env
    conn = FakeConnector({"a.md": b"alpha"})
    run(conn.sync(source, fs))
    extra = fs.resolve("mirror/transcript.vtt")
    extra.write_text("WEBVTT")
    stats = run(conn.sync(source, fs, keep_extensions={".vtt"}))
    assert stats["deleted"] == 0
    assert extra.exists()


def test_download_errors_counted_not_fatal(env):
    fs, source = env
    conn = FakeConnector({"a.md": b"alpha", "bad.md": b"x"}, fail={"bad.md"})
    stats = run(conn.sync(source, fs))
    assert stats["errors"] == 1 and stats["downloaded"] == 1
    assert fs.resolve("mirror/a.md").exists()
    assert not fs.resolve("mirror/bad.md").exists()


def test_hidden_sidecars_not_mirror_deleted(env):
    fs, source = env
    conn = FakeConnector({"a.md": b"alpha"})
    run(conn.sync(source, fs))
    # Sidecars (dotfiles) from the previous pass must survive the delete scan.
    stats = run(conn.sync(source, fs))
    assert stats["deleted"] == 0
    assert fs.resolve("mirror/.voitta_timestamps.json").exists()


def test_write_sidecars_skips_empty(tmp_path):
    write_sidecars(tmp_path, [RemoteFile("x", 1, "")])
    ts = json.loads((tmp_path / ".voitta_timestamps.json").read_text())
    assert ts == {}
    assert not (tmp_path / ".voitta_sources.json").exists()


class RevConnector(BaseSyncConnector):
    """Remote files with revision markers and NO hash (SharePoint shape)."""

    def __init__(self, files: dict[str, tuple[bytes, str]],
                 fail: set[str] | None = None):
        self.files = files
        self.fail = fail or set()
        self.downloads: list[str] = []

    async def list_files(self, source):
        return [
            RemoteFile(remote_path=p, size=len(b),
                       modified_at="2026-01-02T03:04:05Z", remote_rev=rev)
            for p, (b, rev) in sorted(self.files.items())
        ]

    async def download_file(self, source, remote_path, local_path):
        if remote_path in self.fail:
            raise RuntimeError("simulated download failure")
        self.downloads.append(remote_path)
        local_path.write_bytes(self.files[remote_path][0])


def test_same_size_edit_resynced_via_revision(env):
    fs, source = env
    conn = RevConnector({"a.txt": (b"AAAA", "rev1")})
    run(conn.sync(source, fs))
    assert conn.downloads == ["a.txt"]

    # Same size, same mtime string — only the revision marker changes.
    conn.files["a.txt"] = (b"BBBB", "rev2")
    run(conn.sync(source, fs))
    assert conn.downloads == ["a.txt", "a.txt"]
    assert (fs.resolve("mirror") / "a.txt").read_bytes() == b"BBBB"

    # Unchanged revision skips.
    stats = run(conn.sync(source, fs))
    assert stats["skipped"] == 1 and conn.downloads.count("a.txt") == 2


def test_revision_sidecar_persisted(env):
    fs, source = env
    conn = RevConnector({"a.txt": (b"x", "r9")})
    run(conn.sync(source, fs))
    revs = json.loads(
        (fs.resolve("mirror") / ".voitta_revisions.json").read_text())
    assert revs == {"a.txt": "r9"}


def test_failed_download_not_marked_synced(env):
    fs, source = env
    conn = RevConnector({"a.txt": (b"x", "r1")}, fail={"a.txt"})
    stats = run(conn.sync(source, fs))
    assert stats["errors"] == 1
    # The rev must NOT be recorded: the retry next sync must re-download.
    revs = json.loads(
        (fs.resolve("mirror") / ".voitta_revisions.json").read_text())
    assert "a.txt" not in revs
    conn.fail = set()
    run(conn.sync(source, fs))
    assert conn.downloads == ["a.txt"]
