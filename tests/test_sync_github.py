"""GitHub connector against a real local git repository (no network):
shallow clone, mirror copy, incremental fetch, branch listing, mirror
deletes, timestamp sidecars (reference sync/github.py:375-548)."""

import asyncio
import json
import subprocess
from pathlib import Path
from types import SimpleNamespace

import pytest


def git(args, cwd):
    subprocess.run(["git", *args], cwd=cwd, check=True, capture_output=True)


@pytest.fixture()
def local_repo(tmp_path):
    repo = tmp_path / "origin"
    repo.mkdir()
    git(["init", "-b", "main"], repo)
    git(["config", "user.email", "t@example.com"], repo)
    git(["config", "user.name", "t"], repo)
    (repo / "README.md").write_text("# hello\n")
    (repo / "src").mkdir()
    (repo / "src" / "a.py").write_text("print('a')\n")
    git(["add", "."], repo)
    git(["commit", "-m", "initial"], repo)
    git(["checkout", "-b", "feature"], repo)
    (repo / "feature.txt").write_text("feature branch\n")
    git(["add", "."], repo)
    git(["commit", "-m", "feature"], repo)
    git(["checkout", "main"], repo)
    return repo


class FakeFS:
    def __init__(self, root: Path):
        self.root = root

    def resolve(self, rel: str) -> Path:
        return self.root / rel


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def make_source(repo: Path, tmp_path, **kw):
    defaults = dict(
        folder_path="mirror", source_type="github",
        gh_repo=str(repo), gh_branch="main", gh_path=None,
        gh_auth_method=None, gh_username=None, gh_pat=None, gh_token=None,
        gh_all_branches=None)
    defaults.update(kw)
    return SimpleNamespace(**defaults)


@pytest.fixture()
def env(local_repo, tmp_path, monkeypatch):
    monkeypatch.setenv("VOITTA_ROOT_PATH", str(tmp_path / "root"))
    monkeypatch.setenv("VOITTA_GIT_CACHE", str(tmp_path / "cache"))
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    fs = FakeFS(tmp_path / "root")
    (tmp_path / "root").mkdir()
    yield local_repo, fs, tmp_path
    get_settings.cache_clear()


def test_clone_and_mirror(env):
    repo, fs, tmp_path = env
    from voitta_rag_tpu.services.sync.github import GithubConnector

    conn = GithubConnector()
    src = make_source(repo, tmp_path)
    stats = run(conn.sync(src, fs))
    root = fs.resolve("mirror")
    assert (root / "README.md").read_text() == "# hello\n"
    assert (root / "src" / "a.py").exists()
    assert not (root / ".git").exists()
    assert stats.get("downloaded", 0) >= 2

    # Timestamps sidecar written with commit times.
    ts_file = root / ".voitta_timestamps.json"
    assert ts_file.exists()
    ts = json.loads(ts_file.read_text())
    assert any(k.endswith("README.md") for k in ts)


def test_incremental_update_and_delete(env):
    repo, fs, tmp_path = env
    from voitta_rag_tpu.services.sync.github import GithubConnector

    conn = GithubConnector()
    src = make_source(repo, tmp_path)
    run(conn.sync(src, fs))

    # Upstream change: add one file, remove another.
    (repo / "new.md").write_text("new content\n")
    (repo / "src" / "a.py").unlink()
    git(["add", "-A"], repo)
    git(["commit", "-m", "update"], repo)

    run(conn.sync(src, fs))
    root = fs.resolve("mirror")
    assert (root / "new.md").read_text() == "new content\n"
    assert not (root / "src" / "a.py").exists()


def test_branch_listing_and_all_branches(env):
    repo, fs, tmp_path = env
    from voitta_rag_tpu.services.sync.github import GithubConnector

    conn = GithubConnector()
    src = make_source(repo, tmp_path)
    branches = conn._remote_branches(src)
    assert set(branches) >= {"main", "feature"}
    assert conn.detect_default_branch(src) == "main"

    src_all = make_source(repo, tmp_path, gh_all_branches=True)
    run(conn.sync(src_all, fs))
    root = fs.resolve("mirror") / "branches"
    assert (root / "main" / "README.md").exists()
    assert (root / "feature" / "feature.txt").exists()


def test_subfolder_mirror(env):
    repo, fs, tmp_path = env
    from voitta_rag_tpu.services.sync.github import GithubConnector

    conn = GithubConnector()
    src = make_source(repo, tmp_path, gh_path="src")
    run(conn.sync(src, fs))
    root = fs.resolve("mirror")
    assert (root / "a.py").exists()
    assert not (root / "README.md").exists()
