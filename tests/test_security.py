"""Security hardening regression tests (round-2 security review pass):
anamnesis path traversal, git argv injection, login-required HTTP search,
secret-drop on endpoint retarget, root-prefix containment, OAuth state
binding, LIKE-escape in the folder-delete cascade."""

import asyncio

import pytest

from tests.test_api import app_env, make_client, login, run  # noqa: F401
from tests.test_mcp import (  # noqa: F401
    mcp_env, make_client as make_mcp_client, rpc)


# ---------------------------------------------------------------------------
# Anamnesis traversal (MCP memory tools)
# ---------------------------------------------------------------------------

def test_anamnesis_rejects_traversal_components(tmp_path, monkeypatch):
    from voitta_rag_tpu.config import get_settings
    monkeypatch.setenv("VOITTA_ROOT_PATH", str(tmp_path))
    get_settings.cache_clear()
    from voitta_rag_tpu.services import anamnesis

    for bad in ("..", "a/b", "a\\b", "", "."):
        with pytest.raises(ValueError):
            anamnesis.user_dir(bad)
        with pytest.raises(ValueError):
            anamnesis.memory_path("alice", bad)
    # legitimate values unaffected
    p = anamnesis.memory_path("alice@corp.com", "123e4567-e89b")
    assert str(p).startswith(str(tmp_path))


def test_mcp_memory_tool_traversal_is_error_not_crash(mcp_env):
    async def body():
        client = await make_mcp_client()
        try:
            outside = mcp_env.parent / "loot.md"
            outside.write_text("secret")
            data = await rpc(client, "tools/call", {
                "name": "get_memory",
                "arguments": {"memory_id": "../../loot"}}, user="../..")
            res = data["result"]
            assert res.get("isError") or "invalid" in str(res).lower() \
                or "error" in str(res).lower()
            assert "secret" not in str(res)
            assert outside.exists()  # and delete_memory can't reach it either
            data = await rpc(client, "tools/call", {
                "name": "delete_memory",
                "arguments": {"memory_id": "../../loot"}}, user="../..",
                msg_id=2)
            assert outside.exists()
        finally:
            await client.close()

    run(body())


# ---------------------------------------------------------------------------
# Git argv injection
# ---------------------------------------------------------------------------

def test_git_arg_guard():
    from voitta_rag_tpu.services.sync.github import _safe_git_arg

    with pytest.raises(RuntimeError):
        _safe_git_arg("--upload-pack=touch /tmp/pwned", "branch")
    with pytest.raises(RuntimeError):
        _safe_git_arg("-c", "repo")
    with pytest.raises(RuntimeError):
        _safe_git_arg("", "branch")
    assert _safe_git_arg("main", "branch") == "main"
    assert _safe_git_arg("org/repo", "repo") == "org/repo"


def test_clone_rejects_option_branch(tmp_path):
    from types import SimpleNamespace

    from voitta_rag_tpu.services.sync.github import GithubConnector

    conn = GithubConnector()
    src = SimpleNamespace(gh_repo="org/repo", gh_auth_method=None,
                          gh_token=None, gh_pat=None, gh_username=None)
    with pytest.raises(RuntimeError, match="invalid git branch"):
        conn._clone_or_update(src, "--upload-pack=touch /tmp/pwned")
    with pytest.raises(RuntimeError, match="invalid git repo"):
        conn._repo_url(SimpleNamespace(gh_repo="--config=x", gh_auth_method=None,
                                       gh_pat=None, gh_username=None))


# ---------------------------------------------------------------------------
# HTTP search requires a session
# ---------------------------------------------------------------------------

def test_search_requires_login(app_env):
    async def body():
        client = await make_client()
        try:
            resp = await client.get("/api/search?q=anything",
                                    allow_redirects=False)
            assert resp.status in (302, 401, 403)
        finally:
            await client.close()

    run(body())


# ---------------------------------------------------------------------------
# Secret-drop on endpoint retarget
# ---------------------------------------------------------------------------

def test_retargeting_jira_url_drops_stored_token(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            resp = await client.post("/api/folders",
                                     json={"path": "", "name": "jira"})
            assert resp.status in (200, 201)
            resp = await client.put("/api/sync/jira", json={
                "source_type": "jira", "jira_url": "https://real.example",
                "jira_project": "KB", "jira_token": "s3cret"})
            assert resp.status == 200

            # plain field update keeps the secret
            resp = await client.put("/api/sync/jira", json={
                "source_type": "jira", "jira_url": "https://real.example",
                "jira_project": "OTHER", "jira_token": "***"})
            assert (await resp.json())["jira_token"] == "***"

            # retargeting the URL without re-supplying the token drops it
            resp = await client.put("/api/sync/jira", json={
                "source_type": "jira", "jira_url": "https://evil.example",
                "jira_token": "***"})
            assert (await resp.json())["jira_token"] is None

            from voitta_rag_tpu.db.database import get_db
            assert get_db().get_sync_source("jira").jira_token is None
        finally:
            await client.close()

    run(body())


# ---------------------------------------------------------------------------
# Root containment is separator-aware
# ---------------------------------------------------------------------------

def test_sibling_prefix_dir_rejected(app_env, monkeypatch):
    # root /…/root ; sibling /…/root-backup shares the string prefix
    sibling = app_env.parent / (app_env.name + "-backup")
    sibling.mkdir()
    (sibling / "dump.md").write_text("leak")

    from voitta_rag_tpu.mcp import tools as mcp_tools

    with pytest.raises(ValueError):
        mcp_tools.get_file_uri(None, f"../{sibling.name}/dump.md")

    from voitta_rag_tpu.services.filesystem import FilesystemService
    fs = FilesystemService()
    with pytest.raises(PermissionError):
        fs.resolve(f"../{sibling.name}/dump.md")


# ---------------------------------------------------------------------------
# OAuth login state: single-use, expiring, cookie-bound
# ---------------------------------------------------------------------------

def test_oauth_state_expiry_and_single_use(monkeypatch):
    import time as _time

    from voitta_rag_tpu.api.routes import auth as authmod

    authmod._states.clear()
    s1 = authmod._issue_state()
    assert s1 in authmod._states

    class Req:
        def __init__(self, state, cookie):
            self.query = {"state": state}
            self.cookies = ({authmod._STATE_COOKIE: cookie}
                            if cookie else {})

    # wrong/missing cookie -> rejected (and consumed: single-use)
    assert authmod._check_state(Req(s1, None)) is None
    assert s1 not in authmod._states

    s2 = authmod._issue_state()
    assert authmod._check_state(Req(s2, s2)) == s2
    # second redemption fails
    assert authmod._check_state(Req(s2, s2)) is None

    # expiry pruning bounds the dict
    s3 = authmod._issue_state()
    authmod._states[s3] -= authmod._STATE_TTL + 1
    authmod._issue_state()
    assert s3 not in authmod._states


def test_connector_oauth_state_is_unguessable(app_env):
    from voitta_rag_tpu.api.routes import sync as syncmod

    nonce = syncmod._issue_oauth_state("Work")
    # not derivable from the folder name (previously base64(folder))
    import base64
    assert nonce != base64.urlsafe_b64encode(b"Work").decode()
    assert syncmod._redeem_oauth_state(nonce) == "Work"
    assert syncmod._redeem_oauth_state(nonce) is None  # single-use
    assert syncmod._redeem_oauth_state("forged") is None


# ---------------------------------------------------------------------------
# Folder-delete cascade escapes LIKE wildcards
# ---------------------------------------------------------------------------

def test_folder_delete_cascade_does_not_hit_like_siblings(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            for name in ("my_app", "myxapp"):
                resp = await client.post("/api/folders",
                                         json={"path": "", "name": name})
                assert resp.status in (200, 201)
                resp = await client.post(
                    f"/api/settings/folders/{name}/search-active",
                    json={"search_active": True})
                assert resp.status == 200

            resp = await client.delete("/api/folders/my_app")
            assert resp.status == 200

            from voitta_rag_tpu.db.database import get_db
            from voitta_rag_tpu.db.models import User
            db = get_db()
            rows = db.query("SELECT folder_path FROM user_folder_settings")
            paths = {r["folder_path"] for r in rows}
            assert not any(p.startswith("my_app") for p in paths)
            assert any(p.startswith("myxapp") for p in paths), paths
        finally:
            await client.close()

    run(body())
