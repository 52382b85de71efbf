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

def test_oauth_state_store_expiry_single_use_and_cookie_binding():
    from voitta_rag_tpu.api.routes.helpers import (
        STATE_COOKIE, STATE_INVALID, OAuthStateStore, bind_state_cookie,
        cookie_has_state)

    store = OAuthStateStore(ttl=600.0)
    s1 = store.issue("payload-1")
    assert store.redeem(s1) == "payload-1"
    assert store.redeem(s1) is STATE_INVALID  # single-use
    assert store.redeem("forged") is STATE_INVALID

    # expiry pruning bounds the dict
    s2 = store.issue()
    store._entries[s2] = (None, store._entries[s2][1] - 601)
    store.issue()
    assert s2 not in store._entries

    # cookie binding: multi-value so concurrent tabs don't clobber flows
    class Req:
        def __init__(self, jar):
            self.cookies = jar

    class Resp:
        def __init__(self):
            self.jar = {}

        def set_cookie(self, name, value, **kw):
            self.jar[name] = value

    r1 = Resp()
    bind_state_cookie(r1, Req({}), "stateA")
    r2 = Resp()
    bind_state_cookie(r2, Req(r1.jar), "stateB")
    assert cookie_has_state(Req(r2.jar), "stateA")  # first flow survives
    assert cookie_has_state(Req(r2.jar), "stateB")
    assert not cookie_has_state(Req(r2.jar), "stateC")
    # bounded: only the last 5 are kept
    jar = {}
    for i in range(8):
        r = Resp()
        bind_state_cookie(r, Req(jar), f"s{i}")
        jar = r.jar
    assert not cookie_has_state(Req(jar), "s0")
    assert cookie_has_state(Req(jar), "s7")


def test_connector_oauth_state_is_unguessable(app_env):
    import base64

    from voitta_rag_tpu.api.routes import sync as syncmod
    from voitta_rag_tpu.api.routes.helpers import STATE_INVALID

    nonce = syncmod._oauth_store.issue("Work")
    # not derivable from the folder name (previously base64(folder))
    assert nonce != base64.urlsafe_b64encode(b"Work").decode()
    assert syncmod._oauth_store.redeem(nonce) == "Work"
    assert syncmod._oauth_store.redeem(nonce) is STATE_INVALID


def test_gh_path_contained_in_clone(tmp_path):
    from voitta_rag_tpu.services.sync.github import _safe_subpath

    base = tmp_path / "cache"
    for bad in ("../..", "a/../../b", ".."):
        with pytest.raises(RuntimeError, match="invalid gh_path"):
            _safe_subpath(base, bad)
    assert _safe_subpath(base, None) == base
    assert _safe_subpath(base, "docs/sub/") == base / "docs/sub"
    # a leading slash is treated as repo-relative, not absolute
    # (Path join would otherwise yield /etc itself)
    assert _safe_subpath(base, "/etc") == base / "etc"


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

            # index a file in the sibling so the cascade has rows to spare
            from voitta_rag_tpu.db.database import get_db
            from voitta_rag_tpu.index.store import get_vector_store
            db = get_db()
            (app_env / "myxapp" / "keep.md").write_text("sibling doc")
            from voitta_rag_tpu.services.indexing import get_indexing_service
            get_indexing_service().index_file("myxapp/keep.md", "myxapp")
            assert db.get_indexed_file("myxapp/keep.md") is not None
            store = get_vector_store()
            assert store.payloads.gids_where_prefix(
                "folder_path", "myxapp")

            resp = await client.delete("/api/folders/my_app")
            assert resp.status == 200

            rows = db.query("SELECT folder_path FROM user_folder_settings")
            paths = {r["folder_path"] for r in rows}
            assert not any(p.startswith("my_app") for p in paths)
            assert any(p.startswith("myxapp") for p in paths), paths
            # sibling's indexed rows and chunks survive the cascade
            # (unescaped "my_app/%" would have matched and deleted them)
            assert db.get_indexed_file("myxapp/keep.md") is not None
            assert store.payloads.gids_where_prefix("folder_path", "myxapp")
        finally:
            await client.close()

    run(body())
