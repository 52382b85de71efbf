"""API integration tests through the real aiohttp app + lifespan (watcher and
worker threads start, like the reference's TestClient pattern,
tests/conftest.py:52-58 / test_api.py)."""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from voitta_rag_tpu.db import database as dbmod


@pytest.fixture
def app_env(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_MODEL", "test-tiny")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    monkeypatch.setenv("INDEXING_POLL_INTERVAL", "3600")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    dbmod.reset_db()
    (temp_root / "users.txt").write_text("alice\nbob\n")

    import voitta_rag_tpu.services.filesystem as fsmod
    import voitta_rag_tpu.services.indexing as idxmod
    import voitta_rag_tpu.services.embedding as embmod
    import voitta_rag_tpu.index.store as storemod
    import voitta_rag_tpu.search.service as searchmod
    from voitta_rag_tpu.services.watcher import reset_file_watcher
    fsmod.reset_filesystem_service()
    idxmod.reset_indexing_service()
    embmod.reset_embedding_service()
    storemod.reset_vector_store()
    searchmod.reset_search_service()
    reset_file_watcher()
    yield temp_root
    storemod.reset_vector_store()
    dbmod.reset_db()


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


async def make_client(aiohttp_like=None):
    from voitta_rag_tpu.api.app import create_app

    app = create_app(start_services=True)
    client = TestClient(TestServer(app))
    await client.start_server()
    return client


async def login(client, name="alice"):
    resp = await client.post("/select-user", data={"username": name},
                             allow_redirects=False)
    assert resp.status == 302
    return client


def test_landing_lists_seeded_users(app_env):
    async def body():
        client = await make_client()
        try:
            resp = await client.get("/")
            assert resp.status == 200
            html = await resp.text()
            assert "alice" in html and "bob" in html
        finally:
            await client.close()
    run(body())


def test_cookie_auth_required_for_browse(app_env):
    async def body():
        client = await make_client()
        try:
            resp = await client.get("/browse", allow_redirects=False)
            assert resp.status == 302  # redirected to landing
            await login(client)
            resp = await client.get("/browse")
            assert resp.status == 200
            assert "alice" in await resp.text()
        finally:
            await client.close()
    run(body())


def test_folder_crud_cascade(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            resp = await client.post("/api/folders",
                                     json={"path": "", "name": "docs"})
            assert resp.status == 201
            assert (app_env / "docs").is_dir()

            # duplicate rejected
            resp = await client.post("/api/folders",
                                     json={"path": "", "name": "docs"})
            assert resp.status == 409

            resp = await client.delete("/api/folders/docs")
            assert resp.status == 200
            assert not (app_env / "docs").exists()
        finally:
            await client.close()
    run(body())


def test_metadata_crud(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            (app_env / "notes.md").write_text("hello")
            resp = await client.put("/api/metadata/notes.md",
                                    json={"metadata": "my note"})
            assert resp.status == 200
            resp = await client.get("/api/metadata/notes.md")
            data = await resp.json()
            assert data["metadata"] == "my note"
            assert data["updated_by"] == "alice"
            resp = await client.delete("/api/metadata/notes.md")
            assert resp.status == 200
            resp = await client.get("/api/metadata/notes.md")
            assert (await resp.json())["metadata"] is None
        finally:
            await client.close()
    run(body())


def test_settings_toggle_cascade_and_pending(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            (app_env / "proj" / "sub").mkdir(parents=True)
            resp = await client.post(
                "/api/settings/folders/proj/search-active",
                json={"search_active": True})
            data = await resp.json()
            assert data["subfolders_updated"] == 1  # proj/sub

            resp = await client.post("/api/settings/folders/proj/indexing",
                                     json={"enabled": True})
            assert resp.status == 200
            db = dbmod.get_db()
            assert db.get_index_status("proj").status in ("pending",
                                                          "indexing",
                                                          "indexed")
        finally:
            await client.close()
    run(body())


def test_index_trigger_endpoint(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            (app_env / "d2").mkdir()
            resp = await client.post("/api/index/trigger/d2")
            assert resp.status == 200
            data = await resp.json()
            assert data["status"] == "queued"
        finally:
            await client.close()
    run(body())


def test_upload_and_raw_roundtrip(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            (app_env / "up").mkdir()
            import aiohttp

            form = aiohttp.FormData()
            form.add_field("path", "up")
            form.add_field("files", b"file body here",
                           filename="test.txt",
                           content_type="text/plain")
            resp = await client.post("/api/files/upload", data=form)
            assert resp.status == 201
            resp = await client.get("/api/raw/up/test.txt")
            assert resp.status == 200
            assert await resp.text() == "file body here"
        finally:
            await client.close()
    run(body())


def test_projects_crud(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            resp = await client.post("/api/projects", json={"name": "research"})
            assert resp.status == 201
            pid = (await resp.json())["id"]
            resp = await client.post(f"/api/projects/{pid}/select")
            assert resp.status == 200
            resp = await client.get("/api/projects")
            projects = (await resp.json())["projects"]
            active = [p for p in projects if p["is_active"]]
            assert active[0]["name"] == "research"
            # default cannot be deleted
            default = [p for p in projects if p["is_default"]][0]
            resp = await client.delete(f"/api/projects/{default['id']}")
            assert resp.status == 400
            resp = await client.delete(f"/api/projects/{pid}")
            assert resp.status == 200
        finally:
            await client.close()
    run(body())


def test_sync_source_config_roundtrip(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            (app_env / "repo").mkdir()
            resp = await client.put("/api/sync/repo", json={
                "source_type": "github", "gh_repo": "org/repo",
                "gh_branch": "main", "gh_auth_method": "token",
                "gh_pat": "secret-token"})
            assert resp.status == 200
            data = await resp.json()
            assert data["gh_repo"] == "org/repo"
            assert data["gh_pat"] == "***"  # secrets masked
            resp = await client.get("/api/sync/types")
            types = (await resp.json())["types"]
            assert "github" in types and "sharepoint" in types
            resp = await client.delete("/api/sync/repo")
            assert resp.status == 200
        finally:
            await client.close()
    run(body())


def test_details_endpoint(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            d = app_env / "detail"
            d.mkdir()
            (d / "x.py").write_text("print('hi')")
            (d / "y.md").write_text("# hi")
            resp = await client.get("/api/details/detail")
            data = await resp.json()
            assert data["is_dir"]
            assert data["counts"]["files"] == 2
            stats = {s["extension"]: s for s in data["file_types"]}
            assert set(stats) == {".py", ".md"}
            assert stats[".py"]["total_count"] == 1
            assert stats[".py"]["indexed_count"] == 0
            assert stats[".md"]["chunk_count"] == 0
        finally:
            await client.close()
    run(body())


def test_optimize_endpoint_contract(app_env):
    """Optimize builds postings; an IVF failure is SURFACED, never a silent
    200 'optimized' (review finding: the error used to be swallowed)."""
    async def body():
        client = await make_client()
        try:
            await login(client)
            # Empty store: postings build fails -> clean 400.
            resp = await client.post("/api/index/optimize", json={})
            assert resp.status == 400

            # Index a little content directly through the store.
            import numpy as np

            from voitta_rag_tpu.core_types import ChunkMetadata
            from voitta_rag_tpu.index.store import get_vector_store

            store = get_vector_store()
            rng = np.random.default_rng(0)
            n = 8
            store.store_chunks(
                [f"text {i}" for i in range(n)],
                rng.standard_normal((n, store.dimension)).astype(np.float32),
                [ChunkMetadata(file_path=f"kb/f{i}.md", file_name=f"f{i}.md",
                               folder_path="kb", index_folder="kb",
                               chunk_index=0, total_chunks=1, start_char=0,
                               end_char=5, indexed_at="2026-08-16T00:00:00Z")
                 for i in range(n)])

            # Postings succeed; IVF fails (too few rows) -> partial result
            # with the failure surfaced.
            resp = await client.post("/api/index/optimize",
                                     json={"n_cells": 4})
            data = await resp.json()
            assert resp.status == 200
            assert data["status"] == "optimized"
            assert "ivf_error" in data and "256" in data["ivf_error"]

            stats = await (await client.get("/api/stats")).json()
            assert stats["postings_active"] is True
            assert stats["ivf_active"] is False
        finally:
            await client.close()
    run(body())


def test_browse_list_subtree_rollups_and_sync_icons(app_env):
    """gather_file_list_data rolls indexed stats up from nested folders and
    marks rows inside a synced tree with the ancestor's source type
    (reference pages.py folder_stats + current_sync_type)."""
    async def body():
        client = await make_client()
        try:
            await login(client)
            # top/nested/deep.md — indexed record lives two levels down.
            root = app_env
            (root / "top" / "nested").mkdir(parents=True)
            (root / "top" / "nested" / "deep.md").write_text("hello world")
            from voitta_rag_tpu.db.database import get_db
            from voitta_rag_tpu.db.models import IndexedFile
            db = get_db()
            db.upsert_indexed_file(IndexedFile(
                file_path="top/nested/deep.md", folder_path="top/nested",
                index_folder="top", content_hash="x", file_size=11,
                chunk_count=3))
            from voitta_rag_tpu.db.models import FolderSyncSource
            db.upsert_sync_source(FolderSyncSource(
                folder_path="top", source_type="github", gh_repo="o/r"))

            resp = await client.get("/api/browse-list?path=&format=json")
            data = await resp.json()
            top = next(i for i in data["items"] if i["path"] == "top")
            assert top["chunks"] == 3
            assert top["stats"]["indexed_files"] == 1
            assert top["stats"]["indexed_bytes"] == 11
            assert top["sync"]["source_type"] == "github"

            # Rows INSIDE the synced tree inherit the source type.
            resp = await client.get("/api/browse-list?path=top&format=json")
            data = await resp.json()
            nested = next(i for i in data["items"] if i["path"] == "top/nested")
            assert nested["sync_type_inherited"] == "github"
            assert nested["chunks"] == 3

            resp = await client.get(
                "/api/browse-list?path=top/nested&format=json")
            data = await resp.json()
            f = next(i for i in data["items"]
                     if i["path"] == "top/nested/deep.md")
            assert f["extension"] == ".md"
            assert f["sync_type_inherited"] == "github"

            # Fragment render: source icon + slider + status glyph markup.
            resp = await client.get("/api/browse-list?path=top")
            html = await resp.text()
            assert 'data-src="github"' in html
            assert 'class="switch"' in html
            assert 'data-chunks="3"' in html
        finally:
            await client.close()
    run(body())


def test_browse_list_empty_folder_fragment(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            (app_env / "hollow").mkdir()
            resp = await client.get("/api/browse-list?path=hollow")
            html = await resp.text()
            assert "empty" in html and "folder is empty" in html
        finally:
            await client.close()
    run(body())


def test_oauth_login_redirect_and_state_guard(app_env, monkeypatch):
    """OAuth flows (reference api/routes/auth.py:33-228): login 302s to the
    IdP authorize URL with a state token; callback rejects unknown state;
    unconfigured providers 404."""
    async def body():
        client = await make_client()
        try:
            # Not configured → 404.
            resp = await client.get("/auth/microsoft/login",
                                    allow_redirects=False)
            assert resp.status == 404

            from voitta_rag_tpu.config import get_settings
            monkeypatch.setenv("MS_AUTH_TENANT_ID", "tid")
            monkeypatch.setenv("MS_AUTH_CLIENT_ID", "cid")
            monkeypatch.setenv("MS_AUTH_CLIENT_SECRET", "sec")
            monkeypatch.setenv("VOITTA_BASE_URL", "http://example.test")
            get_settings.cache_clear()

            resp = await client.get("/auth/microsoft/login",
                                    allow_redirects=False)
            assert resp.status == 302
            loc = resp.headers["Location"]
            assert loc.startswith(
                "https://login.microsoftonline.com/tid/oauth2/v2.0/authorize")
            assert "client_id=cid" in loc
            assert "state=" in loc
            # yarl re-quotes the Location: ':' '/' are RFC-valid in query
            # values, so accept either encoding.
            from urllib.parse import unquote
            assert ("redirect_uri=http://example.test/auth/microsoft/"
                    "callback") in unquote(loc)

            # Callback with an unknown state is rejected before any
            # token exchange.
            resp = await client.get(
                "/auth/microsoft/callback?state=bogus&code=x",
                allow_redirects=False)
            assert resp.status == 400
        finally:
            await client.close()
            from voitta_rag_tpu.config import get_settings
            get_settings.cache_clear()
    run(body())


def test_login_as_matches_user_by_email(app_env):
    """IdP callbacks match-or-create the user by email and set the session
    cookie (reference auth.py user matching)."""
    async def body():
        from voitta_rag_tpu.api.routes.auth import _login_as
        from voitta_rag_tpu.db.database import get_db
        import aiohttp.web as web

        db = get_db()
        existing = db.get_or_create_user("casey", email="casey@corp.com")
        try:
            _login_as("casey@corp.com")
        except web.HTTPFound as resp:
            cookie = resp.cookies.get("voitta_user")
            assert cookie is not None and cookie.value == existing.name
        else:
            raise AssertionError("expected redirect")

        # Unknown email → user created with email as name.
        try:
            _login_as("new@corp.com")
        except web.HTTPFound as resp:
            assert resp.cookies["voitta_user"].value == "new@corp.com"
        assert db.get_user_by_email("new@corp.com") is not None
    run(body())


def test_search_fusion_validation(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            resp = await client.get("/api/search?q=x&fusion=bogus")
            assert resp.status == 400
            detail = (await resp.json())["detail"]
            assert "fusion" in detail
        finally:
            await client.close()
    run(body())


def test_browse_rollup_like_escaping(app_env):
    """'my_app' must not absorb 'myxapp' rows via LIKE '_' wildcards."""
    async def body():
        client = await make_client()
        try:
            await login(client)
            root = app_env
            (root / "my_app" / "docs").mkdir(parents=True)
            (root / "myxapp" / "docs").mkdir(parents=True)
            from voitta_rag_tpu.db.database import get_db
            from voitta_rag_tpu.db.models import IndexedFile
            db = get_db()
            db.upsert_indexed_file(IndexedFile(
                file_path="myxapp/docs/f.md", folder_path="myxapp/docs",
                index_folder="myxapp", content_hash="x", file_size=7,
                chunk_count=5))
            resp = await client.get("/api/browse-list?path=my_app&format=json")
            data = await resp.json()
            docs = next(i for i in data["items"]
                        if i["path"] == "my_app/docs")
            assert docs["stats"]["indexed_files"] == 0
            assert docs["chunks"] == 0
        finally:
            await client.close()
    run(body())


def test_sharded_mode_end_to_end_via_api(app_env, monkeypatch):
    """The full app stack on a sharded index (virtual 8-device CPU mesh):
    upload → index → search through /api/search with VOITTA_INDEX_SHARDS=2
    — per-chip scans + all-gather merge behind the same HTTP contract."""
    monkeypatch.setenv("VOITTA_INDEX_SHARDS", "2")
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    import voitta_rag_tpu.index.store as storemod
    storemod.reset_vector_store()

    async def body():
        client = await make_client()
        try:
            await login(client)
            d = app_env / "sh"
            d.mkdir()
            (d / "a.md").write_text("the walrus guards the lighthouse " * 5)
            (d / "b.md").write_text("rockets launch from the desert pad " * 5)
            from voitta_rag_tpu.services.indexing import get_indexing_service
            import voitta_rag_tpu.services.indexing as idxmod
            idxmod.reset_indexing_service()
            get_indexing_service().index_folder("sh")

            from voitta_rag_tpu.index.store import get_vector_store
            assert get_vector_store().sharded_active

            resp = await client.post(
                "/api/settings/folders/sh/search-active",
                json={"search_active": True})
            assert resp.status == 200
            resp = await client.get(
                "/api/search?q=walrus+lighthouse&limit=2&sparse_weight=0.9")
            assert resp.status == 200
            results = (await resp.json())["results"]
            assert results and results[0]["file_path"] == "sh/a.md"
        finally:
            await client.close()
    run(body())
    storemod.reset_vector_store()


def test_reference_shaped_path_aliases(app_env):
    """Reference-style URL shapes resolve: /browse/{path},
    /api/browse-list/{path}, /api/folders/{path} listing,
    /api/files/{path} info, /api/sync/{path}/status (reference
    pages.py/folders.py:160/files.py:68/sync.py:665)."""
    async def body():
        client = await make_client()
        try:
            await login(client)
            d = app_env / "proj" / "sub"
            d.mkdir(parents=True)
            (d / "a.md").write_text("hello alias")

            resp = await client.get("/browse/proj/sub")
            assert resp.status == 200
            assert "a.md" in await resp.text()

            resp = await client.get("/api/browse-list/proj/sub")
            assert resp.status == 200
            assert "a.md" in await resp.text()

            resp = await client.get("/api/folders/proj")
            assert resp.status == 200
            items = (await resp.json())["items"]
            assert [i["path"] for i in items] == ["proj/sub"]
            assert items[0]["is_dir"] is True

            resp = await client.get("/api/folders/nope")
            assert resp.status == 404

            resp = await client.get("/api/files/proj/sub/a.md")
            assert resp.status == 200
            info = await resp.json()
            assert info["name"] == "a.md" and info["size"] > 0

            resp = await client.get("/api/sync/proj/status")
            assert resp.status == 404  # no source configured
            resp = await client.put("/api/sync/proj", json={
                "source_type": "filesystem", "fs_path": str(d)})
            assert resp.status == 200
            resp = await client.get("/api/sync/proj/status")
            assert resp.status == 200
            st = await resp.json()
            assert st["folder"] == "proj" and "sync_status" in st
        finally:
            await client.close()
    run(body())
