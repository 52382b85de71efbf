"""MCP server over the streamable-HTTP transport: handshake, tools/list,
tools/call for search + memories + folder state (15-tool contract)."""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from voitta_rag_tpu.db import database as dbmod


@pytest.fixture
def mcp_env(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_MODEL", "test-tiny")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    monkeypatch.setenv("INDEXING_POLL_INTERVAL", "3600")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    dbmod.reset_db()
    dbmod.init_db()

    import voitta_rag_tpu.services.filesystem as fsmod
    import voitta_rag_tpu.services.indexing as idxmod
    import voitta_rag_tpu.services.embedding as embmod
    import voitta_rag_tpu.index.store as storemod
    import voitta_rag_tpu.search.service as searchmod
    fsmod.reset_filesystem_service()
    idxmod.reset_indexing_service()
    embmod.reset_embedding_service()
    storemod.reset_vector_store()
    searchmod.reset_search_service()
    yield temp_root
    storemod.reset_vector_store()
    dbmod.reset_db()


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


async def make_client():
    from voitta_rag_tpu.mcp.server import create_mcp_app

    client = TestClient(TestServer(create_mcp_app()))
    await client.start_server()
    return client


async def rpc(client, method, params=None, *, user=None, msg_id=1):
    headers = {"Content-Type": "application/json"}
    if user:
        headers["X-User-Name"] = user
    resp = await client.post("/mcp", json={
        "jsonrpc": "2.0", "id": msg_id, "method": method,
        "params": params or {}}, headers=headers)
    assert resp.status in (200, 202), await resp.text()
    if resp.status == 202:
        return None
    return await resp.json()


async def call_tool(client, name, arguments=None, *, user=None):
    data = await rpc(client, "tools/call",
                     {"name": name, "arguments": arguments or {}}, user=user)
    assert "result" in data, data
    return data["result"]


def test_initialize_and_tools_list(mcp_env):
    async def body():
        client = await make_client()
        try:
            data = await rpc(client, "initialize", {
                "protocolVersion": "2025-03-26", "capabilities": {},
                "clientInfo": {"name": "test", "version": "0"}})
            assert data["result"]["serverInfo"]["name"] == "voitta-rag-tpu"
            # notifications are acknowledged with 202
            assert await rpc(client, "notifications/initialized") is None

            data = await rpc(client, "tools/list")
            names = {t["name"] for t in data["result"]["tools"]}
            assert names == {
                "search", "list_indexed_folders", "get_file",
                "get_chunk_range", "get_file_uri", "resolve_url",
                "set_folder_active", "get_folder_active_states",
                "create_memory", "get_memory", "update_memory",
                "delete_memory", "like_memory", "dislike_memory",
                "list_memories"}
        finally:
            await client.close()
    run(body())


def test_memory_lifecycle(mcp_env):
    async def body():
        client = await make_client()
        try:
            res = await call_tool(client, "create_memory",
                                  {"content": "remember the kangaroo"},
                                  user="alice")
            sc = res["structuredContent"]
            assert sc["success"], sc
            mid = sc["memory_id"]
            assert res["_meta"]["auth_status"].startswith("ok")

            res = await call_tool(client, "get_memory", {"memory_id": mid},
                                  user="alice")
            assert res["structuredContent"]["content"] == "remember the kangaroo"

            res = await call_tool(client, "like_memory", {"memory_id": mid},
                                  user="alice")
            assert res["structuredContent"]["likes"] == 1

            res = await call_tool(client, "update_memory",
                                  {"memory_id": mid, "content": "updated"},
                                  user="alice")
            assert res["structuredContent"]["content"] == "updated"
            assert res["structuredContent"]["likes"] == 1  # preserved

            res = await call_tool(client, "list_memories", {}, user="alice")
            assert len(res["structuredContent"]["memories"]) == 1

            # Anamnesis reindex queued (reference mcp_server.py:1187-1202).
            db = dbmod.get_db()
            st = db.get_index_status("Anamnesis/alice")
            assert st is not None and st.status in ("pending", "indexing",
                                                    "indexed")

            res = await call_tool(client, "delete_memory",
                                  {"memory_id": mid}, user="alice")
            assert res["structuredContent"]["success"]
            res = await call_tool(client, "list_memories", {}, user="alice")
            assert res["structuredContent"]["memories"] == []

            # No user header → error result.
            res = await call_tool(client, "create_memory", {"content": "x"})
            assert not res["structuredContent"]["success"]
        finally:
            await client.close()
    run(body())


def test_search_and_folder_state_flow(mcp_env):
    async def body():
        from voitta_rag_tpu.services.indexing import get_indexing_service

        root = mcp_env
        d = root / "kb"
        d.mkdir()
        (d / "a.md").write_text("the kangaroo hops across the outback " * 5)
        (d / "b.md").write_text("spacecraft orbiting mars and the moon " * 5)
        get_indexing_service().index_folder("kb")

        client = await make_client()
        try:
            # Anonymous search sees everything.
            res = await call_tool(client, "search",
                                  {"query": "kangaroo outback",
                                   "sparse_weight": 0.9})
            hits = res["structuredContent"]["result"]
            assert hits and hits[0]["file_path"] == "kb/a.md"
            assert hits[0]["total_chunks"] >= 1

            # User with no active folders → empty results.
            res = await call_tool(client, "search", {"query": "kangaroo"},
                                  user="carol")
            assert res["structuredContent"]["result"] == []

            # Activate the folder for carol → results appear.
            res = await call_tool(client, "set_folder_active",
                                  {"folder_path": "kb", "is_active": True},
                                  user="carol")
            assert res["structuredContent"]["success"]
            res = await call_tool(client, "search", {"query": "kangaroo",
                                                     "sparse_weight": 0.9},
                                  user="carol")
            assert res["structuredContent"]["result"]

            res = await call_tool(client, "get_folder_active_states",
                                  user="carol")
            states = {s["folder_path"]: s["is_active"]
                      for s in res["structuredContent"]["result"]}
            assert states.get("kb") is True

            res = await call_tool(client, "list_indexed_folders",
                                  user="carol")
            folders = res["structuredContent"]["result"]
            assert any(f["folder_path"] == "kb" and f["file_count"] == 2
                       for f in folders)

            # get_file + chunk range
            res = await call_tool(client, "get_file",
                                  {"file_path": "kb/a.md"})
            assert "kangaroo" in res["structuredContent"]["content"]
            res = await call_tool(client, "get_chunk_range",
                                  {"file_path": "kb/a.md", "first_chunk": 0,
                                   "last_chunk": 5})
            sc = res["structuredContent"]
            assert sc["success"] and "kangaroo" in sc["merged_text"]

            # get_file_uri
            res = await call_tool(client, "get_file_uri",
                                  {"file_path": "kb/a.md"})
            assert res["structuredContent"]["uri"].endswith("/api/raw/kb/a.md")
        finally:
            await client.close()
    run(body())


def test_resolve_url(mcp_env):
    async def body():
        import json as jsonlib

        from voitta_rag_tpu.services.indexing import get_indexing_service

        root = mcp_env
        d = root / "gdrive"
        d.mkdir()
        (d / "Report.gdoc").write_text(jsonlib.dumps({"doc_id": "doc42"}))
        get_indexing_service().index_folder("gdrive")

        client = await make_client()
        try:
            res = await call_tool(client, "resolve_url", {
                "url": "https://docs.google.com/document/d/doc42/edit?tab=t.0"})
            sc = res["structuredContent"]
            assert sc["success"], sc
            assert sc["file_path"] == "gdrive/Report.gdoc"

            res = await call_tool(client, "resolve_url",
                                  {"url": "https://example.com/nope"})
            assert not res["structuredContent"]["success"]
        finally:
            await client.close()
    run(body())

def test_chunk_range_cap_and_folder_recursion(mcp_env):
    async def body():
        from voitta_rag_tpu.services.indexing import get_indexing_service

        root = mcp_env
        d = root / "big"
        (d / "nested" / "deep").mkdir(parents=True)
        # Long file → many chunks (chunk_size default 512 chars).
        (d / "long.md").write_text(
            "\n\n".join(f"paragraph {i} about wombats and telescopes " * 4
                        for i in range(120)))
        (d / "nested" / "n.md").write_text("nested text about comets " * 5)
        get_indexing_service().index_folder("big")

        client = await make_client()
        try:
            # 20-chunk cap (reference mcp_server.py:659-782).
            res = await call_tool(client, "get_chunk_range",
                                  {"file_path": "big/long.md",
                                   "first_chunk": 0, "last_chunk": 50})
            sc = res["structuredContent"]
            assert sc["success"], sc
            assert sc["truncated_to_limit"] is True
            assert sc["chunks_returned"] <= 20
            assert sc["actual_last_chunk"] - sc["actual_first_chunk"] <= 19

            # Beyond-file range → explanatory error.
            res = await call_tool(client, "get_chunk_range",
                                  {"file_path": "big/long.md",
                                   "first_chunk": 100000,
                                   "last_chunk": 100001})
            sc = res["structuredContent"]
            assert not sc["success"] and "beyond" in sc["error"]

            # Recursive activation counts subfolders.
            res = await call_tool(client, "set_folder_active",
                                  {"folder_path": "big", "is_active": True},
                                  user="dave")
            sc = res["structuredContent"]
            assert sc["success"] and sc["subfolders_updated"] == 2

            # Subfolder settings were written (states listing only covers
            # folders with an index-status row, matching the reference).
            db = dbmod.get_db()
            user = db.get_or_create_user("dave")
            rows = db.query(
                "SELECT folder_path, search_active FROM user_folder_settings "
                "WHERE user_id=?", (user.id,))
            settings = {r["folder_path"]: bool(r["search_active"])
                        for r in rows}
            assert settings.get("big/nested") is True
            assert settings.get("big/nested/deep") is True
        finally:
            await client.close()
    run(body())


def test_search_date_filter_and_dislike(mcp_env):
    async def body():
        import os

        from voitta_rag_tpu.services.indexing import get_indexing_service

        root = mcp_env
        d = root / "dated"
        d.mkdir()
        old, new = d / "old.md", d / "new.md"
        old.write_text("glaciers retreating in patagonia " * 5)
        new.write_text("glaciers advancing in alaska " * 5)
        os.utime(old, (1262304000, 1262304000))   # 2010-01-01
        os.utime(new, (1893456000, 1893456000))   # 2030-01-01
        get_indexing_service().index_folder("dated")

        client = await make_client()
        try:
            res = await call_tool(client, "search", {
                "query": "glaciers", "date_start": "2020-01-01",
                "date_field": "modified"})
            hits = res["structuredContent"]["result"]
            assert hits and all(h["file_path"] == "dated/new.md"
                                for h in hits)

            res = await call_tool(client, "search", {
                "query": "glaciers", "date_end": "2020-01-01",
                "date_field": "modified"})
            hits = res["structuredContent"]["result"]
            assert hits and all(h["file_path"] == "dated/old.md"
                                for h in hits)

            # dislike_memory decrements/records dislikes.
            res = await call_tool(client, "create_memory",
                                  {"content": "m"}, user="erin")
            mid = res["structuredContent"]["memory_id"]
            res = await call_tool(client, "dislike_memory",
                                  {"memory_id": mid}, user="erin")
            assert res["structuredContent"]["dislikes"] == 1
        finally:
            await client.close()
    run(body())


def test_get_file_and_uri_and_auth_meta(mcp_env):
    """get_file parses + returns indexed content; get_file_uri builds a raw
    download URI with mime/size (mcp_server.py:600-656, 785-853); every tool
    result carries auth_status in _meta (AuthStatusMiddleware 48-72)."""
    async def body():
        from voitta_rag_tpu.db.database import get_db
        from voitta_rag_tpu.db.models import IndexedFile

        (mcp_env / "notes").mkdir()
        p = mcp_env / "notes" / "plan.md"
        p.write_text("# Plan\nShip the thing.\n")
        get_db().upsert_indexed_file(IndexedFile(
            file_path="notes/plan.md", folder_path="notes",
            index_folder="notes", content_hash="h", file_size=p.stat().st_size,
            chunk_count=1))
        client = await make_client()
        try:
            res = await call_tool(client, "get_file",
                                  {"file_path": "notes/plan.md"},
                                  user="alice")
            assert res["_meta"]["auth_status"]  # middleware meta present
            import json as _json
            payload = _json.loads(res["content"][0]["text"])
            assert "Ship the thing." in payload["content"]
            assert payload["chunk_count"] == 1

            res = await call_tool(client, "get_file_uri",
                                  {"file_path": "notes/plan.md"},
                                  user="alice")
            payload = _json.loads(res["content"][0]["text"])
            assert payload["uri"].endswith("/api/raw/notes/plan.md")
            assert payload["mime_type"].startswith("text/")
            assert payload["size"] == p.stat().st_size

            # Unindexed file → isError result, not a crash.
            res = await call_tool(client, "get_file",
                                  {"file_path": "notes/missing.md"},
                                  user="alice")
            assert res.get("isError"), res

            # Directory → error for get_file_uri.
            res = await call_tool(client, "get_file_uri",
                                  {"file_path": "notes"}, user="alice")
            assert res.get("isError"), res
        finally:
            await client.close()
    run(body())


def test_list_indexed_folders_shape(mcp_env):
    async def body():
        from voitta_rag_tpu.db.database import get_db

        (mcp_env / "kb").mkdir()
        db = get_db()
        db.set_index_status("kb", "indexed")
        alice = db.get_or_create_user("alice")
        db.upsert_folder_setting(alice.id, "kb", search_active=True)
        client = await make_client()
        try:
            res = await call_tool(client, "list_indexed_folders", {},
                                  user="alice")
            import json as _json
            folders = _json.loads(res["content"][0]["text"])
            kb = next(f for f in folders if f["folder_path"] == "kb")
            assert kb["status"] == "indexed"
            assert "file_count" in kb and "total_chunks" in kb
        finally:
            await client.close()
    run(body())


def test_protocol_error_contract(mcp_env):
    """JSON-RPC error codes: parse error -32700, method not found -32601,
    unknown tool / bad arguments -32602 (streamable-http transport layer)."""
    async def body():
        client = await make_client()
        try:
            resp = await client.post(
                "/mcp", data=b"{not json",
                headers={"Content-Type": "application/json"})
            data = await resp.json()
            assert data["error"]["code"] == -32700

            data = await rpc(client, "no/such/method")
            assert data["error"]["code"] == -32601

            data = await rpc(client, "tools/call",
                             {"name": "not_a_tool", "arguments": {}})
            assert data["error"]["code"] == -32602

            # Wrong argument types are a protocol-level invalid-arguments
            # error, not a 500.
            data = await rpc(client, "tools/call",
                             {"name": "get_chunk_range",
                              "arguments": {"file_path": "x",
                                            "first_chunk": "NaN",
                                            "last_chunk": []}})
            assert "error" in data or data["result"].get("isError"), data
        finally:
            await client.close()
    run(body())


# ---------------------------------------------------------------------------
# SSE transports (reference MCP_SSE_TESTING.md:48-159)
# ---------------------------------------------------------------------------

async def _read_sse_event(resp):
    """Read one SSE event (skipping keepalive comments) from a stream."""
    event = {}
    while True:
        line = (await resp.content.readline()).decode().rstrip("\n").rstrip("\r")
        if line.startswith(":"):
            continue
        if not line:
            if event:
                return event
            continue
        key, _, value = line.partition(":")
        event[key] = value.lstrip()


def test_sse_session_flow(mcp_env):
    """GET /sse yields an endpoint event; POSTed JSON-RPC answers arrive as
    message events on the still-open stream (MCP_SSE_TESTING.md:95-135)."""
    async def body():
        client = await make_client()
        try:
            sse = await client.get("/sse", headers={
                "Accept": "text/event-stream"})
            assert sse.status == 200
            assert sse.headers["Content-Type"].startswith("text/event-stream")
            first = await _read_sse_event(sse)
            assert first["event"] == "endpoint"
            endpoint = first["data"]
            assert "/messages/?session_id=" in endpoint

            post = await client.post(endpoint, json={
                "jsonrpc": "2.0", "id": 7, "method": "tools/list"})
            assert post.status == 202

            msg = await _read_sse_event(sse)
            assert msg["event"] == "message"
            import json as _json
            data = _json.loads(msg["data"])
            assert data["id"] == 7
            names = {t["name"] for t in data["result"]["tools"]}
            assert "search" in names and "list_memories" in names
            sse.close()
        finally:
            await client.close()
    run(body())


def test_sse_resume_with_last_event_id(mcp_env):
    """A dropped SSE client reconnects with Last-Event-ID and replays only
    the missed events."""
    async def body():
        client = await make_client()
        try:
            sse = await client.get("/sse")
            first = await _read_sse_event(sse)
            endpoint = first["data"]
            sid = endpoint.split("session_id=")[1]

            await client.post(endpoint, json={
                "jsonrpc": "2.0", "id": 1, "method": "ping"})
            ev1 = await _read_sse_event(sse)
            assert ev1["id"] == "1"
            sse.close()  # simulate a dropped stream

            # Two more answers queue while the client is away.
            for mid in (2, 3):
                post = await client.post(endpoint, json={
                    "jsonrpc": "2.0", "id": mid, "method": "ping"})
                assert post.status == 202

            sse2 = await client.get(
                f"/sse?session_id={sid}", headers={"Last-Event-ID": "1"})
            again = await _read_sse_event(sse2)
            assert again["event"] == "endpoint"
            assert sid in again["data"]
            import json as _json
            ev2 = await _read_sse_event(sse2)
            ev3 = await _read_sse_event(sse2)
            assert [_json.loads(ev2["data"])["id"],
                    _json.loads(ev3["data"])["id"]] == [2, 3]
            sse2.close()
        finally:
            await client.close()
    run(body())


def test_streamable_http_get_stream(mcp_env):
    """GET /mcp with Accept: text/event-stream opens a resumable stream for
    the session instead of a 405 (streamable-HTTP spec)."""
    async def body():
        client = await make_client()
        try:
            # Establish a session via a normal streamable-HTTP POST.
            resp = await client.post("/mcp", json={
                "jsonrpc": "2.0", "id": 1, "method": "initialize",
                "params": {"protocolVersion": "2025-03-26",
                           "capabilities": {},
                           "clientInfo": {"name": "t", "version": "0"}}})
            sid = resp.headers["Mcp-Session-Id"]

            bad = await client.get("/mcp", headers={"Accept": "text/html"})
            assert bad.status == 406

            sse = await client.get("/mcp", headers={
                "Accept": "text/event-stream", "Mcp-Session-Id": sid})
            assert sse.status == 200
            assert sse.headers["Mcp-Session-Id"] == sid

            # An SSE-session POST targeting the same session id shows up on
            # the streamable GET channel too (shared event history).
            post = await client.post(
                f"/messages/?session_id={sid}",
                json={"jsonrpc": "2.0", "id": 5, "method": "ping"})
            assert post.status == 202
            ev = await _read_sse_event(sse)
            import json as _json
            assert _json.loads(ev["data"])["id"] == 5
            sse.close()

            # DELETE tears the session down; its messages endpoint 404s.
            await client.delete("/mcp", headers={"Mcp-Session-Id": sid})
            gone = await client.post(
                f"/messages/?session_id={sid}",
                json={"jsonrpc": "2.0", "id": 6, "method": "ping"})
            assert gone.status == 404
        finally:
            await client.close()
    run(body())
