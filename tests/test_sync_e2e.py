"""Remote-sync call stack end-to-end (reference SURVEY §3.4 /
api/routes/sync.py:993-1074): PUT config → POST trigger → background
_run_sync → connector.sync → indexed-subfolder reconciliation → the new
remote file is searchable over /api/search — all through real HTTP with
the app lifespan running."""

import asyncio

import pytest

from tests.test_api import app_env, login, make_client, run  # noqa: F401


def test_sync_trigger_reconciles_and_serves_new_file(app_env, tmp_path):
    src_dir = tmp_path / "mapped-src"
    src_dir.mkdir()
    (src_dir / "readme.md").write_text("the falcon inspects the canyon " * 5)

    async def body():
        client = await make_client()
        try:
            await login(client)
            (app_env / "ext").mkdir()
            resp = await client.put("/api/sync/ext", json={
                "source_type": "filesystem", "fs_path": str(src_dir)})
            assert resp.status == 200, await resp.text()

            # Index the mapped folder so the sync reconciler owns it.
            from voitta_rag_tpu.services.indexing import get_indexing_service
            svc = get_indexing_service()
            loop = asyncio.get_running_loop()
            stats = await loop.run_in_executor(
                None, svc.index_folder, "ext")
            assert stats["errors"] == 0 and stats["indexed"] == 1

            # A file appears at the remote side AFTER the initial index.
            (src_dir / "update.md").write_text(
                "gibbons negotiated the treaty " * 5)

            resp = await client.post("/api/sync/ext/trigger")
            assert resp.status == 200
            assert (await resp.json())["status"] == "syncing"

            # Second trigger while syncing must 409 (reference contract)
            # unless the first already finished.
            resp = await client.post("/api/sync/ext/trigger")
            assert resp.status in (200, 409)

            for _ in range(200):
                resp = await client.get("/api/sync/ext")
                data = await resp.json()
                if data["sync_status"] in ("synced", "error"):
                    break
                await asyncio.sleep(0.1)
            assert data["sync_status"] == "synced", data
            assert data["last_synced_at"]

            # The reconciler picked up the post-index remote file...
            resp = await client.post(
                "/api/settings/folders/ext/search-active",
                json={"search_active": True})
            assert resp.status == 200
            resp = await client.get(
                "/api/search?q=gibbons+treaty&limit=2&sparse_weight=0.9")
            assert resp.status == 200
            results = (await resp.json())["results"]
            assert results and results[0]["file_path"] == "ext/update.md"
        finally:
            await client.close()
    run(body())


def test_sync_trigger_without_source_404s(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            resp = await client.post("/api/sync/nowhere/trigger")
            assert resp.status == 404
        finally:
            await client.close()
    run(body())


def test_sync_error_is_reported_and_cleared(app_env, tmp_path):
    """A connector failure lands in sync_error and status=error; the next
    successful sync clears it (reference sync.py:1057-1066)."""
    src_dir = tmp_path / "vanishing"
    src_dir.mkdir()

    async def body():
        client = await make_client()
        try:
            await login(client)
            (app_env / "ext2").mkdir()
            resp = await client.put("/api/sync/ext2", json={
                "source_type": "filesystem", "fs_path": str(src_dir)})
            assert resp.status == 200

            # Break the remote: mapped path gone → connector raises.
            src_dir.rmdir()
            resp = await client.post("/api/sync/ext2/trigger")
            assert resp.status == 200
            for _ in range(200):
                resp = await client.get("/api/sync/ext2")
                data = await resp.json()
                if data["sync_status"] in ("synced", "error"):
                    break
                await asyncio.sleep(0.05)
            assert data["sync_status"] == "error"
            assert "mapped path not found" in (data["sync_error"] or "")

            # Restore and re-trigger: error clears.
            src_dir.mkdir()
            resp = await client.post("/api/sync/ext2/trigger")
            assert resp.status == 200
            for _ in range(200):
                resp = await client.get("/api/sync/ext2")
                data = await resp.json()
                if data["sync_status"] in ("synced", "error"):
                    break
                await asyncio.sleep(0.05)
            assert data["sync_status"] == "synced"
            assert not data.get("sync_error")
        finally:
            await client.close()
    run(body())
