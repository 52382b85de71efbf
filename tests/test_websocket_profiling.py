"""WebSocket event stream (reference api/routes/websocket.py:12-50) and the
profiling stat registry (SURVEY §5.1 — the TPU build's addition)."""

import asyncio
import time

import pytest

from tests.test_api import app_env, make_client, login, run  # noqa: F401


def test_ws_forwards_watcher_events(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            ws = await client.ws_connect("/ws")
            # A watcher publish must arrive as JSON on the socket.
            from voitta_rag_tpu.services.watcher import file_watcher
            file_watcher.broadcast({"type": "index_status",
                                  "folder": "docs", "status": "indexed"})
            msg = await asyncio.wait_for(ws.receive_json(), timeout=5)
            assert msg == {"type": "index_status", "folder": "docs",
                           "status": "indexed"}

            # File events from the API surface too: create a folder over HTTP
            # and expect the watcher's created event.
            resp = await client.post("/api/folders",
                                     json={"path": "", "name": "wsdir"})
            assert resp.status in (200, 201)
            got = None
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline:
                msg = await asyncio.wait_for(ws.receive_json(), timeout=10)
                if msg.get("type") == "created" and \
                        msg.get("path", "").endswith("wsdir"):
                    got = msg
                    break
            assert got is not None, "no created event for wsdir"
            await ws.close()
        finally:
            await client.close()

    run(body())


def test_ws_unsubscribes_on_close(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            from voitta_rag_tpu.services.watcher import file_watcher
            before = len(file_watcher._subscribers)
            ws = await client.ws_connect("/ws")
            # subscription registered
            deadline = time.monotonic() + 5
            while len(file_watcher._subscribers) <= before:
                assert time.monotonic() < deadline
                await asyncio.sleep(0.05)
            await ws.close()
            # handler exits and unsubscribes (publish unblocks the queue.get)
            file_watcher.broadcast({"type": "ping"})
            deadline = time.monotonic() + 5
            while len(file_watcher._subscribers) > before:
                assert time.monotonic() < deadline, "subscriber leaked"
                file_watcher.broadcast({"type": "ping"})
                await asyncio.sleep(0.05)
        finally:
            await client.close()

    run(body())


def test_profiling_stats_registry():
    from voitta_rag_tpu.utils import profiling

    profiling.reset_stats()
    for _ in range(10):
        with profiling.trace("unit.stage"):
            time.sleep(0.001)
    s = profiling.stats()
    assert s["unit.stage"]["count"] == 10
    assert s["unit.stage"]["p50_ms"] >= 1.0
    assert s["unit.stage"]["p95_ms"] >= s["unit.stage"]["p50_ms"]
    profiling.reset_stats()
    assert profiling.stats() == {}


def test_profiling_bounded_buffer():
    from voitta_rag_tpu.utils import profiling

    profiling.reset_stats()
    for _ in range(700):
        with profiling.trace("unit.flood"):
            pass
    assert profiling.stats()["unit.flood"]["count"] == 512  # _MAX_SAMPLES cap
    profiling.reset_stats()


def test_stats_endpoint_carries_latency_block(app_env):
    async def body():
        client = await make_client()
        try:
            await login(client)
            from voitta_rag_tpu.utils import profiling
            with profiling.trace("search.unit_test_probe"):
                pass
            resp = await client.get("/api/stats")
            data = await resp.json()
            assert "search.unit_test_probe" in data["latency"]
        finally:
            await client.close()

    run(body())
