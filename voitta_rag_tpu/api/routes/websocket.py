"""WebSocket endpoint (reference api/routes/websocket.py:12-50): subscribe to
the watcher's pub/sub queue, forward events as JSON, 30 s ping keepalive."""

from __future__ import annotations

import asyncio
import logging

from aiohttp import web

logger = logging.getLogger(__name__)

PING_INTERVAL = 30.0


async def ws_handler(request: web.Request) -> web.WebSocketResponse:
    from voitta_rag_tpu.services.watcher import file_watcher

    ws = web.WebSocketResponse(heartbeat=PING_INTERVAL)
    await ws.prepare(request)
    queue = file_watcher.subscribe()
    try:
        while not ws.closed:
            try:
                event = await asyncio.wait_for(queue.get(), timeout=PING_INTERVAL)
            except asyncio.TimeoutError:
                await ws.send_json({"type": "ping"})
                continue
            await ws.send_json(event)
    except (ConnectionResetError, RuntimeError):
        pass
    finally:
        file_watcher.unsubscribe(queue)
    return ws


def setup(app: web.Application) -> None:
    app.router.add_get("/ws", ws_handler)
