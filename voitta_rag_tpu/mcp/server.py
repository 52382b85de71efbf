"""MCP server: streamable-HTTP JSON-RPC transport, implemented from scratch.

The reference embeds FastMCP (mcp_server.py + main.py:53-54, 122). Here the
MCP protocol layer is ~200 lines over aiohttp: ``initialize`` handshake with
session id, ``tools/list`` / ``tools/call``, notifications, stateless
operation (any session id accepted; reference runs stateless_http=True).

Auth (reference UserHeaderMiddleware, mcp_server.py:157-204): a Microsoft
Bearer token is validated against Graph ``/me``, a Google token against the
userinfo endpoint; the legacy ``X-User-Name`` header is the fallback. Every
tool result carries ``auth_status`` in its meta (AuthStatusMiddleware,
mcp_server.py:48-72).
"""

from __future__ import annotations

import asyncio
import collections
import functools
import json
import logging
import time
import uuid
from typing import Any

from aiohttp import web
from pydantic import BaseModel

from voitta_rag_tpu.mcp import tools as T

logger = logging.getLogger(__name__)

PROTOCOL_VERSION = "2025-03-26"
SERVER_INFO = {"name": "voitta-rag-tpu", "version": "0.1.0"}


# ---------------------------------------------------------------------------
# tool registry
# ---------------------------------------------------------------------------

def _schema(props: dict[str, dict], required: list[str]) -> dict:
    return {"type": "object", "properties": props, "required": required}

S = {"type": "string"}
S_OPT = {"type": ["string", "null"]}
I_OPT = {"type": ["integer", "null"]}
N_OPT = {"type": ["number", "null"]}
ARR_S = {"type": ["array", "null"], "items": {"type": "string"}}

TOOLS: list[dict] = [
    dict(name="search",
         description=(
             "Search indexed documents and user memories using hybrid "
             "semantic + keyword similarity. Results from memories include a "
             "non-null memory_id field."),
         inputSchema=_schema({
             "query": S, "limit": I_OPT,
             "include_folders": ARR_S, "exclude_folders": ARR_S,
             "sparse_weight": dict(N_OPT, description=(
                 "BM25 vs semantic balance: 0.0 = pure semantic, "
                 "1.0 = pure keyword. Defaults to 0.1.")),
             "date_start": S_OPT, "date_end": S_OPT,
             "date_field": dict(S_OPT, description=
                                '"created" or "modified" (default)'),
         }, ["query"]),
         fn=T.search),
    dict(name="list_indexed_folders",
         description="List all folders that have been indexed, with their "
                     "status and metadata.",
         inputSchema=_schema({}, []), fn=T.list_indexed_folders),
    dict(name="get_file",
         description=(
             "Get the full content of an indexed file by re-parsing it from "
             "disk. Prefer get_chunk_range for large files."),
         inputSchema=_schema({"file_path": S}, ["file_path"]), fn=T.get_file),
    dict(name="get_chunk_range",
         description="Get a range of chunks from an indexed file, merged "
                     "with overlaps removed (max 20 chunks).",
         inputSchema=_schema({
             "file_path": S,
             "first_chunk": {"type": "integer"},
             "last_chunk": {"type": "integer"},
         }, ["file_path", "first_chunk", "last_chunk"]),
         fn=T.get_chunk_range),
    dict(name="get_file_uri",
         description="Get a download URI for a file, suitable for use with "
                     "wget/curl.",
         inputSchema=_schema({"file_path": S}, ["file_path"]),
         fn=T.get_file_uri, pass_server_host=True),
    dict(name="resolve_url",
         description="Resolve an external URL (Google Docs, Sheets, Slides) "
                     "to indexed content.",
         inputSchema=_schema({"url": S}, ["url"]), fn=T.resolve_url),
    dict(name="set_folder_active",
         description="Set a folder's active state for search. Also updates "
                     "all subfolders to the same state.",
         inputSchema=_schema({
             "folder_path": S, "is_active": {"type": "boolean"},
         }, ["folder_path", "is_active"]),
         fn=T.set_folder_active),
    dict(name="get_folder_active_states",
         description="Get the active states of all indexed folders for the "
                     "current user.",
         inputSchema=_schema({}, []), fn=T.get_folder_active_states),
    dict(name="create_memory",
         description="Create a new memory note for the current user.",
         inputSchema=_schema({"content": S}, ["content"]),
         fn=T.create_memory),
    dict(name="get_memory",
         description="Get a specific memory by its UUID.",
         inputSchema=_schema({"memory_id": S}, ["memory_id"]),
         fn=T.get_memory),
    dict(name="update_memory",
         description="Update an existing memory's content.",
         inputSchema=_schema({"memory_id": S, "content": S},
                             ["memory_id", "content"]),
         fn=T.update_memory),
    dict(name="delete_memory",
         description="Delete a memory by its UUID.",
         inputSchema=_schema({"memory_id": S}, ["memory_id"]),
         fn=T.delete_memory),
    dict(name="like_memory",
         description="Record positive feedback on a memory.",
         inputSchema=_schema({"memory_id": S}, ["memory_id"]),
         fn=T.like_memory),
    dict(name="dislike_memory",
         description="Record negative feedback on a memory.",
         inputSchema=_schema({"memory_id": S}, ["memory_id"]),
         fn=T.dislike_memory),
    dict(name="list_memories",
         description="List all memories of the current user.",
         inputSchema=_schema({}, []), fn=T.list_memories),
]

TOOL_MAP: dict[str, dict] = {t["name"]: t for t in TOOLS}


# ---------------------------------------------------------------------------
# auth (reference mcp_server.py:78-204)
# ---------------------------------------------------------------------------

async def resolve_user(request: web.Request) -> tuple[str | None, str]:
    """Returns (user_name, auth_status)."""
    auth = request.headers.get("Authorization", "")
    if auth.startswith("Bearer "):
        name, status = await _validate_ms_token(auth[7:])
        if name:
            return name, status
        google = request.headers.get("X-Google-Access-Token")
        if not google:
            # fall through to legacy header but report the failure
            legacy = request.headers.get("X-User-Name")
            return legacy, status
    google = request.headers.get("X-Google-Access-Token")
    if google:
        name, status = await _validate_google_token(google)
        if name:
            return name, status
        legacy = request.headers.get("X-User-Name")
        return legacy, status
    legacy = request.headers.get("X-User-Name")
    if legacy:
        return legacy, "ok (legacy X-User-Name header)"
    return None, "anonymous (no auth headers)"


async def _validate_ms_token(token: str) -> tuple[str | None, str]:
    try:
        import aiohttp

        async with aiohttp.ClientSession() as session:
            async with session.get(
                    "https://graph.microsoft.com/v1.0/me",
                    headers={"Authorization": f"Bearer {token}"},
                    timeout=aiohttp.ClientTimeout(total=10)) as resp:
                if resp.status == 200:
                    data = await resp.json()
                    name = (data.get("mail")
                            or data.get("userPrincipalName") or "").lower()
                    return name or None, "ok (microsoft)"
                return None, f"microsoft token rejected ({resp.status})"
    except Exception as e:
        return None, f"microsoft validation error: {e}"


async def _validate_google_token(token: str) -> tuple[str | None, str]:
    try:
        import aiohttp

        async with aiohttp.ClientSession() as session:
            async with session.get(
                    "https://www.googleapis.com/oauth2/v2/userinfo",
                    headers={"Authorization": f"Bearer {token}"},
                    timeout=aiohttp.ClientTimeout(total=10)) as resp:
                if resp.status == 200:
                    data = await resp.json()
                    email = (data.get("email") or "").lower()
                    return email or None, "ok (google)"
                return None, f"google token rejected ({resp.status})"
    except Exception as e:
        return None, f"google validation error: {e}"


# ---------------------------------------------------------------------------
# JSON-RPC handling
# ---------------------------------------------------------------------------

def _serialize(result: Any) -> Any:
    if isinstance(result, BaseModel):
        return result.model_dump()
    if isinstance(result, list):
        return [_serialize(r) for r in result]
    return result


def _rpc_result(msg_id, result: dict) -> dict:
    return {"jsonrpc": "2.0", "id": msg_id, "result": result}


def _rpc_error(msg_id, code: int, message: str) -> dict:
    return {"jsonrpc": "2.0", "id": msg_id,
            "error": {"code": code, "message": message}}


async def _dispatch(request: web.Request, msg: dict) -> dict | None:
    method = msg.get("method", "")
    msg_id = msg.get("id")
    params = msg.get("params") or {}

    if method == "initialize":
        return _rpc_result(msg_id, {
            "protocolVersion": params.get("protocolVersion",
                                          PROTOCOL_VERSION),
            "capabilities": {"tools": {"listChanged": False}},
            "serverInfo": SERVER_INFO,
        })
    if method.startswith("notifications/"):
        return None  # acknowledged with 202
    if method == "ping":
        return _rpc_result(msg_id, {})
    if method == "tools/list":
        return _rpc_result(msg_id, {"tools": [
            {k: t[k] for k in ("name", "description", "inputSchema")}
            for t in TOOLS
        ]})
    if method == "tools/call":
        name = params.get("name")
        tool = TOOL_MAP.get(name)
        if tool is None:
            return _rpc_error(msg_id, -32602, f"Unknown tool: {name}")
        args = params.get("arguments") or {}
        user_name, auth_status = await resolve_user(request)
        try:
            kwargs = dict(args)
            if tool.get("pass_server_host"):
                kwargs["server_host"] = request.headers.get("X-Server-Host")
            # Executor: tool bodies are synchronous store/DB/device work; a
            # slow one (search behind a long store-lock hold, SQLite busy
            # wait) run inline would stall the whole event loop — every
            # other request, WS broadcast, and watcher callback with it.
            result = await asyncio.get_running_loop().run_in_executor(
                None, functools.partial(tool["fn"], user_name, **kwargs))
            payload = _serialize(result)
            structured = (payload if isinstance(payload, dict)
                          else {"result": payload})
            return _rpc_result(msg_id, {
                "content": [{"type": "text",
                             "text": json.dumps(payload, ensure_ascii=False)}],
                "structuredContent": structured,
                "isError": False,
                # AuthStatusMiddleware contract (mcp_server.py:48-72)
                "_meta": {"auth_status": auth_status,
                          "user": user_name},
            })
        except TypeError as e:
            return _rpc_error(msg_id, -32602, f"Invalid arguments: {e}")
        except ValueError as e:
            return _rpc_result(msg_id, {
                "content": [{"type": "text", "text": str(e)}],
                "isError": True,
                "_meta": {"auth_status": auth_status, "user": user_name},
            })
        except Exception as e:
            logger.exception("tool %s failed", name)
            return _rpc_result(msg_id, {
                "content": [{"type": "text", "text": f"Internal error: {e}"}],
                "isError": True,
                "_meta": {"auth_status": auth_status, "user": user_name},
            })
    return _rpc_error(msg_id, -32601, f"Method not found: {method}")


async def handle_mcp_post(request: web.Request) -> web.Response:
    try:
        body = await request.json()
    except json.JSONDecodeError:
        return web.json_response(_rpc_error(None, -32700, "Parse error"),
                                 status=400)
    session_id = request.headers.get("Mcp-Session-Id") or str(uuid.uuid4())
    messages = body if isinstance(body, list) else [body]
    responses = []
    for msg in messages:
        resp = await _dispatch(request, msg)
        if resp is not None:
            responses.append(resp)
    headers = {"Mcp-Session-Id": session_id}
    if not responses:
        return web.Response(status=202, headers=headers)
    payload = responses if isinstance(body, list) else responses[0]
    accept = request.headers.get("Accept", "")
    if "text/event-stream" in accept and "application/json" not in accept:
        # Single-event SSE response for streamable-http clients that insist.
        data = json.dumps(payload, ensure_ascii=False)
        return web.Response(
            text=f"event: message\ndata: {data}\n\n",
            content_type="text/event-stream", headers=headers)
    return web.json_response(payload, headers=headers)


# ---------------------------------------------------------------------------
# SSE sessions (reference MCP_SSE_TESTING.md:48-159: GET /sse yields an
# ``endpoint`` event naming /messages/?session_id=...; JSON-RPC requests are
# POSTed there and responses arrive as ``message`` events on the open stream)
# ---------------------------------------------------------------------------

_SSE_KEEPALIVE_S = 15.0
_SSE_HISTORY = 256          # events retained per session for resume
_SSE_MAX_SESSIONS = 256
_SSE_IDLE_EVICT_S = 300.0   # disconnected sessions older than this are dropped


class _SseSession:
    """One SSE client session: an event queue plus a replay ring.

    Events get monotonically increasing ids so a client that lost the
    stream can reconnect with ``Last-Event-ID`` and replay what it missed
    (both on GET /sse?session_id=... and on the streamable-HTTP GET).
    """

    def __init__(self, sid: str):
        self.sid = sid
        self.queue: asyncio.Queue[tuple[int, str]] = asyncio.Queue()
        self.next_id = 1
        self.history: collections.deque[tuple[int, str]] = collections.deque(
            maxlen=_SSE_HISTORY)
        self.connected = False
        self.last_seen = time.monotonic()

    def push(self, data: str) -> int:
        eid = self.next_id
        self.next_id += 1
        self.history.append((eid, data))
        self.queue.put_nowait((eid, data))
        self.last_seen = time.monotonic()
        return eid


_SSE_SESSIONS: dict[str, _SseSession] = {}


def _sse_evict() -> None:
    now = time.monotonic()
    stale = [sid for sid, s in _SSE_SESSIONS.items()
             if not s.connected and now - s.last_seen > _SSE_IDLE_EVICT_S]
    for sid in stale:
        del _SSE_SESSIONS[sid]
    while len(_SSE_SESSIONS) >= _SSE_MAX_SESSIONS:
        # drop the oldest disconnected session, else the oldest outright
        victims = sorted(_SSE_SESSIONS.values(),
                         key=lambda s: (s.connected, s.last_seen))
        del _SSE_SESSIONS[victims[0].sid]


def _sse_get_or_create(sid: str | None) -> _SseSession:
    if sid and sid in _SSE_SESSIONS:
        sess = _SSE_SESSIONS[sid]
    else:
        _sse_evict()
        sess = _SseSession(sid or uuid.uuid4().hex)
        _SSE_SESSIONS[sess.sid] = sess
    sess.last_seen = time.monotonic()
    return sess


async def _sse_stream(request: web.Request, sess: _SseSession,
                      first_event: tuple[str, str] | None = None
                      ) -> web.StreamResponse:
    """Serve a session's events as a live SSE stream until disconnect.

    Replays history after the client's ``Last-Event-ID``, then follows the
    queue, emitting ``: ping`` comments while idle so intermediaries keep
    the connection open (reference troubleshooting note, lines 304-306).
    """
    resp = web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
        "Connection": "keep-alive",
        "Mcp-Session-Id": sess.sid,
    })
    await resp.prepare(request)
    sess.connected = True
    try:
        if first_event is not None:
            name, data = first_event
            await resp.write(f"event: {name}\ndata: {data}\n\n".encode())
        last = request.headers.get("Last-Event-ID")
        seen = 0
        if last is not None:
            try:
                seen = int(last)
            except ValueError:
                seen = 0
            for eid, data in list(sess.history):
                if eid > seen:
                    await resp.write(
                        f"id: {eid}\nevent: message\ndata: {data}\n\n"
                        .encode())
                    seen = eid
        while True:
            try:
                eid, data = await asyncio.wait_for(sess.queue.get(),
                                                   _SSE_KEEPALIVE_S)
            except asyncio.TimeoutError:
                await resp.write(b": ping\n\n")
                continue
            if eid <= seen:     # already replayed from history
                continue
            await resp.write(f"id: {eid}\nevent: message\ndata: {data}\n\n"
                             .encode())
    except (ConnectionResetError, asyncio.CancelledError):
        pass
    finally:
        sess.connected = False
        sess.last_seen = time.monotonic()
    return resp


async def handle_sse_get(request: web.Request) -> web.StreamResponse:
    """Legacy HTTP+SSE transport entry point (GET /sse).

    First event is ``endpoint`` with the session's message-POST URL,
    relative to this server's mount (the reference's FastMCP emits
    ``/messages/?session_id=...``, MCP_SSE_TESTING.md:110-118).
    """
    sess = _sse_get_or_create(request.query.get("session_id"))
    base = request.path
    base = base[:-len("sse")] if base.endswith("sse") else "/"
    endpoint = f"{base}messages/?session_id={sess.sid}"
    return await _sse_stream(request, sess, first_event=("endpoint", endpoint))


async def handle_sse_messages(request: web.Request) -> web.Response:
    """POST target for SSE sessions: dispatch, reply 202, emit on stream."""
    sid = request.query.get("session_id", "")
    sess = _SSE_SESSIONS.get(sid)
    if sess is None:
        return web.Response(status=404, text="Unknown session")
    try:
        body = await request.json()
    except json.JSONDecodeError:
        return web.json_response(_rpc_error(None, -32700, "Parse error"),
                                 status=400)
    for msg in body if isinstance(body, list) else [body]:
        out = await _dispatch(request, msg)
        if out is not None:
            sess.push(json.dumps(out, ensure_ascii=False))
    return web.Response(status=202, text="Accepted")


async def handle_mcp_get(request: web.Request) -> web.StreamResponse:
    """Streamable-HTTP GET stream: resumable server→client event channel."""
    accept = request.headers.get("Accept", "")
    if "text/event-stream" not in accept:
        return web.Response(status=406, text="Accept: text/event-stream "
                                             "required")
    sid = request.headers.get("Mcp-Session-Id")
    sess = _sse_get_or_create(sid)
    return await _sse_stream(request, sess)


async def handle_mcp_delete(request: web.Request) -> web.Response:
    sid = request.headers.get("Mcp-Session-Id")
    if sid:
        _SSE_SESSIONS.pop(sid, None)
    return web.Response(status=200)


def create_mcp_app() -> web.Application:
    app = web.Application()
    # The reference serves at /mcp/mcp (FastMCP mounts /mcp inside the
    # sub-app, MCP_SSE_TESTING.md); accept both the root and /mcp.
    app.router.add_post("", handle_mcp_post)
    app.router.add_post("/", handle_mcp_post)
    app.router.add_post("/mcp", handle_mcp_post)
    app.router.add_get("/mcp", handle_mcp_get)
    app.router.add_delete("/mcp", handle_mcp_delete)
    # Legacy SSE transport (reference default for Claude Code remote MCP).
    app.router.add_get("/sse", handle_sse_get)
    app.router.add_post("/messages/", handle_sse_messages)
    app.router.add_post("/messages", handle_sse_messages)
    return app
