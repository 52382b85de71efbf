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
import functools
import json
import logging
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


async def handle_mcp_get(request: web.Request) -> web.Response:
    # Stateless server: no server-initiated stream.
    return web.Response(status=405, text="SSE stream not supported "
                                         "(stateless streamable-http)")


async def handle_mcp_delete(request: web.Request) -> web.Response:
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
    return app
