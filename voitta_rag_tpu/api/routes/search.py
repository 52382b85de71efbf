"""HTTP search endpoint.

The reference exposes search only through MCP (mcp_server.py:373); this
endpoint exposes the same hybrid search over plain HTTP for the web UI and
scripts, with identical filter semantics."""

from __future__ import annotations

import asyncio
import functools

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import json_error, require_user
from voitta_rag_tpu.mcp import tools as mcp_tools


@require_user
async def search(request: web.Request, user) -> web.Response:
    # Login required: the MCP transport's "no identity -> all folders"
    # contract (reference mcp_server.py:535) is for trusted MCP clients;
    # the cookie-facing HTTP endpoint scopes to the session user.
    q = request.query.get("q", "").strip()
    if not q:
        return json_error(400, "query parameter 'q' required")
    try:
        limit = int(request.query.get("limit", "10"))
        sparse_weight = request.query.get("sparse_weight")
        # Executor: the search body is synchronous device + SQLite work;
        # inline it would stall the event loop behind store/payload locks.
        results = await asyncio.get_running_loop().run_in_executor(
            None, functools.partial(
                mcp_tools.search,
                user.name, q, limit=limit,
                include_folders=request.query.getall("include_folder", None),
                exclude_folders=request.query.getall("exclude_folder", None),
                sparse_weight=float(sparse_weight) if sparse_weight else None,
                date_start=request.query.get("date_start"),
                date_end=request.query.get("date_end"),
                date_field=request.query.get("date_field"),
                fusion=request.query.get("fusion", "weighted")))
    except ValueError as e:
        return json_error(400, str(e))
    return web.json_response({
        "query": q,
        "results": [r.model_dump() for r in results]})


def setup(app: web.Application) -> None:
    app.router.add_get("/api/search", search)
