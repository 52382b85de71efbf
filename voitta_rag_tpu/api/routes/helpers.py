"""Shared route helpers: cookie auth, JSON errors, path extraction."""

from __future__ import annotations

import functools

from aiohttp import web

from voitta_rag_tpu.db.database import get_db
from voitta_rag_tpu.db.models import User

USER_COOKIE = "voitta_user"


def current_user(request: web.Request) -> User | None:
    name = request.cookies.get(USER_COOKIE)
    if not name:
        return None
    return get_db().get_user_by_name(name)


def require_user(handler):
    @functools.wraps(handler)
    async def wrapper(request: web.Request):
        user = current_user(request)
        if user is None:
            raise web.HTTPUnauthorized(text="No user selected")
        return await handler(request, user)
    return wrapper


def tail_path(request: web.Request, key: str = "path") -> str:
    """Path segment captured with {path:.*}; normalized, traversal-safe."""
    p = request.match_info.get(key, "").strip("/")
    if ".." in p.split("/"):
        raise web.HTTPBadRequest(text="invalid path")
    return p


def json_error(status: int, message: str) -> web.Response:
    return web.json_response({"detail": message}, status=status)
