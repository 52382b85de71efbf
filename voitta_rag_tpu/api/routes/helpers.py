"""Shared route helpers: cookie auth, JSON errors, path extraction."""

from __future__ import annotations

import functools
import secrets
import time

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


# ---------------------------------------------------------------------------
# OAuth state (shared by login auth.py and connector-OAuth sync.py)
# ---------------------------------------------------------------------------

STATE_COOKIE = "voitta_oauth_state"
STATE_INVALID = object()  # redeem() sentinel: unknown/expired state


class OAuthStateStore:
    """Single-use, expiring OAuth state nonces with an optional payload.

    CSRF protection is two-sided: the nonce must be known server-side
    (unguessable, single-use, TTL-bounded — the store prunes itself so it
    can't grow without bound) AND echoed by the browser that initiated the
    flow via :func:`bind_state_cookie` — a victim clicking an
    attacker-minted auth URL fails the cookie check, blocking session
    fixation / token planting.
    """

    def __init__(self, ttl: float = 600.0):
        self.ttl = ttl
        self._entries: dict[str, tuple[object, float]] = {}

    def issue(self, payload: object = None) -> str:
        now = time.monotonic()
        for k in [k for k, (_, t) in self._entries.items()
                  if now - t > self.ttl]:
            self._entries.pop(k, None)
        state = secrets.token_urlsafe(24)
        self._entries[state] = (payload, now)
        return state

    def redeem(self, state: str) -> object:
        """Pop the state; returns its payload, or ``STATE_INVALID`` if
        unknown/expired (single-use: a second redeem always fails)."""
        entry = self._entries.pop(state, None)
        if entry is None or time.monotonic() - entry[1] > self.ttl:
            return STATE_INVALID
        return entry[0]


def bind_state_cookie(resp, request: web.Request, state: str,
                      max_states: int = 5) -> None:
    """Append ``state`` to the shared multi-value state cookie (keeps the
    last ``max_states`` so concurrent login/connector flows in other tabs
    don't clobber each other)."""
    prev = request.cookies.get(STATE_COOKIE, "")
    vals = [v for v in prev.split("|") if v][-(max_states - 1):] + [state]
    resp.set_cookie(STATE_COOKIE, "|".join(vals), max_age=600,
                    httponly=True, samesite="Lax")


def cookie_has_state(request: web.Request, state: str) -> bool:
    return state in request.cookies.get(STATE_COOKIE, "").split("|")
