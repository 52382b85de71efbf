"""OAuth login flows (reference api/routes/auth.py:33-228): Microsoft
(Azure AD) and Google authorization-code flows; user match-or-create by
email; cookie session. Enabled only when the corresponding credentials are
configured (config.py ms_auth_enabled / google_auth_enabled)."""

from __future__ import annotations

import logging

from urllib.parse import urlencode

import aiohttp
from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import (
    STATE_INVALID, USER_COOKIE, OAuthStateStore, bind_state_cookie,
    cookie_has_state, json_error)
from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.db.database import get_db

logger = logging.getLogger(__name__)

_store = OAuthStateStore()


def _redirect_uri(provider: str) -> str:
    return f"{get_settings().base_url.rstrip('/')}/auth/{provider}/callback"


async def ms_login(request: web.Request) -> web.Response:
    s = get_settings()
    if not s.ms_auth_enabled:
        return json_error(404, "Microsoft auth not configured")
    state = _store.issue()
    params = urlencode({
        "client_id": s.ms_auth_client_id,
        "response_type": "code",
        "redirect_uri": _redirect_uri("microsoft"),
        "scope": "openid profile email User.Read",
        "state": state,
    })
    resp = web.HTTPFound(
        f"https://login.microsoftonline.com/{s.ms_auth_tenant_id}"
        f"/oauth2/v2.0/authorize?{params}")
    bind_state_cookie(resp, request, state)
    raise resp


async def ms_callback(request: web.Request) -> web.Response:
    s = get_settings()
    state = request.query.get("state", "")
    # Cookie check first: redeeming is destructive (single use), so an
    # unauthenticated probe with a leaked state value must not be able to
    # invalidate the legitimate in-flight login.
    if (not cookie_has_state(request, state)
            or _store.redeem(state) is STATE_INVALID):
        return json_error(400, "invalid state")
    code = request.query.get("code")
    if not code:
        return json_error(400, "missing code")
    async with aiohttp.ClientSession() as session:
        async with session.post(
                f"https://login.microsoftonline.com/{s.ms_auth_tenant_id}"
                f"/oauth2/v2.0/token",
                data={
                    "client_id": s.ms_auth_client_id,
                    "client_secret": s.ms_auth_client_secret,
                    "code": code,
                    "grant_type": "authorization_code",
                    "redirect_uri": _redirect_uri("microsoft"),
                }) as resp:
            tokens = await resp.json()
        access = tokens.get("access_token")
        if not access:
            return json_error(401, "token exchange failed")
        async with session.get(
                "https://graph.microsoft.com/v1.0/me",
                headers={"Authorization": f"Bearer {access}"}) as resp:
            me = await resp.json()
    email = (me.get("mail") or me.get("userPrincipalName") or "").lower()
    if not email:
        return json_error(401, "no email in profile")
    return _login_as(email)


async def google_login(request: web.Request) -> web.Response:
    s = get_settings()
    if not s.google_auth_enabled:
        return json_error(404, "Google auth not configured")
    state = _store.issue()
    params = urlencode({
        "client_id": s.google_auth_client_id,
        "response_type": "code",
        "redirect_uri": _redirect_uri("google"),
        "scope": "openid email profile",
        "state": state,
    })
    resp = web.HTTPFound(
        f"https://accounts.google.com/o/oauth2/v2/auth?{params}")
    bind_state_cookie(resp, request, state)
    raise resp


async def google_callback(request: web.Request) -> web.Response:
    s = get_settings()
    state = request.query.get("state", "")
    # Cookie check first: redeeming is destructive (single use), so an
    # unauthenticated probe with a leaked state value must not be able to
    # invalidate the legitimate in-flight login.
    if (not cookie_has_state(request, state)
            or _store.redeem(state) is STATE_INVALID):
        return json_error(400, "invalid state")
    code = request.query.get("code")
    if not code:
        return json_error(400, "missing code")
    async with aiohttp.ClientSession() as session:
        async with session.post(
                "https://oauth2.googleapis.com/token",
                data={
                    "client_id": s.google_auth_client_id,
                    "client_secret": s.google_auth_client_secret,
                    "code": code,
                    "grant_type": "authorization_code",
                    "redirect_uri": _redirect_uri("google"),
                }) as resp:
            tokens = await resp.json()
        access = tokens.get("access_token")
        if not access:
            return json_error(401, "token exchange failed")
        async with session.get(
                "https://www.googleapis.com/oauth2/v2/userinfo",
                headers={"Authorization": f"Bearer {access}"}) as resp:
            me = await resp.json()
    email = (me.get("email") or "").lower()
    if not email:
        return json_error(401, "no email in profile")
    return _login_as(email)


def _login_as(email: str) -> web.Response:
    """Match-or-create user by email (reference auth.py user matching)."""
    db = get_db()
    user = db.get_user_by_email(email)
    if user is None:
        user = db.get_or_create_user(email, email=email)
        if user.email is None:
            db.execute("UPDATE users SET email=? WHERE id=?",
                       (email, user.id))
    resp = web.HTTPFound("/browse")
    resp.set_cookie(USER_COOKIE, user.name, max_age=86400 * 365,
                    httponly=True)
    raise resp


def setup(app: web.Application) -> None:
    app.router.add_get("/auth/microsoft/login", ms_login)
    app.router.add_get("/auth/microsoft/callback", ms_callback)
    app.router.add_get("/auth/google/login", google_login)
    app.router.add_get("/auth/google/callback", google_callback)
