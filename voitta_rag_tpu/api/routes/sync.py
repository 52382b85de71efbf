"""Sync source management + trigger (reference api/routes/sync.py).

Contract: per-connector config field schemas (25-112), status/upsert/delete
CRUD (660-990), trigger → background ``_run_sync`` task (742-768, 993-1074):
suppress watcher → connector.sync → Teams transcripts (SharePoint) →
``sync_folder`` reconcile of indexed subfolders → status + WS broadcast.
Secrets are write-only: reads mask configured credential fields.
"""

from __future__ import annotations

import asyncio
import logging
from datetime import datetime, timezone

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import (
    STATE_INVALID, OAuthStateStore, bind_state_cookie, cookie_has_state,
    json_error, require_user, tail_path)
from voitta_rag_tpu.db.database import get_db
from voitta_rag_tpu.db.models import SOURCE_TYPES, FolderSyncSource

logger = logging.getLogger(__name__)

# Per-connector config schemas (reference sync.py:25-112).
CONFIG_SCHEMAS: dict[str, dict] = {
    "filesystem": {"fields": ["fs_path"], "secrets": []},
    "github": {"fields": ["gh_repo", "gh_branch", "gh_path",
                          "gh_auth_method", "gh_username", "gh_all_branches"],
               "secrets": ["gh_token", "gh_pat"]},
    "sharepoint": {"fields": ["sp_tenant_id", "sp_client_id", "sp_site_url",
                              "sp_drive_id", "sp_all_sites",
                              "sp_selected_sites"],
                   "secrets": ["sp_client_secret", "sp_refresh_token"]},
    "google_drive": {"fields": ["gd_folder_id", "gd_client_id"],
                     "secrets": ["gd_service_account_json",
                                 "gd_client_secret", "gd_refresh_token"]},
    "azure_devops": {"fields": ["ado_tenant_id", "ado_client_id",
                                "ado_organization", "ado_project", "ado_url"],
                     "secrets": ["ado_client_secret", "ado_refresh_token"]},
    "jira": {"fields": ["jira_url", "jira_project", "jira_auth_method",
                        "jira_email"],
             "secrets": ["jira_token"]},
    "confluence": {"fields": ["confluence_url", "confluence_space",
                              "confluence_auth_method", "confluence_email"],
                   "secrets": ["confluence_token"]},
    "box": {"fields": ["box_client_id", "box_folder_id"],
            "secrets": ["box_client_secret", "box_refresh_token"]},
    "glue_catalog": {"fields": ["glue_region", "glue_profile",
                                "glue_catalog_id", "glue_databases",
                                "glue_access_key_id"],
                     "secrets": ["glue_secret_access_key"]},
}


def _source_to_dict(src: FolderSyncSource, mask_secrets: bool = True) -> dict:
    schema = CONFIG_SCHEMAS.get(src.source_type, {"fields": [], "secrets": []})
    out = {
        "folder_path": src.folder_path,
        "source_type": src.source_type,
        "sync_status": src.sync_status,
        "sync_error": src.sync_error,
        "last_synced_at": src.last_synced_at,
    }
    for f in schema["fields"]:
        out[f] = getattr(src, f, None)
    for f in schema["secrets"]:
        val = getattr(src, f, None)
        out[f] = ("***" if val else None) if mask_secrets else val
    return out


async def sync_types(request: web.Request) -> web.Response:
    return web.json_response({"types": {
        t: CONFIG_SCHEMAS[t] for t in SOURCE_TYPES if t in CONFIG_SCHEMAS}})


@require_user
async def get_source(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    src = get_db().get_sync_source(rel)
    if src is None:
        return json_error(404, "no sync source configured")
    return web.json_response(_source_to_dict(src))


@require_user
async def upsert_source(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    body = await request.json()
    source_type = body.get("source_type")
    if source_type not in SOURCE_TYPES:
        return json_error(400, f"unknown source_type: {source_type}")
    from voitta_rag_tpu.services.filesystem import get_filesystem_service

    fs = get_filesystem_service()
    if not fs.exists(rel) or not fs.is_dir(rel):
        return json_error(404, "Folder not found")
    db = get_db()
    existing = db.get_sync_source(rel)
    src = existing or FolderSyncSource(folder_path=rel,
                                       source_type=source_type)
    # Credential-exfiltration guard: retargeting an endpoint URL while the
    # stored secret is preserved would send that secret to the NEW host on
    # the next lookup/sync (e.g. jira_url -> attacker, then
    # /jira-projects ships the stored token there). Changing an endpoint
    # field invalidates every secret not re-supplied in the same request.
    # (Prior values snapshotted before the field loop mutates ``src``.)
    endpoint_fields = {
        "jira": ("jira_url",), "confluence": ("confluence_url",),
        "azure_devops": ("ado_url", "ado_organization"),
        "github": ("gh_repo",),
    }.get(source_type, ())
    retargeted = existing is not None and (
        source_type != existing.source_type
        or any(f in body and body[f] != getattr(existing, f, None)
               for f in endpoint_fields))
    src.source_type = source_type
    schema = CONFIG_SCHEMAS.get(source_type, {"fields": [], "secrets": []})
    for f in schema["fields"] + schema["secrets"]:
        if f in body and body[f] != "***":
            setattr(src, f, body[f])
    if retargeted:
        for f in schema["secrets"]:
            if body.get(f) in (None, "***"):
                setattr(src, f, None)
    db.upsert_sync_source(src)
    # Install filesystem mappings immediately (+ live watch on the target);
    # retargeting or switching source type tears the old watch down first.
    from voitta_rag_tpu.services.filesystem import get_filesystem_service
    from voitta_rag_tpu.services.watcher import file_watcher

    fs_svc = get_filesystem_service()
    new_target = src.fs_path if source_type == "filesystem" else None
    old_target = fs_svc.mappings().get(rel)
    if old_target is not None and str(old_target) != (new_target or ""):
        fs_svc.remove_mapping(rel)
        try:
            file_watcher.remove_watch_root(rel, old_target)
        except Exception:
            logger.exception("watch root removal failed for %s", rel)
    if new_target:
        fs_svc.add_mapping(rel, new_target)
        try:
            file_watcher.add_watch_root(rel, new_target)
        except Exception:
            logger.exception("watch root add failed for %s", rel)
    return web.json_response(_source_to_dict(db.get_sync_source(rel)))


@require_user
async def delete_source(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    db = get_db()
    if db.get_sync_source(rel) is None:
        return json_error(404, "no sync source configured")
    db.delete_sync_source(rel)
    # Tear down any filesystem mapping + its watch root.
    from voitta_rag_tpu.services.filesystem import get_filesystem_service
    from voitta_rag_tpu.services.watcher import file_watcher

    old_target = get_filesystem_service().remove_mapping(rel)
    if old_target is not None:
        try:
            file_watcher.remove_watch_root(rel, old_target)
        except Exception:
            logger.exception("watch root removal failed for %s", rel)
    return web.json_response({"deleted": rel})


@require_user
async def sync_status(request: web.Request, user) -> web.Response:
    """Poll endpoint for sync progress (reference sync.py:665-690
    get_sync_status) — the status subset of the source record."""
    rel = tail_path(request)
    src = get_db().get_sync_source(rel)
    if src is None:
        return json_error(404, "no sync source configured")
    return web.json_response({
        "folder": rel, "sync_status": src.sync_status,
        "sync_error": src.sync_error, "last_synced_at": src.last_synced_at})


@require_user
async def trigger_sync(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    db = get_db()
    src = db.get_sync_source(rel)
    if src is None:
        return json_error(404, "no sync source configured")
    if src.sync_status == "syncing":
        return json_error(409, "sync already in progress")
    db.update_sync_source(rel, sync_status="syncing", sync_error=None)
    asyncio.get_running_loop().create_task(_run_sync(rel))
    return web.json_response({"status": "syncing", "folder": rel})


async def _run_sync(folder_path: str) -> None:
    """Background sync task (reference sync.py:993-1074)."""
    from voitta_rag_tpu.services.filesystem import get_filesystem_service
    from voitta_rag_tpu.services.indexing import get_indexing_service
    from voitta_rag_tpu.services.sync import get_connector
    from voitta_rag_tpu.services.watcher import file_watcher

    db = get_db()
    fs = get_filesystem_service()
    src = db.get_sync_source(folder_path)
    file_watcher.suppress_path(folder_path)
    try:
        connector = get_connector(src.source_type)
        stats = await connector.sync(src, fs)

        # SharePoint: Teams transcript pass (reference sync.py:1018-1026).
        if src.source_type == "sharepoint":
            try:
                from voitta_rag_tpu.services.sync.teams_transcripts import (
                    fetch_transcripts_for_folder,
                )

                await fetch_transcripts_for_folder(src, fs)
            except Exception as e:
                logger.warning("teams transcripts failed: %s", e)

        # Reconcile indexed subfolders (reference sync.py:1029-1055).
        loop = asyncio.get_running_loop()
        svc = get_indexing_service()
        for status in db.all_index_statuses():
            p = status.folder_path
            if status.status in ("indexed", "pending") and (
                    p == folder_path or p.startswith(folder_path + "/")):
                await loop.run_in_executor(None, svc.sync_folder, p)

        db.update_sync_source(
            folder_path, sync_status="synced",
            last_synced_at=datetime.now(timezone.utc).isoformat())
        file_watcher.broadcast({"type": "sync_status", "folder": folder_path,
                                "status": "synced", "stats": stats})
    except Exception as e:
        logger.exception("[SYNC] failed for %s", folder_path)
        db.update_sync_source(folder_path, sync_status="error",
                              sync_error=str(e)[:2000])
        file_watcher.broadcast({"type": "sync_status", "folder": folder_path,
                                "status": "error", "error": str(e)[:500]})
    finally:
        file_watcher.unsuppress_path(folder_path)


# -- helper lookups (reference sync.py:475-663), network-gated ---------------

@require_user
async def github_branches(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    src = get_db().get_sync_source(rel)
    if src is None or src.source_type != "github":
        return json_error(404, "no github source configured")
    from voitta_rag_tpu.services.sync.github import GithubConnector

    loop = asyncio.get_running_loop()
    try:
        branches = await loop.run_in_executor(
            None, GithubConnector()._remote_branches, src)
    except Exception as e:
        return json_error(502, f"branch lookup failed: {e}")
    return web.json_response({"branches": branches})


@require_user
async def jira_projects(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    src = get_db().get_sync_source(rel)
    if src is None or src.source_type != "jira":
        return json_error(404, "no jira source configured")
    from voitta_rag_tpu.services.sync.jira import JiraConnector

    loop = asyncio.get_running_loop()
    try:
        projects = await loop.run_in_executor(
            None, JiraConnector.list_projects, src)
    except Exception as e:
        return json_error(502, f"project lookup failed: {e}")
    return web.json_response({"projects": projects})


@require_user
async def confluence_spaces(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    src = get_db().get_sync_source(rel)
    if src is None or src.source_type != "confluence":
        return json_error(404, "no confluence source configured")
    from voitta_rag_tpu.services.sync.confluence import ConfluenceConnector

    loop = asyncio.get_running_loop()
    try:
        spaces = await loop.run_in_executor(
            None, ConfluenceConnector.list_spaces, src)
    except Exception as e:
        return json_error(502, f"space lookup failed: {e}")
    return web.json_response({"spaces": spaces})


# ---------------------------------------------------------------------------
# OAuth popup flow for connector credentials (reference sync.py:278-473):
# GET /api/sync/oauth/auth?folder_path=X  -> {"auth_url": ...}
# GET /api/sync/oauth/callback?code&state -> stores refresh token, notifies
# the opener tab over WebSocket, returns a self-closing page.
# ---------------------------------------------------------------------------

_OAUTH_SOURCES = {
    "sharepoint": {"tenant_id": "sp_tenant_id", "client_id": "sp_client_id",
                   "client_secret": "sp_client_secret",
                   "refresh_token": "sp_refresh_token",
                   "ws_event": "sharepoint_connected"},
    "azure_devops": {"tenant_id": "ado_tenant_id",
                     "client_id": "ado_client_id",
                     "client_secret": "ado_client_secret",
                     "refresh_token": "ado_refresh_token",
                     "ws_event": "azure_devops_connected"},
    "google_drive": {"client_id": "gd_client_id",
                     "client_secret": "gd_client_secret",
                     "refresh_token": "gd_refresh_token",
                     "ws_event": "google_drive_connected"},
    "box": {"client_id": "box_client_id", "client_secret": "box_client_secret",
            "refresh_token": "box_refresh_token",
            "ws_event": "box_connected"},
}


# Single-use, expiring, cookie-bound connector-OAuth state (shared
# mechanism with the login flows — helpers.OAuthStateStore; the payload is
# the folder path the token will be stored on).
_oauth_store = OAuthStateStore()


def _oauth_redirect_uri() -> str:
    from voitta_rag_tpu.config import get_settings

    return f"{get_settings().base_url}/api/sync/oauth/callback"


@require_user
async def oauth_auth(request: web.Request, user) -> web.Response:
    """Unified OAuth2 initiation — dispatches by source_type."""
    folder_path = request.query.get("folder_path", "")
    src = get_db().get_sync_source(folder_path)
    if not src or src.source_type not in _OAUTH_SOURCES:
        return json_error(404, "OAuth sync source not found")
    cfg = _OAUTH_SOURCES[src.source_type]
    client_id = getattr(src, cfg["client_id"], None)
    if not client_id:
        return json_error(
            400, "Save configuration (client ID, client secret) before "
                 "connecting")
    state = _oauth_store.issue(folder_path)
    redirect = _oauth_redirect_uri()
    if src.source_type == "google_drive":
        from voitta_rag_tpu.services.sync.google_drive import get_auth_url
        url = get_auth_url(client_id, redirect, state)
    elif src.source_type == "box":
        from voitta_rag_tpu.services.sync.box import get_auth_url
        url = get_auth_url(client_id, redirect, state)
    else:
        tenant = getattr(src, cfg["tenant_id"], None)
        if not tenant:
            return json_error(400, "Save configuration (tenant ID, client "
                                   "ID, etc.) before connecting")
        from voitta_rag_tpu.services.sync.msgraph import get_auth_url
        if src.source_type == "azure_devops":
            from voitta_rag_tpu.services.sync.azure_devops import ADO_SCOPE
            url = get_auth_url(tenant, client_id, redirect, state,
                               scope=f"offline_access {ADO_SCOPE}")
        else:
            url = get_auth_url(tenant, client_id, redirect, state)
    resp = web.json_response({"auth_url": url})
    # Bind the flow to this browser: the callback (which arrives in the
    # OAuth popup, same cookie jar) must echo the state cookie, so an
    # attacker-minted auth_url clicked by a victim is rejected.
    bind_state_cookie(resp, request, state)
    return resp


async def oauth_callback(request: web.Request) -> web.Response:
    """Unified OAuth2 callback — exchanges the code, stores the refresh
    token, and notifies the UI over WebSocket."""
    code = request.query.get("code")
    state = request.query.get("state", "")
    if not code:
        return json_error(400, "Missing code")
    # Cookie check first: redeem() is destructive (single use), so a probe
    # with a leaked state value cannot cancel the in-flight authorization.
    if not cookie_has_state(request, state):
        return json_error(400, "Invalid state parameter")
    folder_path = _oauth_store.redeem(state)
    if folder_path is STATE_INVALID:
        return json_error(400, "Invalid state parameter")
    db = get_db()
    src = db.get_sync_source(folder_path)
    if not src or src.source_type not in _OAUTH_SOURCES:
        return json_error(404, "OAuth sync source not found")
    cfg = _OAUTH_SOURCES[src.source_type]
    redirect = _oauth_redirect_uri()
    loop = asyncio.get_running_loop()
    try:
        if src.source_type == "google_drive":
            from voitta_rag_tpu.services.sync.google_drive import (
                exchange_code_for_tokens)
            tokens = await loop.run_in_executor(None, lambda: (
                exchange_code_for_tokens(src.gd_client_id,
                                         src.gd_client_secret, code,
                                         redirect)))
        elif src.source_type == "box":
            from voitta_rag_tpu.services.sync.box import (
                exchange_code_for_tokens)
            tokens = await loop.run_in_executor(None, lambda: (
                exchange_code_for_tokens(src.box_client_id,
                                         src.box_client_secret, code,
                                         redirect)))
        else:
            from voitta_rag_tpu.services.sync.msgraph import (
                exchange_code_for_tokens)
            scope = "offline_access https://graph.microsoft.com/.default"
            if src.source_type == "azure_devops":
                from voitta_rag_tpu.services.sync.azure_devops import ADO_SCOPE
                scope = f"offline_access {ADO_SCOPE}"
            tokens = await loop.run_in_executor(None, lambda: (
                exchange_code_for_tokens(
                    getattr(src, cfg["tenant_id"]),
                    getattr(src, cfg["client_id"]),
                    getattr(src, cfg["client_secret"]), code, redirect,
                    scope=scope)))
    except Exception as e:
        return json_error(400, f"Token exchange failed: {e}")
    db.update_sync_source(folder_path,
                          **{cfg["refresh_token"]: tokens["refresh_token"]})

    from voitta_rag_tpu.services.watcher import file_watcher

    file_watcher.broadcast({"type": cfg["ws_event"], "path": folder_path})
    return web.Response(
        text="<html><body><script>window.close()</script>"
             "<p>Connected! You can close this tab.</p></body></html>",
        content_type="text/html")


@require_user
async def gdrive_folders(request: web.Request, user) -> web.Response:
    """Root-level Drive folders for a connected source (sync.py:495-520)."""
    rel = tail_path(request)
    src = get_db().get_sync_source(rel)
    if not src or src.source_type != "google_drive":
        return json_error(404, "Google Drive source not found")
    if not src.gd_refresh_token:
        return json_error(400, "Google Drive not connected yet")
    from voitta_rag_tpu.services.sync.google_drive import list_root_folders

    loop = asyncio.get_running_loop()
    try:
        data = await loop.run_in_executor(None, lambda: list_root_folders(
            src.gd_client_id, src.gd_client_secret, src.gd_refresh_token))
    except Exception as e:
        return json_error(400, str(e))
    return web.json_response(data)


@require_user
async def sharepoint_sites(request: web.Request, user) -> web.Response:
    """All SharePoint sites visible to the connected user (sync.py:575-610)."""
    rel = tail_path(request)
    src = get_db().get_sync_source(rel)
    if not src or src.source_type != "sharepoint":
        return json_error(404, "SharePoint source not found")
    if not src.sp_refresh_token:
        return json_error(400, "SharePoint not connected yet")
    from voitta_rag_tpu.services.sync.msgraph import list_sites

    loop = asyncio.get_running_loop()
    try:
        sites = await loop.run_in_executor(None, lambda: list_sites(
            src.sp_tenant_id, src.sp_client_id, src.sp_client_secret,
            src.sp_refresh_token))
    except Exception as e:
        return json_error(400, str(e))
    return web.json_response({"sites": sites})


@require_user
async def acl_probe(request: web.Request, user) -> web.Response:
    """Diagnostic: fetch ACL/permissions for a few files without triggering
    a sync (reference sync.py:686-740; SharePoint only)."""
    rel = tail_path(request)
    src = get_db().get_sync_source(rel)
    if not src:
        return json_error(404, "No sync source for this folder")
    if src.source_type != "sharepoint":
        return json_error(400, "ACL probe only supports SharePoint")
    try:
        max_items = max(1, min(int(request.query.get("max_items", 3)), 20))
    except ValueError:
        max_items = 3

    from voitta_rag_tpu.services.sync.sharepoint import SharePointConnector

    connector = SharePointConnector()
    try:
        await connector.list_files(src)
        items = list(connector._item_map.items())[:max_items]
        if not items:
            return web.json_response({"error": "No files found", "items": []})
        client = connector._client_cache
        loop = asyncio.get_running_loop()
        results = []
        for remote_path, meta in items:
            try:
                body = await loop.run_in_executor(None, client.get, (
                    f"/drives/{meta['drive_id']}/items/{meta['item_id']}"
                    f"/permissions"))
                results.append({"file": remote_path, "permissions": body})
            except Exception as e:
                results.append({"file": remote_path, "error": str(e)})
        return web.json_response({"items": results})
    except Exception as e:
        return json_error(400, str(e))


@require_user
async def browse_host_dirs(request: web.Request, user) -> web.Response:
    """Host directory browser for filesystem sources (local mode only,
    reference sync.py:612-663)."""
    from pathlib import Path

    from voitta_rag_tpu.config import get_settings

    if get_settings().docker_mode:
        return json_error(403,
                          "Directory browsing is not available in Docker mode")
    raw = request.query.get("path", "/")
    target = Path(raw).expanduser().resolve()
    if not target.is_dir():
        return json_error(404, f"Directory not found: {raw}")
    entries = []
    try:
        for child in sorted(target.iterdir(), key=lambda x: x.name.lower()):
            if not child.is_dir() or child.name.startswith("."):
                continue
            try:
                has_children = any(
                    c.is_dir() and not c.name.startswith(".")
                    for c in child.iterdir())
            except PermissionError:
                has_children = False
            entries.append({"name": child.name, "path": str(child),
                            "has_children": has_children})
    except PermissionError:
        return json_error(403, f"Permission denied: {raw}")
    return web.json_response(entries)


def setup(app: web.Application) -> None:
    app.router.add_get("/api/sync/types", sync_types)
    app.router.add_get("/api/sync/oauth/auth", oauth_auth)
    app.router.add_get("/api/sync/oauth/callback", oauth_callback)
    app.router.add_get("/api/sync/browse-host-dirs", browse_host_dirs)
    app.router.add_get("/api/sync/{path:.*}/gdrive-folders", gdrive_folders)
    app.router.add_get("/api/sync/{path:.*}/sp-sites", sharepoint_sites)
    app.router.add_get("/api/sync/{path:.*}/acl-probe", acl_probe)
    app.router.add_get("/api/sync/{path:.*}/branches", github_branches)
    app.router.add_get("/api/sync/{path:.*}/jira-projects", jira_projects)
    app.router.add_get("/api/sync/{path:.*}/confluence-spaces",
                       confluence_spaces)
    app.router.add_get("/api/sync/{path:.*}/status", sync_status)
    app.router.add_post("/api/sync/{path:.*}/trigger", trigger_sync)
    app.router.add_get("/api/sync/{path:.*}", get_source)
    app.router.add_put("/api/sync/{path:.*}", upsert_source)
    app.router.add_delete("/api/sync/{path:.*}", delete_source)
