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

from voitta_rag_tpu.api.routes.helpers import json_error, require_user, tail_path
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
    src.source_type = source_type
    schema = CONFIG_SCHEMAS.get(source_type, {"fields": [], "secrets": []})
    for f in schema["fields"] + schema["secrets"]:
        if f in body and body[f] != "***":
            setattr(src, f, body[f])
    db.upsert_sync_source(src)
    # Install filesystem mappings immediately.
    if source_type == "filesystem" and src.fs_path:
        from voitta_rag_tpu.services.filesystem import get_filesystem_service

        get_filesystem_service().add_mapping(rel, src.fs_path)
    return web.json_response(_source_to_dict(db.get_sync_source(rel)))


@require_user
async def delete_source(request: web.Request, user) -> web.Response:
    rel = tail_path(request)
    db = get_db()
    if db.get_sync_source(rel) is None:
        return json_error(404, "no sync source configured")
    db.delete_sync_source(rel)
    return web.json_response({"deleted": rel})


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


def setup(app: web.Application) -> None:
    app.router.add_get("/api/sync/types", sync_types)
    app.router.add_get("/api/sync/{path:.*}/branches", github_branches)
    app.router.add_get("/api/sync/{path:.*}/jira-projects", jira_projects)
    app.router.add_get("/api/sync/{path:.*}/confluence-spaces",
                       confluence_spaces)
    app.router.add_post("/api/sync/{path:.*}/trigger", trigger_sync)
    app.router.add_get("/api/sync/{path:.*}", get_source)
    app.router.add_put("/api/sync/{path:.*}", upsert_source)
    app.router.add_delete("/api/sync/{path:.*}", delete_source)
