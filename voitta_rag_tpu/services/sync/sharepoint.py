"""SharePoint connector (Microsoft Graph).

Behavior contract (reference services/sync/sharepoint.py): OAuth2
refresh-token auth (86-131, 191-230); single-site and multi-/all-sites modes
(384-547); drive-item recursion → ``RemoteFile`` list with quickXorHash skip
hashes; **per-file ACL fetch** via Graph ``$batch`` permissions →
``.voitta_acl.json`` sidecar → live store payload update (741-885).
"""

from __future__ import annotations

import asyncio
import json
import logging
from pathlib import Path

from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile
from voitta_rag_tpu.services.sync.msgraph import GraphClient, refresh_access_token

logger = logging.getLogger(__name__)


class SharePointConnector(BaseSyncConnector):
    def _client(self, source) -> GraphClient:
        tokens = refresh_access_token(
            source.sp_tenant_id, source.sp_client_id,
            source.sp_client_secret, source.sp_refresh_token)
        if tokens.get("refresh_token"):
            from voitta_rag_tpu.db.database import get_db

            get_db().update_sync_source(
                source.folder_path, sp_refresh_token=tokens["refresh_token"])
        return GraphClient(tokens["access_token"])

    # -- site/drive enumeration ---------------------------------------------
    def _sites(self, source, client: GraphClient) -> list[dict]:
        if source.sp_all_sites:
            return client.get_paged("/sites?search=*")
        if source.sp_selected_sites:
            return json.loads(source.sp_selected_sites)
        if source.sp_site_url:
            host_and_path = source.sp_site_url.split("//", 1)[-1]
            host, _, path = host_and_path.partition("/")
            site = client.get(f"/sites/{host}:/{path}")
            return [site]
        return []

    def _walk_drive(self, client: GraphClient, drive_id: str, item_id: str,
                    prefix: str, out: list[tuple[RemoteFile, dict]]) -> None:
        children = client.get_paged(
            f"/drives/{drive_id}/items/{item_id}/children")
        for child in children:
            name = child.get("name", "")
            rel = f"{prefix}{name}"
            if "folder" in child:
                self._walk_drive(client, drive_id, child["id"], rel + "/", out)
            elif "file" in child:
                # Graph hashes aren't sha256, so they can't feed
                # content_hash — but quickXorHash (or cTag/eTag as weaker
                # fallbacks) is an exact revision marker: comparing it to
                # the previous sync's sidecar catches same-size edits that
                # a size-only skip misses (reference sharepoint.py uses
                # quickXorHash the same way).
                hashes = child.get("file", {}).get("hashes", {})
                rev = (hashes.get("quickXorHash")
                       or child.get("cTag") or child.get("eTag") or None)
                out.append((RemoteFile(
                    remote_path=rel,
                    size=child.get("size", 0),
                    modified_at=child.get("lastModifiedDateTime", ""),
                    created_at=child.get("createdDateTime", ""),
                    content_hash=None,
                    source_url=child.get("webUrl"),
                    remote_rev=rev,
                ), {"drive_id": drive_id, "item_id": child["id"],
                    "etag": child.get("eTag", "")}))

    def _collect(self, source, client: GraphClient):
        out: list[tuple[RemoteFile, dict]] = []
        sites = self._sites(source, client)
        multi = len(sites) > 1 or source.sp_all_sites
        for site in sites:
            site_id = site.get("id")
            prefix = f"{site.get('displayName', site_id)}/" if multi else ""
            drives = client.get_paged(f"/sites/{site_id}/drives")
            for drive in drives:
                droot = client.get(f"/drives/{drive['id']}/root")
                dprefix = (f"{prefix}{drive.get('name', '')}/"
                           if multi or len(drives) > 1 else prefix)
                self._walk_drive(client, drive["id"], droot["id"], dprefix, out)
        return out

    async def list_files(self, source) -> list[RemoteFile]:
        loop = asyncio.get_running_loop()
        client = await loop.run_in_executor(None, self._client, source)
        items = await loop.run_in_executor(None, self._collect, source, client)
        self._item_map = {rf.remote_path: meta for rf, meta in items}
        self._client_cache = client
        return [rf for rf, _ in items]

    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        meta = self._item_map[remote_path]
        url = (f"https://graph.microsoft.com/v1.0/drives/{meta['drive_id']}"
               f"/items/{meta['item_id']}/content")
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(
            None, self._client_cache.download, url, local_path)

    async def sync(self, source, fs, keep_extensions=None) -> dict:
        stats = await super().sync(source, fs, keep_extensions)
        try:
            await self._sync_acls(source, fs)
        except Exception as e:
            logger.warning("ACL sync failed: %s", e)
        return stats

    # -- ACLs (reference sharepoint.py:741-885) ------------------------------
    async def _sync_acls(self, source, fs) -> None:
        if not getattr(self, "_item_map", None):
            return
        loop = asyncio.get_running_loop()
        client = self._client_cache
        paths = list(self._item_map)
        requests = [
            {"id": str(i), "method": "GET",
             "url": f"/drives/{m['drive_id']}/items/{m['item_id']}/permissions"}
            for i, m in enumerate(self._item_map[p] for p in paths)
        ]
        responses = await loop.run_in_executor(None, client.batch, requests)
        acl_map: dict[str, list[str]] = {}
        for resp in responses:
            try:
                idx = int(resp.get("id", -1))
            except ValueError:
                continue
            if idx < 0 or resp.get("status") != 200:
                continue
            users = set()
            for perm in resp.get("body", {}).get("value", []):
                for key in ("grantedToV2", "grantedTo"):
                    ident = perm.get(key, {})
                    email = ident.get("user", {}).get("email")
                    if email:
                        users.add(email.lower())
                for ident in perm.get("grantedToIdentitiesV2", []):
                    email = ident.get("user", {}).get("email")
                    if email:
                        users.add(email.lower())
            acl_map[paths[idx]] = sorted(users)

        local_root = fs.resolve(source.folder_path)
        (local_root / ".voitta_acl.json").write_text(json.dumps(acl_map))
        # Live payload update for already-indexed files.
        from voitta_rag_tpu.index.store import get_vector_store

        store = get_vector_store()
        for rel, users in acl_map.items():
            store.update_file_acl(f"{source.folder_path}/{rel}", users)
