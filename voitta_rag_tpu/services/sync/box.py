"""Box connector (reference services/sync/box.py:1-236): OAuth2
refresh-token flow (rotating refresh tokens persisted back), recursive
folder listing, content download."""

from __future__ import annotations

import asyncio
import logging
from pathlib import Path

import httpx

from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile

logger = logging.getLogger(__name__)

API = "https://api.box.com/2.0"


def get_auth_url(client_id: str, redirect_uri: str, state: str) -> str:
    """Authorization-code URL for the OAuth popup flow
    (reference box.py get_auth_url / sync.py:390-453)."""
    from urllib.parse import urlencode

    return "https://account.box.com/api/oauth2/authorize?" + urlencode({
        "client_id": client_id,
        "redirect_uri": redirect_uri,
        "response_type": "code",
        "state": state,
    })


def exchange_code_for_tokens(client_id: str, client_secret: str, code: str,
                             redirect_uri: str) -> dict:
    resp = httpx.post("https://api.box.com/oauth2/token", data={
        "client_id": client_id,
        "client_secret": client_secret,
        "code": code,
        "grant_type": "authorization_code",
        "redirect_uri": redirect_uri}, timeout=30)
    resp.raise_for_status()
    return resp.json()


class BoxConnector(BaseSyncConnector):
    def _access_token(self, source) -> str:
        resp = httpx.post("https://api.box.com/oauth2/token", data={
            "grant_type": "refresh_token",
            "refresh_token": source.box_refresh_token,
            "client_id": source.box_client_id,
            "client_secret": source.box_client_secret}, timeout=30)
        resp.raise_for_status()
        tokens = resp.json()
        # Box rotates refresh tokens: persist the new one.
        if tokens.get("refresh_token"):
            from voitta_rag_tpu.db.database import get_db

            get_db().update_sync_source(
                source.folder_path, box_refresh_token=tokens["refresh_token"])
        return tokens["access_token"]

    def _walk(self, token: str, folder_id: str, prefix: str,
              out: list[tuple[RemoteFile, str]]) -> None:
        offset = 0
        while True:
            resp = httpx.get(
                f"{API}/folders/{folder_id}/items",
                headers={"Authorization": f"Bearer {token}"},
                params={"limit": 1000, "offset": offset,
                        "fields": "id,type,name,size,modified_at,created_at,"
                                  "sha1"},
                timeout=60)
            resp.raise_for_status()
            data = resp.json()
            for item in data.get("entries", []):
                if item["type"] == "folder":
                    self._walk(token, item["id"],
                               f"{prefix}{item['name']}/", out)
                elif item["type"] == "file":
                    out.append((RemoteFile(
                        remote_path=f"{prefix}{item['name']}",
                        size=item.get("size", 0),
                        modified_at=item.get("modified_at", ""),
                        created_at=item.get("created_at", ""),
                        content_hash=None,  # Box exposes sha1, not sha256
                    ), item["id"]))
            offset += len(data.get("entries", []))
            if offset >= data.get("total_count", 0):
                return

    async def list_files(self, source) -> list[RemoteFile]:
        loop = asyncio.get_running_loop()
        token = await loop.run_in_executor(None, self._access_token, source)
        out: list[tuple[RemoteFile, str]] = []
        await loop.run_in_executor(
            None, self._walk, token, source.box_folder_id or "0", "", out)
        self._token = token
        self._ids = {rf.remote_path: fid for rf, fid in out}
        return [rf for rf, _ in out]

    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        fid = self._ids[remote_path]

        def dl():
            with httpx.stream(
                    "GET", f"{API}/files/{fid}/content",
                    headers={"Authorization": f"Bearer {self._token}"},
                    follow_redirects=True, timeout=300) as resp:
                resp.raise_for_status()
                with open(local_path, "wb") as f:
                    for chunk in resp.iter_bytes(1 << 20):
                        f.write(chunk)

        await asyncio.get_running_loop().run_in_executor(None, dl)
