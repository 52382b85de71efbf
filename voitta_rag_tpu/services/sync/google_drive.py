"""Google Drive connector (reference services/sync/google_drive.py:1-362):
service-account (JWT) or OAuth refresh-token auth; recursive folder listing;
Workspace docs exported (Docs→md-ish text, Sheets→csv, Slides→txt) with
``source_url`` set to the canonical document link.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
from pathlib import Path

import httpx

from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile

logger = logging.getLogger(__name__)

DRIVE = "https://www.googleapis.com/drive/v3"

EXPORTS = {
    "application/vnd.google-apps.document":
        ("text/plain", ".txt", "https://docs.google.com/document/d/{id}/edit"),
    "application/vnd.google-apps.spreadsheet":
        ("text/csv", ".csv",
         "https://docs.google.com/spreadsheets/d/{id}/edit"),
    "application/vnd.google-apps.presentation":
        ("text/plain", ".txt",
         "https://docs.google.com/presentation/d/{id}/edit"),
}


def _jwt_assertion(sa: dict, scope: str) -> str:
    """RS256 service-account JWT. Requires the 'cryptography' package; raises
    a clear error when unavailable (OAuth refresh tokens work without it)."""
    import base64

    try:
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding
    except ImportError as e:
        raise RuntimeError(
            "service-account auth requires the 'cryptography' package; "
            "configure an OAuth refresh token instead") from e

    def b64(data: bytes) -> bytes:
        return base64.urlsafe_b64encode(data).rstrip(b"=")

    now = int(time.time())
    header = b64(json.dumps({"alg": "RS256", "typ": "JWT"}).encode())
    claims = b64(json.dumps({
        "iss": sa["client_email"], "scope": scope,
        "aud": "https://oauth2.googleapis.com/token",
        "iat": now, "exp": now + 3600,
    }).encode())
    signing_input = header + b"." + claims
    key = serialization.load_pem_private_key(
        sa["private_key"].encode(), password=None)
    sig = key.sign(signing_input, padding.PKCS1v15(), hashes.SHA256())
    return (signing_input + b"." + b64(sig)).decode()


def get_auth_url(client_id: str, redirect_uri: str, state: str) -> str:
    """Authorization-code URL for the OAuth popup flow
    (reference google_drive.py get_auth_url / sync.py:390-453)."""
    from urllib.parse import urlencode

    return "https://accounts.google.com/o/oauth2/v2/auth?" + urlencode({
        "client_id": client_id,
        "redirect_uri": redirect_uri,
        "response_type": "code",
        "scope": "https://www.googleapis.com/auth/drive.readonly",
        "access_type": "offline",
        "prompt": "consent",
        "state": state,
    })


def exchange_code_for_tokens(client_id: str, client_secret: str, code: str,
                             redirect_uri: str) -> dict:
    resp = httpx.post("https://oauth2.googleapis.com/token", data={
        "client_id": client_id,
        "client_secret": client_secret,
        "code": code,
        "grant_type": "authorization_code",
        "redirect_uri": redirect_uri}, timeout=30)
    resp.raise_for_status()
    return resp.json()


def list_root_folders(client_id: str, client_secret: str,
                      refresh_token: str) -> dict:
    """Root-level Drive folders for the folder picker
    (reference sync.py:495-520)."""
    resp = httpx.post("https://oauth2.googleapis.com/token", data={
        "client_id": client_id, "client_secret": client_secret,
        "refresh_token": refresh_token,
        "grant_type": "refresh_token"}, timeout=30)
    resp.raise_for_status()
    token = resp.json()["access_token"]
    resp = httpx.get(f"{DRIVE}/files", params={
        "q": "'root' in parents and trashed = false and "
             "mimeType = 'application/vnd.google-apps.folder'",
        "fields": "files(id, name)", "pageSize": 1000,
    }, headers={"Authorization": f"Bearer {token}"}, timeout=60)
    resp.raise_for_status()
    return {"folders": resp.json().get("files", [])}


class GoogleDriveConnector(BaseSyncConnector):
    def _access_token(self, source) -> str:
        scope = "https://www.googleapis.com/auth/drive.readonly"
        if source.gd_service_account_json:
            sa = json.loads(source.gd_service_account_json)
            assertion = _jwt_assertion(sa, scope)
            resp = httpx.post("https://oauth2.googleapis.com/token", data={
                "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
                "assertion": assertion}, timeout=30)
        else:
            resp = httpx.post("https://oauth2.googleapis.com/token", data={
                "client_id": source.gd_client_id,
                "client_secret": source.gd_client_secret,
                "refresh_token": source.gd_refresh_token,
                "grant_type": "refresh_token"}, timeout=30)
        resp.raise_for_status()
        return resp.json()["access_token"]

    def _list(self, token: str, folder_id: str, prefix: str,
              out: list[tuple[RemoteFile, dict]]) -> None:
        page_token = None
        while True:
            params = {
                "q": f"'{folder_id}' in parents and trashed = false",
                "fields": "nextPageToken, files(id, name, mimeType, size, "
                          "modifiedTime, createdTime, md5Checksum, webViewLink)",
                "pageSize": 1000,
            }
            if page_token:
                params["pageToken"] = page_token
            resp = httpx.get(f"{DRIVE}/files", params=params,
                             headers={"Authorization": f"Bearer {token}"},
                             timeout=60)
            resp.raise_for_status()
            data = resp.json()
            for f in data.get("files", []):
                mime = f.get("mimeType", "")
                if mime == "application/vnd.google-apps.folder":
                    self._list(token, f["id"], f"{prefix}{f['name']}/", out)
                    continue
                export = EXPORTS.get(mime)
                name = f["name"] + (export[1] if export else "")
                url = (export[2].format(id=f["id"]) if export
                       else f.get("webViewLink"))
                out.append((RemoteFile(
                    remote_path=f"{prefix}{name}",
                    size=int(f.get("size", 0) or 0),
                    modified_at=f.get("modifiedTime", ""),
                    created_at=f.get("createdTime", ""),
                    content_hash=None,
                    source_url=url,
                ), {"id": f["id"], "export": export[0] if export else None}))
            page_token = data.get("nextPageToken")
            if not page_token:
                return

    async def list_files(self, source) -> list[RemoteFile]:
        loop = asyncio.get_running_loop()
        token = await loop.run_in_executor(None, self._access_token, source)
        out: list[tuple[RemoteFile, dict]] = []
        await loop.run_in_executor(
            None, self._list, token, source.gd_folder_id or "root", "", out)
        self._token = token
        self._meta = {rf.remote_path: m for rf, m in out}
        return [rf for rf, _ in out]

    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        meta = self._meta[remote_path]
        if meta["export"]:
            url = f"{DRIVE}/files/{meta['id']}/export"
            params = {"mimeType": meta["export"]}
        else:
            url = f"{DRIVE}/files/{meta['id']}"
            params = {"alt": "media"}

        def dl():
            with httpx.stream("GET", url, params=params,
                              headers={"Authorization": f"Bearer {self._token}"},
                              timeout=300) as resp:
                resp.raise_for_status()
                with open(local_path, "wb") as f:
                    for chunk in resp.iter_bytes(1 << 20):
                        f.write(chunk)

        await asyncio.get_running_loop().run_in_executor(None, dl)
