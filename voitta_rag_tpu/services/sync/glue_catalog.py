"""AWS Glue Catalog connector (reference services/sync/glue_catalog.py:
renders databases/tables as markdown data-dictionary files; UpdateTime-derived
content hashes for change detection, 200-274).

AWS SigV4 signing is implemented standalone (boto3 is not a dependency):
static credentials from the source config or env.
"""

from __future__ import annotations

import asyncio
import datetime
import hashlib
import hmac
import json
import logging
import os
from pathlib import Path

import httpx

from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile

logger = logging.getLogger(__name__)


def _sigv4_headers(method: str, url: str, region: str, service: str,
                   body: bytes, access_key: str, secret_key: str,
                   target: str) -> dict:
    """Minimal AWS Signature V4 for Glue's JSON-RPC API."""
    from urllib.parse import urlparse

    parsed = urlparse(url)
    host = parsed.netloc
    now = datetime.datetime.now(datetime.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    date_stamp = now.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(body).hexdigest()
    canonical_headers = (f"content-type:application/x-amz-json-1.1\n"
                         f"host:{host}\nx-amz-date:{amz_date}\n"
                         f"x-amz-target:{target}\n")
    signed_headers = "content-type;host;x-amz-date;x-amz-target"
    canonical_request = "\n".join([
        method, parsed.path or "/", "", canonical_headers, signed_headers,
        payload_hash])
    scope = f"{date_stamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical_request.encode()).hexdigest()])

    def sign(key, msg):
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = sign(f"AWS4{secret_key}".encode(), date_stamp)
    k = sign(k, region)
    k = sign(k, service)
    k = sign(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(),
                         hashlib.sha256).hexdigest()
    return {
        "Content-Type": "application/x-amz-json-1.1",
        "X-Amz-Date": amz_date,
        "X-Amz-Target": target,
        "Authorization": (
            f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"),
    }


def render_table(db_name: str, table: dict) -> str:
    lines = [f"# Table: {db_name}.{table.get('Name', '')}", ""]
    if table.get("Description"):
        lines += [table["Description"], ""]
    lines.append(f"- **Location:** "
                 f"{(table.get('StorageDescriptor') or {}).get('Location')}")
    lines.append(f"- **Updated:** {table.get('UpdateTime')}")
    cols = (table.get("StorageDescriptor") or {}).get("Columns", [])
    if cols:
        lines += ["", "## Columns", "", "| Name | Type | Comment |",
                  "| --- | --- | --- |"]
        for c in cols:
            lines.append(f"| {c.get('Name', '')} | {c.get('Type', '')} | "
                         f"{c.get('Comment', '')} |")
    parts = table.get("PartitionKeys", [])
    if parts:
        lines += ["", "## Partition keys", ""]
        lines += [f"- {p.get('Name')} ({p.get('Type')})" for p in parts]
    return "\n".join(lines)


class GlueCatalogConnector(BaseSyncConnector):
    def _call(self, source, action: str, payload: dict) -> dict:
        region = source.glue_region or "us-east-1"
        access = source.glue_access_key_id or os.getenv("AWS_ACCESS_KEY_ID", "")
        secret = (source.glue_secret_access_key
                  or os.getenv("AWS_SECRET_ACCESS_KEY", ""))
        if not access or not secret:
            raise RuntimeError("AWS credentials not configured")
        url = f"https://glue.{region}.amazonaws.com/"
        body = json.dumps(payload).encode()
        headers = _sigv4_headers("POST", url, region, "glue", body, access,
                                 secret, f"AWSGlue.{action}")
        resp = httpx.post(url, headers=headers, content=body, timeout=60)
        resp.raise_for_status()
        return resp.json()

    def _collect(self, source) -> list[tuple[RemoteFile, str]]:
        wanted = [d.strip() for d in (source.glue_databases or "").split(",")
                  if d.strip()]
        out: list[tuple[RemoteFile, str]] = []
        dbs = []
        token = None
        while True:
            payload = {"MaxResults": 100}
            if source.glue_catalog_id:
                payload["CatalogId"] = source.glue_catalog_id
            if token:
                payload["NextToken"] = token
            data = self._call(source, "GetDatabases", payload)
            dbs.extend(data.get("DatabaseList", []))
            token = data.get("NextToken")
            if not token:
                break
        for db in dbs:
            name = db.get("Name", "")
            if wanted and name not in wanted:
                continue
            token = None
            while True:
                payload = {"DatabaseName": name, "MaxResults": 100}
                if token:
                    payload["NextToken"] = token
                data = self._call(source, "GetTables", payload)
                for table in data.get("TableList", []):
                    content = render_table(name, table)
                    rel = f"{name}/{table.get('Name', 'table')}.md"
                    # UpdateTime-derived hash (reference glue_catalog.py:200-274)
                    h = hashlib.sha256(
                        f"{name}.{table.get('Name')}@{table.get('UpdateTime')}"
                        .encode()).hexdigest()
                    out.append((RemoteFile(
                        remote_path=rel, size=len(content.encode()),
                        modified_at=str(table.get("UpdateTime", "")),
                        content_hash=None), content))
                token = data.get("NextToken")
                if not token:
                    break
        return out

    async def list_files(self, source) -> list[RemoteFile]:
        loop = asyncio.get_running_loop()
        items = await loop.run_in_executor(None, self._collect, source)
        self._content = {rf.remote_path: c for rf, c in items}
        return [rf for rf, _ in items]

    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        local_path.write_text(self._content[remote_path], encoding="utf-8")
