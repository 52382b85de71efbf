"""Azure DevOps connector (reference services/sync/azure_devops.py:76-396):
MS OAuth (Graph tenant) auth; work items (WIQL query + batch fetch) and wiki
page trees rendered to markdown."""

from __future__ import annotations

import asyncio
import logging
from pathlib import Path

import httpx

from voitta_rag_tpu.services.parsers.html_utils import html_to_markdown
from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile
from voitta_rag_tpu.services.sync.msgraph import refresh_access_token

logger = logging.getLogger(__name__)

ADO_SCOPE = "499b84ac-1321-427f-aa17-267ca6975798/.default"  # ADO resource


def render_work_item(item: dict, org_url: str) -> str:
    f = item.get("fields", {})
    wid = item.get("id")
    lines = [f"# Work Item {wid}: {f.get('System.Title', '')}", ""]
    lines.append(f"- **Type:** {f.get('System.WorkItemType')}")
    lines.append(f"- **State:** {f.get('System.State')}")
    lines.append(f"- **Assigned:** "
                 f"{(f.get('System.AssignedTo') or {}).get('displayName') if isinstance(f.get('System.AssignedTo'), dict) else f.get('System.AssignedTo')}")
    lines.append(f"- **Area:** {f.get('System.AreaPath')}")
    lines.append(f"- **Created:** {f.get('System.CreatedDate')}")
    lines.append(f"- **Changed:** {f.get('System.ChangedDate')}")
    lines.append(f"- **URL:** {org_url}/_workitems/edit/{wid}")
    desc = f.get("System.Description") or ""
    lines += ["", "## Description", "", html_to_markdown(desc)]
    return "\n".join(lines)


class AzureDevOpsConnector(BaseSyncConnector):
    def _token(self, source) -> str:
        tokens = refresh_access_token(
            source.ado_tenant_id, source.ado_client_id,
            source.ado_client_secret, source.ado_refresh_token,
            scope=ADO_SCOPE)
        if tokens.get("refresh_token"):
            from voitta_rag_tpu.db.database import get_db

            get_db().update_sync_source(
                source.folder_path, ado_refresh_token=tokens["refresh_token"])
        return tokens["access_token"]

    def _base(self, source) -> str:
        if source.ado_url:
            return source.ado_url.rstrip("/")
        return f"https://dev.azure.com/{source.ado_organization}"

    def _collect(self, source) -> list[tuple[RemoteFile, str]]:
        token = self._token(source)
        headers = {"Authorization": f"Bearer {token}"}
        base = self._base(source)
        project = source.ado_project
        out: list[tuple[RemoteFile, str]] = []

        # Work items via WIQL (reference azure_devops.py:76-161).
        wiql = {"query": "Select [System.Id] From WorkItems "
                         "Order By [System.ChangedDate] Desc"}
        resp = httpx.post(
            f"{base}/{project}/_apis/wit/wiql?api-version=7.0",
            headers=headers, json=wiql, timeout=60)
        resp.raise_for_status()
        ids = [w["id"] for w in resp.json().get("workItems", [])][:2000]
        for i in range(0, len(ids), 200):
            batch = ids[i:i + 200]
            resp = httpx.get(
                f"{base}/{project}/_apis/wit/workitems",
                headers=headers,
                params={"ids": ",".join(map(str, batch)),
                        "api-version": "7.0", "$expand": "fields"},
                timeout=60)
            resp.raise_for_status()
            for item in resp.json().get("value", []):
                f = item.get("fields", {})
                content = render_work_item(item, f"{base}/{project}")
                rel = f"work_items/{item['id']}.md"
                out.append((RemoteFile(
                    remote_path=rel, size=len(content.encode()),
                    modified_at=f.get("System.ChangedDate", ""),
                    created_at=f.get("System.CreatedDate", ""),
                    source_url=f"{base}/{project}/_workitems/edit/{item['id']}"),
                    content))

        # Wiki pages (reference azure_devops.py:283-396).
        try:
            resp = httpx.get(f"{base}/{project}/_apis/wiki/wikis"
                             f"?api-version=7.0", headers=headers, timeout=60)
            resp.raise_for_status()
            for wiki in resp.json().get("value", []):
                resp2 = httpx.get(
                    f"{base}/{project}/_apis/wiki/wikis/{wiki['id']}/pages",
                    headers=headers,
                    params={"recursionLevel": "full",
                            "includeContent": "false",
                            "api-version": "7.0"},
                    timeout=60)
                resp2.raise_for_status()

                def walk(page):
                    path = page.get("path", "/")
                    if not page.get("isParentPage", False) or True:
                        resp3 = httpx.get(
                            f"{base}/{project}/_apis/wiki/wikis/"
                            f"{wiki['id']}/pages",
                            headers=headers,
                            params={"path": path, "includeContent": "true",
                                    "api-version": "7.0"},
                            timeout=60)
                        if resp3.status_code == 200:
                            content = resp3.json().get("content", "") or ""
                            if content.strip():
                                rel = (f"wiki/{wiki.get('name', 'wiki')}"
                                       f"{path}.md").replace("//", "/")
                                out.append((RemoteFile(
                                    remote_path=rel,
                                    size=len(content.encode()),
                                    modified_at=""), content))
                    for sub in page.get("subPages", []) or []:
                        walk(sub)

                walk(resp2.json())
        except httpx.HTTPError as e:
            logger.warning("wiki sync failed: %s", e)
        return out

    async def list_files(self, source) -> list[RemoteFile]:
        loop = asyncio.get_running_loop()
        items = await loop.run_in_executor(None, self._collect, source)
        self._content = {rf.remote_path: c for rf, c in items}
        return [rf for rf, _ in items]

    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        local_path.write_text(self._content[remote_path], encoding="utf-8")
