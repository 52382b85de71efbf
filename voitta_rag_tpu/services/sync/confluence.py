"""Confluence connector (reference services/sync/confluence.py): Cloud/Server
auth; space page trees with page-hierarchy paths (286-304); storage-format
HTML converted to markdown text (30-101)."""

from __future__ import annotations

import asyncio
import logging
from pathlib import Path

import httpx

from voitta_rag_tpu.services.parsers.html_utils import html_to_markdown
from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile

logger = logging.getLogger(__name__)


class ConfluenceConnector(BaseSyncConnector):
    def _auth_headers(self, source) -> dict:
        if source.confluence_auth_method == "cloud" and source.confluence_email:
            import base64

            cred = base64.b64encode(
                f"{source.confluence_email}:{source.confluence_token}"
                .encode()).decode()
            return {"Authorization": f"Basic {cred}"}
        return {"Authorization": f"Bearer {source.confluence_token}"}

    def _pages(self, source) -> list[dict]:
        base = source.confluence_url.rstrip("/")
        space = source.confluence_space
        pages = []
        start = 0
        while True:
            resp = httpx.get(
                f"{base}/rest/api/content",
                headers=self._auth_headers(source),
                params={"spaceKey": space, "type": "page", "start": start,
                        "limit": 50,
                        "expand": "body.storage,ancestors,version,history"},
                timeout=60)
            resp.raise_for_status()
            data = resp.json()
            pages.extend(data.get("results", []))
            if len(data.get("results", [])) < 50:
                return pages
            start += 50

    @staticmethod
    def _safe(name: str) -> str:
        return "".join(c if c.isalnum() or c in " -_." else "_"
                       for c in name).strip() or "page"

    def _page_path(self, page: dict) -> str:
        """Hierarchy path from ancestors (reference confluence.py:286-304)."""
        parts = [self._safe(a.get("title", "")) for a in
                 page.get("ancestors", [])]
        parts.append(self._safe(page.get("title", "page")) + ".md")
        return "/".join(parts)

    async def list_files(self, source) -> list[RemoteFile]:
        loop = asyncio.get_running_loop()
        pages = await loop.run_in_executor(None, self._pages, source)
        base = source.confluence_url.rstrip("/")
        self._content = {}
        out = []
        for page in pages:
            rel = self._page_path(page)
            html = (page.get("body", {}).get("storage", {})
                    .get("value", ""))
            md = f"# {page.get('title', '')}\n\n" + html_to_markdown(html)
            self._content[rel] = md
            version = page.get("version", {})
            created = (page.get("history", {}) or {}).get("createdDate", "")
            webui = (page.get("_links", {}) or {}).get("webui", "")
            out.append(RemoteFile(
                remote_path=rel, size=len(md.encode()),
                modified_at=version.get("when", ""), created_at=created,
                source_url=f"{base}{webui}" if webui else None))
        return out

    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        local_path.write_text(self._content[remote_path], encoding="utf-8")

    @staticmethod
    def list_spaces(source) -> list[dict]:
        base = source.confluence_url.rstrip("/")
        resp = httpx.get(f"{base}/rest/api/space",
                         headers=ConfluenceConnector()._auth_headers(source),
                         params={"limit": 100}, timeout=30)
        resp.raise_for_status()
        return resp.json().get("results", [])
