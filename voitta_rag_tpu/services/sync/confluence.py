"""Confluence connector (reference services/sync/confluence.py).

Behavior contract: Cloud (email+token basic auth, ``{url}/wiki/rest/api``)
vs Server (bearer PAT, ``{url}/rest/api``) variants (reference 240-247);
single / comma-list / ``*`` (all) space selection (319-333); paginated
space page listing with ancestors (249-283); **page-hierarchy paths** —
each page lands at ``pages/<ancestor-titles...>/<id>-<title>.md`` so the
space's tree structure becomes folder structure (286-304); version-based
change detection (the page version number is an exact revision marker);
storage-format HTML converted to markdown.
"""

from __future__ import annotations

import asyncio
import logging
from pathlib import Path

import httpx

from voitta_rag_tpu.services.parsers.html_utils import html_to_markdown
from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile

logger = logging.getLogger(__name__)


class ConfluenceConnector(BaseSyncConnector):
    @staticmethod
    def _is_cloud(source) -> bool:
        if source.confluence_auth_method:
            return source.confluence_auth_method == "cloud"
        return "atlassian.net" in (source.confluence_url or "")

    def _api_base(self, source) -> str:
        base = source.confluence_url.rstrip("/")
        # Cloud mounts the API under /wiki; Server/Data Center at the root.
        return f"{base}/wiki/rest/api" if self._is_cloud(source) \
            else f"{base}/rest/api"

    def _auth_headers(self, source) -> dict:
        if self._is_cloud(source) and source.confluence_email:
            import base64

            cred = base64.b64encode(
                f"{source.confluence_email}:{source.confluence_token}"
                .encode()).decode()
            return {"Authorization": f"Basic {cred}"}
        return {"Authorization": f"Bearer {source.confluence_token}"}

    def _space_keys(self, source) -> list[str]:
        val = (source.confluence_space or "").strip()
        if not val:
            raise ValueError("Confluence space not configured")
        if val == "*":
            return [s["key"] for s in self.list_spaces(source)]
        if "," in val:
            return [k.strip() for k in val.split(",") if k.strip()]
        return [val]

    def _pages(self, source, space: str) -> list[dict]:
        api = self._api_base(source)
        pages = []
        start = 0
        while True:
            resp = httpx.get(
                f"{api}/content",
                headers=self._auth_headers(source),
                params={"spaceKey": space, "type": "page", "start": start,
                        "limit": 50,
                        "expand": "body.storage,ancestors,version,history"},
                timeout=60)
            if resp.status_code == 401:
                raise RuntimeError(
                    "Confluence authentication failed; check the token")
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

    def _page_path(self, page: dict, prefix: str) -> str:
        """Hierarchy path from ancestors, id-prefixed leaf for stable lookup
        across renames (reference confluence.py:286-304)."""
        parts = [self._safe(a.get("title", "")) for a in
                 page.get("ancestors", []) if a.get("title")]
        pid = page.get("id", "0")
        parts.append(f"{pid}-{self._safe(page.get('title', 'page'))}.md")
        return f"pages/{prefix}" + "/".join(parts)

    async def list_files(self, source) -> list[RemoteFile]:
        loop = asyncio.get_running_loop()
        spaces = await loop.run_in_executor(None, self._space_keys, source)
        base = source.confluence_url.rstrip("/")
        self._content = {}
        out = []
        for space in spaces:
            pages = await loop.run_in_executor(None, self._pages, source,
                                               space)
            # ALWAYS space-prefixed: keying the layout on how many spaces the
            # config currently resolves to would re-path (and re-index) every
            # page when an admin adds a second space or uses '*'.
            prefix = f"{space}/"
            for page in pages:
                rel = self._page_path(page, prefix)
                html = (page.get("body", {}).get("storage", {})
                        .get("value", ""))
                md = f"# {page.get('title', '')}\n\n" + html_to_markdown(html)
                self._content[rel] = md
                version = page.get("version", {}) or {}
                created = (page.get("history", {}) or {}).get(
                    "createdDate", "")
                webui = (page.get("_links", {}) or {}).get("webui", "")
                out.append(RemoteFile(
                    remote_path=rel, size=len(md.encode()),
                    modified_at=version.get("when", ""), created_at=created,
                    source_url=f"{base}{webui}" if webui else None,
                    remote_rev=f"{version.get('number', 0)}:"
                               f"{version.get('when', '')}"))
        return out

    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        local_path.write_text(self._content[remote_path], encoding="utf-8")

    @staticmethod
    def list_spaces(source) -> list[dict]:
        conn = ConfluenceConnector()
        resp = httpx.get(f"{conn._api_base(source)}/space",
                         headers=conn._auth_headers(source),
                         params={"limit": 100}, timeout=30)
        resp.raise_for_status()
        return resp.json().get("results", [])
