"""Jira connector (reference services/sync/jira.py): Cloud (email+token
basic auth) or Server (bearer PAT) variants (390-418); issues + agile boards
rendered to markdown (81-326, 453-618); multi-project or ``*``."""

from __future__ import annotations

import asyncio
import logging
from pathlib import Path

import httpx

from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile

logger = logging.getLogger(__name__)


def render_issue(issue: dict, base_url: str) -> str:
    f = issue.get("fields", {})
    key = issue.get("key", "")
    lines = [f"# {key}: {f.get('summary', '')}", ""]
    lines.append(f"- **Type:** {(f.get('issuetype') or {}).get('name')}")
    lines.append(f"- **Status:** {(f.get('status') or {}).get('name')}")
    lines.append(f"- **Priority:** {(f.get('priority') or {}).get('name')}")
    lines.append(f"- **Assignee:** "
                 f"{(f.get('assignee') or {}).get('displayName')}")
    lines.append(f"- **Reporter:** "
                 f"{(f.get('reporter') or {}).get('displayName')}")
    lines.append(f"- **Created:** {f.get('created')}")
    lines.append(f"- **Updated:** {f.get('updated')}")
    labels = ", ".join(f.get("labels") or [])
    if labels:
        lines.append(f"- **Labels:** {labels}")
    lines.append(f"- **URL:** {base_url}/browse/{key}")
    lines += ["", "## Description", "", _adf_to_text(f.get("description"))]
    comments = ((f.get("comment") or {}).get("comments") or [])
    if comments:
        lines += ["", "## Comments", ""]
        for c in comments:
            author = (c.get("author") or {}).get("displayName", "?")
            lines.append(f"**{author}** ({c.get('created', '')}):")
            lines.append(_adf_to_text(c.get("body")))
            lines.append("")
    return "\n".join(lines)


def _adf_to_text(body) -> str:
    """Flatten Atlassian Document Format (Cloud) or pass through strings."""
    if body is None:
        return ""
    if isinstance(body, str):
        return body
    out: list[str] = []

    def walk(node):
        if isinstance(node, dict):
            if node.get("type") == "text":
                out.append(node.get("text", ""))
            for child in node.get("content", []) or []:
                walk(child)
            if node.get("type") in ("paragraph", "heading", "listItem"):
                out.append("\n")
        elif isinstance(node, list):
            for n in node:
                walk(n)

    walk(body)
    return "".join(out).strip()


def _safe_name(name: str) -> str:
    return "".join(c if c.isalnum() or c in "-_. " else "_"
                   for c in name).strip().replace(" ", "-") or "unnamed"


def _cell(text) -> str:
    """Markdown-table-safe cell text."""
    return str(text or "").replace("|", "/").replace("\n", " ")


def render_board(board: dict, sprints: list[dict], project: str) -> str:
    """Board summary with a sprint table (reference jira.py:505-535)."""
    lines = [
        f"# Board: {board.get('name', '')}",
        "",
        "| Field | Value |",
        "|---|---|",
        f"| ID | {board.get('id')} |",
        f"| Type | {board.get('type', 'unknown')} |",
        f"| Project | {project} |",
        "",
    ]
    if sprints:
        lines += ["## Sprints", "",
                  "| Sprint | State | Start | End | Goal |",
                  "|---|---|---|---|---|"]
        for sp in sprints:
            lines.append(
                f"| {_cell(sp.get('name'))} | {_cell(sp.get('state'))} "
                f"| {(sp.get('startDate') or '')[:10]} "
                f"| {(sp.get('endDate') or '')[:10]} "
                f"| {_cell(sp.get('goal'))} |")
        lines.append("")
    return "\n".join(lines)


def render_sprint(sprint: dict, board_name: str, issues: list[dict]) -> str:
    """Sprint detail: metadata table, goal, issue table (reference
    jira.py:538-609)."""
    lines = [
        f"# Sprint: {sprint.get('name', '')}",
        "",
        "| Field | Value |",
        "|---|---|",
        f"| ID | {sprint.get('id')} |",
        f"| Board | {_cell(board_name)} |",
        f"| State | {_cell(sprint.get('state'))} |",
        f"| Start Date | {(sprint.get('startDate') or '')[:10]} |",
        f"| End Date | {(sprint.get('endDate') or '')[:10]} |",
    ]
    complete = (sprint.get("completeDate") or "")[:10]
    if complete:
        lines.append(f"| Completed | {complete} |")
    lines.append("")
    if sprint.get("goal"):
        lines += ["## Goal", "", sprint["goal"], ""]
    if issues:
        lines += ["## Issues", "",
                  "| Key | Type | Summary | Status | Assignee |",
                  "|---|---|---|---|---|"]
        for it in issues:
            f = it.get("fields", {})
            lines.append(
                f"| {it.get('key', '')} "
                f"| {_cell((f.get('issuetype') or {}).get('name'))} "
                f"| {_cell(f.get('summary'))} "
                f"| {_cell((f.get('status') or {}).get('name'))} "
                f"| {(f.get('assignee') or {}).get('displayName', 'Unassigned')} |")
        lines.append("")
    return "\n".join(lines)


class JiraConnector(BaseSyncConnector):
    def _auth_headers(self, source) -> dict:
        if source.jira_auth_method == "cloud" and source.jira_email:
            import base64

            cred = base64.b64encode(
                f"{source.jira_email}:{source.jira_token}".encode()).decode()
            return {"Authorization": f"Basic {cred}"}
        return {"Authorization": f"Bearer {source.jira_token}"}

    def _search(self, source) -> list[dict]:
        base = source.jira_url.rstrip("/")
        project = source.jira_project or "*"
        jql = "" if project in ("*", "") else f"project = {project}"
        issues = []
        start = 0
        while True:
            resp = httpx.get(
                f"{base}/rest/api/3/search",
                headers=self._auth_headers(source),
                params={"jql": jql, "startAt": start, "maxResults": 100,
                        "fields": "*all"},
                timeout=60)
            if resp.status_code == 404:  # Server API fallback
                resp = httpx.get(
                    f"{base}/rest/api/2/search",
                    headers=self._auth_headers(source),
                    params={"jql": jql, "startAt": start, "maxResults": 100,
                            "fields": "*all"}, timeout=60)
            resp.raise_for_status()
            data = resp.json()
            issues.extend(data.get("issues", []))
            start += len(data.get("issues", []))
            if start >= data.get("total", 0) or not data.get("issues"):
                return issues

    def _boards(self, source) -> list[tuple[str, str, dict]]:
        """(rel_path, markdown, meta) for boards + sprints via the Agile API
        (reference jira.py:453-615). Degrades to [] when the Agile API is
        absent (Server without Jira Software, or permission-denied)."""
        base = source.jira_url.rstrip("/")
        agile = f"{base}/rest/agile/1.0"
        headers = self._auth_headers(source)
        params = {"maxResults": 50}
        project = (source.jira_project or "").strip()
        if project and project != "*" and "," not in project:
            params["projectKeyOrId"] = project
        try:
            resp = httpx.get(f"{agile}/board", params=params, headers=headers,
                             timeout=60)
        except httpx.HTTPError as e:
            logger.warning("Agile board API unreachable: %s", e)
            return []
        if resp.status_code != 200:
            logger.warning("Agile board API unavailable (%s)",
                           resp.status_code)
            return []
        out = []
        seen_sprints: set = set()
        for board in resp.json().get("values", []):
            bid = board.get("id")
            bname = board.get("name", f"Board-{bid}")
            sprints: list[dict] = []
            start = 0
            while True:  # Kanban boards may not support sprints (non-200)
                sp = httpx.get(f"{agile}/board/{bid}/sprint",
                               params={"startAt": start, "maxResults": 50},
                               headers=headers, timeout=60)
                if sp.status_code != 200:
                    break
                data = sp.json()
                batch = data.get("values", [])
                sprints.extend(batch)
                if data.get("isLast", True) or not batch:
                    break
                start += len(batch)
            out.append((f"boards/{bid}-{_safe_name(bname)}.md",
                        render_board(board, sprints, project or "*"),
                        {"url": f"{base}/secure/RapidBoard.jspa?rapidView={bid}"}))
            for spr in sprints:
                sid = spr.get("id")
                if sid in seen_sprints:
                    # Boards are saved filters, so one sprint commonly shows
                    # on several boards; emitting it once per board would
                    # flip-flop the file content (board name differs) and
                    # re-download + re-index it every sync. First board wins.
                    continue
                seen_sprints.add(sid)
                issues = []
                try:
                    ir = httpx.get(
                        f"{agile}/sprint/{sid}/issue",
                        params={"maxResults": 200,
                                "fields": "key,summary,status,assignee,"
                                          "issuetype"},
                        headers=headers, timeout=60)
                    if ir.status_code == 200:
                        issues = ir.json().get("issues", [])
                except httpx.HTTPError as e:
                    logger.warning("sprint %s issues failed: %s", sid, e)
                out.append((
                    f"sprints/{sid}-{_safe_name(spr.get('name', str(sid)))}.md",
                    render_sprint(spr, bname, issues),
                    {"url": f"{base}/secure/RapidBoard.jspa?rapidView={bid}"
                            f"&sprint={sid}"}))
        return out

    async def list_files(self, source) -> list[RemoteFile]:
        loop = asyncio.get_running_loop()
        issues = await loop.run_in_executor(None, self._search, source)
        base = source.jira_url.rstrip("/")
        self._content = {}
        out = []
        for issue in issues:
            key = issue.get("key", "unknown")
            project = key.split("-")[0]
            rel = f"{project}/{key}.md"
            content = render_issue(issue, base)
            self._content[rel] = content
            f = issue.get("fields", {})
            out.append(RemoteFile(
                remote_path=rel, size=len(content.encode()),
                modified_at=f.get("updated", ""),
                created_at=f.get("created", ""),
                source_url=f"{base}/browse/{key}"))
        if getattr(source, "jira_sync_boards", True):
            for rel, content, meta in await loop.run_in_executor(
                    None, self._boards, source):
                self._content[rel] = content
                out.append(RemoteFile(
                    remote_path=rel, size=len(content.encode()),
                    modified_at="", created_at="",
                    source_url=meta.get("url", "")))
        return out

    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        local_path.write_text(self._content[remote_path], encoding="utf-8")

    @staticmethod
    def list_projects(source) -> list[dict]:
        """Helper lookup (reference api/routes/sync.py jira projects)."""
        base = source.jira_url.rstrip("/")
        resp = httpx.get(f"{base}/rest/api/3/project/search",
                         headers=JiraConnector()._auth_headers(source),
                         timeout=30)
        if resp.status_code == 404:
            resp = httpx.get(f"{base}/rest/api/2/project",
                             headers=JiraConnector()._auth_headers(source),
                             timeout=30)
            resp.raise_for_status()
            return resp.json()
        resp.raise_for_status()
        return resp.json().get("values", [])
