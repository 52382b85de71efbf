"""Connector listing/rendering contracts with mocked HTTP: Azure DevOps,
Box, Google Drive, Teams transcript shortcuts.

(Reference behaviors: services/sync/azure_devops.py work items + wiki trees,
box.py recursive folder walk, google_drive.py Workspace-doc exports,
teams_transcripts.py .url shortcut parsing.)
"""

import asyncio
from types import SimpleNamespace

import httpx
import pytest


class FakeResp:
    def __init__(self, payload, status=200):
        self._payload = payload
        self.status_code = status

    def json(self):
        return self._payload

    def raise_for_status(self):
        if self.status_code >= 400:
            raise httpx.HTTPStatusError("err", request=None, response=None)


# ---------------------------------------------------------------------------
# Azure DevOps
# ---------------------------------------------------------------------------

def test_ado_work_item_render():
    from voitta_rag_tpu.services.sync.azure_devops import render_work_item

    item = {"id": 7, "fields": {
        "System.Title": "Fix the flux capacitor",
        "System.WorkItemType": "Bug", "System.State": "Active",
        "System.AssignedTo": {"displayName": "Doc Brown"},
        "System.AreaPath": "proj\\hardware",
        "System.CreatedDate": "2026-01-01", "System.ChangedDate": "2026-02-01",
        "System.Description": "<p>It <b>stopped</b> fluxing</p>",
    }}
    md = render_work_item(item, "https://dev.azure.com/org/proj")
    assert "# Work Item 7: Fix the flux capacitor" in md
    assert "- **State:** Active" in md
    assert "Doc Brown" in md
    assert "https://dev.azure.com/org/proj/_workitems/edit/7" in md
    assert "stopped" in md and "<p>" not in md


def test_ado_list_files_work_items_and_wiki(monkeypatch):
    from voitta_rag_tpu.services.sync.azure_devops import AzureDevOpsConnector

    monkeypatch.setattr(AzureDevOpsConnector, "_token", lambda self, s: "tok")

    def fake_post(url, **kw):
        assert "/_apis/wit/wiql" in url
        return FakeResp({"workItems": [{"id": 1}, {"id": 2}]})

    def fake_get(url, **kw):
        params = kw.get("params", {})
        if "/_apis/wit/workitems" in url:
            ids = params["ids"].split(",")
            return FakeResp({"value": [
                {"id": int(i), "fields": {"System.Title": f"Item {i}",
                                          "System.ChangedDate": "2026-01-02"}}
                for i in ids]})
        if url.endswith("/_apis/wiki/wikis?api-version=7.0"):
            return FakeResp({"value": [{"id": "w1", "name": "TeamWiki"}]})
        if "/wikis/w1/pages" in url and params.get("includeContent") == "false":
            return FakeResp({"path": "/",
                             "subPages": [{"path": "/Home", "subPages": []}]})
        if "/wikis/w1/pages" in url:
            content = "# Home page" if params.get("path") == "/Home" else ""
            return FakeResp({"content": content})
        raise AssertionError(f"unexpected GET {url}")

    monkeypatch.setattr(httpx, "post", fake_post)
    monkeypatch.setattr(httpx, "get", fake_get)

    conn = AzureDevOpsConnector()
    src = SimpleNamespace(ado_url=None, ado_organization="org",
                          ado_project="proj", folder_path="f")
    files = asyncio.run(conn.list_files(src))
    paths = {f.remote_path for f in files}
    assert paths == {"work_items/1.md", "work_items/2.md",
                     "wiki/TeamWiki/Home.md"}
    by_path = {f.remote_path: f for f in files}
    assert by_path["work_items/1.md"].source_url.endswith("/_workitems/edit/1")

    # download_file serves the rendered markdown collected during listing
    import tempfile
    from pathlib import Path
    with tempfile.TemporaryDirectory() as d:
        target = Path(d) / "x.md"
        asyncio.run(conn.download_file(src, "wiki/TeamWiki/Home.md", target))
        assert target.read_text() == "# Home page"


# ---------------------------------------------------------------------------
# Box
# ---------------------------------------------------------------------------

def test_box_recursive_walk(monkeypatch):
    from voitta_rag_tpu.services.sync.box import BoxConnector

    monkeypatch.setattr(BoxConnector, "_access_token", lambda self, s: "tok")

    def fake_get(url, **kw):
        if "/folders/0/items" in url:
            return FakeResp({"total_count": 2, "entries": [
                {"type": "folder", "id": "f1", "name": "sub"},
                {"type": "file", "id": "a1", "name": "a.txt", "size": 5,
                 "modified_at": "2026-01-01T00:00:00Z",
                 "created_at": "2025-12-01T00:00:00Z"},
            ]})
        if "/folders/f1/items" in url:
            return FakeResp({"total_count": 1, "entries": [
                {"type": "file", "id": "b2", "name": "b.md", "size": 9,
                 "modified_at": "2026-02-02T00:00:00Z"},
            ]})
        raise AssertionError(f"unexpected GET {url}")

    monkeypatch.setattr(httpx, "get", fake_get)

    conn = BoxConnector()
    src = SimpleNamespace(box_folder_id=None, folder_path="f")
    files = asyncio.run(conn.list_files(src))
    by_path = {f.remote_path: f for f in files}
    assert set(by_path) == {"sub/b.md", "a.txt"}
    assert by_path["a.txt"].size == 5
    assert conn._ids == {"sub/b.md": "b2", "a.txt": "a1"}


# ---------------------------------------------------------------------------
# Google Drive
# ---------------------------------------------------------------------------

def test_gdrive_listing_exports_workspace_docs(monkeypatch):
    from voitta_rag_tpu.services.sync.google_drive import GoogleDriveConnector

    monkeypatch.setattr(GoogleDriveConnector, "_access_token",
                        lambda self, s: "tok")

    def fake_get(url, **kw):
        q = kw.get("params", {}).get("q", "")
        if "'root' in parents" in q:
            return FakeResp({"files": [
                {"id": "d1", "name": "docs",
                 "mimeType": "application/vnd.google-apps.folder"},
                {"id": "r1", "name": "report.pdf", "size": "100",
                 "mimeType": "application/pdf",
                 "modifiedTime": "2026-01-01T00:00:00Z",
                 "webViewLink": "https://drive.google.com/file/d/r1/view"},
            ]})
        if "'d1' in parents" in q:
            return FakeResp({"files": [
                {"id": "g1", "name": "Spec",
                 "mimeType": "application/vnd.google-apps.document",
                 "modifiedTime": "2026-03-01T00:00:00Z"},
            ]})
        raise AssertionError(f"unexpected query {q}")

    monkeypatch.setattr(httpx, "get", fake_get)

    conn = GoogleDriveConnector()
    src = SimpleNamespace(gd_service_account_json=None, gd_folder_id=None,
                          folder_path="f")
    files = asyncio.run(conn.list_files(src))
    by_path = {f.remote_path: f for f in files}
    # Workspace doc exported with .txt suffix + canonical docs URL
    assert set(by_path) == {"docs/Spec.txt", "report.pdf"}
    assert by_path["docs/Spec.txt"].source_url == \
        "https://docs.google.com/document/d/g1/edit"
    assert by_path["report.pdf"].source_url.endswith("/r1/view")
    assert conn._meta["docs/Spec.txt"]["export"] == "text/plain"
    assert conn._meta["report.pdf"]["export"] is None


# ---------------------------------------------------------------------------
# Teams transcript shortcuts
# ---------------------------------------------------------------------------

def test_teams_parse_url_shortcut(tmp_path):
    from voitta_rag_tpu.services.sync.teams_transcripts import (
        _MEETING_RE, parse_url_shortcut)

    p = tmp_path / "meeting.url"
    p.write_text("[InternetShortcut]\n"
                 "URL=https://teams.microsoft.com/l/meetup-join/"
                 "19%3ameeting_abc%40thread.v2/0?context=x\n")
    url = parse_url_shortcut(p)
    assert url and url.startswith("https://teams.microsoft.com/l/meetup-join/")
    m = _MEETING_RE.search(url)
    assert m and m.group(1) == "19%3ameeting_abc%40thread.v2"

    # malformed shortcut degrades to None, not an exception
    bad = tmp_path / "bad.url"
    bad.write_text("not an ini file [[[")
    assert parse_url_shortcut(bad) is None
