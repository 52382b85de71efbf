"""Connector document renderers: Jira issues (ADF), Glue table data
dictionaries, Confluence HTML→markdown — pure functions, sample payloads."""

from voitta_rag_tpu.services.parsers.html_utils import html_to_markdown
from voitta_rag_tpu.services.sync.glue_catalog import render_table
from voitta_rag_tpu.services.sync.jira import _adf_to_text, render_issue


def test_jira_render_issue_full():
    issue = {
        "key": "PROJ-42",
        "fields": {
            "summary": "Fix the flux capacitor",
            "issuetype": {"name": "Bug"},
            "status": {"name": "In Progress"},
            "priority": {"name": "High"},
            "assignee": {"displayName": "Ada"},
            "reporter": {"displayName": "Bob"},
            "created": "2026-01-01T00:00:00Z",
            "updated": "2026-01-02T00:00:00Z",
            "labels": ["power", "urgent"],
            "description": {
                "type": "doc",
                "content": [
                    {"type": "paragraph", "content": [
                        {"type": "text", "text": "It needs "},
                        {"type": "text", "text": "1.21 gigawatts."}]},
                ],
            },
            "comment": {"comments": [{
                "author": {"displayName": "Doc"},
                "created": "2026-01-03",
                "body": {"type": "doc", "content": [
                    {"type": "paragraph", "content": [
                        {"type": "text", "text": "Great Scott!"}]}]},
            }]},
        },
    }
    md = render_issue(issue, "https://jira.example.com")
    assert md.startswith("# PROJ-42: Fix the flux capacitor")
    assert "- **Type:** Bug" in md
    assert "- **Labels:** power, urgent" in md
    assert "https://jira.example.com/browse/PROJ-42" in md
    assert "It needs 1.21 gigawatts." in md
    assert "**Doc** (2026-01-03):" in md
    assert "Great Scott!" in md


def test_adf_to_text_variants():
    assert _adf_to_text(None) == ""
    assert _adf_to_text("plain server-style text") == "plain server-style text"
    adf = {"type": "doc", "content": [
        {"type": "heading", "content": [{"type": "text", "text": "H"}]},
        {"type": "bulletList", "content": [
            {"type": "listItem", "content": [
                {"type": "paragraph", "content": [
                    {"type": "text", "text": "item one"}]}]},
        ]},
    ]}
    text = _adf_to_text(adf)
    assert "H" in text and "item one" in text


def test_glue_render_table():
    table = {
        "Name": "events",
        "Description": "Clickstream events",
        "UpdateTime": "2026-05-01 12:00:00",
        "StorageDescriptor": {
            "Location": "s3://bucket/events/",
            "Columns": [
                {"Name": "user_id", "Type": "bigint", "Comment": "who"},
                {"Name": "ts", "Type": "timestamp", "Comment": ""},
            ],
        },
        "PartitionKeys": [{"Name": "dt", "Type": "string"}],
    }
    md = render_table("analytics", table)
    assert md.startswith("# Table: analytics.events")
    assert "Clickstream events" in md
    assert "s3://bucket/events/" in md
    assert "| user_id | bigint | who |" in md
    assert "- dt (string)" in md


def test_confluence_html_to_markdown():
    html = ("<h1>Title</h1><p>Some <b>bold</b> and <i>italic</i> text with "
            "a <a href='https://x.example'>link</a>.</p>"
            "<ul><li>alpha</li><li>beta</li></ul>"
            "<pre><code>print('hi')</code></pre>")
    md = html_to_markdown(html)
    assert "# Title" in md
    assert "**bold**" in md
    assert "alpha" in md and "beta" in md
    assert "print('hi')" in md


def test_jira_render_board_with_sprints():
    from voitta_rag_tpu.services.sync.jira import render_board

    board = {"id": 7, "name": "Team Alpha", "type": "scrum"}
    sprints = [
        {"name": "Sprint 1", "state": "closed",
         "startDate": "2026-01-01T09:00:00.000Z",
         "endDate": "2026-01-14T17:00:00.000Z", "goal": "Ship | it"},
        {"name": "Sprint 2", "state": "active"},
    ]
    md = render_board(board, sprints, "ALPHA")
    assert "# Board: Team Alpha" in md
    assert "| ID | 7 |" in md
    assert "| Type | scrum |" in md
    assert "| Project | ALPHA |" in md
    assert "## Sprints" in md
    assert "| Sprint 1 | closed | 2026-01-01 | 2026-01-14 | Ship / it |" in md
    assert "| Sprint 2 | active |  |  |  |" in md


def test_jira_render_board_kanban_no_sprints():
    from voitta_rag_tpu.services.sync.jira import render_board

    md = render_board({"id": 3, "name": "KB", "type": "kanban"}, [], "*")
    assert "## Sprints" not in md
    assert "| Type | kanban |" in md


def test_jira_render_sprint_with_issues():
    from voitta_rag_tpu.services.sync.jira import render_sprint

    sprint = {"id": 42, "name": "Sprint 9", "state": "closed",
              "startDate": "2026-02-01T00:00:00Z",
              "endDate": "2026-02-14T00:00:00Z",
              "completeDate": "2026-02-15T00:00:00Z",
              "goal": "Finish the migration"}
    issues = [
        {"key": "AL-1", "fields": {
            "summary": "Fix | pipe", "status": {"name": "Done"},
            "issuetype": {"name": "Bug"},
            "assignee": {"displayName": "Sam"}}},
        {"key": "AL-2", "fields": {"summary": "Docs", "status": None,
                                   "issuetype": None, "assignee": None}},
    ]
    md = render_sprint(sprint, "Team Alpha", issues)
    assert "# Sprint: Sprint 9" in md
    assert "| Board | Team Alpha |" in md
    assert "| Completed | 2026-02-15 |" in md
    assert "## Goal" in md and "Finish the migration" in md
    assert "| AL-1 | Bug | Fix / pipe | Done | Sam |" in md
    assert "| AL-2 |  | Docs |  | Unassigned |" in md


def test_jira_list_files_includes_boards(monkeypatch):
    import asyncio
    from voitta_rag_tpu.services.sync.jira import JiraConnector

    class Src:
        jira_url = "https://example.atlassian.net"
        jira_project = "AL"
        jira_auth_method = "cloud"
        jira_email = "a@b.c"
        jira_token = "t"

    conn = JiraConnector()
    monkeypatch.setattr(conn, "_search", lambda s: [
        {"key": "AL-1", "fields": {"summary": "Hello", "updated": "u",
                                   "created": "c"}}])

    class Resp:
        def __init__(self, code, payload):
            self.status_code = code
            self._p = payload
        def json(self):
            return self._p

    calls = []

    def fake_get(url, **kw):
        calls.append(url)
        if url.endswith("/board"):
            return Resp(200, {"values": [
                {"id": 1, "name": "B One", "type": "scrum"}]})
        if url.endswith("/board/1/sprint"):
            return Resp(200, {"values": [{"id": 5, "name": "S5",
                                          "state": "active"}],
                              "isLast": True})
        if url.endswith("/sprint/5/issue"):
            return Resp(200, {"issues": [{"key": "AL-1", "fields": {
                "summary": "Hello", "status": {"name": "Open"},
                "issuetype": {"name": "Task"}, "assignee": None}}]})
        raise AssertionError(url)

    import voitta_rag_tpu.services.sync.jira as jira_mod
    monkeypatch.setattr(jira_mod.httpx, "get", fake_get)

    files = asyncio.run(conn.list_files(Src()))
    rels = [f.remote_path for f in files]
    assert "AL/AL-1.md" in rels
    assert "boards/1-B-One.md" in rels
    assert "sprints/5-S5.md" in rels
    assert "## Issues" in conn._content["sprints/5-S5.md"]


def test_jira_boards_degrade_gracefully(monkeypatch):
    import asyncio
    from voitta_rag_tpu.services.sync.jira import JiraConnector

    class Src:
        jira_url = "https://jira.corp"
        jira_project = "*"
        jira_auth_method = "server"
        jira_email = None
        jira_token = "pat"

    conn = JiraConnector()
    monkeypatch.setattr(conn, "_search", lambda s: [])

    class Resp:
        status_code = 404
        def json(self):
            return {}

    import voitta_rag_tpu.services.sync.jira as jira_mod
    monkeypatch.setattr(jira_mod.httpx, "get", lambda url, **kw: Resp())
    files = asyncio.run(conn.list_files(Src()))
    assert files == []  # no boards, no crash


def _conf_src(**kw):
    from types import SimpleNamespace
    base = dict(confluence_url="https://corp.atlassian.net",
                confluence_space="ENG", confluence_token="t",
                confluence_auth_method=None, confluence_email="a@b.c")
    base.update(kw)
    return SimpleNamespace(**base)


def test_confluence_api_base_cloud_vs_server():
    from voitta_rag_tpu.services.sync.confluence import ConfluenceConnector

    c = ConfluenceConnector()
    assert c._api_base(_conf_src()) == \
        "https://corp.atlassian.net/wiki/rest/api"
    assert c._api_base(_conf_src(confluence_url="https://wiki.corp",
                                 confluence_auth_method="server")) == \
        "https://wiki.corp/rest/api"
    # Explicit cloud method wins over URL heuristic.
    assert c._api_base(_conf_src(confluence_url="https://wiki.corp",
                                 confluence_auth_method="cloud")) == \
        "https://wiki.corp/wiki/rest/api"


def test_confluence_space_keys():
    from voitta_rag_tpu.services.sync.confluence import ConfluenceConnector

    c = ConfluenceConnector()
    assert c._space_keys(_conf_src()) == ["ENG"]
    assert c._space_keys(_conf_src(confluence_space="ENG, OPS")) == \
        ["ENG", "OPS"]


def test_confluence_hierarchy_paths(monkeypatch):
    import asyncio
    from voitta_rag_tpu.services.sync.confluence import ConfluenceConnector

    pages = [
        {"id": "100", "title": "Root Page", "ancestors": [],
         "body": {"storage": {"value": "<p>hello</p>"}},
         "version": {"number": 3, "when": "2026-01-01T00:00:00Z"},
         "history": {"createdDate": "2025-01-01T00:00:00Z"},
         "_links": {"webui": "/spaces/ENG/pages/100"}},
        {"id": "101", "title": "Child: Setup?",
         "ancestors": [{"id": "100", "title": "Root Page"}],
         "body": {"storage": {"value": "<p>child</p>"}},
         "version": {"number": 1, "when": ""}, "history": {}, "_links": {}},
    ]
    c = ConfluenceConnector()
    monkeypatch.setattr(c, "_pages", lambda src, space: pages)
    files = asyncio.run(c.list_files(_conf_src()))
    rels = [f.remote_path for f in files]
    assert rels[0] == "pages/ENG/100-Root Page.md"
    assert rels[1] == "pages/ENG/Root Page/101-Child_ Setup_.md"
    assert files[0].remote_rev == "3:2026-01-01T00:00:00Z"
    assert files[0].source_url == \
        "https://corp.atlassian.net/spaces/ENG/pages/100"
    assert "hello" in c._content[rels[0]]


def test_confluence_multi_space_prefix(monkeypatch):
    import asyncio
    from voitta_rag_tpu.services.sync.confluence import ConfluenceConnector

    c = ConfluenceConnector()
    monkeypatch.setattr(c, "_pages", lambda src, space: [
        {"id": "1", "title": f"Home {space}", "ancestors": [],
         "body": {"storage": {"value": ""}}, "version": {"number": 1},
         "history": {}, "_links": {}}])
    files = asyncio.run(c.list_files(_conf_src(confluence_space="ENG,OPS")))
    assert {f.remote_path for f in files} == \
        {"pages/ENG/1-Home ENG.md", "pages/OPS/1-Home OPS.md"}
