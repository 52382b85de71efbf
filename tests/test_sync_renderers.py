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
