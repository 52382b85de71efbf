#!/usr/bin/env python3
"""Import Claude Code history as Anamnesis memories (reference
scripts/import_claude_history.py:1-268 contract): parse
``~/.claude/history.jsonl``, group entries by session, filter by
project/date/keyword, create one memory per session via the MCP HTTP API."""

from __future__ import annotations

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import argparse
import json
import sys
from collections import defaultdict
from datetime import datetime, timezone
from pathlib import Path

import httpx


def load_sessions(history_path: Path, project: str | None,
                  since: str | None, keyword: str | None) -> dict[str, list]:
    sessions: dict[str, list] = defaultdict(list)
    since_ts = None
    if since:
        since_ts = datetime.fromisoformat(since).replace(
            tzinfo=timezone.utc).timestamp()
    with open(history_path) as f:
        for line in f:
            try:
                entry = json.loads(line)
            except json.JSONDecodeError:
                continue
            if project and project not in (entry.get("cwd") or
                                           entry.get("project") or ""):
                continue
            ts = entry.get("timestamp") or entry.get("ts") or 0
            if isinstance(ts, str):
                try:
                    ts = datetime.fromisoformat(
                        ts.replace("Z", "+00:00")).timestamp()
                except ValueError:
                    ts = 0
            if ts and ts > 1e12:
                ts = ts / 1000.0
            if since_ts and ts and ts < since_ts:
                continue
            text = entry.get("display") or entry.get("prompt") or ""
            if keyword and keyword.lower() not in text.lower():
                continue
            sid = entry.get("sessionId") or entry.get("session_id") or "unknown"
            sessions[sid].append((ts, text))
    return sessions


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--history", default="~/.claude/history.jsonl")
    ap.add_argument("--mcp-url", default="http://localhost:8000/mcp/mcp")
    ap.add_argument("--user", required=True)
    ap.add_argument("--project", help="filter: project path substring")
    ap.add_argument("--since", help="filter: ISO date lower bound")
    ap.add_argument("--keyword", help="filter: keyword substring")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    history = Path(args.history).expanduser()
    if not history.exists():
        print(f"history file not found: {history}", file=sys.stderr)
        return 1
    sessions = load_sessions(history, args.project, args.since, args.keyword)
    print(f"{len(sessions)} sessions matched")

    for sid, entries in sessions.items():
        entries.sort()
        body = "\n".join(f"- {text}" for _, text in entries if text)
        if not body:
            continue
        content = f"Claude Code session {sid}:\n{body}"
        if args.dry_run:
            print(f"[dry-run] session {sid}: {len(entries)} prompts")
            continue
        resp = httpx.post(args.mcp_url, json={
            "jsonrpc": "2.0", "id": 1, "method": "tools/call",
            "params": {"name": "create_memory",
                       "arguments": {"content": content}},
        }, headers={"X-User-Name": args.user,
                    "Accept": "application/json"}, timeout=60)
        ok = resp.status_code == 200 and not resp.json().get(
            "result", {}).get("isError")
        print(f"session {sid}: {'ok' if ok else 'FAILED'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
