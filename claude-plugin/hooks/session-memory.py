#!/usr/bin/env python3
"""SessionEnd hook: save the session transcript as an Anamnesis memory.

Reference contract (claude-plugin/hooks/session-memory.py:1-222): read the
hook payload from stdin, summarize the transcript, POST it to the MCP
``create_memory`` tool; NEVER fail the session on errors (13-14)."""

from __future__ import annotations

import json
import os
import sys
import urllib.request

MCP_URL = os.environ.get("VOITTA_MCP_URL", "http://localhost:8000/mcp/mcp")
USER = os.environ.get("VOITTA_USER", os.environ.get("USER", "claude"))
MAX_CHARS = 8000


def main() -> int:
    try:
        payload = json.load(sys.stdin)
    except Exception:
        return 0  # never fail the session

    transcript_path = payload.get("transcript_path")
    lines: list[str] = []
    if transcript_path and os.path.exists(transcript_path):
        try:
            with open(transcript_path) as f:
                for raw in f:
                    try:
                        entry = json.loads(raw)
                    except json.JSONDecodeError:
                        continue
                    msg = entry.get("message") or {}
                    role = msg.get("role") or entry.get("type")
                    content = msg.get("content")
                    if isinstance(content, list):
                        content = " ".join(
                            c.get("text", "") for c in content
                            if isinstance(c, dict) and c.get("type") == "text")
                    if role in ("user", "assistant") and content:
                        lines.append(f"{role}: {content[:400]}")
        except OSError:
            pass

    if not lines:
        return 0
    body = "\n".join(lines)[-MAX_CHARS:]
    content = (f"Claude Code session summary "
               f"({payload.get('session_id', 'unknown')}):\n{body}")
    req = urllib.request.Request(
        MCP_URL,
        data=json.dumps({
            "jsonrpc": "2.0", "id": 1, "method": "tools/call",
            "params": {"name": "create_memory",
                       "arguments": {"content": content}},
        }).encode(),
        headers={"Content-Type": "application/json",
                 "Accept": "application/json",
                 "X-User-Name": USER})
    try:
        urllib.request.urlopen(req, timeout=15).read()
    except Exception:
        pass  # never fail the session
    return 0


if __name__ == "__main__":
    sys.exit(main())
