#!/usr/bin/env bash
# Register the voitta-rag-tpu MCP server with Claude Code
# (reference claude-plugin/setup.sh contract: writes the server entry into
# ~/.claude.json with the X-User-Name header; optionally installs the
# SessionEnd memory hook).
set -euo pipefail

BASE_URL="${VOITTA_BASE_URL:-http://localhost:8000}"
USER_NAME="${VOITTA_USER:-${USER:-claude}}"
CLAUDE_JSON="${HOME}/.claude.json"
INSTALL_HOOK="${1:-}"

echo "Registering voitta-rag MCP server (${BASE_URL}/mcp/mcp) as '${USER_NAME}'"

python3 - "$CLAUDE_JSON" "$BASE_URL" "$USER_NAME" <<'PY'
import json, sys, os
path, base_url, user = sys.argv[1:4]
data = {}
if os.path.exists(path):
    with open(path) as f:
        data = json.load(f)
servers = data.setdefault("mcpServers", {})
servers["voitta-rag"] = {
    "type": "http",
    "url": f"{base_url}/mcp/mcp",
    "headers": {"X-User-Name": user},
}
with open(path, "w") as f:
    json.dump(data, f, indent=2)
print(f"wrote {path}")
PY

if [ "$INSTALL_HOOK" = "--with-session-hook" ]; then
  SETTINGS="${HOME}/.claude/settings.json"
  HOOK_PATH="$(cd "$(dirname "$0")" && pwd)/hooks/session-memory.py"
  mkdir -p "${HOME}/.claude"
  python3 - "$SETTINGS" "$HOOK_PATH" <<'PY'
import json, sys, os
path, hook = sys.argv[1:3]
data = {}
if os.path.exists(path):
    with open(path) as f:
        data = json.load(f)
hooks = data.setdefault("hooks", {})
entries = hooks.setdefault("SessionEnd", [])
cmd = {"type": "command", "command": f"python3 {hook}"}
if not any(h.get("hooks", [{}])[0].get("command") == cmd["command"]
           for h in entries if h.get("hooks")):
    entries.append({"hooks": [cmd]})
with open(path, "w") as f:
    json.dump(data, f, indent=2)
print(f"installed SessionEnd hook in {path}")
PY
fi

echo "done"
