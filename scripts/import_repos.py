#!/usr/bin/env python3
"""Bulk repo import (reference scripts/import_repos.py:30-228 contract).

Reads a JSON config of hosts/auth + folders of repos, then for each repo:
create the folder, configure the github sync source, auto-detect the branch,
enable indexing, trigger the sync, and poll until it finishes — all against
the running HTTP API.

Config format (reference README.md:402-411):
{
  "base_url": "http://localhost:8000",
  "user": "importer",
  "hosts": {"github.com": {"auth_method": "token", "username": "x",
                            "pat": "..."}},
  "folders": {"repos/team-a": ["org/repo1", "org/repo2@main"]}
}
"""

from __future__ import annotations

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import argparse
import json
import sys
import time

import httpx


def api(client: httpx.Client, method: str, path: str, **kw):
    resp = client.request(method, path, **kw)
    if resp.status_code >= 400:
        raise RuntimeError(f"{method} {path} -> {resp.status_code}: "
                           f"{resp.text[:300]}")
    # Non-JSON responses (e.g. the select-user 302 redirect body) are not
    # parsed — callers only consume JSON payloads.
    ctype = resp.headers.get("content-type", "")
    if resp.content and ctype.startswith("application/json"):
        return resp.json()
    return {}


def import_repo(client: httpx.Client, folder: str, repo_spec: str,
                host_auth: dict) -> None:
    repo, _, branch = repo_spec.partition("@")
    name = repo.rsplit("/", 1)[-1]
    target = f"{folder}/{name}"
    print(f"==> {repo} -> {target}")

    try:
        api(client, "POST", "/api/folders",
            json={"path": folder, "name": name})
    except RuntimeError as e:
        if "409" not in str(e):
            raise
    body = {
        "source_type": "github", "gh_repo": repo,
        "gh_auth_method": host_auth.get("auth_method", "token"),
        "gh_username": host_auth.get("username"),
        "gh_pat": host_auth.get("pat"),
        "gh_token": host_auth.get("ssh_key"),
    }
    if branch:
        body["gh_branch"] = branch
    api(client, "PUT", f"/api/sync/{target}", json=body)
    if not branch:
        try:
            branches = api(client, "GET",
                           f"/api/sync/{target}/branches")["branches"]
            default = "main" if "main" in branches else (
                "master" if "master" in branches else branches[0])
            api(client, "PUT", f"/api/sync/{target}",
                json={"source_type": "github", "gh_branch": default})
        except (RuntimeError, IndexError):
            print("   branch auto-detect failed; using connector default")

    api(client, "POST", f"/api/settings/folders/{target}/indexing",
        json={"enabled": True})
    api(client, "POST", f"/api/sync/{target}/trigger")
    while True:
        time.sleep(5)
        status = api(client, "GET", f"/api/sync/{target}")
        if status["sync_status"] in ("synced", "error"):
            print(f"   sync {status['sync_status']}"
                  + (f": {status['sync_error']}" if status.get("sync_error")
                     else ""))
            break


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="JSON import config")
    args = ap.parse_args()
    cfg = json.loads(open(args.config).read())
    base = cfg.get("base_url", "http://localhost:8000")
    with httpx.Client(base_url=base, timeout=60,
                      cookies={"voitta_user": cfg.get("user", "importer")}) as client:
        api(client, "POST", "/select-user",
            data={"username": cfg.get("user", "importer")})
        for folder, repos in cfg.get("folders", {}).items():
            for repo_spec in repos:
                host = repo_spec.split("/")[0] if "://" in repo_spec else "github.com"
                host_auth = cfg.get("hosts", {}).get(host, {})
                try:
                    import_repo(client, folder, repo_spec, host_auth)
                except RuntimeError as e:
                    print(f"   FAILED: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
