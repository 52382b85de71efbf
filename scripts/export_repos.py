#!/usr/bin/env python3
"""Repo export (reference scripts/export_repos.py:1-280 contract): walk the
configured sync sources and dump github sources back into the import-config
JSON format, secrets stripped."""

from __future__ import annotations

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", "-o", default="-")
    args = ap.parse_args()

    from voitta_rag_tpu.db.database import get_db

    db = get_db()
    folders: dict[str, list[str]] = {}
    hosts: dict[str, dict] = {}
    for src in db.list_sync_sources():
        if src.source_type != "github" or not src.gh_repo:
            continue
        parent = src.folder_path.rsplit("/", 1)[0] if "/" in src.folder_path \
            else ""
        spec = src.gh_repo + (f"@{src.gh_branch}" if src.gh_branch else "")
        folders.setdefault(parent, []).append(spec)
        hosts.setdefault("github.com", {
            "auth_method": src.gh_auth_method or "token",
            "username": src.gh_username,
            # secrets stripped (reference README.md:402-411)
        })
    out = {"hosts": hosts, "folders": folders}
    text = json.dumps(out, indent=2)
    if args.output == "-":
        print(text)
    else:
        open(args.output, "w").write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
