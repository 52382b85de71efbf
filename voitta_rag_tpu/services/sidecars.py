"""Sidecar JSON loaders: timestamps, ACLs, source URLs.

Behavior contract (reference services/indexing.py:64-174): connectors write
``.voitta_timestamps.json`` / ``.voitta_acl.json`` / ``.voitta_sources.json``
at their sync roots; the indexer walks UP from a file's directory to the
first sidecar, looks the file up by its path relative to the sidecar's
directory, and stops walking once a sidecar is found (even without an
entry). Timestamps fall back to filesystem stat(); ACLs fall back to the
sidecar's ``_default`` key.
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path

TIMESTAMPS_SIDECAR = ".voitta_timestamps.json"
ACL_SIDECAR = ".voitta_acl.json"
SOURCES_SIDECAR = ".voitta_sources.json"


def iso_to_epoch(value: str) -> int | None:
    if not value:
        return None
    try:
        return int(datetime.fromisoformat(value.replace("Z", "+00:00")).timestamp())
    except (ValueError, OSError):
        return None


def _walk_up(abs_path: Path, sidecar_name: str):
    """Yield (sidecar_data, rel_key) for the first sidecar found walking up."""
    current = abs_path.parent
    while True:
        sidecar = current / sidecar_name
        if sidecar.exists():
            try:
                data = json.loads(sidecar.read_text())
                return data, str(abs_path.relative_to(current))
            except Exception:
                return None, None
        parent = current.parent
        if parent == current:
            return None, None
        current = parent


def load_source_timestamps(abs_path: Path) -> tuple[int | None, int | None]:
    data, key = _walk_up(abs_path, TIMESTAMPS_SIDECAR)
    if data is not None:
        entry = data.get(key, {})
        if entry:
            return (iso_to_epoch(entry.get("created_at", "")),
                    iso_to_epoch(entry.get("modified_at", "")))
    try:
        st = abs_path.stat()
        created = int(getattr(st, "st_birthtime", st.st_ctime))
        return created, int(st.st_mtime)
    except OSError:
        return None, None


def load_acl(abs_path: Path) -> list[str] | None:
    data, key = _walk_up(abs_path, ACL_SIDECAR)
    if data is not None:
        entry = data.get(key)
        if entry is not None:
            return entry
        return data.get("_default")
    return None


def load_source_url(abs_path: Path) -> str | None:
    data, key = _walk_up(abs_path, SOURCES_SIDECAR)
    if data is not None:
        url = data.get(key)
        if url:
            return url
    return None
