"""Sync connector base: mirror sync with sidecars.

Behavior contract (reference services/sync/base.py:13-124):
``RemoteFile(remote_path, size, modified_at, content_hash, created_at,
source_url)``; default ``sync`` = list remote → hash/size-skip download →
delete local files not on remote → rmdir empties → write
``.voitta_timestamps.json`` + ``.voitta_sources.json`` sidecars.
"""

from __future__ import annotations

import hashlib
import json
import logging
from abc import ABC, abstractmethod
from dataclasses import dataclass
from pathlib import Path

logger = logging.getLogger(__name__)


@dataclass
class RemoteFile:
    remote_path: str
    size: int
    modified_at: str  # ISO 8601
    content_hash: str | None = None
    created_at: str = ""
    source_url: str | None = None
    #: Opaque remote revision marker (Graph quickXorHash/eTag, Confluence
    #: version, etc.). When set, change detection compares it against the
    #: ``.voitta_revisions.json`` sidecar from the previous sync — catching
    #: same-size edits that a size-only comparison silently skips.
    remote_rev: str | None = None


REV_SIDECAR = ".voitta_revisions.json"


class BaseSyncConnector(ABC):
    @abstractmethod
    async def list_files(self, source) -> list[RemoteFile]:
        ...

    @abstractmethod
    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        ...

    async def sync(self, source, fs, keep_extensions: set[str] | None = None) -> dict:
        folder_path = source.folder_path
        local_root = fs.resolve(folder_path)
        local_root.mkdir(parents=True, exist_ok=True)

        remote_files = await self.list_files(source)
        remote_paths = set()
        stats = {"downloaded": 0, "deleted": 0, "skipped": 0, "errors": 0}

        rev_file = local_root / REV_SIDECAR
        prev_revs: dict[str, str] = {}
        if rev_file.exists():
            try:
                prev_revs = json.loads(rev_file.read_text())
            except (OSError, json.JSONDecodeError):
                prev_revs = {}
        new_revs: dict[str, str] = {}

        for rf in remote_files:
            remote_paths.add(rf.remote_path)
            local_file = local_root / rf.remote_path
            if rf.remote_rev:
                new_revs[rf.remote_path] = rf.remote_rev
            if local_file.exists():
                # Skip priority: remote revision marker (exact, catches
                # same-size edits) > content hash > size.
                if rf.remote_rev:
                    if prev_revs.get(rf.remote_path) == rf.remote_rev:
                        stats["skipped"] += 1
                        continue
                elif rf.content_hash:
                    local_hash = hashlib.sha256(
                        local_file.read_bytes()).hexdigest()
                    if local_hash == rf.content_hash:
                        stats["skipped"] += 1
                        continue
                elif local_file.stat().st_size == rf.size:
                    stats["skipped"] += 1
                    continue
            local_file.parent.mkdir(parents=True, exist_ok=True)
            try:
                await self.download_file(source, rf.remote_path, local_file)
                stats["downloaded"] += 1
            except Exception as e:
                logger.error("Failed to download %s: %s", rf.remote_path, e)
                stats["errors"] += 1
                # Do not record the rev: next sync must retry the download.
                new_revs.pop(rf.remote_path, None)

        keep = keep_extensions or set()
        for local_file in local_root.rglob("*"):
            if local_file.is_file() and not local_file.name.startswith("."):
                if local_file.suffix.lower() in keep:
                    continue
                rel = str(local_file.relative_to(local_root))
                if rel not in remote_paths:
                    try:
                        local_file.unlink()
                        stats["deleted"] += 1
                    except OSError as e:
                        logger.error("Failed to delete %s: %s", rel, e)
                        stats["errors"] += 1

        for dirpath in sorted(local_root.rglob("*"), reverse=True):
            if dirpath.is_dir() and not any(dirpath.iterdir()):
                try:
                    dirpath.rmdir()
                except OSError:
                    pass

        if (any(rf.remote_rev for rf in remote_files)
                or new_revs or rev_file.exists()):
            try:
                rev_file.write_text(json.dumps(new_revs))
            except OSError as e:
                logger.warning("revision sidecar write failed: %s", e)

        write_sidecars(local_root, remote_files)
        logger.info("[SYNC] complete for %s: %s", folder_path, stats)
        return stats


def write_sidecars(local_root: Path, remote_files: list[RemoteFile]) -> None:
    timestamps = {}
    for rf in remote_files:
        entry = {}
        if rf.modified_at:
            entry["modified_at"] = rf.modified_at
        if rf.created_at:
            entry["created_at"] = rf.created_at
        if entry:
            timestamps[rf.remote_path] = entry
    (local_root / ".voitta_timestamps.json").write_text(json.dumps(timestamps))
    sources = {rf.remote_path: rf.source_url
               for rf in remote_files if rf.source_url}
    if sources:
        (local_root / ".voitta_sources.json").write_text(json.dumps(sources))
