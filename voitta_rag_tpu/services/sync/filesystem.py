"""Filesystem connector (reference services/sync/filesystem.py:1-55):
local-path mapping source — files are read in place via the filesystem
service's mapped-path indirection, so sync is a near no-op that validates
the mapping and refreshes timestamps."""

from __future__ import annotations

import logging
from datetime import datetime, timezone
from pathlib import Path

from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile

logger = logging.getLogger(__name__)


class FilesystemConnector(BaseSyncConnector):
    async def list_files(self, source) -> list[RemoteFile]:
        root = Path(source.fs_path or "")
        if not root.exists():
            raise FileNotFoundError(f"mapped path not found: {source.fs_path}")
        out = []
        for p in root.rglob("*"):
            if p.is_file() and not any(
                    part.startswith(".") for part in p.relative_to(root).parts):
                st = p.stat()
                out.append(RemoteFile(
                    remote_path=str(p.relative_to(root)),
                    size=st.st_size,
                    modified_at=datetime.fromtimestamp(
                        st.st_mtime, tz=timezone.utc).isoformat()))
        return out

    async def download_file(self, source, remote_path: str,
                            local_path: Path) -> None:
        # Mapped sources are read in place; nothing to copy.
        raise NotImplementedError("filesystem sources are read in place")

    async def sync(self, source, fs, keep_extensions=None) -> dict:
        # Ensure the mapping is installed; no mirroring.
        fs.add_mapping(source.folder_path, source.fs_path)
        files = await self.list_files(source)
        return {"downloaded": 0, "deleted": 0, "skipped": len(files),
                "errors": 0}
