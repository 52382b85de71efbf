"""Filesystem service: path resolution, traversal guards, CRUD.

Behavior contract: reference services/filesystem.py:27-331 — all paths in
the API are relative to ``VOITTA_ROOT_PATH``; filesystem-type sync sources
map a subtree onto an external directory (mapped-path indirection, 72-106);
traversal outside the root (or mapping) is rejected; names are sanitized on
upload/create (199-256).
"""

from __future__ import annotations

import logging
import threading
import os
import re
import shutil
from dataclasses import dataclass
from pathlib import Path

from voitta_rag_tpu.config import get_settings

logger = logging.getLogger(__name__)

_SANITIZE_RE = re.compile(r"[^\w\-. ()\[\]+@#&,']")


def sanitize_name(name: str) -> str:
    name = name.replace("/", "_").replace("\\", "_").strip()
    name = _SANITIZE_RE.sub("_", name)
    return name[:255] or "_"


@dataclass
class FileInfo:
    name: str
    path: str           # relative path
    is_dir: bool
    size: int
    modified_at: float


class FilesystemService:
    """Root-relative file operations with mapped-path indirection."""

    def __init__(self, root: Path | None = None):
        self.root = (root or get_settings().root_path).resolve()
        # folder_path (relative) -> external absolute Path
        self._mappings: dict[str, Path] = {}

    # -- mappings (reference filesystem.py:72-106) --------------------------
    def load_mappings(self, sources) -> None:
        """Install mapped paths from filesystem-type sync sources."""
        self._mappings = {}
        for src in sources:
            if src.source_type == "filesystem" and src.fs_path:
                self._mappings[src.folder_path.strip("/")] = Path(src.fs_path)

    def add_mapping(self, folder: str, target: str | Path) -> None:
        self._mappings[folder.strip("/")] = Path(target)

    def remove_mapping(self, folder: str) -> Path | None:
        """Uninstall a mapping; returns the old target (for watch teardown)."""
        return self._mappings.pop(folder.strip("/"), None)

    def mappings(self) -> dict[str, Path]:
        """folder_path -> external target dir (for the watcher's extra
        watch roots, reference watcher.py:330-335)."""
        return dict(self._mappings)

    def mapping_for(self, rel_path: str) -> tuple[str, Path] | None:
        rel = rel_path.strip("/")
        for folder, target in self._mappings.items():
            if rel == folder or rel.startswith(folder + "/"):
                return folder, target
        return None

    # -- resolution with traversal guard (filesystem.py:94-104) -------------
    def resolve(self, rel_path: str) -> Path:
        rel = (rel_path or "").strip("/")
        if ".." in Path(rel).parts:
            raise PermissionError(f"path traversal rejected: {rel_path}")
        hit = self.mapping_for(rel)
        if hit:
            folder, target = hit
            sub = rel[len(folder):].strip("/")
            p = (target / sub).resolve() if sub else target.resolve()
            t = target.resolve()
            if p != t and not str(p).startswith(str(t) + os.sep):
                raise PermissionError(f"path escapes mapping: {rel_path}")
            return p
        p = (self.root / rel).resolve()
        if p != self.root and not str(p).startswith(str(self.root) + os.sep):
            raise PermissionError(f"path escapes root: {rel_path}")
        return p

    def relative(self, abs_path: Path) -> str:
        abs_path = Path(abs_path).resolve()
        for folder, target in self._mappings.items():
            t = str(target.resolve())
            if str(abs_path).startswith(t):
                sub = str(abs_path)[len(t):].strip("/")
                return f"{folder}/{sub}" if sub else folder
        return str(abs_path.relative_to(self.root))

    # -- listing -------------------------------------------------------------
    def exists(self, rel_path: str) -> bool:
        try:
            return self.resolve(rel_path).exists()
        except PermissionError:
            return False

    def is_dir(self, rel_path: str) -> bool:
        return self.resolve(rel_path).is_dir()

    def list_dir(self, rel_path: str = "") -> list[FileInfo]:
        base = self.resolve(rel_path)
        rel = rel_path.strip("/")
        out = []
        if not base.exists():
            return out
        for p in sorted(base.iterdir(), key=lambda x: (not x.is_dir(), x.name.lower())):
            if p.name.startswith("."):
                continue
            try:
                st = p.stat()
            except OSError:
                continue
            out.append(FileInfo(
                name=p.name,
                path=f"{rel}/{p.name}" if rel else p.name,
                is_dir=p.is_dir(),
                size=st.st_size if p.is_file() else 0,
                modified_at=st.st_mtime,
            ))
        return out

    def walk_files(self, rel_path: str = "") -> list[str]:
        """All non-hidden file paths (relative) under a folder, recursively."""
        base = self.resolve(rel_path)
        rel = rel_path.strip("/")
        out = []
        if not base.exists():
            return out
        for p in sorted(base.rglob("*")):
            if any(part.startswith(".") for part in p.relative_to(base).parts):
                continue
            if p.is_file():
                sub = str(p.relative_to(base))
                out.append(f"{rel}/{sub}" if rel else sub)
        return out

    def breadcrumbs(self, rel_path: str) -> list[dict]:
        crumbs = [{"name": "Home", "path": ""}]
        parts = [p for p in rel_path.strip("/").split("/") if p]
        for i in range(len(parts)):
            crumbs.append({"name": parts[i], "path": "/".join(parts[: i + 1])})
        return crumbs

    # -- mutation ------------------------------------------------------------
    def create_folder(self, rel_path: str, name: str) -> str:
        name = sanitize_name(name)
        target = self.resolve(rel_path) / name
        target.mkdir(parents=True, exist_ok=False)
        rel = rel_path.strip("/")
        return f"{rel}/{name}" if rel else name

    def delete(self, rel_path: str) -> None:
        p = self.resolve(rel_path)
        if p == self.root:
            raise PermissionError("refusing to delete root")
        if p.is_dir():
            shutil.rmtree(p)
        elif p.exists():
            p.unlink()

    def write_file(self, rel_dir: str, name: str, data: bytes) -> str:
        name = sanitize_name(name)
        d = self.resolve(rel_dir)
        d.mkdir(parents=True, exist_ok=True)
        (d / name).write_bytes(data)
        rel = rel_dir.strip("/")
        return f"{rel}/{name}" if rel else name

    def read_file(self, rel_path: str) -> bytes:
        return self.resolve(rel_path).read_bytes()

    def file_counts(self, rel_path: str) -> dict:
        """Recursive {files, dirs, total_size} (reference details sidebar)."""
        base = self.resolve(rel_path)
        files = dirs = size = 0
        if base.exists():
            for p in base.rglob("*"):
                if any(part.startswith(".") for part in
                       p.relative_to(base).parts):
                    continue
                if p.is_dir():
                    dirs += 1
                elif p.is_file():
                    files += 1
                    size += p.stat().st_size
        return {"files": files, "dirs": dirs, "total_size": size}


_fs: FilesystemService | None = None
_create_lock = threading.Lock()


def get_filesystem_service() -> FilesystemService:
    global _fs
    if _fs is None:
        with _create_lock:
            if _fs is None:
                _fs = FilesystemService()
    return _fs


def reset_filesystem_service() -> None:
    global _fs
    _fs = None
