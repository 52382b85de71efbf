"""Anamnesis — per-user memory files.

Behavior contract (reference services/anamnesis.py:1-146): each memory is a
self-contained ``.md`` file at ``<root>/Anamnesis/<user>/<uuid>.md`` with
frontmatter ``memory_id / created_at / modified_at / likes / dislikes``.
"""

from __future__ import annotations

import threading
import uuid
from datetime import datetime, timezone
from pathlib import Path

from voitta_rag_tpu.config import get_settings

ANAMNESIS_DIR = "Anamnesis"

# Read-modify-write serialization: memory tool bodies used to run inline on
# the single event-loop thread (implicitly atomic); with MCP tools offloaded
# to executor threads, concurrent like/dislike/update of the same memory
# would lose updates without this lock. Writes are write-then-rename so a
# concurrent reader/indexer never sees a torn file.
_mem_lock = threading.Lock()


def _safe_component(value: str, what: str) -> str:
    """Reject path separators / traversal in identity-derived path pieces.

    The MCP transport accepts a client-asserted user name (reference
    mcp_server.py X-User-Name fallback) and memory ids arrive from tool
    arguments — neither may escape ``<root>/Anamnesis/``. The reference
    interpolates both unchecked; legitimate values (emails, uuids) are
    unaffected by this guard.
    """
    if (not value or value in (".", "..") or "/" in value or "\\" in value
            or "\x00" in value):
        raise ValueError(f"invalid {what}: {value!r}")
    return value


def user_dir(user_name: str) -> Path:
    return (get_settings().root_path / ANAMNESIS_DIR
            / _safe_component(user_name, "user name"))


def memory_path(user_name: str, memory_id: str) -> Path:
    return user_dir(user_name) / f"{_safe_component(memory_id, 'memory id')}.md"


def memory_rel_path(user_name: str, memory_id: str) -> str:
    return f"{ANAMNESIS_DIR}/{user_name}/{memory_id}.md"


def anamnesis_folder_path(user_name: str) -> str:
    return f"{ANAMNESIS_DIR}/{user_name}"


def serialize_memory(memory_id: str, content: str, created_at: datetime,
                     modified_at: datetime, likes: int, dislikes: int) -> str:
    return (
        f"---\n"
        f"memory_id: {memory_id}\n"
        f"created_at: {created_at.isoformat()}\n"
        f"modified_at: {modified_at.isoformat()}\n"
        f"likes: {likes}\n"
        f"dislikes: {dislikes}\n"
        f"---\n"
        f"{content}\n"
    )


def parse_memory(file_content: str) -> dict:
    lines = file_content.split("\n")
    if not lines or lines[0].strip() != "---":
        return {"content": file_content}
    end_idx = None
    for i in range(1, len(lines)):
        if lines[i].strip() == "---":
            end_idx = i
            break
    if end_idx is None:
        return {"content": file_content}
    meta: dict = {}
    for line in lines[1:end_idx]:
        colon = line.find(":")
        if colon < 0:
            continue
        meta[line[:colon].strip()] = line[colon + 1:].strip()
    body = "\n".join(lines[end_idx + 1:]).strip()

    def _int(key):
        try:
            return int(meta.get(key, 0))
        except ValueError:
            return 0

    return {
        "memory_id": meta.get("memory_id", ""),
        "created_at": meta.get("created_at", ""),
        "modified_at": meta.get("modified_at", ""),
        "likes": _int("likes"),
        "dislikes": _int("dislikes"),
        "content": body,
    }


def write_memory(user_name: str, content: str,
                 memory_id: str | None = None) -> dict:
    """Create (or overwrite) a memory; returns the parsed dict."""
    with _mem_lock:
        return _write_memory_locked(user_name, content, memory_id)


def _write_memory_locked(user_name, content, memory_id) -> dict:
    now = datetime.now(timezone.utc)
    if memory_id is None:
        memory_id = str(uuid.uuid4())
        created = now
        likes = dislikes = 0
    else:
        existing = read_memory(user_name, memory_id)
        if existing is None:
            created = now
            likes = dislikes = 0
        else:
            created = datetime.fromisoformat(existing["created_at"]) \
                if existing["created_at"] else now
            likes, dislikes = existing["likes"], existing["dislikes"]
    path = memory_path(user_name, memory_id)
    path.parent.mkdir(parents=True, exist_ok=True)
    _atomic_write(path, serialize_memory(memory_id, content, created, now,
                                         likes, dislikes))
    return parse_memory(path.read_text(encoding="utf-8"))


def _atomic_write(path, text: str) -> None:
    tmp = path.with_suffix(".md.tmp")
    tmp.write_text(text, encoding="utf-8")
    tmp.replace(path)


def read_memory(user_name: str, memory_id: str) -> dict | None:
    path = memory_path(user_name, memory_id)
    if not path.exists():
        return None
    return parse_memory(path.read_text(encoding="utf-8"))


def delete_memory(user_name: str, memory_id: str) -> bool:
    path = memory_path(user_name, memory_id)
    if not path.exists():
        return False
    path.unlink()
    return True


def list_memories(user_name: str) -> list[dict]:
    d = user_dir(user_name)
    if not d.exists():
        return []
    out = []
    for f in sorted(d.glob("*.md")):
        data = parse_memory(f.read_text(encoding="utf-8"))
        if not data.get("memory_id"):
            data["memory_id"] = f.stem
        out.append(data)
    return out


def adjust_feedback(user_name: str, memory_id: str, likes_delta: int = 0,
                    dislikes_delta: int = 0) -> dict | None:
    """like/dislike counters (reference like_memory/dislike_memory tools)."""
    with _mem_lock:
        data = read_memory(user_name, memory_id)
        if data is None:
            return None
        now = datetime.now(timezone.utc)
        created = (datetime.fromisoformat(data["created_at"])
                   if data["created_at"] else now)
        path = memory_path(user_name, memory_id)
        _atomic_write(path, serialize_memory(
            memory_id, data["content"], created, now,
            max(data["likes"] + likes_delta, 0),
            max(data["dislikes"] + dislikes_delta, 0)))
        return read_memory(user_name, memory_id)
