"""String interning: payload strings → dense int32 ids for in-kernel filters.

Folder paths, index folders, and file paths are compared *by id* inside the
scan kernels (ops/filters.py). This table is the host-side mapping, persisted
in the payload SQLite database so ids are stable across restarts.
"""

from __future__ import annotations

import sqlite3
import threading


class InternTable:
    """Bidirectional string↔id mapping backed by a SQLite table."""

    def __init__(self, conn: sqlite3.Connection, name: str, lock: threading.RLock):
        self._conn = conn
        self._table = f"intern_{name}"
        self._lock = lock
        self._to_id: dict[str, int] = {}
        self._to_str: dict[int, str] = {}
        with self._lock:
            conn.execute(
                f"CREATE TABLE IF NOT EXISTS {self._table} "
                "(id INTEGER PRIMARY KEY AUTOINCREMENT, value TEXT UNIQUE NOT NULL)"
            )
            for id_, value in conn.execute(f"SELECT id, value FROM {self._table}"):
                self._to_id[value] = id_
                self._to_str[id_] = value

    def intern(self, value: str) -> int:
        with self._lock:
            if value in self._to_id:
                return self._to_id[value]
            cur = self._conn.execute(
                f"INSERT INTO {self._table} (value) VALUES (?)", (value,)
            )
            self._conn.commit()
            id_ = cur.lastrowid
            self._to_id[value] = id_
            self._to_str[id_] = value
            return id_

    def lookup(self, value: str) -> int | None:
        """Id for an existing string, or None (never creates: an unknown
        folder in a filter matches nothing, like Qdrant MatchValue)."""
        return self._to_id.get(value)

    def to_string(self, id_: int) -> str | None:
        return self._to_str.get(id_)

    def intern_many(self, values: list[str]) -> list[int]:
        return [self.intern(v) for v in values]

    def lookup_many(self, values: list[str]) -> list[int]:
        """Ids for existing strings; unknown strings are dropped."""
        out = []
        for v in values:
            i = self._to_id.get(v)
            if i is not None:
                out.append(i)
        return out

    def __len__(self) -> int:
        return len(self._to_id)
