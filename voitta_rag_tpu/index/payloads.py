"""Host-side payload store: texts + chunk metadata in SQLite.

The device index (segments) stores only vectors, sparse terms, and int32
filter columns; chunk texts and full payload metadata live here, keyed by the
chunk's global row id. This is the TPU-native split of Qdrant's
vector-plus-payload model: scoring data in HBM, payloads on host. SQL indexes
replace Qdrant's scroll+payload-filter queries (reference
vector_store.py:163-214, 698-1016).
"""

from __future__ import annotations

import json
import sqlite3
import threading
from pathlib import Path

from voitta_rag_tpu.core_types import ChunkMetadata, StoredChunk
from voitta_rag_tpu.index.registry import InternTable

SCHEMA = """
CREATE TABLE IF NOT EXISTS chunks (
    gid INTEGER PRIMARY KEY,          -- global row id (segment*capacity+row)
    point_id TEXT NOT NULL,           -- uuid, reference point id semantics
    text TEXT NOT NULL,
    file_path TEXT NOT NULL,
    folder_path TEXT NOT NULL,
    index_folder TEXT NOT NULL,
    chunk_index INTEGER NOT NULL,
    source_url TEXT,
    meta TEXT NOT NULL                -- full ChunkMetadata JSON
);
CREATE INDEX IF NOT EXISTS idx_chunks_file ON chunks (file_path);
CREATE INDEX IF NOT EXISTS idx_chunks_folder ON chunks (folder_path);
CREATE INDEX IF NOT EXISTS idx_chunks_index_folder ON chunks (index_folder);
CREATE INDEX IF NOT EXISTS idx_chunks_source_url ON chunks (source_url);
CREATE INDEX IF NOT EXISTS idx_chunks_point ON chunks (point_id);

CREATE TABLE IF NOT EXISTS term_stats (      -- BM25 document frequencies
    term INTEGER PRIMARY KEY,
    df INTEGER NOT NULL
);
CREATE TABLE IF NOT EXISTS collection_meta (
    key TEXT PRIMARY KEY,
    value TEXT NOT NULL
);
"""


class PayloadStore:
    """SQLite-backed chunk payloads + intern tables + BM25 df stats."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._lock = threading.RLock()
        self._conn = sqlite3.connect(str(self.path), check_same_thread=False)
        self._conn.execute("PRAGMA journal_mode=WAL")
        self._conn.execute("PRAGMA busy_timeout=30000")
        self._conn.executescript(SCHEMA)
        self.folders = InternTable(self._conn, "folders", self._lock)
        self.docs = InternTable(self._conn, "docs", self._lock)

    # -- chunk payloads ------------------------------------------------------
    def insert_chunks(self, rows: list[tuple[int, str, str, ChunkMetadata]]) -> None:
        """rows: (gid, point_id, text, metadata)."""
        with self._lock:
            self._conn.executemany(
                "INSERT OR REPLACE INTO chunks "
                "(gid, point_id, text, file_path, folder_path, index_folder,"
                " chunk_index, source_url, meta) VALUES (?,?,?,?,?,?,?,?,?)",
                [
                    (gid, pid, text, m.file_path, m.folder_path, m.index_folder,
                     m.chunk_index, m.source_url, json.dumps(m.to_dict()))
                    for gid, pid, text, m in rows
                ],
            )
            self._conn.commit()

    def all_gids(self) -> list[int]:
        with self._lock:
            return [r[0] for r in
                    self._conn.execute("SELECT gid FROM chunks")]

    def remap_gids(self, mapping: dict[int, int],
                   generation: int | None = None) -> None:
        """Rewrite gids after segment compaction (old → new), atomically
        with a ``gid_generation`` meta stamp (the compaction journal uses
        it to tell whether this transaction committed before a crash).
        Two-phase via the negative range so overlapping old/new ids never
        collide (gids are non-negative by construction). Caller must have
        removed any payload rows NOT in the mapping whose gid collides
        with a target (orphans of lost segments)."""
        with self._lock, self._conn:
            if mapping:
                self._conn.executemany(
                    "UPDATE chunks SET gid = -2 - ? WHERE gid = ?",
                    [(new, old) for old, new in mapping.items()])
                self._conn.execute(
                    "UPDATE chunks SET gid = -2 - gid WHERE gid <= -2")
            if generation is not None:
                self._conn.execute(
                    "INSERT INTO collection_meta (key, value) VALUES "
                    "('gid_generation', ?) ON CONFLICT(key) DO UPDATE "
                    "SET value=excluded.value", (str(generation),))

    def delete_gids(self, gids: list[int]) -> None:
        with self._lock:
            self._conn.executemany("DELETE FROM chunks WHERE gid=?",
                                   [(g,) for g in gids])
            self._conn.commit()

    def _row_to_chunk(self, row) -> StoredChunk:
        gid, pid, text, meta_json = row
        return StoredChunk(id=pid, text=text,
                           metadata=ChunkMetadata.from_dict(json.loads(meta_json)))

    def get_chunks(self, gids: list[int]) -> dict[int, StoredChunk]:
        if not gids:
            return {}
        with self._lock:
            qs = ",".join("?" * len(gids))
            rows = self._conn.execute(
                f"SELECT gid, point_id, text, meta FROM chunks WHERE gid IN ({qs})",
                gids,
            ).fetchall()
        return {r[0]: self._row_to_chunk(r) for r in rows}

    def gids_where(self, column: str, value: str) -> list[int]:
        assert column in ("file_path", "folder_path", "index_folder",
                          "source_url", "point_id")
        with self._lock:
            rows = self._conn.execute(
                f"SELECT gid FROM chunks WHERE {column}=?", (value,)
            ).fetchall()
        return [r[0] for r in rows]

    def gids_where_prefix(self, column: str, prefix: str) -> list[int]:
        """gids whose column equals prefix or starts with prefix + '/'."""
        from voitta_rag_tpu.db.database import like_prefix

        assert column in ("file_path", "folder_path", "index_folder")
        with self._lock:
            rows = self._conn.execute(
                f"SELECT gid FROM chunks WHERE {column}=? "
                f"OR {column} LIKE ? ESCAPE '\\'",
                (prefix, like_prefix(prefix)),
            ).fetchall()
        return [r[0] for r in rows]

    def chunks_for_file(self, file_path: str, start: int | None = None,
                        end: int | None = None) -> list[StoredChunk]:
        """Ordered chunk range for a file (reference get_chunk_range scroll)."""
        sql = ("SELECT gid, point_id, text, meta FROM chunks WHERE file_path=?")
        args: list = [file_path]
        if start is not None:
            sql += " AND chunk_index>=?"
            args.append(start)
        if end is not None:
            sql += " AND chunk_index<=?"
            args.append(end)
        sql += " ORDER BY chunk_index"
        with self._lock:
            rows = self._conn.execute(sql, args).fetchall()
        return [self._row_to_chunk(r) for r in rows]

    def count_for_file(self, file_path: str) -> int:
        with self._lock:
            (n,) = self._conn.execute(
                "SELECT COUNT(*) FROM chunks WHERE file_path=?", (file_path,)
            ).fetchone()
        return n

    def file_paths_for(self, column: str, value: str) -> set[str]:
        assert column in ("folder_path", "index_folder")
        with self._lock:
            rows = self._conn.execute(
                f"SELECT DISTINCT file_path FROM chunks WHERE {column}=?", (value,)
            ).fetchall()
        return {r[0] for r in rows}

    def find_by_source_url(self, source_url: str) -> list[StoredChunk]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT gid, point_id, text, meta FROM chunks WHERE source_url=? "
                "ORDER BY chunk_index", (source_url,)
            ).fetchall()
        return [self._row_to_chunk(r) for r in rows]

    def count(self) -> int:
        with self._lock:
            (n,) = self._conn.execute("SELECT COUNT(*) FROM chunks").fetchone()
        return n

    def distinct(self, column: str) -> list[str]:
        assert column in ("file_path", "folder_path", "index_folder")
        with self._lock:
            rows = self._conn.execute(
                f"SELECT DISTINCT {column} FROM chunks"
            ).fetchall()
        return [r[0] for r in rows]

    def update_acl(self, file_path: str, allowed_users: list[str] | None) -> None:
        """Live ACL payload update (reference sharepoint.py:741-885 path)."""
        with self._lock:
            rows = self._conn.execute(
                "SELECT gid, meta FROM chunks WHERE file_path=?", (file_path,)
            ).fetchall()
            for gid, meta_json in rows:
                meta = json.loads(meta_json)
                meta["allowed_users"] = allowed_users
                self._conn.execute("UPDATE chunks SET meta=? WHERE gid=?",
                                   (json.dumps(meta), gid))
            self._conn.commit()

    # -- BM25 document frequencies ------------------------------------------
    def bump_term_dfs(self, term_counts: dict[int, int]) -> None:
        """Add (or subtract, negative counts) document frequencies."""
        with self._lock:
            self._conn.executemany(
                "INSERT INTO term_stats (term, df) VALUES (?, ?) "
                "ON CONFLICT(term) DO UPDATE SET df = df + excluded.df",
                list(term_counts.items()),
            )
            self._conn.execute("DELETE FROM term_stats WHERE df <= 0")
            self._conn.commit()

    def term_dfs(self, terms: list[int]) -> dict[int, int]:
        if not terms:
            return {}
        with self._lock:
            qs = ",".join("?" * len(terms))
            rows = self._conn.execute(
                f"SELECT term, df FROM term_stats WHERE term IN ({qs})", terms
            ).fetchall()
        return dict(rows)

    # -- misc ----------------------------------------------------------------
    def get_meta(self, key: str, default: str | None = None) -> str | None:
        with self._lock:
            row = self._conn.execute(
                "SELECT value FROM collection_meta WHERE key=?", (key,)
            ).fetchone()
        return row[0] if row else default

    def set_meta(self, key: str, value: str) -> None:
        with self._lock:
            self._conn.execute(
                "INSERT INTO collection_meta (key, value) VALUES (?, ?) "
                "ON CONFLICT(key) DO UPDATE SET value=excluded.value",
                (key, value),
            )
            self._conn.commit()

    def close(self) -> None:
        with self._lock:
            self._conn.close()
