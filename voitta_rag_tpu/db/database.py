"""SQLite metadata store (stdlib sqlite3; WAL + busy-timeout).

Behavior contract: reference db/database.py — WAL + busy_timeout pragmas
(20-25), ``init_db`` with create_all + **additive column migration** (91-106)
+ default-project migration (109-129) + user seeding from users.txt
(150-168), and ``reset_engines`` for tests (217-221).

Instead of an ORM, a single :class:`Database` object concentrates typed CRUD
helpers; row objects are the dataclasses in :mod:`voitta_rag_tpu.db.models`.
"""

from __future__ import annotations

import logging
import sqlite3
import threading
from dataclasses import asdict, fields
from pathlib import Path
from typing import Any, TypeVar

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.db import models as m

logger = logging.getLogger(__name__)

T = TypeVar("T")


def like_prefix(path: str) -> str:
    r"""Escaped LIKE pattern matching strict descendants of ``path``.

    Use with ``ESCAPE '\'``: an unescaped ``_``/``%`` in a folder name
    would make "my_app/%" match sibling "myxapp/..." rows — in a DELETE
    cascade that is silent data loss. Single shared helper so every
    prefix-LIKE in the codebase gets the same treatment.
    """
    return (path.rstrip("/").replace("\\", "\\\\").replace("%", "\\%")
            .replace("_", "\\_") + "/%")


def _to_row(cls, row: sqlite3.Row):
    if row is None:
        return None
    names = {f.name for f in fields(cls)}
    data = {k: row[k] for k in row.keys() if k in names}
    # bools come back as ints
    for f in fields(cls):
        if f.type.startswith("bool") and f.name in data and data[f.name] is not None:
            data[f.name] = bool(data[f.name])
    return cls(**data)


class Database:
    """One shared connection (serialized by an RLock), WAL mode."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.lock = threading.RLock()
        self.conn = sqlite3.connect(str(self.path), check_same_thread=False)
        self.conn.row_factory = sqlite3.Row
        self.conn.execute("PRAGMA journal_mode=WAL")
        self.conn.execute("PRAGMA busy_timeout=30000")
        self.conn.execute("PRAGMA foreign_keys=ON")

    # -- generic helpers -----------------------------------------------------
    def execute(self, sql: str, params: tuple | list = ()) -> sqlite3.Cursor:
        with self.lock:
            cur = self.conn.execute(sql, params)
            self.conn.commit()
            return cur

    def query(self, sql: str, params: tuple | list = ()) -> list[sqlite3.Row]:
        with self.lock:
            return self.conn.execute(sql, params).fetchall()

    def query_one(self, sql: str, params: tuple | list = ()) -> sqlite3.Row | None:
        with self.lock:
            return self.conn.execute(sql, params).fetchone()

    def insert(self, table: str, obj) -> int:
        data = {k: v for k, v in asdict(obj).items() if k != "id"}
        cols = ", ".join(data)
        ph = ", ".join("?" * len(data))
        vals = [int(v) if isinstance(v, bool) else v for v in data.values()]
        with self.lock:
            cur = self.conn.execute(
                f"INSERT INTO {table} ({cols}) VALUES ({ph})", vals)
            self.conn.commit()
        obj.id = cur.lastrowid
        return cur.lastrowid

    def update_fields(self, table: str, row_id: int, **kw) -> None:
        sets = ", ".join(f"{k}=?" for k in kw)
        vals = [int(v) if isinstance(v, bool) else v for v in kw.values()]
        self.execute(f"UPDATE {table} SET {sets}, updated_at=? WHERE id=?"
                     if "updated_at" in self._columns(table) and "updated_at" not in kw
                     else f"UPDATE {table} SET {sets} WHERE id=?",
                     vals + ([m.utc_now_iso(), row_id]
                             if "updated_at" in self._columns(table)
                             and "updated_at" not in kw else [row_id]))

    def get(self, table: str, cls, row_id: int):
        return _to_row(cls, self.query_one(
            f"SELECT * FROM {table} WHERE id=?", (row_id,)))

    def _columns(self, table: str) -> set[str]:
        return {r["name"] for r in self.query(f"PRAGMA table_info({table})")}

    # -- schema init + migration (reference db/database.py:91-129) -----------
    def init_schema(self) -> None:
        with self.lock:
            self.conn.executescript(m.ddl())
            self.conn.commit()
        self._migrate_additive_columns()

    def _migrate_additive_columns(self) -> None:
        """Add any dataclass fields missing from existing tables."""
        for table, cls in m.TABLES.items():
            existing = self._columns(table)
            for f in fields(cls):
                if f.name not in existing:
                    sql_type = m._column_sql_type(f)
                    logger.info("migrating: ALTER TABLE %s ADD COLUMN %s",
                                table, f.name)
                    self.execute(
                        f"ALTER TABLE {table} ADD COLUMN {f.name} {sql_type}")

    # -- users ---------------------------------------------------------------
    def get_or_create_user(self, name: str, email: str | None = None) -> m.User:
        row = self.query_one("SELECT * FROM users WHERE name=?", (name,))
        if row:
            return _to_row(m.User, row)
        user = m.User(name=name, email=email)
        self.insert("users", user)
        self.ensure_default_project(user)
        return user

    def get_user_by_name(self, name: str) -> m.User | None:
        return _to_row(m.User, self.query_one(
            "SELECT * FROM users WHERE name=?", (name,)))

    def get_user_by_email(self, email: str) -> m.User | None:
        return _to_row(m.User, self.query_one(
            "SELECT * FROM users WHERE email=?", (email,)))

    def list_users(self) -> list[m.User]:
        return [_to_row(m.User, r) for r in
                self.query("SELECT * FROM users ORDER BY name")]

    # -- projects (reference db/database.py:109-129 default migration) -------
    def ensure_default_project(self, user: m.User) -> m.Project:
        row = self.query_one(
            "SELECT * FROM projects WHERE user_id=? AND is_default=1",
            (user.id,))
        if row:
            proj = _to_row(m.Project, row)
        else:
            proj = m.Project(name="Default", user_id=user.id, is_default=True)
            self.insert("projects", proj)
            # Migrate legacy search_active user-folder settings into it.
            for r in self.query(
                    "SELECT folder_path, search_active FROM user_folder_settings "
                    "WHERE user_id=?", (user.id,)):
                self.execute(
                    "INSERT OR IGNORE INTO project_folder_settings "
                    "(project_id, folder_path, search_active, created_at) "
                    "VALUES (?,?,?,?)",
                    (proj.id, r["folder_path"], r["search_active"],
                     m.utc_now_iso()))
        if user.active_project_id is None:
            self.execute("UPDATE users SET active_project_id=? WHERE id=?",
                         (proj.id, user.id))
            user.active_project_id = proj.id
        return proj

    def get_active_project(self, user: m.User) -> m.Project:
        if user.active_project_id:
            proj = self.get("projects", m.Project, user.active_project_id)
            if proj:
                return proj
        return self.ensure_default_project(user)

    def list_projects(self, user_id: int) -> list[m.Project]:
        return [_to_row(m.Project, r) for r in self.query(
            "SELECT * FROM projects WHERE user_id=? ORDER BY created_at",
            (user_id,))]

    # -- folder settings -----------------------------------------------------
    def folder_setting(self, user_id: int, folder: str) -> m.UserFolderSetting | None:
        return _to_row(m.UserFolderSetting, self.query_one(
            "SELECT * FROM user_folder_settings WHERE user_id=? AND folder_path=?",
            (user_id, folder)))

    def upsert_folder_setting(self, user_id: int, folder: str,
                              enabled: bool | None = None,
                              search_active: bool | None = None) -> None:
        cur = self.folder_setting(user_id, folder)
        if cur is None:
            s = m.UserFolderSetting(
                user_id=user_id, folder_path=folder,
                enabled=bool(enabled), search_active=bool(search_active))
            self.insert("user_folder_settings", s)
        else:
            kw: dict[str, Any] = {}
            if enabled is not None:
                kw["enabled"] = enabled
            if search_active is not None:
                kw["search_active"] = search_active
            if kw:
                sets = ", ".join(f"{k}=?" for k in kw)
                self.execute(
                    f"UPDATE user_folder_settings SET {sets} WHERE id=?",
                    [int(v) for v in kw.values()] + [cur.id])

    def project_folder_active(self, project_id: int, folder: str) -> bool:
        r = self.query_one(
            "SELECT search_active FROM project_folder_settings "
            "WHERE project_id=? AND folder_path=?", (project_id, folder))
        return bool(r["search_active"]) if r else False

    def set_project_folder_active(self, project_id: int, folder: str,
                                  active: bool) -> None:
        self.execute(
            "INSERT INTO project_folder_settings "
            "(project_id, folder_path, search_active, created_at) VALUES (?,?,?,?) "
            "ON CONFLICT(project_id, folder_path) DO UPDATE SET "
            "search_active=excluded.search_active",
            (project_id, folder, int(active), m.utc_now_iso()))

    def active_folders_for_project(self, project_id: int) -> list[str]:
        return [r["folder_path"] for r in self.query(
            "SELECT folder_path FROM project_folder_settings "
            "WHERE project_id=? AND search_active=1", (project_id,))]

    # -- folder index status -------------------------------------------------
    def get_index_status(self, folder: str) -> m.FolderIndexStatus | None:
        return _to_row(m.FolderIndexStatus, self.query_one(
            "SELECT * FROM folder_index_status WHERE folder_path=?", (folder,)))

    def set_index_status(self, folder: str, status: str,
                         error_message: str | None = None,
                         indexed_at: str | None = None) -> None:
        assert status in m.INDEX_STATUSES, status
        self.execute(
            "INSERT INTO folder_index_status "
            "(folder_path, status, error_message, indexed_at, updated_at) "
            "VALUES (?,?,?,?,?) ON CONFLICT(folder_path) DO UPDATE SET "
            "status=excluded.status, error_message=excluded.error_message, "
            "indexed_at=COALESCE(excluded.indexed_at, folder_index_status.indexed_at), "
            "updated_at=excluded.updated_at",
            (folder, status, error_message, indexed_at, m.utc_now_iso()))

    def folders_with_status(self, status: str) -> list[m.FolderIndexStatus]:
        return [_to_row(m.FolderIndexStatus, r) for r in self.query(
            "SELECT * FROM folder_index_status WHERE status=?", (status,))]

    def all_index_statuses(self) -> list[m.FolderIndexStatus]:
        return [_to_row(m.FolderIndexStatus, r) for r in
                self.query("SELECT * FROM folder_index_status")]

    def delete_index_status(self, folder: str) -> None:
        self.execute("DELETE FROM folder_index_status WHERE folder_path=?",
                     (folder,))

    # -- indexed files (content-hash change tracking) ------------------------
    def get_indexed_file(self, file_path: str) -> m.IndexedFile | None:
        return _to_row(m.IndexedFile, self.query_one(
            "SELECT * FROM indexed_files WHERE file_path=?", (file_path,)))

    def upsert_indexed_file(self, rec: m.IndexedFile) -> None:
        self.execute(
            "INSERT INTO indexed_files (file_path, folder_path, index_folder, "
            "content_hash, file_size, chunk_count, parse_error, "
            "source_created_at, "
            "source_modified_at, indexed_at, updated_at) "
            "VALUES (?,?,?,?,?,?,?,?,?,?,?) ON CONFLICT(file_path) DO UPDATE SET "
            "folder_path=excluded.folder_path, index_folder=excluded.index_folder, "
            "content_hash=excluded.content_hash, file_size=excluded.file_size, "
            "chunk_count=excluded.chunk_count, "
            "parse_error=excluded.parse_error, "
            "source_created_at=excluded.source_created_at, "
            "source_modified_at=excluded.source_modified_at, "
            "updated_at=excluded.updated_at",
            (rec.file_path, rec.folder_path, rec.index_folder,
             rec.content_hash, rec.file_size, rec.chunk_count,
             rec.parse_error, rec.source_created_at, rec.source_modified_at,
             rec.indexed_at, m.utc_now_iso()))

    def set_chunk_count(self, file_path: str, count: int) -> None:
        self.execute(
            "UPDATE indexed_files SET chunk_count=?, updated_at=? WHERE file_path=?",
            (count, m.utc_now_iso(), file_path))

    def delete_indexed_file(self, file_path: str) -> None:
        self.execute("DELETE FROM indexed_files WHERE file_path=?", (file_path,))

    def indexed_files_in(self, column: str, value: str) -> list[m.IndexedFile]:
        assert column in ("folder_path", "index_folder")
        return [_to_row(m.IndexedFile, r) for r in self.query(
            f"SELECT * FROM indexed_files WHERE {column}=?", (value,))]

    def indexed_files_under(self, folder: str) -> list[m.IndexedFile]:
        return [_to_row(m.IndexedFile, r) for r in self.query(
            "SELECT * FROM indexed_files WHERE folder_path=? "
            "OR folder_path LIKE ? ESCAPE '\\'",
            (folder, like_prefix(folder)))]

    def distinct_indexed_folders(self) -> list[str]:
        return [r["folder_path"] for r in
                self.query("SELECT DISTINCT folder_path FROM indexed_files")]

    # -- file metadata -------------------------------------------------------
    def get_file_metadata(self, path: str) -> m.FileMetadata | None:
        return _to_row(m.FileMetadata, self.query_one(
            "SELECT * FROM file_metadata WHERE path=?", (path,)))

    def set_file_metadata(self, path: str, text: str | None,
                          user_id: int | None) -> None:
        self.execute(
            "INSERT INTO file_metadata (path, metadata_text, updated_at, updated_by) "
            "VALUES (?,?,?,?) ON CONFLICT(path) DO UPDATE SET "
            "metadata_text=excluded.metadata_text, updated_at=excluded.updated_at, "
            "updated_by=excluded.updated_by",
            (path, text, m.utc_now_iso(), user_id))

    def delete_file_metadata(self, path: str) -> None:
        self.execute("DELETE FROM file_metadata WHERE path=?", (path,))

    def file_metadata_for_paths(self, paths: list[str]) -> dict[str, str | None]:
        if not paths:
            return {}
        qs = ",".join("?" * len(paths))
        return {r["path"]: r["metadata_text"] for r in self.query(
            f"SELECT path, metadata_text FROM file_metadata WHERE path IN ({qs})",
            paths)}

    # -- sync sources --------------------------------------------------------
    def get_sync_source(self, folder: str) -> m.FolderSyncSource | None:
        return _to_row(m.FolderSyncSource, self.query_one(
            "SELECT * FROM folder_sync_sources WHERE folder_path=?", (folder,)))

    def list_sync_sources(self) -> list[m.FolderSyncSource]:
        return [_to_row(m.FolderSyncSource, r) for r in
                self.query("SELECT * FROM folder_sync_sources")]

    def upsert_sync_source(self, src: m.FolderSyncSource) -> None:
        data = {k: (int(v) if isinstance(v, bool) else v)
                for k, v in asdict(src).items() if k != "id"}
        cols = ", ".join(data)
        ph = ", ".join("?" * len(data))
        updates = ", ".join(f"{k}=excluded.{k}" for k in data
                            if k not in ("folder_path", "created_at"))
        self.execute(
            f"INSERT INTO folder_sync_sources ({cols}) VALUES ({ph}) "
            f"ON CONFLICT(folder_path) DO UPDATE SET {updates}", list(data.values()))

    def update_sync_source(self, folder: str, **kw) -> None:
        sets = ", ".join(f"{k}=?" for k in kw)
        vals = [int(v) if isinstance(v, bool) else v for v in kw.values()]
        self.execute(
            f"UPDATE folder_sync_sources SET {sets}, updated_at=? WHERE folder_path=?",
            vals + [m.utc_now_iso(), folder])

    def delete_sync_source(self, folder: str) -> None:
        self.execute("DELETE FROM folder_sync_sources WHERE folder_path=?",
                     (folder,))

    def close(self) -> None:
        with self.lock:
            self.conn.close()


# ---------------------------------------------------------------------------
# module-level singleton (reference get_sync_engine / reset_engines pattern)
# ---------------------------------------------------------------------------

_db: Database | None = None
_db_lock = threading.Lock()


def get_db() -> Database:
    global _db
    with _db_lock:
        if _db is None:
            _db = Database(get_settings().db_path)
            _db.init_schema()
        return _db


def reset_db() -> None:
    """Reset for tests (reference db/database.py:217-221)."""
    global _db
    with _db_lock:
        if _db is not None:
            _db.close()
        _db = None


def init_db() -> None:
    """Full init: schema + migrations + user seeding (reference
    db/database.py:132-214). Also discovers top-level folders and seeds
    users from <root>/users.txt when present."""
    db = get_db()
    settings = get_settings()
    users_file = settings.root_path / "users.txt"
    if users_file.exists():
        for line in users_file.read_text().splitlines():
            name = line.strip()
            if name and not name.startswith("#"):
                db.get_or_create_user(name)
    # Ensure every existing user has a default project.
    for user in db.list_users():
        db.ensure_default_project(user)
