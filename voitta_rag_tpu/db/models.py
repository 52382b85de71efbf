"""Metadata-store row types + schema DDL (stdlib sqlite3, no ORM).

Mirrors the reference's SQLAlchemy models (db/models.py:20-244) table by
table and column by column: users, file_metadata, user_folder_settings,
projects, project_folder_settings, folder_index_status, folder_sync_sources
(per-connector credential groups), indexed_files (content-hash change
tracking; ``chunk_count < 0`` = indexing in progress, the crash-resume
convention of db/models.py:238 / services/indexing.py:237-277).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from datetime import datetime, timezone


def utc_now_iso() -> str:
    return datetime.now(timezone.utc).isoformat()


INDEX_STATUSES = ("none", "pending", "indexing", "indexed", "disabled", "error")

SOURCE_TYPES = (
    "filesystem", "sharepoint", "google_drive", "github", "azure_devops",
    "jira", "confluence", "box", "glue_catalog",
)


@dataclass
class User:
    id: int | None = None
    name: str = ""
    email: str | None = None
    password: str | None = None
    active_project_id: int | None = None
    created_at: str = field(default_factory=utc_now_iso)


@dataclass
class FileMetadata:
    id: int | None = None
    path: str = ""
    metadata_text: str | None = None
    updated_at: str = field(default_factory=utc_now_iso)
    updated_by: int | None = None


@dataclass
class UserFolderSetting:
    id: int | None = None
    user_id: int = 0
    folder_path: str = ""
    enabled: bool = False        # indexing toggle
    search_active: bool = False  # MCP search toggle (legacy, see projects)
    created_at: str = field(default_factory=utc_now_iso)


@dataclass
class Project:
    id: int | None = None
    name: str = ""
    user_id: int = 0
    is_default: bool = False
    created_at: str = field(default_factory=utc_now_iso)


@dataclass
class ProjectFolderSetting:
    id: int | None = None
    project_id: int = 0
    folder_path: str = ""
    search_active: bool = False
    created_at: str = field(default_factory=utc_now_iso)


@dataclass
class FolderIndexStatus:
    id: int | None = None
    folder_path: str = ""
    status: str = "none"
    error_message: str | None = None
    indexed_at: str | None = None
    updated_at: str = field(default_factory=utc_now_iso)


@dataclass
class FolderSyncSource:
    id: int | None = None
    folder_path: str = ""
    source_type: str = ""
    # SharePoint
    sp_tenant_id: str | None = None
    sp_client_id: str | None = None
    sp_client_secret: str | None = None
    sp_site_url: str | None = None
    sp_drive_id: str | None = None
    sp_refresh_token: str | None = None
    sp_all_sites: bool | None = None
    sp_selected_sites: str | None = None
    # Google Drive
    gd_service_account_json: str | None = None
    gd_folder_id: str | None = None
    gd_client_id: str | None = None
    gd_client_secret: str | None = None
    gd_refresh_token: str | None = None
    # GitHub
    gh_token: str | None = None
    gh_repo: str | None = None
    gh_branch: str | None = None
    gh_path: str | None = None
    gh_auth_method: str | None = None
    gh_username: str | None = None
    gh_pat: str | None = None
    gh_all_branches: bool | None = None
    # Azure DevOps
    ado_tenant_id: str | None = None
    ado_client_id: str | None = None
    ado_client_secret: str | None = None
    ado_refresh_token: str | None = None
    ado_organization: str | None = None
    ado_project: str | None = None
    ado_url: str | None = None
    # Jira
    jira_url: str | None = None
    jira_project: str | None = None
    jira_token: str | None = None
    jira_auth_method: str | None = None
    jira_email: str | None = None
    # Confluence
    confluence_url: str | None = None
    confluence_space: str | None = None
    confluence_token: str | None = None
    confluence_auth_method: str | None = None
    confluence_email: str | None = None
    # Box
    box_client_id: str | None = None
    box_client_secret: str | None = None
    box_folder_id: str | None = None
    box_refresh_token: str | None = None
    # AWS Glue
    glue_region: str | None = None
    glue_profile: str | None = None
    glue_access_key_id: str | None = None
    glue_secret_access_key: str | None = None
    glue_catalog_id: str | None = None
    glue_databases: str | None = None
    # Filesystem
    fs_path: str | None = None
    is_docker_managed: bool | None = None
    # Sync status
    sync_status: str = "idle"
    sync_error: str | None = None
    last_synced_at: str | None = None
    created_at: str = field(default_factory=utc_now_iso)
    updated_at: str = field(default_factory=utc_now_iso)


@dataclass
class IndexedFile:
    id: int | None = None
    file_path: str = ""
    folder_path: str = ""
    index_folder: str = ""
    content_hash: str = ""
    file_size: int = 0
    chunk_count: int = 0  # negative = indexing in progress (resume marker)
    parse_error: str | None = None  # last parse failure (e.g. OCR needed)
    source_created_at: int | None = None
    source_modified_at: int | None = None
    indexed_at: str = field(default_factory=utc_now_iso)
    updated_at: str = field(default_factory=utc_now_iso)


# table name → dataclass
TABLES = {
    "users": User,
    "file_metadata": FileMetadata,
    "user_folder_settings": UserFolderSetting,
    "projects": Project,
    "project_folder_settings": ProjectFolderSetting,
    "folder_index_status": FolderIndexStatus,
    "folder_sync_sources": FolderSyncSource,
    "indexed_files": IndexedFile,
}

_SQL_TYPES = {int: "INTEGER", bool: "INTEGER", str: "TEXT"}


def _column_sql_type(f) -> str:
    t = f.type
    for base, sql in (("int", "INTEGER"), ("bool", "INTEGER"), ("str", "TEXT")):
        if t.startswith(base):
            return sql
    return "TEXT"


def ddl() -> str:
    """Generate CREATE TABLE statements from the dataclasses."""
    stmts = []
    uniques = {
        "users": ["UNIQUE (name)"],
        "file_metadata": ["UNIQUE (path)"],
        "user_folder_settings": ["UNIQUE (user_id, folder_path)"],
        "projects": ["UNIQUE (user_id, name)"],
        "project_folder_settings": ["UNIQUE (project_id, folder_path)"],
        "folder_index_status": ["UNIQUE (folder_path)"],
        "folder_sync_sources": ["UNIQUE (folder_path)"],
        "indexed_files": ["UNIQUE (file_path)"],
    }
    for table, cls in TABLES.items():
        cols = ["id INTEGER PRIMARY KEY AUTOINCREMENT"]
        for f in fields(cls):
            if f.name == "id":
                continue
            cols.append(f"{f.name} {_column_sql_type(f)}")
        cols.extend(uniques.get(table, []))
        stmts.append(
            f"CREATE TABLE IF NOT EXISTS {table} (\n  " + ",\n  ".join(cols) + "\n);")
    stmts.append("CREATE INDEX IF NOT EXISTS idx_if_folder ON indexed_files (folder_path);")
    stmts.append("CREATE INDEX IF NOT EXISTS idx_if_index_folder ON indexed_files (index_folder);")
    stmts.append("CREATE INDEX IF NOT EXISTS idx_ufs_folder ON user_folder_settings (folder_path);")
    stmts.append("CREATE INDEX IF NOT EXISTS idx_pfs_folder ON project_folder_settings (folder_path);")
    return "\n".join(stmts)
