"""Metadata store: schema, migrations, users/projects, indexed files."""

import pytest

from voitta_rag_tpu.db import database as dbmod
from voitta_rag_tpu.db.models import FolderSyncSource, IndexedFile


@pytest.fixture
def db(temp_root):
    dbmod.reset_db()
    yield dbmod.get_db()
    dbmod.reset_db()


def test_get_or_create_user_with_default_project(db):
    u = db.get_or_create_user("alice")
    assert u.id is not None
    u2 = db.get_or_create_user("alice")
    assert u2.id == u.id
    proj = db.get_active_project(db.get_user_by_name("alice"))
    assert proj.is_default and proj.name == "Default"


def test_folder_settings_and_project_active(db):
    u = db.get_or_create_user("bob")
    proj = db.get_active_project(u)
    db.upsert_folder_setting(u.id, "docs", enabled=True)
    s = db.folder_setting(u.id, "docs")
    assert s.enabled and not s.search_active
    db.set_project_folder_active(proj.id, "docs", True)
    assert db.project_folder_active(proj.id, "docs")
    assert db.active_folders_for_project(proj.id) == ["docs"]
    db.set_project_folder_active(proj.id, "docs", False)
    assert db.active_folders_for_project(proj.id) == []


def test_index_status_lifecycle(db):
    db.set_index_status("docs", "pending")
    assert db.get_index_status("docs").status == "pending"
    assert [f.folder_path for f in db.folders_with_status("pending")] == ["docs"]
    db.set_index_status("docs", "indexed", indexed_at="2026-01-01T00:00:00")
    st = db.get_index_status("docs")
    assert st.status == "indexed" and st.indexed_at is not None
    with pytest.raises(AssertionError):
        db.set_index_status("docs", "bogus")


def test_indexed_file_upsert_and_chunk_count(db):
    rec = IndexedFile(file_path="a/b.md", folder_path="a", index_folder="a",
                      content_hash="x" * 64, file_size=10, chunk_count=-1)
    db.upsert_indexed_file(rec)
    got = db.get_indexed_file("a/b.md")
    assert got.chunk_count == -1  # in-progress marker
    db.set_chunk_count("a/b.md", 7)
    assert db.get_indexed_file("a/b.md").chunk_count == 7
    rec.content_hash = "y" * 64
    db.upsert_indexed_file(rec)
    assert db.get_indexed_file("a/b.md").content_hash == "y" * 64


def test_sync_source_roundtrip(db):
    src = FolderSyncSource(folder_path="repos/x", source_type="github",
                           gh_repo="org/x", gh_branch="main",
                           gh_auth_method="token", gh_pat="secret")
    db.upsert_sync_source(src)
    got = db.get_sync_source("repos/x")
    assert got.gh_repo == "org/x"
    db.update_sync_source("repos/x", sync_status="syncing")
    assert db.get_sync_source("repos/x").sync_status == "syncing"
    db.delete_sync_source("repos/x")
    assert db.get_sync_source("repos/x") is None


def test_additive_migration(db):
    # Simulate an old table missing a column; init re-adds it.
    db.execute("ALTER TABLE users DROP COLUMN active_project_id")
    db._migrate_additive_columns()
    assert "active_project_id" in db._columns("users")


def test_file_metadata(db):
    u = db.get_or_create_user("meta-user")
    db.set_file_metadata("docs/readme.md", "important file", u.id)
    assert db.get_file_metadata("docs/readme.md").metadata_text == "important file"
    m = db.file_metadata_for_paths(["docs/readme.md", "nope"])
    assert m == {"docs/readme.md": "important file"}


def test_users_seeded_from_users_txt(temp_root):
    (temp_root / "users.txt").write_text("carol\ndave\n# comment\n")
    dbmod.reset_db()
    dbmod.init_db()
    db = dbmod.get_db()
    names = {u.name for u in db.list_users()}
    assert {"carol", "dave"} <= names
    dbmod.reset_db()
