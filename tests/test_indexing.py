"""Indexing service end-to-end: hash skip/repair, folder indexing,
sync_folder reconciliation, sidecars, worker."""

import json
import time

import pytest

from voitta_rag_tpu.db import database as dbmod


@pytest.fixture
def env(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_MODEL", "test-tiny")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    monkeypatch.setenv("CHUNK_SIZE", "120")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    dbmod.reset_db()

    from voitta_rag_tpu.index.store import TpuVectorStore
    from voitta_rag_tpu.services.embedding import EmbeddingService
    from voitta_rag_tpu.services.filesystem import FilesystemService
    from voitta_rag_tpu.services.indexing import IndexingService
    from voitta_rag_tpu.services.chunking import ChunkingService

    store = TpuVectorStore(dimension=64)
    svc = IndexingService(
        vector_store=store,
        embedder=EmbeddingService(model_name="test-tiny", model_path="",
                                  max_seq_len=32),
        chunker=ChunkingService(chunk_size=120, chunk_overlap=10),
        fs=FilesystemService(temp_root),
    )
    yield temp_root, svc, store
    store.close()
    dbmod.reset_db()


def write_docs(root):
    d = root / "docs"
    d.mkdir(exist_ok=True)
    (d / "a.md").write_text("alpha document about kangaroos. " * 10)
    (d / "b.md").write_text("beta document about spacecraft. " * 10)
    (d / "sub").mkdir(exist_ok=True)
    (d / "sub" / "c.txt").write_text("gamma notes about cooking pasta. " * 10)


def test_index_folder_and_skip_on_reindex(env):
    root, svc, store = env
    write_docs(root)
    stats = svc.index_folder("docs")
    assert stats["indexed"] == 3 and stats["errors"] == 0
    assert store.count() > 0
    db = dbmod.get_db()
    assert db.get_index_status("docs").status == "indexed"
    rec = db.get_indexed_file("docs/a.md")
    assert rec.chunk_count > 0
    assert rec.index_folder == "docs"
    assert rec.folder_path == "docs"

    # Second run: all unchanged → skipped.
    stats2 = svc.index_folder("docs")
    assert stats2["skipped"] == 3 and stats2["indexed"] == 0


def test_changed_file_reindexed(env):
    root, svc, store = env
    write_docs(root)
    svc.index_folder("docs")
    before = store.count_chunks_for_file("docs/a.md")
    (root / "docs" / "a.md").write_text("totally new content. " * 30)
    stats = svc.index_folder("docs")
    assert stats["indexed"] == 1 and stats["skipped"] == 2
    after = store.count_chunks_for_file("docs/a.md")
    assert after > 0
    db = dbmod.get_db()
    assert db.get_indexed_file("docs/a.md").chunk_count == after


def test_interrupted_marker_triggers_reindex(env):
    root, svc, store = env
    write_docs(root)
    svc.index_folder("docs")
    db = dbmod.get_db()
    db.set_chunk_count("docs/a.md", -3)  # simulate crash mid-index
    stats = svc.index_folder("docs")
    assert stats["indexed"] == 1
    assert db.get_indexed_file("docs/a.md").chunk_count > 0


def test_count_mismatch_repair(env):
    root, svc, store = env
    write_docs(root)
    svc.index_folder("docs")
    # Remove chunks from the store behind the DB's back.
    store.delete_by_file("docs/b.md")
    stats = svc.index_folder("docs")
    assert stats["indexed"] == 1  # b.md repaired
    assert store.count_chunks_for_file("docs/b.md") > 0


def test_sync_folder_reconciles(env):
    root, svc, store = env
    write_docs(root)
    svc.index_folder("docs")
    # Delete one, change one, add one.
    (root / "docs" / "a.md").unlink()
    (root / "docs" / "b.md").write_text("changed beta content. " * 20)
    (root / "docs" / "d.md").write_text("delta fresh file. " * 20)
    stats = svc.sync_folder("docs")
    assert stats["removed"] == 1
    assert stats["reindexed"] == 1
    assert stats["added"] == 1
    assert store.count_chunks_for_file("docs/a.md") == 0
    assert store.count_chunks_for_file("docs/d.md") > 0


def test_sidecar_timestamps_and_source_url(env):
    root, svc, store = env
    d = root / "synced"
    d.mkdir()
    (d / "x.md").write_text("synced doc content. " * 10)
    (d / ".voitta_timestamps.json").write_text(json.dumps({
        "x.md": {"created_at": "2024-01-02T00:00:00+00:00",
                 "modified_at": "2024-06-01T12:00:00+00:00"}}))
    (d / ".voitta_sources.json").write_text(json.dumps({
        "x.md": "https://example.com/doc/x"}))
    svc.index_file("synced/x.md", index_folder="synced")
    chunks = store.get_chunks_for_file("synced/x.md")
    assert chunks
    m = chunks[0].metadata
    assert m.source_created_at == 1704153600
    assert m.source_modified_at == 1717243200
    assert m.source_url == "https://example.com/doc/x"


def test_acl_sidecar_with_default(env):
    root, svc, store = env
    d = root / "acl"
    d.mkdir()
    (d / "doc.md").write_text("secret doc. " * 10)
    (d / "other.md").write_text("default acl doc. " * 10)
    (d / ".voitta_acl.json").write_text(json.dumps({
        "doc.md": ["alice@example.com"],
        "_default": ["everyone@example.com"]}))
    svc.index_file("acl/doc.md", index_folder="acl")
    svc.index_file("acl/other.md", index_folder="acl")
    assert store.get_chunks_for_file("acl/doc.md")[0].metadata.allowed_users \
        == ["alice@example.com"]
    assert store.get_chunks_for_file("acl/other.md")[0].metadata.allowed_users \
        == ["everyone@example.com"]


def test_unsupported_files_skipped(env):
    root, svc, store = env
    d = root / "docs"
    d.mkdir(exist_ok=True)
    (d / "img.qoi").write_bytes(b"\x00" * 100)
    r = svc.index_file("docs/img.qoi", index_folder="docs")
    assert r["status"] == "skipped" and r["reason"] == "unsupported"


def test_worker_processes_pending(env, monkeypatch):
    root, svc, store = env
    write_docs(root)
    import voitta_rag_tpu.services.indexing as indexing_mod
    monkeypatch.setattr(indexing_mod, "_indexing_service", svc)
    from voitta_rag_tpu.services.indexing_worker import IndexingWorker

    db = dbmod.get_db()
    db.set_index_status("docs", "pending")
    worker = IndexingWorker(poll_interval=9999)
    n = worker.process_pending()
    assert n == 1
    assert db.get_index_status("docs").status == "indexed"
    assert store.count() > 0


def test_worker_auto_optimizes_after_burst(env, monkeypatch):
    """After the last pending folder of a burst, the worker rebuilds stale
    snapshots so serving returns to the postings/IVF fast path without a
    manual /api/index/optimize call."""
    root, svc, store = env
    write_docs(root)
    import voitta_rag_tpu.services.indexing as indexing_mod
    import voitta_rag_tpu.index.store as storemod
    monkeypatch.setattr(indexing_mod, "_indexing_service", svc)
    monkeypatch.setattr(storemod, "_vector_store", store)
    monkeypatch.setenv("VOITTA_AUTO_OPTIMIZE_MIN_ROWS", "1")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.services.indexing_worker import IndexingWorker

    db = dbmod.get_db()
    db.set_index_status("docs", "pending")
    worker = IndexingWorker(poll_interval=9999)
    assert not store.postings_active
    worker.process_pending()
    assert store.postings_active  # rebuilt by the worker

    # New mutations invalidate; the next burst rebuilds again.
    (root / "docs" / "d.md").write_text("delta document about oceans. " * 10)
    db.set_index_status("docs", "pending")
    worker.process_pending()
    assert store.postings_active

    # Disabled via env → stale snapshots stay stale.
    monkeypatch.setenv("VOITTA_AUTO_OPTIMIZE", "false")
    get_settings.cache_clear()
    (root / "docs" / "e.md").write_text("epsilon document about trains. " * 10)
    db.set_index_status("docs", "pending")
    worker.process_pending()
    assert not store.postings_active
    get_settings.cache_clear()
