"""Ops-script smoke tests: the disaster-recovery contract (SURVEY §5.3 —
reference scripts/sync_qdrant_stats.py / build_sparse_vectors.py)."""

import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _seed_store(temp_root, n=12):
    from voitta_rag_tpu.core_types import ChunkMetadata
    from voitta_rag_tpu.index.store import (
        get_vector_store, reset_vector_store,
    )

    reset_vector_store()  # the singleton may carry a prior test's paths
    store = get_vector_store()
    rng = np.random.default_rng(0)
    kb = temp_root / "kb"
    kb.mkdir(exist_ok=True)
    texts, metas = [], []
    for i in range(n):
        p = kb / f"f{i // 3}.md"
        p.write_text(f"file {i // 3} body")
        texts.append(f"chunk {i} searchable text body")
        metas.append(ChunkMetadata(
            file_path=f"kb/f{i // 3}.md", file_name=f"f{i // 3}.md",
            folder_path="kb", index_folder="kb", chunk_index=i % 3,
            total_chunks=3, start_char=0, end_char=10,
            indexed_at="2026-08-17T00:00:00Z"))
    dense = rng.standard_normal((n, store.dimension)).astype(np.float32)
    store.store_chunks(texts, dense, metas)
    store.save()
    return store


def _run(script):
    # temp_root's monkeypatched VOITTA_* env vars are inherited, so the
    # subprocess operates on the same root/db/index as the test process.
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run([sys.executable, str(REPO / "scripts" / script)],
                          capture_output=True, text=True, env=env,
                          timeout=300)


def test_rebuild_index_stats(temp_root, monkeypatch):
    """Payload store → SQLite indexed_files recovery after 'disaster'."""
    from voitta_rag_tpu.db.database import get_db, init_db, reset_db

    _seed_store(temp_root)
    # Disaster: the SQLite bookkeeping is lost (fresh DB).
    proc = _run("rebuild_index_stats.py")
    assert proc.returncode == 0, proc.stderr[-800:]
    assert "rebuilt 4 indexed_files rows from 12 chunks" in proc.stdout

    init_db()
    recs = get_db().indexed_files_under("kb")
    assert len(recs) == 4
    by_path = {r.file_path: r for r in recs}
    assert by_path["kb/f0.md"].chunk_count == 3
    assert by_path["kb/f0.md"].content_hash  # recomputed from disk
    reset_db()


def test_rebuild_sparse_vectors(temp_root, monkeypatch):
    """Sparse backfill populates term slots for dense-only chunks."""
    store = _seed_store(temp_root)
    store.close()
    proc = _run("rebuild_sparse_vectors.py")
    assert proc.returncode == 0, proc.stderr[-800:]

    from voitta_rag_tpu.index.store import TpuVectorStore
    from voitta_rag_tpu.search.sparse_text import get_sparse_embedding_service

    s2 = TpuVectorStore(index_dir=None)
    try:
        # A hybrid query over the backfilled terms finds the right chunk.
        sv = get_sparse_embedding_service().embed_query(
            "chunk 7 searchable text body")
        rng = np.random.default_rng(0)
        dense = rng.standard_normal((12, s2.dimension)).astype(np.float32)
        q = dense[7] / np.linalg.norm(dense[7])
        hits = s2.search(q, limit=3, sparse_query=sv, sparse_weight=0.5)
        assert hits and hits[0].text == "chunk 7 searchable text body"
    finally:
        s2.close()
