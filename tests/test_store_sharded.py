"""TpuVectorStore in sharded mode (VOITTA_INDEX_SHARDS=8 over the virtual
8-device CPU mesh): upsert → search → delete → spill/restore, same store
contract as flat mode."""

import numpy as np
import pytest

from voitta_rag_tpu.core_types import ChunkMetadata, SparseVector

DIM = 32


@pytest.fixture()
def store(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_INDEX_SHARDS", "8")
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "256")
    monkeypatch.setenv("EMBEDDING_DIMENSION", str(DIM))
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    s = TpuVectorStore(index_dir=temp_root / "index")
    yield s
    s.close()
    get_settings.cache_clear()


def make_batch(n, seed=0, folder="kb"):
    rng = np.random.default_rng(seed)
    dense = rng.standard_normal((n, DIM)).astype(np.float32)
    texts = [f"chunk {i} of {folder}" for i in range(n)]
    metas = [ChunkMetadata(file_path=f"{folder}/f{i // 4}.md",
                           file_name=f"f{i // 4}.md",
                           folder_path=folder, index_folder=folder,
                           chunk_index=i % 4, total_chunks=4,
                           start_char=0, end_char=10,
                           indexed_at="2026-08-16T00:00:00Z")
             for i in range(n)]
    sparse = [SparseVector(indices=[100 + i % 7, 200 + i % 3],
                           values=[1.0, 0.5]) for i in range(n)]
    return texts, dense, metas, sparse


def test_sharded_upsert_search_delete(store):
    assert store.sharded_active
    texts, dense, metas, sparse = make_batch(64)
    pids = store.store_chunks(texts, dense, metas, sparse)
    assert len(pids) == 64
    assert store.count() == 64

    # Self-query: row 10's vector must retrieve its own chunk first.
    q = dense[10] / np.linalg.norm(dense[10])
    hits = store.search(q, limit=3)
    assert hits and hits[0].text == texts[10]

    # Hybrid with the row's own sparse terms still finds it.
    hits = store.search(q, limit=3, sparse_query=sparse[10],
                        sparse_weight=0.3)
    assert hits and hits[0].text == texts[10]

    # Folder filter excludes everything -> empty.
    hits = store.search(q, limit=3, include_folders=["nope"])
    assert hits == []

    # Delete one file's chunks (4 rows) and confirm they vanish.
    n = store.delete_by_file("kb/f2.md")
    assert n == 4
    assert store.count() == 60
    q8 = dense[8] / np.linalg.norm(dense[8])  # row 8 lives in f2
    hits = store.search(q8, limit=5)
    assert all(h.metadata.file_path != "kb/f2.md" for h in hits)


def test_sharded_spill_restore(store, temp_root):
    texts, dense, metas, sparse = make_batch(32, seed=1)
    store.store_chunks(texts, dense, metas, sparse)
    store.save()
    store.close()

    from voitta_rag_tpu.index.store import TpuVectorStore

    s2 = TpuVectorStore(index_dir=temp_root / "index")
    try:
        assert s2.sharded_active
        assert s2.count() == 32
        q = dense[5] / np.linalg.norm(dense[5])
        hits = s2.search(q, limit=2)
        assert hits and hits[0].text == texts[5]
        # Writes continue after restore (allocation state persisted).
        t2, d2, m2, sp2 = make_batch(8, seed=2, folder="other")
        s2.store_chunks(t2, d2, m2, sp2)
        assert s2.count() == 40
    finally:
        s2.close()


def test_sharded_rejects_ivf(store):
    texts, dense, metas, sparse = make_batch(64, seed=3)
    store.store_chunks(texts, dense, metas, sparse)
    with pytest.raises(ValueError):
        store.build_ivf(n_cells=4)
