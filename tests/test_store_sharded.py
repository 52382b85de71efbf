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


def test_sharded_ivf_requires_rows(store):
    texts, dense, metas, sparse = make_batch(64, seed=3)
    store.store_chunks(texts, dense, metas, sparse)
    with pytest.raises(ValueError):
        store.build_ivf(n_cells=4)  # < 256 live rows


def test_sharded_delete_keeps_df_exact(store):
    """Sharded deletes must decrement document frequencies exactly (the
    round-1 implementation let IDF go stale; VERDICT.md weak #6)."""
    texts, dense, metas, sparse = make_batch(64, seed=4)
    store.store_chunks(texts, dense, metas, sparse)
    # Term 100 appears in rows with i % 7 == 0 (10 of 64 rows).
    assert store.payloads.term_dfs([100])[100] == 10
    # f0 covers rows 0-3; rows 0 (term 100) among them.
    store.delete_by_file("kb/f0.md")
    dfs = store.payloads.term_dfs([100, 101, 102, 103])
    # Recount over surviving rows i in [4, 64): i % 7 == 0.
    expect = {t: sum(1 for i in range(4, 64) if 100 + i % 7 == t)
              for t in (100, 101, 102, 103)}
    assert dfs == expect


@pytest.fixture()
def big_store(temp_root, monkeypatch):
    """Non-toy shard capacity: 8 shards x 8192 rows, 384-d."""
    monkeypatch.setenv("VOITTA_INDEX_SHARDS", "8")
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", str(8 * 8192))
    monkeypatch.setenv("EMBEDDING_DIMENSION", "384")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    s = TpuVectorStore(index_dir=temp_root / "index")
    yield s
    s.close()
    get_settings.cache_clear()


def test_sharded_ivf_search(big_store):
    """Per-chip IVF at non-toy capacity: recall vs the exact sharded scan."""
    store = big_store
    rng = np.random.default_rng(7)
    n, dim = 4096, 384
    # Clustered corpus so IVF has real structure to find.
    centers = rng.standard_normal((32, dim)).astype(np.float32)
    cid = rng.integers(0, 32, n)
    dense = centers[cid] + 0.3 * rng.standard_normal((n, dim)).astype(np.float32)
    texts = [f"chunk {i}" for i in range(n)]
    metas = [ChunkMetadata(file_path=f"kb/f{i // 8}.md", file_name=f"f{i // 8}.md",
                           folder_path="kb", index_folder="kb",
                           chunk_index=i % 8, total_chunks=8,
                           start_char=0, end_char=10,
                           indexed_at="2026-08-16T00:00:00Z")
             for i in range(n)]
    for lo in range(0, n, 1024):
        store.store_chunks(texts[lo:lo + 1024], dense[lo:lo + 1024],
                           metas[lo:lo + 1024])
    info = store.build_ivf(n_cells=64, nprobe=16)
    assert info["shards"] == 8
    assert info["rows"] == n
    assert store.ivf_active

    hits_exact, hits_ivf = [], []
    for qi in (5, 777, 2048, 4000):
        q = dense[qi] / np.linalg.norm(dense[qi])
        # IVF path (active) vs exact flat sharded scan (forced by nprobe=None
        # via direct ShardedIndex.search).
        got = store.search(q, limit=10)
        assert got and got[0].text == texts[qi]  # self-retrieval through IVF
        hits_ivf.append({h.text for h in got})
        from voitta_rag_tpu.ops.filters import make_filter_spec
        import jax.numpy as jnp
        scores, gids = store._sharded.search(
            jnp.asarray(q.reshape(1, -1)), make_filter_spec(), limit=10)
        live = [int(g) for g in np.asarray(gids)[0] if g >= 0]
        chunks = store.payloads.get_chunks(live)
        exact = {chunks[g].text for g in live if g in chunks}
        hits_exact.append(exact)
    recall = np.mean([len(a & b) / 10 for a, b in zip(hits_ivf, hits_exact)])
    assert recall >= 0.9, recall

    # Mutation invalidates the snapshot; exact scan takes over (still correct).
    store.delete_by_file("kb/f0.md")
    assert not store.ivf_active
    q = dense[100] / np.linalg.norm(dense[100])
    got = store.search(q, limit=3)
    assert got and got[0].text == texts[100]

    # Rebuild folds the tombstones in.
    store.build_ivf(n_cells=64, nprobe=16)
    assert store.ivf_active
    q0 = dense[0] / np.linalg.norm(dense[0])
    got = store.search(q0, limit=10)
    assert all(h.metadata.file_path != "kb/f0.md" for h in got)


def test_sharded_ivf_hybrid_and_filters(big_store):
    store = big_store
    rng = np.random.default_rng(8)
    n, dim = 2048, 384
    dense = rng.standard_normal((n, dim)).astype(np.float32)
    texts = [f"chunk {i}" for i in range(n)]
    sparse = [SparseVector(indices=[1000 + i % 50], values=[1.0])
              for i in range(n)]
    metas = [ChunkMetadata(file_path=f"{'a' if i < n // 2 else 'b'}/f{i}.md",
                           file_name=f"f{i}.md",
                           folder_path="a" if i < n // 2 else "b",
                           index_folder="a" if i < n // 2 else "b",
                           chunk_index=0, total_chunks=1,
                           start_char=0, end_char=10,
                           indexed_at="2026-08-16T00:00:00Z")
             for i in range(n)]
    store.store_chunks(texts, dense, metas, sparse)
    store.build_ivf(n_cells=8, nprobe=4)

    qi = 42
    q = dense[qi] / np.linalg.norm(dense[qi])
    # Hybrid through the sharded IVF path still self-retrieves.
    got = store.search(q, limit=5, sparse_query=sparse[qi], sparse_weight=0.3)
    assert got and got[0].text == texts[qi]
    # Folder filter respected inside the probe kernel's mask.
    got = store.search(q, limit=5, include_folders=["b"])
    assert got and all(h.metadata.folder_path == "b" for h in got)


def test_sharded_postings(big_store):
    """Per-chip inverted postings: sharded hybrid results match the exact
    slot-scan path, and the store routes through the snapshot."""
    store = big_store
    rng = np.random.default_rng(11)
    n, dim = 2048, 384
    dense = rng.standard_normal((n, dim)).astype(np.float32)
    texts = [f"chunk {i}" for i in range(n)]
    sparse = [SparseVector(indices=[2000 + i % 37, 3000 + i % 11],
                           values=[1.0, 0.4]) for i in range(n)]
    metas = [ChunkMetadata(file_path=f"kb/f{i}.md", file_name=f"f{i}.md",
                           folder_path="kb", index_folder="kb",
                           chunk_index=0, total_chunks=1,
                           start_char=0, end_char=10,
                           indexed_at="2026-08-16T00:00:00Z")
             for i in range(n)]
    store.store_chunks(texts, dense, metas, sparse)

    qi = 123
    q = dense[qi] / np.linalg.norm(dense[qi])
    exact = store.search(q, limit=10, sparse_query=sparse[qi],
                         sparse_weight=0.3)
    assert not store.postings_active
    info = store.build_postings()
    assert info["shards"] == 8 and info["postings"] == 2 * n
    assert store.postings_active
    snap = store.search(q, limit=10, sparse_query=sparse[qi],
                        sparse_weight=0.3)
    assert snap and snap[0].text == texts[qi]
    assert [h.text for h in snap] == [h.text for h in exact]

    # Mutations invalidate; the slot scan takes over transparently.
    store.delete_by_file(f"kb/f{qi}.md")
    assert not store.postings_active
    got = store.search(q, limit=5, sparse_query=sparse[qi],
                       sparse_weight=0.3)
    assert all(h.text != texts[qi] for h in got)

    # IVF + postings together (the full snapshot serving path).
    store.build_ivf(n_cells=8, nprobe=4)
    store.build_postings()
    assert store.ivf_active and store.postings_active
    q2 = dense[400] / np.linalg.norm(dense[400])
    got = store.search(q2, limit=5, sparse_query=sparse[400],
                       sparse_weight=0.3)
    assert got and got[0].text == texts[400]


@pytest.fixture()
def pod_store(temp_root, monkeypatch):
    """Pod topology: 2 slices x 4 chips on the 8-device CPU mesh —
    hierarchical ICI-then-DCN candidate merge (BASELINE config 5)."""
    monkeypatch.setenv("VOITTA_INDEX_SHARDS", "8")
    monkeypatch.setenv("VOITTA_INDEX_SLICES", "2")
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", str(8 * 1024))
    monkeypatch.setenv("EMBEDDING_DIMENSION", "128")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    s = TpuVectorStore(index_dir=temp_root / "index")
    yield s
    s.close()
    get_settings.cache_clear()


def test_pod_mesh_hierarchical_merge(pod_store, temp_root):
    """2-level merge matches the flat exact result; IVF + postings +
    spill/restore all work over the pod mesh."""
    store = pod_store
    from voitta_rag_tpu.parallel.mesh import SLICE_AXIS

    assert store.sharded_active
    assert SLICE_AXIS in store._sharded.mesh.axis_names
    assert store._sharded.n_shards == 8

    rng = np.random.default_rng(21)
    n, dim = 2048, 128
    dense = rng.standard_normal((n, dim)).astype(np.float32)
    texts = [f"chunk {i}" for i in range(n)]
    sparse = [SparseVector(indices=[500 + i % 23], values=[1.0])
              for i in range(n)]
    metas = [ChunkMetadata(file_path=f"kb/f{i}.md", file_name=f"f{i}.md",
                           folder_path="kb", index_folder="kb",
                           chunk_index=0, total_chunks=1,
                           start_char=0, end_char=10,
                           indexed_at="2026-08-16T00:00:00Z")
             for i in range(n)]
    store.store_chunks(texts, dense, metas, sparse)

    # Exact merge: results equal a NumPy oracle's top-10 (dense-only).
    q = dense[777] / np.linalg.norm(dense[777])
    got = store.search(q, limit=10)
    got_texts = [h.text for h in got]
    dn = dense / np.linalg.norm(dense, axis=1, keepdims=True)
    oracle = list(np.argsort(-(dn @ q))[:10])
    assert got_texts == [texts[i] for i in oracle]

    # Hybrid self-retrieval through the hierarchical merge.
    got = store.search(q, limit=5, sparse_query=sparse[777],
                       sparse_weight=0.3)
    assert got and got[0].text == texts[777]

    # Snapshots over the pod mesh.
    store.build_ivf(n_cells=8, nprobe=4)
    store.build_postings()
    assert store.ivf_active and store.postings_active
    got = store.search(q, limit=5, sparse_query=sparse[777],
                       sparse_weight=0.3)
    assert got and got[0].text == texts[777]

    # Spill + restore preserves the pod layout.
    store.save()
    store.close()
    from voitta_rag_tpu.index.store import TpuVectorStore

    s2 = TpuVectorStore(index_dir=temp_root / "index")
    try:
        assert s2.count() == n
        got = s2.search(q, limit=3)
        assert got and got[0].text == texts[777]
    finally:
        s2.close()
