"""Store-level postings integration: build, snapshot search, invalidation.

The postings snapshot must return the same hybrid results as the exact
slot-scan path (same BM25 weights, same fusion) for uncapped term runs.
"""

from datetime import datetime, timezone

import numpy as np
import pytest

from voitta_rag_tpu.core_types import ChunkMetadata
from voitta_rag_tpu.index.store import TpuVectorStore
from voitta_rag_tpu.search.sparse_text import SparseEmbeddingService

DIM = 32
N = 400


@pytest.fixture
def store(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "256")  # multi-segment
    monkeypatch.setenv("EMBEDDING_DIMENSION", str(DIM))
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    s = TpuVectorStore()
    yield s
    s.close()


def fill(store, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((N, DIM)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    texts = [f"document number {i} keyword{i % 7} common" for i in range(N)]
    metas = [ChunkMetadata(
        file_path=f"d/f{i}.md", folder_path=f"fold{i % 3}",
        index_folder="d", file_name=f"f{i}.md", chunk_index=0,
        total_chunks=1, start_char=0, end_char=5,
        indexed_at=datetime.now(timezone.utc).isoformat()) for i in range(N)]
    sparse = SparseEmbeddingService().embed(texts)
    store.store_chunks(texts, v, metas, sparse)
    return v


def hybrid(store, q, **kw):
    sv = SparseEmbeddingService().embed_query(kw.pop("text", "keyword3"))
    return store.search(q, sparse_query=sv, **kw)


def test_build_and_parity_with_slot_scan(store):
    v = fill(store)
    assert not store.postings_active
    info = store.build_postings()
    assert info["postings"] > 0
    assert store.postings_active

    snap = hybrid(store, v[42], limit=5, sparse_weight=0.5)
    store._postings_dirty = True  # force exact slot-scan path
    exact = hybrid(store, v[42], limit=5, sparse_weight=0.5)
    store._postings_dirty = False
    assert [r.id for r in snap] == [r.id for r in exact]
    np.testing.assert_allclose([r.score for r in snap],
                               [r.score for r in exact], rtol=1e-5)


def test_postings_with_filters(store):
    v = fill(store, seed=1)
    store.build_postings()
    res = hybrid(store, v[0], limit=20, include_folders=["fold1"],
                 sparse_weight=0.9)
    assert res
    assert all(r.metadata.folder_path == "fold1" for r in res)


def test_postings_sparse_ranking(store):
    v = fill(store, seed=2)
    store.build_postings()
    res = hybrid(store, v[10], limit=5, sparse_weight=0.95, text="keyword3")
    assert res
    top_i = int(res[0].metadata.file_path.split("f")[-1].split(".")[0])
    assert top_i % 7 == 3


def test_mutation_invalidates_postings(store):
    v = fill(store, seed=3)
    store.build_postings()
    assert store.postings_active
    store.delete_by_file("d/f0.md")
    assert not store.postings_active
    res = hybrid(store, v[1], limit=5)
    assert all(r.metadata.file_path != "d/f0.md" for r in res)


def test_postings_plus_ivf_combined(store):
    rng = np.random.default_rng(4)
    centers = rng.standard_normal((8, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = centers[rng.integers(0, 8, N)] + 0.15 * rng.standard_normal((N, DIM))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    texts = [f"clustered doc {i} keyword{i % 5}" for i in range(N)]
    metas = [ChunkMetadata(
        file_path=f"d/g{i}.md", folder_path="fold0", index_folder="d",
        file_name=f"g{i}.md", chunk_index=0, total_chunks=1, start_char=0,
        end_char=5, indexed_at="now") for i in range(N)]
    store.store_chunks(texts, v, metas, SparseEmbeddingService().embed(texts))
    store.build_postings()
    store.build_ivf(n_cells=8, nprobe=8, kmeans_iters=4)
    assert store.ivf_active and store.postings_active
    res = hybrid(store, v[42], limit=5, sparse_weight=0.3)
    assert res[0].metadata.file_path == "d/g42.md"


def test_rrf_fusion_on_snapshot(store):
    v = fill(store, seed=5)
    store.build_postings()
    sv = SparseEmbeddingService().embed_query("keyword2")
    res = store.search(v[2], limit=5, sparse_query=sv, fusion="rrf")
    assert res
    assert res[0].metadata.file_path == "d/f2.md"
