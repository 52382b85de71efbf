"""Store-level IVF integration: build, accelerated search, invalidation."""

from datetime import datetime, timezone

import numpy as np
import pytest

from voitta_rag_tpu.core_types import ChunkMetadata
from voitta_rag_tpu.index.store import TpuVectorStore
from voitta_rag_tpu.search.sparse_text import SparseEmbeddingService

DIM = 32
N = 600


@pytest.fixture
def store(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", str(DIM))
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    s = TpuVectorStore()
    yield s
    s.close()


def fill(store, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((8, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = centers[rng.integers(0, 8, N)] + 0.15 * rng.standard_normal((N, DIM))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    texts = [f"doc {i} keyword{i % 7}" for i in range(N)]
    metas = [ChunkMetadata(
        file_path=f"d/f{i}.md", folder_path=f"fold{i % 3}",
        index_folder="d", file_name=f"f{i}.md", chunk_index=0,
        total_chunks=1, start_char=0, end_char=5,
        indexed_at=datetime.now(timezone.utc).isoformat()) for i in range(N)]
    sparse = SparseEmbeddingService().embed(texts)
    store.store_chunks(texts, v, metas, sparse)
    return v


def test_build_and_search_via_ivf(store):
    v = fill(store)
    assert not store.ivf_active
    info = store.build_ivf(n_cells=8, nprobe=8, kmeans_iters=4)
    assert info["rows"] == N
    assert store.ivf_active

    res = store.search(v[42], limit=5)
    assert res[0].metadata.file_path == "d/f42.md"
    # Full probe (nprobe=8 of 8 cells) is exact vs the flat oracle.
    store._ivf_dirty = True  # force flat
    flat = store.search(v[42], limit=5)
    store._ivf_dirty = False
    assert [r.id for r in res] == [r.id for r in flat]


def test_ivf_with_filters(store):
    v = fill(store, seed=1)
    store.build_ivf(n_cells=8, nprobe=8, kmeans_iters=4)
    res = store.search(v[0], limit=20, include_folders=["fold1"])
    assert res
    assert all(r.metadata.folder_path == "fold1" for r in res)


def test_ivf_hybrid(store):
    v = fill(store, seed=2)
    store.build_ivf(n_cells=8, nprobe=8, kmeans_iters=4)
    sv = SparseEmbeddingService().embed_query("keyword3")
    res = store.search(v[10], limit=5, sparse_query=sv, sparse_weight=0.9)
    assert res
    # keyword3 appears in docs with i % 7 == 3
    assert int(res[0].metadata.file_path.split("f")[-1].split(".")[0]) % 7 == 3


def test_mutation_invalidates_ivf(store):
    v = fill(store, seed=3)
    store.build_ivf(n_cells=8, nprobe=4, kmeans_iters=4)
    assert store.ivf_active
    store.delete_by_file("d/f0.md")
    assert not store.ivf_active  # falls back to exact flat scan
    res = store.search(v[1], limit=5)
    assert all(r.metadata.file_path != "d/f0.md" for r in res)


def test_build_requires_enough_rows(store):
    rng = np.random.default_rng(0)
    v = rng.standard_normal((10, DIM)).astype(np.float32)
    metas = [ChunkMetadata(
        file_path=f"x/{i}.md", folder_path="x", index_folder="x",
        file_name=f"{i}.md", chunk_index=0, total_chunks=1, start_char=0,
        end_char=1, indexed_at="now") for i in range(10)]
    store.store_chunks([f"t{i}" for i in range(10)], v, metas)
    with pytest.raises(ValueError):
        store.build_ivf(n_cells=4)


def test_layout_knob_parity(store, monkeypatch):
    """VOITTA_IVF_LAYOUT selects the device layout; at full probe both the
    flat (variable-length lists, index/ivf_flat.py) and padded (fixed cell
    blocks, index/ivf.py) layouts are exact vs the flat-scan oracle, so
    their results agree. Stats dicts carry layout-specific keys."""
    from voitta_rag_tpu.config import get_settings

    v = fill(store, seed=4)
    store._ivf_dirty = True  # exact flat-scan oracle
    oracle = [r.id for r in store.search(v[7], limit=5)]

    monkeypatch.setenv("VOITTA_IVF_LAYOUT", "flat")
    get_settings.cache_clear()
    info_flat = store.build_ivf(n_cells=8, nprobe=8, kmeans_iters=4)
    assert info_flat["layout"] == "flat"
    assert info_flat["rows"] == N
    assert info_flat["probe_cap"] > 0
    assert info_flat["virtual_cells"] >= 8
    got_flat = [r.id for r in store.search(v[7], limit=5)]

    monkeypatch.setenv("VOITTA_IVF_LAYOUT", "padded")
    get_settings.cache_clear()
    info_pad = store.build_ivf(n_cells=8, nprobe=8, kmeans_iters=4)
    assert info_pad["layout"] == "padded"
    assert "cell_cap" in info_pad and "residual" in info_pad
    got_pad = [r.id for r in store.search(v[7], limit=5)]

    get_settings.cache_clear()
    assert got_flat == oracle
    assert got_pad == oracle
