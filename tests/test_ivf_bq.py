"""Composed scale tiers: IVF probing x cold segments x BQ sketches.

The 100M-architecture contract (index/ivf_bq.py): a store whose corpus is
>= 2x the device budget builds an IVF snapshot over the cold segments' BQ
sketches and serves searches through probe -> coarse -> exact-host-rescore
-> candidate fusion, with recall >= 0.97 vs the fully-resident oracle and
EXACT scores on every returned row. Mirrors the reference engine's composed
mmap + ANN + quantized-rescore store (vector_store.py:88-115)."""

from datetime import datetime, timezone

import numpy as np
import pytest

from voitta_rag_tpu.core_types import ChunkMetadata
from voitta_rag_tpu.index.store import TpuVectorStore
from voitta_rag_tpu.search.sparse_text import SparseEmbeddingService

DIM = 64
CAP = 256
N = 1100  # 5 segments of 256; budget 2*CAP leaves >= 2x the budget cold


def meta(file_path="docs/a.md", folder="docs"):
    return ChunkMetadata(
        file_path=file_path, folder_path=folder, index_folder=folder,
        file_name=file_path.rsplit("/", 1)[-1], chunk_index=0,
        total_chunks=1, start_char=0, end_char=10,
        indexed_at=datetime.now(timezone.utc).isoformat())


def clustered_vecs(n, seed=0, n_clusters=16):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32)
    cid = rng.integers(0, n_clusters, n)
    v = centers[cid] + 0.5 * rng.standard_normal((n, DIM)).astype(np.float32)
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def make_corpus():
    vecs = clustered_vecs(N, seed=3)
    texts = [f"chunk {i} about topic {i % 37} and subject {i % 11}"
             for i in range(N)]
    metas = [meta(file_path=f"docs/f{i % 50}.md",
                  folder="docs" if i % 2 == 0 else "notes")
             for i in range(N)]
    sparse = SparseEmbeddingService(avg_len=8.0).embed(texts)
    return vecs, texts, metas, sparse


def build_store(temp_root, monkeypatch, budget, subdir, bq=True):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", str(CAP))
    monkeypatch.setenv("EMBEDDING_DIMENSION", str(DIM))
    monkeypatch.setenv("VOITTA_DEVICE_ROWS_BUDGET", str(budget))
    monkeypatch.setenv("VOITTA_COLD_BQ", "1" if bq else "0")
    monkeypatch.setenv("VOITTA_IVF_ASSIGN_K", "2")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    return TpuVectorStore(index_dir=temp_root / subdir)


def _recall(got_rows, want_rows, k):
    got = {r.text for r in got_rows[:k]}
    want = {r.text for r in want_rows[:k]}
    return len(got & want) / max(len(want), 1)


@pytest.fixture()
def stores(temp_root, monkeypatch):
    vecs, texts, metas, sparse = make_corpus()
    hot = build_store(temp_root, monkeypatch, 0, "hot", bq=False)
    cold = build_store(temp_root, monkeypatch, 2 * CAP, "cold", bq=True)
    try:
        hot.store_chunks(texts, vecs, metas, sparse)
        cold.store_chunks(texts, vecs, metas, sparse)
        yield hot, cold, vecs, texts, sparse
    finally:
        hot.close()
        cold.close()


def test_cold_ivf_builds_and_meets_recall(stores):
    hot, cold, vecs, texts, _ = stores
    assert cold.cold_tier_active
    assert N >= 2 * (2 * CAP), "corpus must be >= 2x the device budget"
    info = cold.build_ivf(n_cells=8, nprobe=6)
    assert cold._cold_ivf is not None and cold.ivf_active
    assert info["cold_segments"] >= 2
    assert info["rows"] >= info["cold_segments"] * 200  # packed live rows

    recalls = []
    for qi in range(0, N, 23):
        a = hot.search(vecs[qi], limit=10)
        b = cold.search(vecs[qi], limit=10)
        recalls.append(_recall(b, a, 10))
        # Every returned score is the EXACT cosine (host rescore), never
        # a coarse sketch value.
        exact = {t: float(vecs[qi] @ vecs[j]) for j, t in enumerate(texts)}
        for r in b:
            np.testing.assert_allclose(r.score, exact[r.text],
                                       rtol=2e-2, atol=2e-2)
    assert np.mean(recalls) >= 0.97, recalls


def test_cold_ivf_hybrid_and_filters(stores):
    hot, cold, vecs, texts, sparse = stores
    cold.build_ivf(n_cells=8, nprobe=8)
    svc = SparseEmbeddingService(avg_len=8.0)
    for qi in (7, 400, 901):
        sq = svc.embed_query(texts[qi])
        a = hot.search(vecs[qi], limit=10, sparse_query=sq,
                       sparse_weight=0.3)
        b = cold.search(vecs[qi], limit=10, sparse_query=sq,
                        sparse_weight=0.3)
        assert _recall(b, a, 10) >= 0.9
        # Folder filter flows through the composed path's in-kernel masks.
        bf = cold.search(vecs[qi], limit=10, include_folders=["docs"])
        assert bf and all(r.metadata.folder_path == "docs" for r in bf)
        af = hot.search(vecs[qi], limit=10, include_folders=["docs"])
        assert _recall(bf, af, 10) >= 0.9


def test_mutation_invalidates_cold_ivf(stores):
    hot, cold, vecs, texts, _ = stores
    cold.build_ivf(n_cells=8, nprobe=8)
    assert cold.ivf_active
    v = clustered_vecs(1, seed=99)
    cold.store_chunks(["a fresh chunk"], v, [meta("docs/new.md")],
                      SparseEmbeddingService(avg_len=8.0).embed(
                          ["a fresh chunk"]))
    assert not cold.ivf_active  # dirty -> falls back to the flat cold path
    got = cold.search(v[0], limit=3)
    assert got and got[0].text == "a fresh chunk"
    # Rebuild picks the new row back up through the resident tail.
    cold.build_ivf(n_cells=8, nprobe=8)
    got = cold.search(v[0], limit=3)
    assert got and got[0].text == "a fresh chunk"


def test_bq_sparse_full_batch_width(stores):
    """The cold sparse side serves a true multi-query batch (not batch-1):
    per-query host-postings scoring must match the per-query flat path."""
    import jax.numpy as jnp

    from voitta_rag_tpu.index.bq_serve import bq_segment_scores
    from voitta_rag_tpu.ops.filters import make_filter_spec

    hot, cold, vecs, texts, _ = stores
    seg = next(s for s in cold.segments if not s.resident)
    spec = make_filter_spec()
    svc = SparseEmbeddingService(avg_len=8.0)
    queries = [texts[5], texts[310]]
    qts, qws = [], []
    for t in queries:
        sv = svc.embed_query(t)
        qt, qw = cold._sparse_query_arrays(sv)
        qts.append(qt[0])
        qws.append(qw[0])
    width = max(len(x) for x in qts)
    qt_b = np.full((2, width), qts[0].dtype.type(-1), qts[0].dtype)
    qw_b = np.zeros((2, width), np.float32)
    from voitta_rag_tpu.ops.sparse_scan import TERM_PAD
    qt_b[:] = TERM_PAD
    for i, (t, w) in enumerate(zip(qts, qws)):
        qt_b[i, :len(t)] = t
        qw_b[i, :len(w)] = w

    qd = jnp.asarray(vecs[:2])
    dense_b, sparse_b = bq_segment_scores(qd, seg, spec, qt_b, qw_b,
                                          k_prime=64)
    assert sparse_b is not None
    sparse_b = np.asarray(sparse_b)
    # Reference: each query scored alone must reproduce its batch row.
    for i in range(2):
        _, s1 = bq_segment_scores(qd[i:i + 1], seg, spec,
                                  qt_b[i:i + 1], qw_b[i:i + 1], k_prime=64)
        np.testing.assert_allclose(np.asarray(s1)[0], sparse_b[i],
                                   rtol=1e-5, atol=1e-5)
