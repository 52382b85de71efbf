"""C++ HNSW baseline: build, recall vs brute force, determinism."""

import numpy as np
import pytest

from voitta_rag_tpu.utils import hnsw_baseline


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((32, 48))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = centers[rng.integers(0, 32, 5000)] + 0.3 * rng.standard_normal(
        (5000, 48))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


@pytest.fixture(scope="module")
def index(corpus):
    if not hnsw_baseline.available():
        pytest.skip("g++/native build unavailable")
    idx = hnsw_baseline.HnswBaseline(48, 5000, m=16, ef_construction=100)
    idx.add(corpus)
    return idx


def test_size(index, corpus):
    assert len(index) == len(corpus)


def test_recall_at_10(index, corpus):
    rng = np.random.default_rng(1)
    q_idx = rng.choice(5000, 50, replace=False)
    q = corpus[q_idx]
    ids, sims = index.search(q, k=10, ef=64)
    exact = np.argsort(-(q @ corpus.T), axis=1)[:, :10]
    recalls = [
        len(set(ids[b].tolist()) & set(exact[b].tolist())) / 10
        for b in range(len(q))
    ]
    assert np.mean(recalls) >= 0.9, np.mean(recalls)
    # Self-query must find itself first.
    assert (ids[:, 0] == q_idx).mean() >= 0.95


def test_scores_are_cosine(index, corpus):
    q = corpus[7]
    ids, sims = index.search(q, k=5, ef=64)
    for i, s in zip(ids[0], sims[0]):
        np.testing.assert_allclose(s, float(q @ corpus[i]), rtol=1e-5)


def test_graph_save_load_roundtrip(index, corpus, tmp_path):
    """Graph-only cache: identical search results after reload; a changed
    corpus is refused by checksum (bench.py loads caches across rounds)."""
    path = tmp_path / "g.bin"
    ids1, _ = index.search(corpus[:8], k=10, ef=64)
    assert index.save_graph(path)
    h2 = hnsw_baseline.HnswBaseline.load_graph(path, corpus)
    assert h2 is not None and len(h2) == len(corpus)
    ids2, _ = h2.search(corpus[:8], k=10, ef=64)
    np.testing.assert_array_equal(ids1, ids2)
    bad = corpus.copy()
    bad[0, 0] += 1.0
    assert hnsw_baseline.HnswBaseline.load_graph(path, bad) is None
