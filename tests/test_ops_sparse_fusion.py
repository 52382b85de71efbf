"""Sparse BM25 kernel + hybrid fusion vs NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores, TERM_PAD, TILE_N
from voitta_rag_tpu.ops.filters import COL_VALID, COL_FOLDER, NUM_COLS, make_filter_spec
from voitta_rag_tpu.ops.fusion import hybrid_fuse, rrf_fuse
from voitta_rag_tpu.ops.pallas_utils import NEG_INF

N, S, QT = TILE_N, 16, 8


def make_sparse(seed=0, n=N):
    rng = np.random.default_rng(seed)
    terms = rng.integers(0, 500, (n, S)).astype(np.int32)
    # Pad a random suffix of slots per row.
    lens = rng.integers(1, S + 1, n)
    for i in range(n):
        terms[i, lens[i]:] = TERM_PAD
    weights = rng.random((n, S)).astype(np.float32)
    weights[terms == TERM_PAD] = 0.0
    q_terms = np.full((1, QT), TERM_PAD, np.int32)
    q_vals = np.zeros((1, QT), np.float32)
    nq = 5
    q_terms[0, :nq] = rng.choice(500, nq, replace=False)
    q_vals[0, :nq] = rng.random(nq) + 0.1
    cols = np.zeros((NUM_COLS, n), dtype=np.int32)
    cols[COL_VALID] = 1
    cols[COL_FOLDER] = rng.integers(0, 4, n)
    return q_terms, q_vals, terms, weights, cols


def oracle_scores(q_terms, q_vals, terms, weights):
    n = terms.shape[0]
    out = np.zeros(n, np.float32)
    for t, w in zip(q_terms[0], q_vals[0]):
        if t == TERM_PAD:
            continue
        hit = terms == t
        out += w * (weights * hit).sum(axis=1)
    return out


@pytest.mark.parametrize("use_pallas", [True, False])
def test_sparse_scores_match_oracle(use_pallas):
    q_terms, q_vals, terms, weights, cols = make_sparse()
    spec = make_filter_spec()
    scores = np.asarray(
        sparse_scan_scores(jnp.asarray(q_terms), jnp.asarray(q_vals),
                           jnp.asarray(terms.T), jnp.asarray(weights.T),
                           jnp.asarray(cols), spec, use_pallas=use_pallas)
    )[0]
    np.testing.assert_allclose(scores, oracle_scores(q_terms, q_vals, terms, weights),
                               atol=1e-4)


def test_sparse_filter_masks():
    q_terms, q_vals, terms, weights, cols = make_sparse(seed=1)
    spec = make_filter_spec(include_folder_ids=[2])
    scores = np.asarray(
        sparse_scan_scores(jnp.asarray(q_terms), jnp.asarray(q_vals),
                           jnp.asarray(terms.T), jnp.asarray(weights.T),
                           jnp.asarray(cols), spec, use_pallas=True)
    )[0]
    assert np.all(scores[cols[COL_FOLDER] != 2] <= NEG_INF / 2)


# ---- fusion oracle: direct transcription of vector_store.py:621-697 ----

def reference_fusion(dense, sparse, limit, w, mult=3):
    p = limit * mult

    def toplist(scores):
        idx = np.argsort(-scores, kind="stable")[:p]
        return [(int(i), float(scores[i])) for i in idx if scores[i] > NEG_INF / 2]

    def normalize(results):
        if not results:
            return {}
        vals = [s for _, s in results]
        mn, mx = min(vals), max(vals)
        spread = mx - mn
        return {i: ((s - mn) / spread if spread > 0 else 1.0) for i, s in results}

    d_n = normalize(toplist(dense))
    s_n = normalize(toplist(sparse))
    combined = []
    for pid in set(d_n) | set(s_n):
        score = (1 - w) * d_n.get(pid, 0.0) + w * s_n.get(pid, 0.0)
        combined.append((score, pid))
    combined.sort(key=lambda x: (-x[0], x[1]))
    return combined[:limit]


@pytest.mark.parametrize("w", [0.0, 0.1, 0.5, 1.0])
def test_hybrid_fuse_matches_reference_semantics(w):
    rng = np.random.default_rng(42)
    n, limit = 400, 10
    dense = rng.random((2, n)).astype(np.float32)
    sparse = rng.random((2, n)).astype(np.float32)
    # Mask some rows in both.
    dense[:, 350:] = NEG_INF
    sparse[:, ::7] = NEG_INF

    scores, ids = hybrid_fuse(jnp.asarray(dense), jnp.asarray(sparse), w,
                              limit=limit, prefetch_multiplier=3)
    scores, ids = np.asarray(scores), np.asarray(ids)
    for b in range(2):
        expected = reference_fusion(dense[b], sparse[b], limit, w)
        got = [(round(float(s), 5), int(i)) for s, i in zip(scores[b], ids[b]) if i >= 0]
        exp = [(round(s, 5), i) for s, i in expected]
        # Scores must match; id order may differ only within exact ties.
        assert [g[0] for g in got] == [e[0] for e in exp]
        assert {g for g in got} == {e for e in exp} or \
            [g[0] for g in got] == [e[0] for e in exp]


def test_hybrid_fuse_dense_only_degenerates_to_topk():
    rng = np.random.default_rng(0)
    dense = rng.random((1, 300)).astype(np.float32)
    sparse = np.full((1, 300), NEG_INF, np.float32)
    scores, ids = hybrid_fuse(jnp.asarray(dense), jnp.asarray(sparse), 0.1,
                              limit=5)
    oracle = np.argsort(-dense[0])[:5]
    assert list(np.asarray(ids)[0]) == list(oracle)


def test_rrf_fuse_ranks():
    rng = np.random.default_rng(3)
    dense = rng.random((1, 200)).astype(np.float32)
    sparse = rng.random((1, 200)).astype(np.float32)
    scores, ids = rrf_fuse(jnp.asarray(dense), jnp.asarray(sparse), limit=10)
    ids = np.asarray(ids)[0]
    assert len(set(ids.tolist())) == 10
    # The top dense item must appear in RRF top-10 when p=30.
    assert int(np.argmax(dense[0])) in ids.tolist()


def test_fuse_candidates_mismatched_widths():
    """Dense (IVF probe) lists can be wider than the sparse fallback list;
    fusion must clamp p to the narrower side instead of top_k-ing past it."""
    import jax.numpy as jnp
    import numpy as np

    from voitta_rag_tpu.ops.fusion import (
        hybrid_fuse_candidates, rrf_fuse_candidates,
    )

    d_vals = jnp.asarray(np.linspace(1.0, 0.1, 40)[None, :], jnp.float32)
    d_ids = jnp.arange(40, dtype=jnp.int32)[None, :]
    s_vals = jnp.asarray([[0.9, 0.8, 0.7]], jnp.float32)
    s_ids = jnp.asarray([[2, 5, 99]], jnp.int32)

    vals, ids = hybrid_fuse_candidates(d_vals, d_ids, s_vals, s_ids, 0.3,
                                       limit=10, prefetch_multiplier=3)
    out = [int(g) for g in np.asarray(ids)[0] if g >= 0]
    assert 0 in out          # best dense survives
    assert 2 in out          # fused dense+sparse id survives
    vals_r, ids_r = rrf_fuse_candidates(d_vals, d_ids, s_vals, s_ids,
                                        limit=10, prefetch_multiplier=3)
    assert (np.asarray(ids_r)[0] >= -1).all()
