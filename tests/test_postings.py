"""SparsePostings parity vs the exact slot-major sparse scan.

The postings snapshot must reproduce sparse_scan_scores' BM25 semantics
exactly (same doc weights, same query-side IDF weights) whenever no term run
is truncated — same top candidates, same scores. Truncation must only drop
lowest-weight postings of a term (impact ordering).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.index.postings import SparsePostings
from voitta_rag_tpu.ops.filters import (
    COL_FOLDER, COL_VALID, NUM_COLS, make_filter_spec,
)
from voitta_rag_tpu.ops.sparse_scan import TERM_PAD, sparse_scan_scores
from voitta_rag_tpu.ops.topk import VALID_THRESHOLD


def make_corpus(rng, n=512, s=8, vocab=64, n_folders=4):
    terms = rng.integers(0, vocab, (s, n)).astype(np.int32)
    # Random pads sprinkled in.
    pad_mask = rng.random((s, n)) < 0.2
    terms[pad_mask] = TERM_PAD
    weights = (rng.random((s, n)).astype(np.float32) + 0.05)
    weights[pad_mask] = 0.0
    cols = np.zeros((NUM_COLS, n), np.int32)
    cols[COL_VALID] = 1
    cols[COL_FOLDER] = rng.integers(0, n_folders, n)
    return terms, weights, cols


def make_query(rng, qt_n=6, vocab=64, pad=2):
    qt = np.full((1, qt_n + pad), TERM_PAD, np.int32)
    qt[0, :qt_n] = rng.choice(vocab, qt_n, replace=False)
    qw = np.zeros((1, qt_n + pad), np.float32)
    qw[0, :qt_n] = rng.random(qt_n).astype(np.float32) + 0.1
    return qt, qw


def exact_top(qt, qw, terms, weights, cols, spec, k):
    scores = np.asarray(sparse_scan_scores(
        jnp.asarray(qt), jnp.asarray(qw), jnp.asarray(terms),
        jnp.asarray(weights), jnp.asarray(cols), spec, use_pallas=False))[0]
    order = np.argsort(-scores, kind="stable")[:k]
    return [(int(i), float(scores[i])) for i in order
            if scores[i] > VALID_THRESHOLD / 2]


@pytest.mark.parametrize("seed", [0, 1])
def test_postings_match_slot_scan(seed):
    rng = np.random.default_rng(seed)
    terms, weights, cols = make_corpus(rng)
    gids = np.arange(terms.shape[1], dtype=np.int32)
    post = SparsePostings.build(terms, weights, gids)
    assert post.n_live == int(((terms != TERM_PAD) & (weights > 0)).sum())

    spec = make_filter_spec()
    qt, qw = make_query(rng)
    k = 10
    vals, out_g = post.candidates(jnp.asarray(qt), jnp.asarray(qw),
                                  jnp.asarray(cols), spec, limit=k,
                                  max_postings=512)
    vals, out_g = np.asarray(vals)[0], np.asarray(out_g)[0]
    expected = exact_top(qt, qw, terms, weights, cols, spec, k)

    got = [(int(g), float(v)) for g, v in zip(out_g, vals) if g >= 0]
    assert len(got) == len(expected)
    # Same score multiset; ties may order differently.
    np.testing.assert_allclose(sorted(v for _, v in got),
                               sorted(v for _, v in expected), rtol=1e-5)
    exp_by_gid = dict(expected)
    for g, v in got:
        assert g in exp_by_gid or any(
            abs(v - ev) < 1e-5 for ev in exp_by_gid.values())


def test_postings_respect_filters():
    rng = np.random.default_rng(7)
    terms, weights, cols = make_corpus(rng, n_folders=4)
    gids = np.arange(terms.shape[1], dtype=np.int32)
    post = SparsePostings.build(terms, weights, gids)
    spec = make_filter_spec(include_folder_ids=[1, 3])
    qt, qw = make_query(rng)
    _, out_g = post.candidates(jnp.asarray(qt), jnp.asarray(qw),
                               jnp.asarray(cols), spec, limit=20,
                               max_postings=512)
    out_g = np.asarray(out_g)[0]
    hits = out_g[out_g >= 0]
    assert len(hits) > 0
    assert np.isin(cols[COL_FOLDER][hits], [1, 3]).all()


def test_postings_sum_multi_term_matches():
    # One doc matching two query terms must score the SUM of contributions.
    terms = np.full((4, 8), TERM_PAD, np.int32)
    weights = np.zeros((4, 8), np.float32)
    terms[0, 0], weights[0, 0] = 11, 2.0
    terms[1, 0], weights[1, 0] = 22, 3.0
    terms[0, 1], weights[0, 1] = 11, 10.0  # single-term doc, bigger weight
    cols = np.zeros((NUM_COLS, 8), np.int32)
    cols[COL_VALID] = 1
    gids = np.arange(8, dtype=np.int32)
    post = SparsePostings.build(terms, weights, gids)

    qt = np.asarray([[11, 22, TERM_PAD]], np.int32)
    qw = np.asarray([[1.0, 1.0, 0.0]], np.float32)
    vals, out_g = post.candidates(jnp.asarray(qt), jnp.asarray(qw),
                                  jnp.asarray(cols), make_filter_spec(),
                                  limit=4, max_postings=16)
    vals, out_g = np.asarray(vals)[0], np.asarray(out_g)[0]
    by_gid = {int(g): float(v) for g, v in zip(out_g, vals) if g >= 0}
    assert by_gid[1] == pytest.approx(10.0)
    assert by_gid[0] == pytest.approx(5.0)  # 2.0 + 3.0 summed across terms


def test_postings_truncation_is_impact_ordered():
    # A term with a long run: max_postings below the run length keeps the
    # HIGHEST-weight postings.
    n = 64
    terms = np.full((2, n), TERM_PAD, np.int32)
    weights = np.zeros((2, n), np.float32)
    terms[0, :] = 5
    weights[0, :] = np.linspace(0.1, 6.4, n, dtype=np.float32)
    cols = np.zeros((NUM_COLS, n), np.int32)
    cols[COL_VALID] = 1
    post = SparsePostings.build(terms, weights, np.arange(n, dtype=np.int32))

    qt = np.asarray([[5]], np.int32)
    qw = np.asarray([[1.0]], np.float32)
    vals, out_g = post.candidates(jnp.asarray(qt), jnp.asarray(qw),
                                  jnp.asarray(cols), make_filter_spec(),
                                  limit=8, max_postings=8)
    out_g = np.asarray(out_g)[0]
    # Top-8 by weight are the last 8 gids.
    assert set(out_g.tolist()) == set(range(n - 8, n))


def test_postings_batch_queries():
    rng = np.random.default_rng(3)
    terms, weights, cols = make_corpus(rng)
    gids = np.arange(terms.shape[1], dtype=np.int32)
    post = SparsePostings.build(terms, weights, gids)
    spec = make_filter_spec()
    B, k = 3, 10
    qts, qws = zip(*(make_query(rng) for _ in range(B)))
    qt = np.concatenate(qts)
    qw = np.concatenate(qws)
    vals, out_g = post.candidates(jnp.asarray(qt), jnp.asarray(qw),
                                  jnp.asarray(cols), spec, limit=k,
                                  max_postings=512)
    for b in range(B):
        expected = exact_top(qt[b:b + 1], qw[b:b + 1], terms, weights, cols,
                             spec, k)
        got = [(int(g), float(v))
               for g, v in zip(np.asarray(out_g)[b], np.asarray(vals)[b])
               if g >= 0]
        np.testing.assert_allclose(sorted(v for _, v in got),
                                   sorted(v for _, v in expected), rtol=1e-5)


def test_postings_roundtrip_host():
    rng = np.random.default_rng(9)
    terms, weights, cols = make_corpus(rng)
    gids = np.arange(terms.shape[1], dtype=np.int32)
    post = SparsePostings.build(terms, weights, gids)
    post2 = SparsePostings.from_host(post.to_host())
    assert post2.n_live == post.n_live
    np.testing.assert_array_equal(np.asarray(post.terms),
                                  np.asarray(post2.terms))
    np.testing.assert_array_equal(np.asarray(post.gids),
                                  np.asarray(post2.gids))
