"""IVF index: k-means, probe scan, recall vs exact oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.index.ivf import IVFIndex, spherical_kmeans
from voitta_rag_tpu.ops.filters import (
    COL_FOLDER, COL_VALID, NUM_COLS, make_filter_spec,
)
from voitta_rag_tpu.ops.topk import masked_topk
from voitta_rag_tpu.ops.pallas_utils import NEG_INF

DIM = 32


def clustered_corpus(n=4000, n_clusters=32, seed=0):
    """Synthetic clustered unit vectors (IVF's favorable regime)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.integers(0, n_clusters, n)
    v = centers[which] + 0.15 * rng.standard_normal((n, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


def cols_for(n, rng):
    cols = np.zeros((n, NUM_COLS), np.int32)
    cols[:, COL_VALID] = 1
    cols[:, COL_FOLDER] = rng.integers(0, 4, n)
    return cols


def test_kmeans_partitions_unit_sphere():
    v = clustered_corpus(1000, 8)
    centroids, assign = spherical_kmeans(jnp.asarray(v), 8, iters=8)
    centroids, assign = np.asarray(centroids), np.asarray(assign)
    np.testing.assert_allclose(np.linalg.norm(centroids, axis=1), 1.0,
                               atol=1e-5)
    # Every cell non-trivially used on clustered data.
    counts = np.bincount(assign, minlength=8)
    assert (counts > 10).all()
    # Assignment is argmax cosine.
    sims = v @ centroids.T
    assert (assign == sims.argmax(axis=1)).all()


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(1)
    v = clustered_corpus(4000, 32, seed=1)
    cols = cols_for(4000, rng)
    gids = np.arange(4000, dtype=np.int64) * 7 + 3  # arbitrary global ids
    idx = IVFIndex.build(v, cols, gids, n_cells=32, kmeans_iters=8,
                         dtype="float32")
    return idx, v, cols, gids


def test_full_probe_is_exact(built):
    idx, v, cols, gids = built
    spec = make_filter_spec()
    q = jnp.asarray(v[5][None])
    scores, out_gids = idx.search_scores(q, spec, nprobe=32)
    vals, pos = masked_topk(scores, 10)
    got = np.asarray(out_gids)[0][np.asarray(pos)[0]]
    oracle = gids[np.argsort(-(v @ v[5]))[:10]]
    assert set(got.tolist()) == set(oracle.tolist())


def test_nprobe_recall(built):
    idx, v, cols, gids = built
    spec = make_filter_spec()
    rng = np.random.default_rng(2)
    recalls = []
    for qi in rng.choice(4000, 20, replace=False):
        q = jnp.asarray(v[qi][None])
        scores, out_gids = idx.search_scores(q, spec, nprobe=8)
        _, pos = masked_topk(scores, 10)
        got = set(np.asarray(out_gids)[0][np.asarray(pos)[0]].tolist())
        oracle = set(gids[np.argsort(-(v @ v[qi]))[:10]].tolist())
        recalls.append(len(got & oracle) / 10)
    assert np.mean(recalls) >= 0.9, np.mean(recalls)


def test_filters_apply_in_probe(built):
    idx, v, cols, gids = built
    spec = make_filter_spec(include_folder_ids=[2])
    q = jnp.asarray(v[0][None])
    scores, out_gids = idx.search_scores(q, spec, nprobe=32)
    scores, out_gids = np.asarray(scores)[0], np.asarray(out_gids)[0]
    folder_of = dict(zip(gids.tolist(), cols[:, COL_FOLDER].tolist()))
    live = out_gids[scores > NEG_INF / 2]
    assert len(live) > 0
    assert all(folder_of[int(g)] == 2 for g in live)


def test_overflow_goes_to_residual():
    rng = np.random.default_rng(3)
    # Degenerate: all points identical cluster → every cell overflows.
    v = np.tile(rng.standard_normal((1, DIM)), (600, 1))
    v += 0.01 * rng.standard_normal((600, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v.astype(np.float32)
    cols = cols_for(600, rng)
    gids = np.arange(600, dtype=np.int64)
    # cell_cap = round_up(0.2 * 600 / 4, 128) = 128 → 4*128 = 512 < 600,
    # so at least 88 rows must overflow into the residual block.
    idx = IVFIndex.build(v, cols, gids, n_cells=4, skew_factor=0.2,
                         kmeans_iters=4, dtype="float32")
    assert int(np.asarray(idx.rest_gid >= 0).sum()) > 0
    # Still exact at full probe because residual is always scanned.
    spec = make_filter_spec()
    scores, out_gids = idx.search_scores(jnp.asarray(v[17][None]), spec,
                                         nprobe=4)
    _, pos = masked_topk(scores, 5)
    got = set(np.asarray(out_gids)[0][np.asarray(pos)[0]].tolist())
    oracle = set(np.argsort(-(v @ v[17]))[:5].tolist())
    assert got == oracle
