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


def test_multi_assign_improves_recall_and_dedups():
    rng = np.random.default_rng(5)
    v = clustered_corpus(4000, 32, seed=5)
    cols = cols_for(4000, rng)
    gids = np.arange(4000, dtype=np.int64)
    spec = make_filter_spec()
    q_idx = rng.choice(4000, 20, replace=False)

    def recall(idx, nprobe):
        rs = []
        for qi in q_idx:
            q = jnp.asarray(v[qi][None])
            vals, got = idx.search_candidates(q, spec, nprobe=nprobe,
                                              limit=10)
            got = np.asarray(got)[0]
            live = got[got >= 0]
            assert len(set(live.tolist())) == len(live), "duplicate gids"
            oracle = set(np.argsort(-(v @ v[qi]))[:10].tolist())
            rs.append(len(set(live.tolist()) & oracle) / 10)
        return float(np.mean(rs))

    idx1 = IVFIndex.build(v, cols, gids, n_cells=32, kmeans_iters=8,
                          dtype="float32", assign_k=1)
    idx2 = IVFIndex.build(v, cols, gids, n_cells=32, kmeans_iters=8,
                          dtype="float32", assign_k=2)
    r1, r2 = recall(idx1, 2), recall(idx2, 2)
    assert r2 >= r1, (r1, r2)
    assert r2 >= 0.85, r2

    # Margin-gated replicas: only boundary rows are duplicated, recall sits
    # between single- and full-double-assignment, memory well under 2x.
    idxm = IVFIndex.build(v, cols, gids, n_cells=32, kmeans_iters=8,
                          dtype="float32", assign_k=2, assign_margin=0.10)
    rm = recall(idxm, 2)
    assert rm >= r1, (r1, rm)
    slots2 = idx2.vecs3.shape[0] * idx2.vecs3.shape[1]
    slotsm = idxm.vecs3.shape[0] * idxm.vecs3.shape[1]
    assert slotsm < slots2, (slotsm, slots2)
    # A huge margin degenerates to full assign_k=2 recall.
    idxf = IVFIndex.build(v, cols, gids, n_cells=32, kmeans_iters=8,
                          dtype="float32", assign_k=2, assign_margin=2.0)
    assert recall(idxf, 2) == pytest.approx(r2, abs=0.03)


def test_pack_permutation_spill_invariants():
    from voitta_rag_tpu.index.ivf import pack_permutation

    rng = np.random.default_rng(11)
    n, n_cells, cap = 5000, 8, 512  # 8*512 = 4096 < 5000 → forced overflow
    # Skewed primaries: most rows pile into cells 0-2.
    prim = rng.choice(n_cells, n, p=[.4, .25, .15, .05, .05, .04, .03, .03])
    assign = prim[:, None].astype(np.int64)
    # Spill candidates: two distinct other cells per row.
    sp1 = (prim + 1) % n_cells
    sp2 = (prim + 3) % n_cells
    spill = np.stack([sp1, sp2], axis=1).astype(np.int64)

    src0, dest0, prio0, rest0 = pack_permutation(assign, n_cells, cap)
    src, dest, prio, rest = pack_permutation(assign, n_cells, cap,
                                             spill=spill)
    # Spill strictly shrinks the residual on skewed data.
    assert len(rest) < len(rest0), (len(rest), len(rest0))
    # No slot is written twice; slots stay in range.
    assert len(np.unique(dest)) == len(dest)
    assert dest.min() >= 0 and dest.max() < n_cells * cap
    # Every row has EXACTLY one home: a prio-0 placement xor residual.
    homes = np.zeros(n, np.int32)
    np.add.at(homes, src[prio == 0], 1)
    np.add.at(homes, rest, 1)
    assert (homes == 1).all()
    # A spilled row sits in one of ITS OWN candidate cells.
    spilled = np.setdiff1d(src[prio == 0], np.array([], np.int32))
    cell_of = np.full(n, -1, np.int64)
    cell_of[src[prio == 0]] = dest[prio == 0] // cap
    moved = np.nonzero((cell_of >= 0) & (cell_of != prim))[0]
    assert len(moved) > 0
    assert np.isin(cell_of[moved],
                   np.stack([sp1, sp2], 1)[moved].T).any(axis=0).all()


def test_spill_keeps_rows_probeable():
    """Overflow rows homed in their 2nd-nearest cell are found by a probe
    that covers it, and the residual stays small despite heavy skew."""
    rng = np.random.default_rng(12)
    v = clustered_corpus(4000, 8, seed=12)  # 8 true clusters, 32 cells
    cols = cols_for(4000, rng)
    gids = np.arange(4000, dtype=np.int64)
    # Tight capacity: cap0 = 1.0 * 4000 / 32 = 125 → 128; clusters of ~500
    # rows per 4 cells overflow hard.
    idx = IVFIndex.build(v, cols, gids, n_cells=32, skew_factor=1.0,
                         kmeans_iters=8, dtype="float32", spill_levels=2)
    idx_ns = IVFIndex.build(v, cols, gids, n_cells=32, skew_factor=1.0,
                            kmeans_iters=8, dtype="float32", spill_levels=0)
    n_rest = int(np.asarray(idx.rest_gid >= 0).sum())
    n_rest_ns = int(np.asarray(idx_ns.rest_gid >= 0).sum())
    assert n_rest < n_rest_ns, (n_rest, n_rest_ns)
    # Full probe remains exact even with spilled homes.
    spec = make_filter_spec()
    for qi in (3, 777, 2222):
        scores, out_gids = idx.search_scores(jnp.asarray(v[qi][None]), spec,
                                             nprobe=32)
        _, pos = masked_topk(scores, 10)
        got = set(np.asarray(out_gids)[0][np.asarray(pos)[0]].tolist())
        oracle = set(np.argsort(-(v @ v[qi]))[:10].tolist())
        assert got == oracle
    # Moderate probes still reach spilled rows (their home is a near cell).
    recalls = []
    for qi in rng.choice(4000, 20, replace=False):
        _, got = idx.search_candidates(jnp.asarray(v[qi][None]), spec,
                                       nprobe=8, limit=10)
        got = set(np.asarray(got)[0].tolist()) - {-1}
        oracle = set(np.argsort(-(v @ v[qi]))[:10].tolist())
        recalls.append(len(got & oracle) / 10)
    assert np.mean(recalls) >= 0.85, np.mean(recalls)


def test_int8_cells_close_to_float():
    rng = np.random.default_rng(6)
    v = clustered_corpus(2000, 16, seed=6)
    cols = cols_for(2000, rng)
    gids = np.arange(2000, dtype=np.int64)
    spec = make_filter_spec()
    idx8 = IVFIndex.build(v, cols, gids, n_cells=16, kmeans_iters=8,
                          dtype="int8")
    assert idx8.vecs3.dtype == jnp.int8 and idx8.scales3 is not None
    overlaps = []
    for qi in rng.choice(2000, 10, replace=False):
        q = jnp.asarray(v[qi][None])
        _, got = idx8.search_candidates(q, spec, nprobe=16, limit=10)
        got = set(np.asarray(got)[0].tolist()) - {-1}
        oracle = set(np.argsort(-(v @ v[qi]))[:10].tolist())
        overlaps.append(len(got & oracle) / 10)
    assert np.mean(overlaps) >= 0.9, np.mean(overlaps)


def test_int8_input_roundtrip():
    # Building from an already-quantized corpus (the 10M serving shape).
    rng = np.random.default_rng(7)
    v = clustered_corpus(1000, 8, seed=7)
    scale = np.abs(v).max(axis=1) / 127.0
    v8 = np.clip(np.round(v / scale[:, None]), -127, 127).astype(np.int8)
    cols = cols_for(1000, rng)
    gids = np.arange(1000, dtype=np.int64)
    idx = IVFIndex.build(v8, cols, gids, n_cells=8, kmeans_iters=6,
                         dtype="int8", scales=scale.astype(np.float32))
    spec = make_filter_spec()
    q = jnp.asarray(v[3][None])
    vals, got = idx.search_candidates(q, spec, nprobe=8, limit=5)
    got = np.asarray(got)[0]
    oracle = np.argsort(-(v @ v[3]))[:5]
    assert got[0] == oracle[0]
    assert len(set(got.tolist()) & set(oracle.tolist())) >= 4


def test_sampled_kmeans_trains_on_subset():
    v = clustered_corpus(3000, 16, seed=8)
    centroids, assign = spherical_kmeans(jnp.asarray(v), 16, iters=6,
                                         train_sample=512)
    counts = np.bincount(np.asarray(assign), minlength=16)
    assert (counts > 0).sum() >= 12  # sampled training still covers clusters


def test_dedup_candidates_keeps_best():
    from voitta_rag_tpu.ops.topk import dedup_candidates

    vals = jnp.asarray([[5.0, 4.0, 4.0, 3.0, NEG_INF]])
    ids = jnp.asarray([[7, 9, 7, 9, -1]], dtype=jnp.int32)
    v2, i2 = dedup_candidates(vals, ids)
    v2, i2 = np.asarray(v2)[0], np.asarray(i2)[0]
    assert i2[0] == 7 and v2[0] == 5.0
    assert i2[1] == 9 and v2[1] == 4.0
    assert (i2[2:] == -1).all()


def test_approx_select_candidates(built):
    """VOITTA_IVF_SELECT=approx path: valid, deduplicated, near-exact on a
    full probe (approx_max_k falls back to exact on small widths; the exact
    vs approx QPS/recall trade is measured on hardware — see
    _ivf_search_candidates docstring)."""
    idx, v, cols, gids = built
    spec = make_filter_spec()
    q = jnp.asarray(v[9][None])
    ve, ge = idx.search_candidates(q, spec, nprobe=32, limit=10)
    va, ga = idx.search_candidates(q, spec, nprobe=32, limit=10,
                                   select="approx")
    ge, ga = np.asarray(ge)[0], np.asarray(ga)[0]
    assert len(set(ga.tolist())) == len(ga)  # deduplicated
    assert set(ga.tolist()) == set(ge.tolist())
    np.testing.assert_allclose(np.asarray(va)[0], np.asarray(ve)[0],
                               rtol=1e-5)
