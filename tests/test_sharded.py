"""Sharded index on a virtual 8-device CPU mesh.

The sharded scan + all-gather top-k merge must produce exactly the results of
a single-device scan over the same corpus (SURVEY.md §4: multi-chip logic
tested via CPU device-count override).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.ops.filters import (
    COL_DOC, COL_FOLDER, COL_INDEX_FOLDER, COL_VALID, NUM_COLS,
    make_filter_spec,
)
from voitta_rag_tpu.ops.dense_scan import dense_scan_scores
from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores, TERM_PAD
from voitta_rag_tpu.ops.fusion import hybrid_fuse
from voitta_rag_tpu.ops.topk import masked_topk
from voitta_rag_tpu.parallel.mesh import index_mesh
from voitta_rag_tpu.parallel.sharded import ShardedIndex

CAP = 512  # per shard (== dense TILE_N)
DIM = 64
S = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return index_mesh(8)


def build(mesh, n_rows=900, seed=0, dtype="float32"):
    rng = np.random.default_rng(seed)
    idx = ShardedIndex(mesh, CAP, DIM, S, dtype=dtype)
    dense = rng.standard_normal((n_rows, DIM)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    cols = np.zeros((n_rows, NUM_COLS), np.int32)
    cols[:, COL_VALID] = 1
    cols[:, COL_FOLDER] = rng.integers(0, 5, n_rows)
    cols[:, COL_INDEX_FOLDER] = rng.integers(0, 3, n_rows)
    cols[:, COL_DOC] = rng.integers(0, 50, n_rows)
    terms = rng.integers(0, 300, (n_rows, S)).astype(np.int32)
    weights = rng.random((n_rows, S)).astype(np.float32)
    gids = idx.write_rows(dense, cols, terms, weights)
    return idx, dense, cols, terms, weights, gids


def q_of(dense, i):
    return jnp.asarray(dense[i][None, :])


def test_balanced_allocation(mesh):
    idx, *_ = build(mesh, n_rows=800)
    # 800 rows over 8 shards of 512 → roughly even fill.
    assert idx._next.max() - idx._next.min() <= 1
    assert idx._next.sum() == 800


def test_dense_search_matches_single_device(mesh):
    idx, dense, cols, terms, weights, gids = build(mesh)
    spec = make_filter_spec()
    scores, out_gids = idx.search(q_of(dense, 17), spec, limit=10)
    scores, out_gids = np.asarray(scores)[0], np.asarray(out_gids)[0]

    # Oracle: brute-force over the host copy, mapped through gids.
    sims = dense @ dense[17]
    order = np.argsort(-sims)[:10]
    expected_gids = [int(gids[i]) for i in order]
    assert out_gids.tolist() == expected_gids
    np.testing.assert_allclose(scores, np.sort(sims)[::-1][:10], atol=1e-5)


def test_filtered_sharded_search(mesh):
    idx, dense, cols, terms, weights, gids = build(mesh, seed=1)
    spec = make_filter_spec(include_folder_ids=[2])
    scores, out_gids = idx.search(q_of(dense, 3), spec, limit=20)
    out_gids = np.asarray(out_gids)[0]
    folder_of = {int(g): int(c) for g, c in zip(gids, cols[:, COL_FOLDER])}
    got = [g for g in out_gids.tolist() if g >= 0]
    assert got, "filtered search returned nothing"
    assert all(folder_of[g] == 2 for g in got)


def test_hybrid_sharded_matches_unsharded_fusion(mesh):
    idx, dense, cols, terms, weights, gids = build(mesh, seed=2)
    spec = make_filter_spec()
    rng = np.random.default_rng(3)
    qt = np.full((1, 4), TERM_PAD, np.int32)
    qt[0, :3] = rng.choice(300, 3, replace=False)
    qw = np.zeros((1, 4), np.float32)
    qw[0, :3] = rng.random(3) + 0.5

    scores_sh, gids_sh = idx.search(
        q_of(dense, 5), spec, qt=qt, qw=qw, sparse_weight=0.4, limit=10)

    # Unsharded oracle: same kernels over one flat segment in gid order.
    n_total = idx.n_shards * idx.cap
    flat_vecs = np.zeros((n_total, DIM), np.float32)
    flat_cols = np.zeros((NUM_COLS, n_total), np.int32)
    flat_terms = np.full((n_total, S), TERM_PAD, np.int32)
    flat_weights = np.zeros((n_total, S), np.float32)
    for i, g in enumerate(gids):
        flat_vecs[g] = dense[i]
        flat_cols[:, g] = cols[i]
        flat_terms[g] = terms[i]
        flat_weights[g] = weights[i]
    d = dense_scan_scores(q_of(dense, 5), jnp.asarray(flat_vecs),
                          jnp.asarray(flat_cols), spec, use_pallas=False)
    s = sparse_scan_scores(jnp.asarray(qt), jnp.asarray(qw),
                           jnp.asarray(flat_terms.T),
                           jnp.asarray(flat_weights.T),
                           jnp.asarray(flat_cols), spec, use_pallas=False)
    exp_scores, exp_gids = hybrid_fuse(d, jnp.broadcast_to(s, d.shape), 0.4,
                                       limit=10)
    np.testing.assert_allclose(np.asarray(scores_sh)[0],
                               np.asarray(exp_scores)[0], atol=1e-5)
    assert np.asarray(gids_sh)[0].tolist() == np.asarray(exp_gids)[0].tolist()


def test_tombstone_doc_excludes_from_search(mesh):
    idx, dense, cols, terms, weights, gids = build(mesh, seed=4)
    target = int(cols[11, COL_DOC])
    idx.tombstone_doc(target)
    spec = make_filter_spec()
    _, out_gids = idx.search(q_of(dense, 11), spec, limit=50)
    doc_of = {int(g): int(c) for g, c in zip(gids, cols[:, COL_DOC])}
    got = [g for g in np.asarray(out_gids)[0].tolist() if g >= 0]
    assert got
    assert all(doc_of[g] != target for g in got)


def test_tombstone_gids_and_row_reuse(mesh):
    idx, dense, cols, terms, weights, gids = build(mesh, seed=5, n_rows=100)
    idx.tombstone_gids(gids[:10])
    assert sum(len(f) for f in idx._free) == 10
    spec = make_filter_spec()
    _, out = idx.search(q_of(dense, 0), spec, limit=100)
    got = set(g for g in np.asarray(out)[0].tolist() if g >= 0)
    assert got.isdisjoint(set(int(g) for g in gids[:10]))
    # Freed slots are preferred for reuse (the balanced allocator may route
    # a few rows to fresher shards, but most land in the free lists).
    new_gids = idx.write_rows(dense[:10], cols[:10], terms[:10], weights[:10])
    reused = set(int(g) for g in new_gids) & set(int(g) for g in gids[:10])
    assert len(reused) >= 8
    # No live-row duplication: all gids unique.
    assert len(set(int(g) for g in new_gids)) == 10


def test_int8_sharded_search(mesh):
    idx, dense, cols, terms, weights, gids = build(mesh, seed=6, dtype="int8")
    spec = make_filter_spec()
    scores, out_gids = idx.search(q_of(dense, 42), spec, limit=10)
    out_gids = np.asarray(out_gids)[0]
    sims = dense @ dense[42]
    oracle = {int(gids[i]) for i in np.argsort(-sims)[:10]}
    overlap = len(oracle & set(out_gids.tolist())) / 10
    assert overlap >= 0.8  # int8 quantization tolerance


def test_resolve_auto_devices_policy(monkeypatch):
    """Shared VOITTA_INDEX_SHARDS / VOITTA_ENCODE_DP resolution: auto stays
    1 off-TPU (virtual CPU device counts must not flip deployments into
    multi-device mode); explicit ints clamp to available devices."""
    from voitta_rag_tpu.parallel.mesh import resolve_auto_devices

    assert resolve_auto_devices("auto") == 1   # CPU backend in tests
    assert resolve_auto_devices("") == 1
    assert resolve_auto_devices("0") == 1
    assert resolve_auto_devices("4") == 4
    assert resolve_auto_devices("999") == 8    # clamped to 8 CPU devices
    assert resolve_auto_devices("garbage") == 1


def test_pod_mesh_validation():
    import pytest

    from voitta_rag_tpu.parallel.mesh import index_mesh

    with pytest.raises(ValueError, match="not divisible"):
        index_mesh(8, n_slices=3)
    mesh = index_mesh(8, n_slices=2)
    assert dict(mesh.shape) == {"slice": 2, "shard": 4}


# ---------------------------------------------------------------------------
# replica-parallel serving (index data parallelism)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def rmesh():
    m = index_mesh(4, n_replicas=2)
    assert dict(m.shape) == {"replica": 2, "shard": 4}
    return m


def test_replica_search_exact_and_batch_sharded(rmesh):
    """4 shards x 2 replicas: every query's results match the brute-force
    oracle, AND the result batch is physically sharded across replica
    groups — each group scored only B/R queries, which is what makes
    aggregate QPS scale with replica count instead of shrinking."""
    idx, dense, cols, terms, weights, gids = build(rmesh, seed=7)
    assert idx.n_shards == 4  # replica axis is not a shard axis
    spec = make_filter_spec()
    B = 8
    scores, out_gids = idx.search(jnp.asarray(dense[:B]), spec, limit=10)
    sims = dense @ dense[:B].T
    for b in range(B):
        order = np.argsort(-sims[:, b])[:10]
        assert np.asarray(out_gids)[b].tolist() == \
            [int(gids[i]) for i in order], f"query {b}"
    # Work accounting: each device holds (and its replica group computed)
    # only B/2 result rows.
    assert scores.sharding.shard_shape(scores.shape) == (B // 2, 10)


def test_replica_search_pads_odd_batches(rmesh):
    idx, dense, cols, terms, weights, gids = build(rmesh, seed=8)
    spec = make_filter_spec()
    B = 5  # not divisible by 2 replicas
    scores, out_gids = idx.search(jnp.asarray(dense[:B]), spec, limit=10)
    assert scores.shape == (B, 10)
    sims = dense @ dense[:B].T
    for b in range(B):
        order = np.argsort(-sims[:, b])[:10]
        assert np.asarray(out_gids)[b].tolist() == \
            [int(gids[i]) for i in order]


def test_replica_hybrid_matches_single_replica(rmesh, mesh):
    """Hybrid fusion on the replica mesh returns exactly the single-group
    (8-shard, no-replica) results for the same corpus and queries."""
    idx_r, dense, cols, terms, weights, gids_r = build(rmesh, seed=9)
    idx_1, _, _, _, _, gids_1 = build(mesh, seed=9)
    rng = np.random.default_rng(10)
    qt = np.full((1, 4), TERM_PAD, np.int32)
    qt[0, :3] = rng.choice(300, 3, replace=False)
    qw = np.zeros((1, 4), np.float32)
    qw[0, :3] = rng.random(3) + 0.5
    spec = make_filter_spec()
    q = jnp.asarray(dense[:4])
    s_r, g_r = idx_r.search(q, spec, qt=qt, qw=qw, sparse_weight=0.4,
                            limit=10)
    s_1, g_1 = idx_1.search(q, spec, qt=qt, qw=qw, sparse_weight=0.4,
                            limit=10)
    # gid layouts differ (4x1024 vs 8x512 is not the case here: both CAP=512
    # — but allocation order differs), so compare through row identity.
    row_of_r = {int(g): i for i, g in enumerate(gids_r)}
    row_of_1 = {int(g): i for i, g in enumerate(gids_1)}
    for b in range(4):
        rows_r = [row_of_r[g] for g in np.asarray(g_r)[b].tolist() if g >= 0]
        rows_1 = [row_of_1[g] for g in np.asarray(g_1)[b].tolist() if g >= 0]
        assert rows_r == rows_1
        np.testing.assert_allclose(np.asarray(s_r)[b], np.asarray(s_1)[b],
                                   atol=1e-5)


def test_replica_ivf_search(rmesh):
    """Per-chip IVF on the replica mesh: probe-limited search still merges
    exactly within each replica group and batch-shards across groups."""
    idx, dense, cols, terms, weights, gids = build(rmesh, seed=11,
                                                   n_rows=1200)
    idx.build_ivf(8, kmeans_iters=5)
    spec = make_filter_spec()
    B = 4
    scores, out_gids = idx.search(jnp.asarray(dense[:B]), spec, limit=10,
                                  nprobe=8)  # all cells -> exact
    sims = dense @ dense[:B].T
    for b in range(B):
        order = np.argsort(-sims[:, b])[:10]
        assert np.asarray(out_gids)[b].tolist() == \
            [int(gids[i]) for i in order]


def test_replica_pod_mesh_axes():
    m = index_mesh(4, n_slices=2, n_replicas=2)
    assert dict(m.shape) == {"replica": 2, "slice": 2, "shard": 2}


def test_sharded_ivf_margin_multi_assign(rmesh):
    """Margin-gated assign_k=2 on the sharded per-chip IVF: full-probe
    search stays exact (dedup drops replica duplicates), and the gated
    build stays within the full-double-assignment slot budget."""
    idx, dense, cols, terms, weights, gids = build(rmesh, seed=13,
                                                   n_rows=1200)
    info = idx.build_ivf(8, kmeans_iters=5, assign_k=2, assign_margin=0.1)
    spec = make_filter_spec()
    B = 4
    scores, out_gids = idx.search(jnp.asarray(dense[:B]), spec, limit=10,
                                  nprobe=8)  # all cells -> exact
    sims = dense @ dense[:B].T
    for b in range(B):
        got = [g for g in np.asarray(out_gids)[b].tolist() if g >= 0]
        assert len(set(got)) == len(got), "duplicate gids after dedup"
        order = np.argsort(-sims[:, b])[:10]
        assert got == [int(gids[i]) for i in order]
    # Probe-limited search on the replicated layout still returns valid rows.
    s2, g2 = idx.search(jnp.asarray(dense[:B]), spec, limit=10, nprobe=2)
    assert (np.asarray(g2)[:, 0] >= 0).all()


def test_sharded_layout_knob_parity(mesh):
    """build_ivf(layout=...) selects the per-chip device layout; at full
    probe both the flat (ShardedIVFFlat: variable-length lists, per-shard
    virtual centroids) and padded (ShardedIVF: fixed cell blocks +
    residual) layouts are exact, so results agree bit-for-bit."""
    idx, dense, cols, terms, weights, gids = build(mesh, seed=17,
                                                   n_rows=1200)
    spec = make_filter_spec()
    B = 3
    qt = np.full((1, 4), TERM_PAD, np.int32)
    qt[0, :2] = [7, 40]
    qw = np.zeros((1, 4), np.float32)
    qw[0, :2] = [1.0, 0.6]

    info_f = idx.build_ivf(8, kmeans_iters=5, layout="flat")
    assert info_f["layout"] == "flat" and info_f["shards"] == 8
    assert info_f["probe_cap"] % 128 == 0
    assert info_f["virtual_cells"] >= 8
    sf, gf = idx.search(jnp.asarray(dense[:B]), spec, limit=10, nprobe=8)
    hf, hgf = idx.search(jnp.asarray(dense[:B]), spec, qt=qt, qw=qw,
                         sparse_weight=0.3, limit=10, nprobe=8)

    info_p = idx.build_ivf(8, kmeans_iters=5, layout="padded")
    assert info_p["layout"] == "padded" and "cell_cap" in info_p
    sp_, gp = idx.search(jnp.asarray(dense[:B]), spec, limit=10, nprobe=8)
    hp, hgp = idx.search(jnp.asarray(dense[:B]), spec, qt=qt, qw=qw,
                         sparse_weight=0.3, limit=10, nprobe=8)

    assert np.asarray(gf).tolist() == np.asarray(gp).tolist()
    np.testing.assert_allclose(np.asarray(sf), np.asarray(sp_), atol=1e-5)
    assert np.asarray(hgf).tolist() == np.asarray(hgp).tolist()
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hp), atol=1e-5)

    # Probe-limited self-retrieval through the flat program.
    idx.build_ivf(8, kmeans_iters=5, layout="flat")
    _, g2 = idx.search(jnp.asarray(dense[:B]), spec, limit=10, nprobe=2)
    for b in range(B):
        assert int(np.asarray(g2)[b, 0]) == int(gids[b])
