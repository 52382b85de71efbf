"""Cold-tier (beyond-HBM) serving of the mesh-sharded index.

The sharded twin of tests/test_bq_cold.py + test_ivf_bq.py: per-chip BQ
coarse scan (flat or IVF-probed) -> ICI candidate gather -> host exact
rescore -> candidate-space fusion (parallel/sharded_cold.py). Verified on
the virtual 8-device CPU mesh against the fully-resident sharded search as
oracle — the composition BASELINE config 5 (100M pod) requires.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.ops.filters import (
    COL_DOC, COL_FOLDER, COL_VALID, NUM_COLS, make_filter_spec,
)
from voitta_rag_tpu.parallel.mesh import index_mesh
from voitta_rag_tpu.parallel.sharded import ShardedIndex

CAP = 512
DIM = 64
S = 8
N_ROWS = 3000
BITS = 4  # 64-d test rows are near-isotropic; 4-bit keeps the sketch sharp


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return index_mesh(8)


def build(mesh, n_rows=N_ROWS, seed=0, dtype="float32"):
    rng = np.random.default_rng(seed)
    idx = ShardedIndex(mesh, CAP, DIM, S, dtype=dtype)
    # Clustered rows (like tests/test_ivf_bq.py): IVF probing is only a
    # meaningful mechanism on corpora with cluster structure.
    centers = rng.standard_normal((16, DIM)).astype(np.float32)
    cid = rng.integers(0, 16, n_rows)
    dense = (centers[cid]
             + 0.5 * rng.standard_normal((n_rows, DIM)).astype(np.float32))
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    cols = np.zeros((n_rows, NUM_COLS), np.int32)
    cols[:, COL_VALID] = 1
    cols[:, COL_FOLDER] = rng.integers(0, 5, n_rows)
    cols[:, COL_DOC] = rng.integers(0, 100, n_rows)
    terms = rng.integers(0, 300, (n_rows, S)).astype(np.int32)
    weights = rng.random((n_rows, S)).astype(np.float32)
    gids = idx.write_rows(dense, cols, terms, weights)
    return idx, dense, cols, terms, weights, gids


def overlap(a: np.ndarray, b: np.ndarray) -> float:
    """Mean per-row overlap fraction of two [B, k] gid sets."""
    return float(np.mean([
        len(set(a[i][a[i] >= 0]) & set(b[i][b[i] >= 0])) / max(
            (b[i] >= 0).sum(), 1)
        for i in range(len(a))]))


@pytest.fixture(scope="module")
def cold_setup(mesh):
    """One shared build: resident oracle results, then the offloaded index."""
    idx, dense, cols, terms, weights, gids = build(mesh)
    spec = make_filter_spec()
    rng = np.random.default_rng(1)
    qi = rng.integers(0, N_ROWS, 8)
    q = jnp.asarray(dense[qi])
    qt = np.full((1, 4), -1, np.int32)
    qt[0, :2] = [5, 17]
    qw = np.zeros((1, 4), np.float32)
    qw[0, :2] = [1.0, 0.5]

    o_dense = idx.search(q, spec, limit=10, fusion=False)
    o_hybrid = idx.search(q, spec, qt=qt, qw=qw, sparse_weight=0.3, limit=10)
    oracle = {
        "dense": (np.asarray(o_dense[0]), np.asarray(o_dense[1])),
        "hybrid": (np.asarray(o_hybrid[0]), np.asarray(o_hybrid[1])),
    }

    info = idx.offload(bq=True, bits=BITS)
    return idx, dense, cols, gids, spec, q, qi, qt, qw, oracle, info


def test_offload_shrinks_device_footprint(cold_setup):
    idx, *_ , info = cold_setup
    assert idx.cold is not None and idx.vecs is None
    exact_bytes = idx.n_shards * CAP * (DIM * 4 + S * 8)  # vecs+terms+weights
    assert info["device_bytes"] < exact_bytes / 2, info
    assert info["host_bytes"] == idx.n_shards * CAP * DIM * 4


def test_cold_dense_recall_and_exact_scores(cold_setup):
    idx, dense, _, gids, spec, q, qi, *_rest = cold_setup
    oracle = _rest[2]
    scores, out = idx.search(q, spec, limit=10, fusion=False, oversample=8)
    scores, out = np.asarray(scores), np.asarray(out)
    # Self-retrieval first, every query.
    for b, i in enumerate(qi):
        assert int(out[b, 0]) == int(gids[i]), (b, out[b], gids[i])
    # The union-of-chips coarse pool + exact rescore holds oracle recall.
    assert overlap(out, oracle["dense"][1]) >= 0.95
    # Dense values are EXACT (host f32 rescore), not coarse estimates:
    # wherever cold and oracle agree on a gid, scores match.
    o_scores, o_gids = oracle["dense"]
    for b in range(len(qi)):
        m = {int(g): float(v) for g, v in zip(o_gids[b], o_scores[b])}
        for g, v in zip(out[b], scores[b]):
            if int(g) in m:
                np.testing.assert_allclose(v, m[int(g)], rtol=1e-4)


def test_cold_hybrid_with_filters(cold_setup):
    idx, dense, cols, gids, spec_all, q, qi, qt, qw, oracle, _ = cold_setup
    got = idx.search(q, spec_all, qt=qt, qw=qw, sparse_weight=0.3,
                     limit=10, oversample=8)
    got = np.asarray(got[1])
    assert overlap(got, oracle["hybrid"][1]) >= 0.9
    # Filtered: only folder==2 rows may appear.
    spec_f = make_filter_spec(include_folder_ids=[2])
    _, out = idx.search(q, spec_f, limit=10, fusion=False, oversample=8)
    out = np.asarray(out)
    folder_of = {int(g): int(c) for g, c in zip(gids, cols[:, COL_FOLDER])}
    for row in out:
        for g in row:
            if g >= 0:
                assert folder_of[int(g)] == 2


def test_cold_sparse_full_batch_width(cold_setup):
    """Per-query sparse batches serve at full width (no batch-1 assert)."""
    idx, dense, _, gids, spec, q, qi, *_ = cold_setup
    b = len(qi)
    rng = np.random.default_rng(3)
    qt = rng.integers(0, 300, (b, 4)).astype(np.int32)
    qw = rng.random((b, 4)).astype(np.float32)
    scores, out = idx.search(q, spec, qt=qt, qw=qw, sparse_weight=0.3,
                             limit=10, oversample=8)
    out = np.asarray(out)
    assert out.shape == (b, 10) and (out >= 0).all()
    # Row i's result must differ from scoring row 0's sparse query for all —
    # i.e. the batch is truly per-query (distinct sparse queries, distinct
    # fused rankings for at least one row).
    qt0 = np.broadcast_to(qt[:1], qt.shape).copy()
    qw0 = np.broadcast_to(qw[:1], qw.shape).copy()
    _, out0 = idx.search(q, spec, qt=qt0, qw=qw0, sparse_weight=0.3,
                         limit=10, oversample=8)
    assert not np.array_equal(out, np.asarray(out0))


def test_cold_ivf_compose(cold_setup):
    """IVF x BQ x sharding: probe cells of each chip's cell-major sketch."""
    idx, dense, _, gids, spec, q, qi, qt, qw, oracle, _ = cold_setup
    info = idx.build_ivf(n_cells=8, kmeans_iters=8, train_sample=2048,
                         assign_k=2, assign_margin=0.1)
    assert info["shards"] == 8 and info["rows"] == N_ROWS, info
    assert idx.cold.ivf is not None

    scores, out = idx.search(q, spec, limit=10, fusion=False,
                             nprobe=4, oversample=8)
    out = np.asarray(out)
    for b, i in enumerate(qi):
        assert int(out[b, 0]) == int(gids[i]), (b, out[b, :3], gids[i])
    assert overlap(out, oracle["dense"][1]) >= 0.9
    # Hybrid through the probed path too.
    _, hout = idx.search(q, spec, qt=qt, qw=qw, sparse_weight=0.3,
                         limit=10, nprobe=4, oversample=8)
    assert overlap(np.asarray(hout), oracle["hybrid"][1]) >= 0.85


def test_cold_tombstone_visible(mesh):
    idx, dense, cols, terms, weights, gids = build(mesh, n_rows=1200, seed=7)
    spec = make_filter_spec()
    q = jnp.asarray(dense[11][None])
    idx.offload(bq=True, bits=BITS)
    _, before = idx.search(q, spec, limit=5, fusion=False, oversample=8)
    assert int(np.asarray(before)[0, 0]) == int(gids[11])
    idx.tombstone_gids(np.asarray([gids[11]]))
    _, after = idx.search(q, spec, limit=5, fusion=False, oversample=8)
    assert int(gids[11]) not in set(np.asarray(after)[0].tolist())
    # Doc-level tombstone while cold: all rows of doc 3 vanish.
    doc3 = {int(g) for g, c in zip(gids, cols[:, COL_DOC]) if c == 3}
    idx.tombstone_doc(3)
    _, out = idx.search(jnp.asarray(dense[:4]), spec, limit=10,
                        fusion=False, oversample=8)
    assert not (doc3 & {int(g) for g in np.asarray(out).ravel()})


def test_cold_write_refused_and_roundtrip(mesh):
    idx, dense, cols, terms, weights, gids = build(mesh, n_rows=1000, seed=9)
    spec = make_filter_spec()
    q = jnp.asarray(dense[:4])
    o_scores, o_gids = idx.search(q, spec, limit=10, fusion=False)
    idx.offload(bq=True, bits=BITS)
    with pytest.raises(AssertionError, match="cold"):
        idx.write_rows(dense[:1], cols[:1], terms[:1], weights[:1])
    # Persistence while cold round-trips through the host mirrors.
    data = idx.to_host()
    idx2 = ShardedIndex.from_host(index_mesh(8), data)
    r_scores, r_gids = idx2.search(q, spec, limit=10, fusion=False)
    np.testing.assert_array_equal(np.asarray(r_gids), np.asarray(o_gids))
    # ensure_resident restores the exact path bit-for-bit.
    idx.ensure_resident()
    assert idx.cold is None and idx.vecs is not None
    b_scores, b_gids = idx.search(q, spec, limit=10, fusion=False)
    np.testing.assert_array_equal(np.asarray(b_gids), np.asarray(o_gids))
    np.testing.assert_allclose(np.asarray(b_scores), np.asarray(o_scores),
                               rtol=1e-5)
