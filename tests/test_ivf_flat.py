"""Variable-length inverted lists (index/ivf_flat.py).

The Zipf-skew fix: a padded cell layout caps every cell at cell_cap and
misplaces the overflow; the flat layout holds ANY cell-size distribution in
exactly N rows and probes a fixed window of each cell's centroid-ordered
core. Tested against the exact oracle on a deliberately skewed corpus —
one mega-cluster holding half the rows (> probe_cap) plus a long tail.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.index.ivf_flat import IVFFlatIndex, plan_layout
from voitta_rag_tpu.ops.filters import (
    COL_FOLDER, COL_VALID, NUM_COLS, make_filter_spec,
)

N, D, C = 6144, 64, 16
PROBE_CAP = 512  # mega-cluster (~3k rows) truncates hard


def skewed_corpus(seed=0):
    """Half the corpus in ONE tight cluster, the rest in 15 spread ones."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((C, D)).astype(np.float32)
    n_hot = N // 2
    cid = np.concatenate([np.zeros(n_hot, np.int64),
                          rng.integers(1, C, N - n_hot)])
    v = centers[cid] * np.where(cid == 0, 3.0, 1.0)[:, None] \
        + 0.45 * rng.standard_normal((N, D)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32), cid


@pytest.fixture(scope="module")
def built():
    vecs, cid = skewed_corpus()
    cols = np.zeros((NUM_COLS, N), np.int32)
    cols[COL_VALID] = 1
    rng = np.random.default_rng(3)
    cols[COL_FOLDER] = rng.integers(0, 4, N)
    idx = IVFFlatIndex.build(
        jnp.asarray(vecs), jnp.asarray(cols),
        np.arange(N, dtype=np.int32), n_cells=C, probe_cap=PROBE_CAP,
        kmeans_iters=10, margin=0.05, train_sample=4096)
    return idx, vecs, cols


def test_layout_holds_all_rows(built):
    idx, vecs, _ = built
    starts = np.asarray(idx.starts)
    assert starts[-1] >= N  # primaries + replicas
    gids = np.asarray(idx.gids)
    present = np.unique(gids[gids >= 0])
    assert len(present) == N, "every row must appear in some cell"
    # The mega-cluster splits into several probe-window-sized VIRTUAL
    # cells sharing one centroid (the situation the padded layout
    # misplaces): more cells than k-means trained, none past the window.
    assert len(starts) - 1 > C
    assert (np.diff(starts) <= PROBE_CAP).all()
    # Duplicated centroids mark the split windows.
    cents = np.asarray(idx.centroids)
    assert len(cents) == len(starts) - 1
    assert len(np.unique(cents[:, 0])) <= C


def test_recall_vs_oracle_on_skewed_corpus(built):
    idx, vecs, _ = built
    rng = np.random.default_rng(7)
    qi = rng.integers(0, N, 32)
    q = jnp.asarray(vecs[qi])
    spec = make_filter_spec()
    vals, got = idx.search_candidates(q, spec, nprobe=4, limit=10,
                                      probe_cap=PROBE_CAP)
    vals, got = np.asarray(vals), np.asarray(got)
    oracle = np.argsort(-(vecs[qi] @ vecs.T), axis=1)[:, :10]
    rec = np.mean([len(set(got[b]) & set(oracle[b])) / 10
                   for b in range(len(qi))])
    assert rec >= 0.9, rec
    _, cid = skewed_corpus()
    for b, i in enumerate(qi):
        if cid[i] != 0:
            # Tail-cluster cells fit the probe window: exact self-retrieval.
            assert got[b, 0] == i, (b, got[b], i)
        else:
            # Inside the truncated mega-cell a row's near-duplicates tie
            # it: the top-1 must match the self-score, not the id.
            assert vals[b, 0] >= float(vecs[i] @ vecs[i]) - 5e-2, (
                b, vals[b, 0])


def test_more_cells_recover_exact_self_retrieval():
    """The flat layout's remedy for mega-cells is MORE CELLS (memory does
    not grow with C, unlike the padded layout): at C=128 the hot cluster
    splits across sub-cells and every row self-retrieves by id."""
    vecs, cid = skewed_corpus()
    cols = np.zeros((NUM_COLS, N), np.int32)
    cols[COL_VALID] = 1
    idx = IVFFlatIndex.build(
        jnp.asarray(vecs), jnp.asarray(cols),
        np.arange(N, dtype=np.int32), n_cells=128, probe_cap=PROBE_CAP,
        kmeans_iters=15, margin=0.05, train_sample=6144)
    sizes = np.diff(np.asarray(idx.starts))
    assert sizes.max() <= PROBE_CAP, "128 cells should tame the hot cluster"
    rng = np.random.default_rng(13)
    qi = rng.integers(0, N, 32)
    _, got = idx.search_candidates(jnp.asarray(vecs[qi]),
                                   make_filter_spec(), nprobe=8, limit=10,
                                   probe_cap=PROBE_CAP)
    got = np.asarray(got)
    for b, i in enumerate(qi):
        assert got[b, 0] == i, (b, got[b], i)


def test_filtered_search(built):
    idx, vecs, cols = built
    rng = np.random.default_rng(9)
    q = jnp.asarray(vecs[rng.integers(0, N, 8)])
    spec = make_filter_spec(include_folder_ids=[2])
    _, got = idx.search_candidates(q, spec, nprobe=4, limit=10,
                                   probe_cap=PROBE_CAP)
    folder = cols[COL_FOLDER]
    for row in np.asarray(got):
        for g in row:
            if g >= 0:
                assert folder[g] == 2


def test_plan_layout_shell_replicas():
    """Rows past probe_cap in their home cell get runner-up replicas."""
    n, cells = 600, 2
    a2 = np.zeros((n, 2), np.int64)
    a2[:, 1] = 1                      # runner-up for everyone is cell 1
    sims = np.zeros((n, 2), np.float32)
    sims[:, 0] = np.linspace(1.0, 0.5, n)   # distinct ranks
    sims[:, 1] = 0.1                  # far: no margin replicas
    pp, rp, starts, m, cmap = plan_layout(
        a2, sims, n_cells=cells, probe_cap=256, margin=0.05, align=1,
        split_hot=False)
    # 600 - 256 shell rows replicate into cell 1 (split_hot=False keeps
    # the window-truncation semantics that need shell replicas).
    assert (rp >= 0).sum() == n - 256
    shell_rows = np.flatnonzero(rp >= 0)
    assert (np.linspace(1.0, 0.5, n)[shell_rows] <
            np.sort(sims[:, 0])[::-1][255]).all()
    assert starts[-1] == m == n + (n - 256)
    assert list(cmap) == [0, 1]
    # Within-cell order is sim-descending: position 0 = best sim.
    assert pp[0] == 0 and pp[n - 1] > pp[0]
    # Default: 128-aligned starts + hot cells split into probe-window
    # virtual cells sharing the home centroid.
    pa, ra, st_a, m_a, cm_a = plan_layout(a2, sims, n_cells=cells,
                                          probe_cap=256, margin=0.05)
    st_a = np.asarray(st_a)
    assert (st_a % 128 == 0).all()
    assert m_a == 640  # 600 rows pad to 640; no shell replicas, cell 1 empty
    # Cell 0 (640 aligned rows) -> 3 windows of <= 256; cell 1 -> 1.
    assert list(cm_a) == [0, 0, 0, 1]
    assert (np.diff(st_a) <= 256).all()


def test_dedup_keeps_single_copy(built):
    """Replicated rows must not appear twice in one result list."""
    idx, vecs, _ = built
    rng = np.random.default_rng(11)
    q = jnp.asarray(vecs[rng.integers(0, N, 16)])
    _, got = idx.search_candidates(q, make_filter_spec(), nprobe=8,
                                   limit=10, probe_cap=PROBE_CAP)
    for row in np.asarray(got):
        live = row[row >= 0]
        assert len(live) == len(set(live.tolist()))
