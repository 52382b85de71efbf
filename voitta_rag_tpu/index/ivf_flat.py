"""IVF with variable-length cell lists (flat cell-major layout).

The padded cell-block layout (index/ivf.py: ``vecs3 [C, cell_cap, D]``)
buys O(1) cell addressing with memory = ``C * cell_cap`` slots. On real
text that trade collapses at scale: embedding mass is Zipfian (measured on
the 1.04M-chunk harvested corpus at 10 views: the top 25% of cells hold
75% of rows; at a 1.4x-mean cap, 40% of rows overflow), so a cap generous
enough for the head costs 2-3x the corpus in padding — beyond HBM at
10M x 768 — while a tight cap forces millions of rows into wrong cells or
an always-scanned residual.

This variant stores the corpus FLAT and sorted by cell (exactly Faiss's
variable-length inverted lists), TPU-shaped:

  - ``vecs [M, D]`` cell-major; ``starts [C+1]`` prefix offsets;
    ``gids/cols/scales`` aligned. Memory = M rows exactly, zero padding —
    cell sizes are unconstrained, so no spilling, no misplacement, and no
    residual tier.
  - WITHIN each cell, rows sort by centroid similarity DESCENDING.
  - A search probes top-``nprobe`` cells and gathers a FIXED
    ``probe_cap``-row window per unique probed cell (lane-aligned, static
    shape — XLA-friendly), then runs the standard masked dense scan over
    the gathered block. A cell longer than ``probe_cap`` is truncated at
    its FAR SHELL (the centroid ordering makes the window the cell's core).
  - Shell rows (rank >= probe_cap in their home cell) and margin-boundary
    rows get REPLICAS appended to their runner-up cell, so truncation and
    cell-boundary effects degrade recall gracefully instead of cliffing.

Build cost is one global (cell, -sim) argsort on the host plus a device
scatter — no k-means balancing pass, no per-cell loops.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from voitta_rag_tpu.ops.dense_scan import dense_scan_scores
from voitta_rag_tpu.ops.filters import COL_VALID, NUM_COLS, FilterSpec
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, round_up
from voitta_rag_tpu.ops.topk import dedup_candidates, masked_topk


def plan_layout(assign2: np.ndarray, sims2: np.ndarray, *,
                n_cells: int, probe_cap: int,
                margin: float | None = 0.05,
                replica_budget: int | None = None,
                align: int = 128, split_hot: bool = True):
    """Host planning: rows -> flat positions (primary + optional replica).

    ``assign2 [N, 2]`` top-2 cells per row, ``sims2 [N, 2]`` their sims.
    Returns ``(primary_pos [N], replica_pos [N] (-1 = none),
    starts [Cv+1], M, cell_map [Cv])`` where positions index the flat
    cell-major arrays and ``cell_map`` maps VIRTUAL cells back to the
    k-means cell whose centroid they share. Within a cell, positions
    order by primary-sim descending. Margin-boundary rows get replicas in
    their runner-up cell (bounded by ``replica_budget``, smallest gaps
    first).

    ``split_hot``: a cell longer than ``probe_cap`` splits POSITIONALLY
    into ceil(len/probe_cap) virtual cells sharing its centroid — the
    probe's top-k then naturally spends several (tied) probes on a hot
    cluster when the query is near it, and every row stays reachable.
    This is the flat layout's answer to Zipf heads that k-means cannot
    split (near-duplicate blobs all share one nearest centroid); measured
    on the real 10M corpus, window truncation without it loses 42% of
    rows in 1.7k hot cells.

    Cell starts are ``align``-row aligned (<= align-1 pad rows per cell,
    ~0.6% at the 10M geometry): the probe window then gathers CONTIGUOUS
    align-row tiles instead of scattered single rows — measured 3x gather
    bandwidth on v5e (row-wise HBM reads of 768 B vs 98 KB tiles).
    """
    n = len(assign2)
    c0 = assign2[:, 0].astype(np.int64)
    boundary = np.zeros(n, bool)
    if margin is not None:
        boundary = (sims2[:, 0] - sims2[:, 1]) <= margin
    cand = np.flatnonzero(boundary)
    if not split_hot:
        # Without positional splitting, shell rows (rank >= probe_cap in
        # their home cell) are window-truncated — replicate them first.
        order = np.lexsort((-sims2[:, 0], c0))
        counts0 = np.bincount(c0, minlength=n_cells)
        st0 = np.zeros(n_cells + 1, np.int64)
        np.cumsum(counts0, out=st0[1:])
        rank = np.arange(n, dtype=np.int64) - st0[c0[order]]
        rank_of_row = np.empty(n, np.int64)
        rank_of_row[order] = rank
        shell = rank_of_row >= probe_cap
        cand = np.flatnonzero(shell | boundary)
        if replica_budget is not None and len(cand) > replica_budget:
            sh = cand[shell[cand]]
            bd = cand[~shell[cand]]
            if len(sh) >= replica_budget:
                cand = sh[:replica_budget]
            else:
                gaps = sims2[bd, 0] - sims2[bd, 1]
                bd = bd[np.argsort(gaps)][: replica_budget - len(sh)]
                cand = np.concatenate([sh, bd])
    elif replica_budget is not None and len(cand) > replica_budget:
        gaps = sims2[cand, 0] - sims2[cand, 1]
        cand = cand[np.argsort(gaps)][:replica_budget]
    rep_cell = assign2[cand, 1].astype(np.int64)
    rep_sim = sims2[cand, 1]

    # Merge primary and replica entries into one (cell, -sim) order.
    all_cells = np.concatenate([c0, rep_cell])
    all_sims = np.concatenate([sims2[:, 0], rep_sim])
    entry_row = np.concatenate([np.arange(n, dtype=np.int64), cand])
    order = np.lexsort((-all_sims, all_cells))
    m_entries = len(all_cells)
    counts = np.bincount(all_cells, minlength=n_cells)
    packed0 = np.zeros(n_cells + 1, np.int64)
    np.cumsum(counts, out=packed0[1:])
    counts_al = -(-counts // align) * align
    starts_cell = np.zeros(n_cells + 1, np.int64)
    np.cumsum(counts_al, out=starts_cell[1:])
    m = int(starts_cell[-1])
    # Rank within the cell (from the packed order) + aligned cell start.
    oc = all_cells[order]
    rank = np.arange(m_entries, dtype=np.int64) - packed0[oc]
    pos_of_entry = np.empty(m_entries, np.int64)
    pos_of_entry[order] = starts_cell[oc] + rank
    primary_pos = pos_of_entry[:n]
    replica_pos = np.full(n, -1, np.int64)
    replica_pos[entry_row[n:]] = pos_of_entry[n:]

    if split_hot:
        # Virtual cells: partition each cell's aligned range into
        # probe_cap windows. Window boundaries chain exactly (aligned
        # counts), so the virtual starts stay a valid prefix array.
        n_win = np.maximum(-(-counts_al // probe_cap), 1)
        cell_map = np.repeat(np.arange(n_cells, dtype=np.int32), n_win)
        first_win = np.r_[0, np.cumsum(n_win)[:-1]]
        win_idx = np.arange(len(cell_map), dtype=np.int64) \
            - first_win[cell_map]
        v_start = starts_cell[cell_map] + win_idx * probe_cap
        starts = np.concatenate([v_start, [m]])
    else:
        cell_map = np.arange(n_cells, dtype=np.int32)
        starts = starts_cell
    return (primary_pos, replica_pos, starts.astype(np.int32), m,
            cell_map)


@dataclass
class IVFFlatIndex:
    """Variable-length inverted lists over a flat cell-major corpus."""

    centroids: jax.Array   # [C, D] f32
    vecs: jax.Array        # [M_pad, D] int8 | bf16 | f32, cell-major
    cols: jax.Array        # [NUM_COLS, M_pad] int32 (pad rows invalid)
    gids: jax.Array        # [M_pad] int32 store-global ids (-1 pad)
    scales: jax.Array      # [1, M_pad] f32 (int8 rows)
    starts: jax.Array      # [C+1] int32 prefix offsets into the flat rows
    probe_cap: int = 0     # window rows per probed cell (build() sets it)

    @property
    def n_cells(self) -> int:
        return self.centroids.shape[0]

    @classmethod
    def build(cls, vecs, cols, gids, *, n_cells: int, probe_cap: int = 0,
              scales=None, kmeans_iters: int = 20,
              margin: float | None = 0.05,
              replica_budget: int | None = None, train_sample: int = 262144,
              seed: int = 0) -> "IVFFlatIndex":
        """In-memory build (tests / moderate corpora; the 10M bench builds
        the same layout streaming, bench.py::bench_real10m)."""
        from voitta_rag_tpu.index.ivf import (
            _assign_topk_cells, _block_rows_for, _kmeans_train,
        )

        n, d = vecs.shape
        is_int8 = vecs.dtype == jnp.int8
        rng = np.random.default_rng(seed)
        ns = min(n, max(train_sample, n_cells * 4))
        pick = jnp.asarray(np.sort(rng.choice(n, ns, replace=False)))
        tv = jnp.take(vecs, pick, axis=0)
        ts = jnp.take(scales[0], pick) if is_int8 else None
        br = _block_rows_for(n_cells)
        centroids = _kmeans_train(tv, ts, n_cells, kmeans_iters,
                                  max(1, ns // br), seed)
        a2, s2 = _assign_topk_cells(
            vecs, scales[0] if is_int8 else None, centroids,
            min(2, n_cells), max(1, -(-n // br)), with_sims=True)
        a2, s2 = np.asarray(a2), np.asarray(s2)
        if a2.shape[1] == 1:  # n_cells == 1 degenerate
            a2 = np.repeat(a2, 2, axis=1)
            s2 = np.repeat(s2, 2, axis=1)
        if probe_cap <= 0:
            # Auto window: cover the longest cell outright on small/even
            # corpora (full-probe searches stay exact vs the flat oracle);
            # on skewed corpora cap at max(1024, 4x mean) and let hot-cell
            # splitting keep truncated rows reachable via virtual cells.
            counts_all = np.bincount(
                np.concatenate([
                    a2[:, 0],
                    a2[(s2[:, 0] - s2[:, 1]) <= (margin or 0.0), 1],
                ]).astype(np.int64), minlength=n_cells)
            max_al = round_up(max(int(counts_all.max()), 1), 128)
            mean = max(int(counts_all.sum()) // max(n_cells, 1), 1)
            probe_cap = min(max_al, max(1024, round_up(4 * mean, 128)))
        primary_pos, replica_pos, starts, m, cell_map = plan_layout(
            a2, s2, n_cells=n_cells, probe_cap=probe_cap, margin=margin,
            replica_budget=replica_budget)
        centroids = jnp.take(centroids, jnp.asarray(cell_map), axis=0)
        m_pad = round_up(max(m, 128), 128)

        src = np.concatenate([np.arange(n, dtype=np.int64),
                              np.flatnonzero(replica_pos >= 0)])
        dst = np.concatenate([primary_pos,
                              replica_pos[replica_pos >= 0]])
        perm = np.full(m_pad, n, np.int64)    # OOB source -> dropped
        perm[dst] = src
        perm_j = jnp.asarray(np.minimum(perm, n - 1))
        valid = jnp.asarray(perm < n)
        flat_vecs = jnp.take(vecs, perm_j, axis=0)
        flat_cols = jnp.take(cols, perm_j, axis=1)
        flat_cols = flat_cols.at[COL_VALID].set(
            jnp.where(valid, flat_cols[COL_VALID], 0))
        flat_gids = jnp.where(valid, jnp.take(jnp.asarray(gids), perm_j),
                              -1).astype(jnp.int32)
        flat_scales = (jnp.take(scales[0], perm_j)[None] if is_int8
                       else jnp.ones((1, m_pad), jnp.float32))
        return cls(centroids=centroids, vecs=flat_vecs, cols=flat_cols,
                   gids=flat_gids, scales=flat_scales,
                   starts=jnp.asarray(starts), probe_cap=probe_cap)

    def search_candidates(self, q, spec: FilterSpec, *, nprobe: int,
                          limit: int, probe_cap: int | None = None,
                          prefetch_multiplier: int = 3):
        cap = probe_cap or self.probe_cap
        assert cap > 0, "probe_cap unset (index not built via build()?)"
        return _ivf_flat_candidates(
            q, self.centroids, self.vecs, self.cols, self.gids,
            self.scales, self.starts, spec,
            nprobe=min(nprobe, self.n_cells), limit=limit,
            probe_cap=cap, prefetch_multiplier=prefetch_multiplier)


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "limit", "probe_cap", "prefetch_multiplier"))
def _ivf_flat_candidates(q, centroids, vecs, cols, gids, scales, starts,
                         spec: FilterSpec, *, nprobe: int, limit: int,
                         probe_cap: int, prefetch_multiplier: int = 3):
    """Probe -> windowed gather -> masked dense scan -> select.

    The gather window is a STATIC ``probe_cap`` rows per unique probed
    cell (batch-deduped, as in index/ivf.py::_ivf_search_scores); slots
    beyond a cell's true length clamp to the last row and are masked off,
    so the scan shapes never depend on cell sizes.
    """
    B = q.shape[0]
    C = centroids.shape[0]
    M = vecs.shape[0]
    qf = q.astype(jnp.float32)
    cell_sims = qf @ centroids.T
    _, cells = jax.lax.top_k(cell_sims, nprobe)                # [B, nprobe]
    U = min(B * nprobe, C)
    flat = jnp.sort(cells.reshape(-1))
    first = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    slot = jnp.where(first, jnp.cumsum(first) - 1, U)
    ucells = (jnp.full((U + 1,), C, jnp.int32)
              .at[slot].set(flat.astype(jnp.int32), mode="drop")[:U])
    pad = ucells == C
    ucells = jnp.where(pad, 0, ucells)

    s_lo = jnp.take(starts, ucells)                            # [U]
    s_len = jnp.take(starts, ucells + 1) - s_lo
    win = jnp.arange(probe_cap, dtype=jnp.int32)
    idx = s_lo[:, None] + win[None, :]                         # [U, cap]
    in_win = win[None, :] < jnp.minimum(s_len, probe_cap)[:, None]
    idx = jnp.clip(idx, 0, M - 1).reshape(-1)

    if M % 128 == 0 and probe_cap % 128 == 0:
        # Aligned layout (plan_layout align=128): the window is whole
        # 128-row tiles, so gather EVERYTHING as contiguous [128, ...]
        # tiles (~98 KB HBM reads for the vectors) instead of scattered
        # per-row reads — the row-wise gather measured 3x slower on v5e,
        # and the small aux arrays (cols/scales/gids) are latency-bound
        # when gathered row-wise.
        d = vecs.shape[1]
        tiles = jnp.clip(s_lo[:, None] // 128
                         + jnp.arange(probe_cap // 128)[None, :],
                         0, M // 128 - 1).reshape(-1)
        rows = jnp.take(vecs.reshape(M // 128, 128, d), tiles,
                        axis=0).reshape(-1, d)                 # [U*cap, D]
        cols_u = (jnp.take(cols.reshape(NUM_COLS, M // 128, 128), tiles,
                           axis=1).reshape(NUM_COLS, -1))
        scales_u = jnp.take(scales[0].reshape(M // 128, 128), tiles,
                            axis=0).reshape(1, -1)
        gids_u = jnp.take(gids.reshape(M // 128, 128), tiles,
                          axis=0).reshape(-1)
    else:
        rows = jnp.take(vecs, idx, axis=0)                     # [U*cap, D]
        cols_u = jnp.take(cols, idx, axis=1)
        scales_u = jnp.take(scales[0], idx)[None]
        gids_u = jnp.take(gids, idx)

    is_int8 = vecs.dtype == jnp.int8
    scores = dense_scan_scores(q, rows, cols_u, spec,
                               scales_u if is_int8 else None)  # [B, U*cap]
    member = jnp.any(
        ucells[None, :, None] == cells[:, None, :], axis=-1) & ~pad[None, :]
    valid = (member[:, :, None] & in_win[None]).reshape(B, -1) \
        & (gids_u[None] >= 0)
    scores = jnp.where(valid, scores, NEG_INF)

    k = min(limit * prefetch_multiplier + 8, scores.shape[-1])
    vals, pos = masked_topk(scores, k,
                            approx=scores.shape[-1] > (1 << 16))
    cand = jnp.where(pos >= 0, jnp.take(gids_u, jnp.maximum(pos, 0)),
                     -1).astype(jnp.int32)
    # Replicas duplicate gids across cells; keep the best copy.
    vals, cand = dedup_candidates(vals, cand)
    return vals[:, :limit], cand[:, :limit]
