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
import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voitta_rag_tpu.ops.dense_scan import dense_scan_scores
from voitta_rag_tpu.ops.filters import COL_VALID, NUM_COLS, FilterSpec, eval_mask
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, interpret_mode, round_up
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
        # probe_cap extra pad rows past the last cell: the Pallas probe
        # DMAs a full window from any virtual start, so the final window
        # must have probe_cap addressable rows (invalid, score-masked).
        m_pad = round_up(max(m, 128), 128) + probe_cap

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

    def pallas_ok(self, probe_cap: int | None = None) -> bool:
        """Whether the scalar-prefetch probe kernel applies: TPU backend,
        aligned layout, and probe_cap pad rows past the last cell (any
        build through plan_layout + the m_pad slack; set
        VOITTA_IVF_FLAT_PALLAS=0 to opt out)."""
        cap = probe_cap or self.probe_cap
        rows_end = getattr(self, "_rows_end", None)
        if rows_end is None:
            rows_end = int(self.starts[-1])   # one sync per instance
            self._rows_end = rows_end
        return (
            os.environ.get("VOITTA_IVF_FLAT_PALLAS", "1") != "0"
            and jax.default_backend() == "tpu"
            and not interpret_mode()
            and cap > 0 and cap % 128 == 0
            and self.vecs.shape[0] % 128 == 0
            and self.vecs.shape[0] >= rows_end + cap)

    def search_candidates(self, q, spec: FilterSpec, *, nprobe: int,
                          limit: int, probe_cap: int | None = None,
                          prefetch_multiplier: int = 3,
                          use_pallas: bool | None = None):
        cap = probe_cap or self.probe_cap
        assert cap > 0, "probe_cap unset (index not built via build()?)"
        if use_pallas is None:
            use_pallas = self.pallas_ok(cap)
        return _ivf_flat_candidates(
            q, self.centroids, self.vecs, self.cols, self.gids,
            self.scales, self.starts, spec,
            nprobe=min(nprobe, self.n_cells), limit=limit,
            probe_cap=cap, prefetch_multiplier=prefetch_multiplier,
            use_pallas=bool(use_pallas))


def _flat_probe_kernel(starts_ref, lens_ref, params_ref, inc_ref, exc_ref,
                       excif_ref, q_ref, vecs_hbm, cols_hbm,
                       scales_hbm, out_ref, vbuf, cbuf, sbuf, sems):
    """One probed window per grid step, double-buffered HBM→VMEM DMA.

    The window START is data-dependent (``starts_ref``, scalar-prefetched),
    which is exactly what XLA cannot express: the jnp fallback in
    ``_ivf_flat_candidates`` lowers to a row/tile gather that measured
    0.06-0.13 of the bandwidth roofline on the 10M real corpus, while this
    kernel issues ONE contiguous ``[probe_cap, D]`` copy per window (plus
    the strided cols/scales sidecars) and overlaps the next window's DMA
    with the current window's MXU scan — the dense_scan pipeline shape,
    with the tile address coming from the probe instead of the grid.
    """
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    cap = vbuf.shape[1]

    def dmas(slot, step):
        # plan_layout aligns every virtual-cell start to 128 rows; the hint
        # lets Mosaic slice the tiled HBM memref at the dynamic offset.
        s = pl.multiple_of(starts_ref[step], 128)
        return (
            pltpu.make_async_copy(vecs_hbm.at[pl.ds(s, cap), :],
                                  vbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(cols_hbm.at[:, pl.ds(s, cap)],
                                  cbuf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(scales_hbm.at[:, pl.ds(s, cap)],
                                  sbuf.at[slot], sems.at[slot, 2]),
        )

    @pl.when(i == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(i + 1 < n_steps)
    def _():
        # The (i+1) slot's previous occupant (step i-1) was consumed in the
        # previous grid step; safe to overwrite while we scan window i.
        for d in dmas((i + 1) % 2, i + 1):
            d.start()

    slot = i % 2
    for d in dmas(slot, i):
        d.wait()
    v = vbuf[slot]
    if v.dtype != jnp.float32:
        v = v.astype(jnp.bfloat16)
    q = q_ref[:]
    if q.dtype != v.dtype:
        q = q.astype(v.dtype)
    scores = jax.lax.dot_general(
        q, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = scores * sbuf[slot][0][None, :]      # int8 dequant (ones else)
    mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                     cbuf[slot])
    # Per-(query, cell) membership is applied by the CALLER (it fuses into
    # the top-k's input read; a [B] column load from a [B, U] operand is
    # not legalizable on the VPU).
    win = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1) < lens_ref[i]
    out_ref[:] = jnp.where(mask[None, :] & win, scores, NEG_INF)


def _flat_probe_scores(q, starts_u, lens_u, vecs, cols, scales,
                       spec: FilterSpec, *, probe_cap: int):
    """Pallas probe: [B, U*probe_cap] masked scores over U windows."""
    B, D = q.shape
    U = int(starts_u.shape[0])
    itemsize = 1 if vecs.dtype == jnp.int8 else vecs.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(U,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, s, l: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(spec.inc_ids.shape, lambda i, s, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(spec.exc_ids.shape, lambda i, s, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(spec.exc_if_ids.shape, lambda i, s, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda i, s, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # vecs stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # cols
            pl.BlockSpec(memory_space=pltpu.ANY),   # scales
        ],
        out_specs=pl.BlockSpec((B, probe_cap), lambda i, s, l: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, probe_cap, D), vecs.dtype),
            pltpu.VMEM((2, NUM_COLS, probe_cap), jnp.int32),
            pltpu.VMEM((2, 1, probe_cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        _flat_probe_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, U * probe_cap), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * U * probe_cap * D,
            bytes_accessed=U * probe_cap * (D * itemsize + NUM_COLS * 4 + 4)
            + B * U * probe_cap * 4,
            transcendentals=0,
        ),
    )(starts_u, lens_u, spec.params, spec.inc_ids, spec.exc_ids,
      spec.exc_if_ids, q, vecs, cols, scales)


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "limit", "probe_cap", "prefetch_multiplier",
                     "use_pallas"))
def _ivf_flat_candidates(q, centroids, vecs, cols, gids, scales, starts,
                         spec: FilterSpec, *, nprobe: int, limit: int,
                         probe_cap: int, prefetch_multiplier: int = 3,
                         use_pallas: bool = False):
    """Probe -> windowed gather -> masked dense scan -> select.

    The gather window is a STATIC ``probe_cap`` rows per unique probed
    cell (batch-deduped, as in index/ivf.py::_ivf_search_scores); slots
    beyond a cell's true length clamp to the last row and are masked off,
    so the scan shapes never depend on cell sizes. With ``use_pallas``
    the gather+scan is one scalar-prefetch kernel (``_flat_probe_kernel``)
    that DMAs each window contiguously — requires the flat arrays to carry
    ``probe_cap`` pad rows past the last cell (build() provides them).
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

    if use_pallas:
        member = jnp.any(ucells[None, :, None] == cells[:, None, :],
                         axis=-1) & ~pad[None, :]          # [B, U]
        lens_u = jnp.minimum(s_len, probe_cap).astype(jnp.int32)
        scores = _flat_probe_scores(q, s_lo.astype(jnp.int32), lens_u,
                                    vecs, cols, scales, spec,
                                    probe_cap=probe_cap)
        # Membership fuses into the top-k's read of the score matrix.
        B_, U_ = member.shape
        scores = jnp.where(member[:, :, None], scores.reshape(B_, U_, -1),
                           NEG_INF).reshape(B_, -1)
        k = min(limit * prefetch_multiplier + 8, scores.shape[-1])
        vals, pos = masked_topk(scores, k,
                                approx=scores.shape[-1] > (1 << 16))
        safe = jnp.maximum(pos, 0)
        rows = jnp.take(s_lo, safe // probe_cap) + safe % probe_cap
        cand = jnp.where(pos >= 0, jnp.take(gids, rows),
                         -1).astype(jnp.int32)
        vals, cand = dedup_candidates(vals, cand)
        return vals[:, :limit], cand[:, :limit]

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
