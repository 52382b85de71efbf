"""IVF (partitioned) index: probe-limited dense scans at large corpus sizes.

Replaces the recall/latency role of Qdrant's HNSW graph (reference
services/vector_store.py:88-100) with the TPU-friendly equivalent: a flat
scan is bandwidth-bound at ~2 bytes/chunk/dim, so at 10M+ chunks the corpus
is partitioned into ``C`` spherical k-means cells and only the ``nprobe``
closest cells are scanned per query (BASELINE config 4). Graph-walk ANN
(HNSW) is pointer-chasing and branch-heavy — hostile to the MXU/VPU; cell
probing keeps every byte moved through HBM part of a dense tiled matmul.

Layout: cell-major blocks ``vecs [C, cell_cap, D]`` + filter columns + global
row ids per slot. The probe kernel uses ``PrefetchScalarGridSpec``: the
selected cell ids arrive as scalar-prefetch operands, so the grid's
``index_map`` DMAs exactly the probed cell blocks from HBM — no host gather,
no materialized candidate copy. Skew overflow beyond ``cell_cap`` lands in a
flat residual block scanned on every query (bounded waste, exactness for the
overflow set).

Recall levers (why these exist — round 1 measured recall@10 of 0.2-0.5 with
3 k-means iterations over isotropic data):

- **Sampled, blocked k-means**: training runs 25 iterations on a device
  subsample (full-corpus iterations at 10M x 768 are wasted work — centroid
  estimates converge on ~256k points), and every E-step is blocked through
  ``lax.scan`` so the ``[rows, C]`` similarity matrix never exceeds a block
  (a full one is 300+ GB at 10M x 8192).
- **Multi-assignment** (``assign_k``): each vector is replicated into its
  top-k closest cells (ScaNN's "spilling"). A vector near a cell boundary is
  findable through either neighbor, which is where single-assignment IVF
  loses most of its recall. Memory cost is k x; with int8 cells, assign_k=2
  still undercuts an f32 HNSW graph's footprint.
- **int8 cells + per-slot scales**: halves probe bandwidth vs bf16; the
  probe kernel dequantizes on the fly after the MXU dot.

Mutation model: an IVF index is a read-optimized snapshot built from the
live segments; fresh upserts land in the flat segments and periodic rebuilds
fold them in (reference analogue: Qdrant's background HNSW indexing).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voitta_rag_tpu.ops.filters import FilterSpec, NUM_COLS, eval_mask
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, interpret_mode, pick_tile, round_up


# ---------------------------------------------------------------------------
# spherical k-means (unit vectors, cosine assignment) — all MXU matmuls
# ---------------------------------------------------------------------------

def _block_rows_for(n_cells: int) -> int:
    """Rows per E-step block: keep the [rows, C] similarity tile ~128 MB."""
    return max(1024, min(1 << 17, (1 << 25) // max(n_cells, 1)))


@functools.partial(jax.jit, static_argnames=("n_cells", "iters", "n_blocks"))
def _kmeans_train(vecs, scales, n_cells: int, iters: int, n_blocks: int,
                  seed: int):
    """Lloyd iterations on (already sampled) rows, E-step blocked via scan.

    vecs: [ns, D] any dtype (int8 dequantized per block via scales [ns]).
    Returns centroids [C, D] f32 unit-norm.
    """
    ns, d = vecs.shape
    br = ns // n_blocks
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, ns, (n_cells,), replace=False)
    init = jnp.take(vecs, init_idx, axis=0).astype(jnp.float32)
    if scales is not None:
        init = init * jnp.take(scales, init_idx)[:, None]
    centroids = init / jnp.clip(
        jnp.linalg.norm(init, axis=1, keepdims=True), 1e-12)

    vblocks = vecs[: n_blocks * br].reshape(n_blocks, br, d)
    sblocks = (scales[: n_blocks * br].reshape(n_blocks, br)
               if scales is not None else jnp.ones((n_blocks, br), jnp.float32))

    def estep(centroids):
        def body(carry, blk):
            sums, counts = carry
            v, s = blk
            vf = v.astype(jnp.float32) * s[:, None]
            sims = vf @ centroids.T                      # [br, C]
            assign = jnp.argmax(sims, axis=1)
            sums = sums + jax.ops.segment_sum(vf, assign,
                                              num_segments=n_cells)
            counts = counts + jax.ops.segment_sum(
                jnp.ones((br,), jnp.float32), assign, num_segments=n_cells)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            body, (jnp.zeros((n_cells, d), jnp.float32),
                   jnp.zeros((n_cells,), jnp.float32)),
            (vblocks, sblocks))
        return sums, counts[:, None]

    def step(_, centroids):
        sums, counts = estep(centroids)
        new = jnp.where(counts > 0, sums / jnp.clip(counts, 1.0, None),
                        centroids)
        return new / jnp.clip(jnp.linalg.norm(new, axis=1, keepdims=True),
                              1e-12)

    return jax.lax.fori_loop(0, iters, step, centroids)


@functools.partial(jax.jit, static_argnames=("k", "n_blocks"))
def _assign_topk_cells_flat(vecs, scales, centroids, k: int, n_blocks: int):
    """Blocked top-k cell assignment; outputs FLAT [n_blocks*br*k] arrays.

    The scan's stacked per-block outputs must not have a tiny minor
    dimension: a [blocks, br, k] layout lane-pads k up to 128 — at 10M
    rows that is two 5 GB buffers of pure padding (64x expansion,
    chip-measured compile OOM). Flattening each block to [br*k] keeps the
    stacked buffers minor-packed; callers reshape on the host.
    """
    n, d = vecs.shape
    br = -(-n // n_blocks)
    pad = n_blocks * br - n
    vp = jnp.pad(vecs, ((0, pad), (0, 0)))
    sp = (jnp.pad(scales, (0, pad)) if scales is not None
          else jnp.ones((n_blocks * br,), jnp.float32))

    def body(_, blk):
        v, s = blk
        vf = v.astype(jnp.float32) * s[:, None]
        sims = vf @ centroids.T
        if k == 1:
            idx = jnp.argmax(sims, axis=1).astype(jnp.int32)[:, None]
            top = jnp.take_along_axis(sims, idx, axis=1)
        else:
            top, idx = jax.lax.top_k(sims, k)
            idx = idx.astype(jnp.int32)
        return None, (idx.reshape(-1), top.astype(jnp.float32).reshape(-1))

    _, (out, sims) = jax.lax.scan(body, None,
                                  (vp.reshape(n_blocks, br, d),
                                   sp.reshape(n_blocks, br)))
    return out.reshape(-1), sims.reshape(-1)


def _assign_topk_cells(vecs, scales, centroids, k: int, n_blocks: int,
                       with_sims: bool = False):
    """Blocked top-k cell assignment for the full corpus → int32 [N, k]
    numpy (plus the f32 [N, k] centroid similarities when ``with_sims``).
    Host-side reshape by design — see _assign_topk_cells_flat."""
    n = vecs.shape[0]
    out_f, sims_f = _assign_topk_cells_flat(vecs, scales, centroids, k,
                                            n_blocks)
    out = np.asarray(out_f).reshape(-1, k)[:n]
    if with_sims:
        return out, np.asarray(sims_f).reshape(-1, k)[:n]
    return out


def spherical_kmeans(
    vecs: jax.Array,
    n_cells: int,
    iters: int = 25,
    seed: int = 0,
    *,
    scales: jax.Array | None = None,
    train_sample: int = 262144,
) -> tuple[jax.Array, jax.Array]:
    """K-means on unit vectors; returns (centroids [C, D] f32, assign [N]).

    Trains on a random device subsample (min(N, train_sample) rows) and
    assigns the full corpus in blocks — both never materialize more than a
    block of the [N, C] similarity matrix.
    """
    n, _ = vecs.shape
    ns = min(n, max(train_sample, n_cells * 4))
    br = _block_rows_for(n_cells)
    if ns < n:
        idx = jax.random.choice(jax.random.PRNGKey(seed ^ 0x5EED), n, (ns,),
                                replace=False)
        train_v = jnp.take(vecs, idx, axis=0)
        train_s = jnp.take(scales, idx) if scales is not None else None
    else:
        train_v, train_s = vecs, scales
    n_blocks_t = max(1, ns // br)
    centroids = _kmeans_train(train_v, train_s, n_cells, iters, n_blocks_t,
                              seed)
    n_blocks_a = max(1, -(-n // br))
    assign = _assign_topk_cells(vecs, scales, centroids, 1, n_blocks_a)[:, 0]
    return centroids, assign


def pack_permutation(
    assign: np.ndarray, n_cells: int, cell_cap: int,
    spill: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side cell-major packing permutation (a few MB of int arithmetic).

    Args:
        assign: int [N, k] top-k cell assignment per row (column 0 = primary;
            -1 in columns 1.. marks a margin-dropped replica).
        n_cells: C.
        cell_cap: uniform slot budget per cell.
        spill: optional int [N, m] fallback cells (the row's ungated
            2nd..(m+1)-th nearest centroids). A row whose primary cell is
            full is HOMED into its first spill cell with free capacity
            instead of the flat residual (ScaNN-style spilling applied to
            overflow). The residual is scanned on EVERY query, so each row
            kept out of it removes ``D+NUM_COLS*4+8`` bytes from every
            probe dispatch; the cost is that a spilled row is only findable
            through a probed neighbor cell (recall measured at 10M/8192
            cells: unchanged at nprobe >= 8 — overflow comes from dense
            clusters whose 2nd-nearest cell the query probes anyway).

    Returns:
        (src, dest, prio, rest_src): scatter row ``src[i]`` into flat slot
        ``dest[i]`` (= cell * cell_cap + position); ``prio[i]`` is 0 for the
        row's single home placement (primary or spill) and c for a replica
        from assignment column c — each row contributes at most one
        placement per prio level. Rows no spill cell could home land in
        ``rest_src`` (exact residual); replicas that don't fit are dropped
        (the home copy guarantees findability).
    """
    n, assign_k = assign.shape
    prim = assign[:, 0].astype(np.int64)
    order = np.argsort(prim, kind="stable")
    cell_sorted = prim[order]
    counts = np.bincount(cell_sorted, minlength=n_cells)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(n, dtype=np.int64) - starts[cell_sorted]
    fits = pos < cell_cap
    srcs = [order[fits].astype(np.int32)]
    dests = [(cell_sorted[fits] * cell_cap + pos[fits]).astype(np.int32)]
    prios = [np.zeros(int(fits.sum()), np.int32)]
    fill = np.minimum(counts, cell_cap)
    pending = order[~fits]
    home_cell = np.full(n, -1, np.int64)
    home_cell[order[fits]] = cell_sorted[fits]

    def place(rows: np.ndarray, cand: np.ndarray, prio_val: int):
        """Rank-within-cell placement of ``rows`` into remaining capacity of
        their candidate cells; returns the placed subset (rows, cells)."""
        nonlocal fill
        ok = cand >= 0
        rows, cand = rows[ok], cand[ok].astype(np.int64)
        o = np.argsort(cand, kind="stable")
        rows_s, cells_s = rows[o], cand[o]
        c_counts = np.bincount(cells_s, minlength=n_cells)
        c_starts = np.concatenate([[0], np.cumsum(c_counts)[:-1]])
        rank = np.arange(len(rows_s), dtype=np.int64) - c_starts[cells_s]
        free = cell_cap - fill
        fit = rank < free[cells_s]
        placed_rows, placed_cells = rows_s[fit], cells_s[fit]
        srcs.append(placed_rows.astype(np.int32))
        dests.append((placed_cells * cell_cap + fill[placed_cells]
                      + rank[fit]).astype(np.int32))
        prios.append(np.full(len(placed_rows), prio_val, np.int32))
        fill = fill + np.minimum(c_counts, np.maximum(free, 0))
        return placed_rows, placed_cells

    if spill is not None and len(pending):
        for j in range(spill.shape[1]):
            if not len(pending):
                break
            placed_rows, placed_cells = place(
                pending, spill[pending, j].astype(np.int64), 0)
            home_cell[placed_rows] = placed_cells
            pending = pending[home_cell[pending] < 0]

    # Margin replicas into whatever capacity the homes left. A replica into
    # the row's own home cell would duplicate it inside one scan; a replica
    # of a residual row is redundant (the residual is always scanned).
    for c in range(1, assign_k):
        sec = assign[:, c].astype(np.int64)
        rows = np.nonzero((sec >= 0) & (home_cell >= 0)
                          & (sec != home_cell))[0]
        place(rows, sec[rows], c)

    src = np.concatenate(srcs)
    dest = np.concatenate(dests)
    prio = np.concatenate(prios)
    return src, dest, prio, pending.astype(np.int32)


# ---------------------------------------------------------------------------
# probe kernel
# ---------------------------------------------------------------------------

def _probe_kernel(cell_ids_ref, params_ref, inc_ref, exc_ref, excif_ref,
                  q_ref, vecs_ref, cols_ref, out_ref):
    v = vecs_ref[0]          # [tile, D]
    if v.dtype != jnp.float32:
        v = v.astype(jnp.bfloat16)
    q = q_ref[:]
    if q.dtype != v.dtype:
        q = q.astype(v.dtype)
    scores = jax.lax.dot_general(
        q, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                     cols_ref[0])
    out_ref[:] = jnp.where(mask[None, :], scores, NEG_INF)


def _probe_kernel_int8(cell_ids_ref, params_ref, inc_ref, exc_ref, excif_ref,
                       q_ref, vecs_ref, scales_ref, cols_ref, out_ref):
    v = vecs_ref[0].astype(jnp.bfloat16)     # [tile, D]
    q = q_ref[:].astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = scores * scales_ref[0, 0][None, :]  # per-slot dequant
    mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                     cols_ref[0])
    out_ref[:] = jnp.where(mask[None, :], scores, NEG_INF)


@functools.partial(jax.jit, static_argnames=("nprobe",))
def probe_scan_scores(
    q: jax.Array,
    cell_ids: jax.Array,
    vecs3: jax.Array,
    cols3: jax.Array,
    spec: FilterSpec,
    scales3: jax.Array | None = None,
    *,
    nprobe: int,
) -> jax.Array:
    """Masked scores over the probed cells.

    Args:
        q: [B, D] query embeddings.
        cell_ids: int32 [nprobe] cells to scan (scalar-prefetched).
        vecs3: [C, cell_cap, D]; cols3: int32 [C, NUM_COLS, cell_cap].
        scales3: f32 [C, 1, cell_cap] per-slot dequant scales (int8 cells).

    Returns:
        f32 [B, nprobe * cell_cap] scores, slot-major per probed cell.
    """
    B, D = q.shape
    C, cap, _ = vecs3.shape
    tile = pick_tile(cap, 512)
    tiles_per_cell = cap // tile
    is_int8 = vecs3.dtype == jnp.int8
    if is_int8:
        assert scales3 is not None, "int8 IVF cells require scales3"

    if interpret_mode():
        # XLA fallback (CPU tests): gather probed blocks then score.
        v = jnp.take(vecs3, cell_ids, axis=0)          # [nprobe, cap, D]
        c = jnp.take(cols3, cell_ids, axis=0)          # [nprobe, NUM_COLS, cap]
        v2 = v.reshape(nprobe * cap, D).astype(jnp.float32)
        c2 = jnp.transpose(c, (1, 0, 2)).reshape(NUM_COLS, nprobe * cap)
        if is_int8:
            s = jnp.take(scales3[:, 0], cell_ids, axis=0).reshape(
                nprobe * cap)
            v2 = v2 * s[:, None]
        scores = q.astype(jnp.float32) @ v2.T
        mask = eval_mask(spec.params, spec.inc_ids, spec.exc_ids,
                         spec.exc_if_ids, c2)
        return jnp.where(mask[None, :], scores, NEG_INF)

    grid = (nprobe, tiles_per_cell)
    in_specs = [
        pl.BlockSpec((1, 8), lambda i, j, cid: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(spec.inc_ids.shape, lambda i, j, cid: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(spec.exc_ids.shape, lambda i, j, cid: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(spec.exc_if_ids.shape, lambda i, j, cid: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, D), lambda i, j, cid: (0, 0),
                     memory_space=pltpu.VMEM),
        # DMA exactly the probed cell's blocks from HBM:
        pl.BlockSpec((1, tile, D), lambda i, j, cid: (cid[i], j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids, q,
                vecs3]
    kernel = _probe_kernel
    if is_int8:
        # [C, 1, cap] (not [C, cap]): Mosaic requires the block's last two
        # dims be (8k, 128k) or equal to the array dims; (1, 1, tile) against
        # [C, 1, cap] satisfies that where (1, tile) against [C, cap] cannot.
        in_specs.append(pl.BlockSpec((1, 1, tile),
                                     lambda i, j, cid: (cid[i], 0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(scales3)
        kernel = _probe_kernel_int8
    in_specs.append(pl.BlockSpec((1, NUM_COLS, tile),
                                 lambda i, j, cid: (cid[i], 0, j),
                                 memory_space=pltpu.VMEM))
    operands.append(cols3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (B, tile), lambda i, j, cid: (0, i * tiles_per_cell + j),
            memory_space=pltpu.VMEM),
    )
    itemsize = 1 if is_int8 else vecs3.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nprobe * cap), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nprobe * cap * D,
            bytes_accessed=nprobe * cap * (D * itemsize
                                           + NUM_COLS * 4) + B * nprobe * cap * 4,
            transcendentals=0,
        ),
    )(cell_ids, *operands)


# ---------------------------------------------------------------------------
# IVF index object
# ---------------------------------------------------------------------------

@dataclass
class IVFIndex:
    centroids: jax.Array   # [C, D] f32
    vecs3: jax.Array       # [C, cell_cap, D]
    cols3: jax.Array       # [C, NUM_COLS, cell_cap] int32
    gid3: jax.Array        # [C, cell_cap] int32 (-1 = empty slot)
    # Residual flat block for cell-capacity overflow (scanned every query).
    rest_vecs: jax.Array   # [R, D]
    rest_cols: jax.Array   # [NUM_COLS, R]
    rest_gid: jax.Array    # [R] int32
    scales3: jax.Array | None = None   # [C, 1, cell_cap] f32 (int8 cells)
    rest_scales: jax.Array | None = None  # [1, R] f32 (int8 cells)
    assign_k: int = 1

    @property
    def n_cells(self) -> int:
        return self.centroids.shape[0]

    @property
    def cell_cap(self) -> int:
        return self.vecs3.shape[1]

    @classmethod
    def build(
        cls,
        dense: np.ndarray | jax.Array,
        col_rows: np.ndarray | jax.Array,
        gids: np.ndarray | jax.Array,
        n_cells: int,
        *,
        kmeans_iters: int = 25,
        skew_factor: float = 2.0,
        seed: int = 0,
        dtype: str = "bfloat16",
        scales: np.ndarray | jax.Array | None = None,
        assign_k: int = 1,
        assign_margin: float | None = None,
        train_sample: int = 262144,
        spill_levels: int = 2,
    ) -> "IVFIndex":
        """Build from live rows: dense [N, D] unit vectors (f32/bf16, or int8
        with per-row ``scales``), col_rows [N, NUM_COLS], gids [N] global row
        ids into the owning store.

        ``assign_k > 1`` replicates each row into its top-k cells (recall
        lever; memory cost k x). Overflow policy: a row whose PRIMARY cell
        is full is homed into its nearest of ``spill_levels`` fallback cells
        with free capacity (ScaNN-style spilling — the row stays probeable
        through a neighbor cell); only rows ALL fallbacks reject land in the
        exact residual block, which is scanned on every query. Secondary
        replicas that don't fit are simply dropped (the home copy already
        guarantees findability).

        ``assign_margin`` gates the replicas to BOUNDARY rows only: a
        secondary assignment is kept iff its centroid similarity is within
        ``assign_margin`` of the primary's. This targets exactly the rows
        IVF loses — points between clusters whose own cell the query never
        probes (measured nprobe-invariant ~1% recall floor at 2M/8192
        cells) — at a fraction of full-k replication's memory.

        The bulk data never round-trips through the host: k-means and the
        cell packing (gather + scatter into the [C, cell_cap, D] layout) run
        on device. The host only pulls the [N, assign_k] assignment matrix
        and computes the permutation indices (a few MB of int32), which
        matters when the host is small or device transfers ride a remote
        tunnel.
        """
        dense_j = dense if isinstance(dense, jax.Array) else jnp.asarray(dense)
        in_scales = (None if scales is None else
                     (scales if isinstance(scales, jax.Array)
                      else jnp.asarray(scales)).reshape(-1))
        if dense_j.dtype == jnp.int8:
            assert in_scales is not None, "int8 input requires scales [N]"
        n, d = dense_j.shape
        assert n_cells >= 2 and n >= n_cells
        br = _block_rows_for(n_cells)
        ns = min(n, max(train_sample, n_cells * 4))
        if ns < n:
            idx = jax.random.choice(jax.random.PRNGKey(seed ^ 0x5EED), n,
                                    (ns,), replace=False)
            train_v = jnp.take(dense_j, idx, axis=0)
            train_s = (jnp.take(in_scales, idx)
                       if in_scales is not None else None)
        else:
            train_v, train_s = dense_j, in_scales
        centroids = _kmeans_train(train_v, train_s, n_cells, kmeans_iters,
                                  max(1, ns // br), seed)
        n_blocks = max(1, -(-n // br))
        # One assignment pass computes both the (possibly margin-gated)
        # replica columns AND the spill fallbacks.
        k_all = min(max(assign_k, 1 + max(spill_levels, 0)), n_cells)
        need_sims = ((assign_k > 1 and assign_margin is not None)
                     or spill_levels > 0)
        if need_sims:
            assign_all_d, sims_d = _assign_topk_cells(
                dense_j, in_scales, centroids, k_all, n_blocks,
                with_sims=True)
            assign_all = np.array(assign_all_d)        # [N, k_all] host
            sims = np.asarray(sims_d)
        else:
            assign_all = np.asarray(_assign_topk_cells(
                dense_j, in_scales, centroids, k_all, n_blocks))
            sims = None
        assign = np.ascontiguousarray(assign_all[:, :assign_k])
        if assign_k > 1 and assign_margin is not None:
            # Secondary replicas only for boundary rows; -1 = dropped.
            gate = sims[:, 1:assign_k] >= (sims[:, :1] - assign_margin)
            assign[:, 1:] = np.where(gate, assign[:, 1:], -1)
            n_replicas = int(gate.sum())
        else:
            n_replicas = n * (assign_k - 1)
        # Spill fallbacks are margin-gated like replicas, and for the same
        # reason: a BOUNDARY row's 2nd cell is one the row's own queries
        # probe, so homing it there loses nothing, while spilling an
        # INTERIOR row of a dense cluster strands it in a cell far down the
        # query's probe order (measured at 2M x 768 / 2048 cells, zipf skew:
        # ungated spill dropped recall@10 1.000 -> 0.927 at np=8; the exact
        # residual, scanned every query, is the right home for those).
        spill = None
        if spill_levels > 0 and k_all > 1:
            spill_margin = assign_margin if assign_margin is not None else 0.05
            spill = np.ascontiguousarray(assign_all[:, 1:1 + spill_levels])
            sgate = (sims[:, 1:1 + spill_levels]
                     >= (sims[:, :1] - spill_margin))
            spill = np.where(sgate, spill, -1)

        total = n + n_replicas
        cap0 = max(int(skew_factor * total / n_cells), 128)
        # Keep cell_cap a multiple of 512 once it's large enough: the probe
        # kernel tiles each cell in pick_tile(cap, 512)-row blocks, and the
        # measured marginal probe bandwidth at tile=128 is ~1.7x worse than
        # at tile=512 (98 KB vs 393 KB DMAs at 768-d int8). Nearest multiple
        # rather than round-up so memory moves by at most 256 slots/cell;
        # spilling absorbs the extra overflow a round-down causes.
        if cap0 >= 448:
            cell_cap = max(512, ((cap0 + 256) // 512) * 512)
        else:
            cell_cap = round_up(cap0, 128)

        # Packing permutation on host (int arithmetic on the [N, k]
        # assignment): primaries ranked within their cell, overflow homed
        # into spill cells with free capacity, margin replicas into the
        # remaining slots, the doubly-unlucky into the residual.
        src, dest, _, rest_src = pack_permutation(assign, n_cells, cell_cap,
                                                  spill=spill)
        r = round_up(max(len(rest_src), 1), 128)

        store_int8 = dtype == "int8"
        store_dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                    "int8": jnp.int8}[dtype]
        cols_j = (col_rows if isinstance(col_rows, jax.Array)
                  else jnp.asarray(col_rows)).astype(jnp.int32)
        gids_j = (gids if isinstance(gids, jax.Array)
                  else jnp.asarray(gids)).astype(jnp.int32)
        src_j, dest_j = jnp.asarray(src), jnp.asarray(dest)

        src_vecs = jnp.take(dense_j, src_j, axis=0)
        src_scales = None
        if store_int8:
            if dense_j.dtype == jnp.int8:
                src_scales = jnp.take(in_scales, src_j)
            else:  # quantize on the fly
                sv = src_vecs.astype(jnp.float32)
                src_scales = jnp.clip(jnp.max(jnp.abs(sv), axis=1), 1e-12,
                                      None) / 127.0
                src_vecs = jnp.clip(jnp.round(sv / src_scales[:, None]),
                                    -127, 127).astype(jnp.int8)
        elif dense_j.dtype == jnp.int8:
            src_vecs = (src_vecs.astype(jnp.float32)
                        * jnp.take(in_scales, src_j)[:, None])

        vecs3 = (jnp.zeros((n_cells * cell_cap, d), store_dt)
                 .at[dest_j].set(src_vecs.astype(store_dt))
                 .reshape(n_cells, cell_cap, d))
        scales3 = None
        if store_int8:
            scales3 = (jnp.zeros((n_cells * cell_cap,), jnp.float32)
                       .at[dest_j].set(src_scales)
                       .reshape(n_cells, 1, cell_cap))
        cols3 = (jnp.zeros((n_cells * cell_cap, NUM_COLS), jnp.int32)
                 .at[dest_j].set(jnp.take(cols_j, src_j, axis=0))
                 .reshape(n_cells, cell_cap, NUM_COLS)
                 .transpose(0, 2, 1))
        gid3 = (jnp.full((n_cells * cell_cap,), -1, jnp.int32)
                .at[dest_j].set(jnp.take(gids_j, src_j))
                .reshape(n_cells, cell_cap))

        # The residual is scanned on EVERY query, so it stays in the same
        # storage dtype as the cells — a bf16 residual would double its
        # share of the probe path's HBM traffic for int8 indexes.
        rest_vecs = jnp.zeros((r, d), store_dt)
        rest_scales_arr = (jnp.zeros((1, r), jnp.float32)
                           if store_int8 else None)
        rest_cols = jnp.zeros((r, NUM_COLS), jnp.int32)
        rest_gid = jnp.full((r,), -1, jnp.int32)
        if len(rest_src):
            rs = jnp.asarray(rest_src)
            k = len(rest_src)
            rv = jnp.take(dense_j, rs, axis=0)
            if store_int8:
                if dense_j.dtype == jnp.int8:
                    rsc = jnp.take(in_scales, rs)
                else:
                    rvf = rv.astype(jnp.float32)
                    rsc = jnp.clip(jnp.max(jnp.abs(rvf), axis=1), 1e-12,
                                   None) / 127.0
                    rv = jnp.clip(jnp.round(rvf / rsc[:, None]),
                                  -127, 127).astype(jnp.int8)
                rest_scales_arr = rest_scales_arr.at[0, :k].set(rsc)
            elif dense_j.dtype == jnp.int8:
                rv = rv.astype(jnp.float32) * jnp.take(in_scales, rs)[:, None]
            rest_vecs = rest_vecs.at[:k].set(rv.astype(store_dt))
            rest_cols = rest_cols.at[:k].set(jnp.take(cols_j, rs, axis=0))
            rest_gid = rest_gid.at[:k].set(jnp.take(gids_j, rs))

        return cls(
            centroids=centroids,
            vecs3=vecs3,
            cols3=cols3,
            gid3=gid3,
            rest_vecs=rest_vecs,
            rest_cols=rest_cols.T,
            rest_gid=rest_gid,
            scales3=scales3,
            rest_scales=rest_scales_arr,
            assign_k=assign_k,
        )

    def search_scores(
        self, q: jax.Array, spec: FilterSpec, *, nprobe: int
    ) -> tuple[jax.Array, jax.Array]:
        """Masked scores + gids over probed cells and the residual block.

        Returns (scores [B, nprobe*cell_cap + R], gids [same]) — feed into
        masked_topk / fusion. Empty slots carry gid -1 and -inf score. With
        ``assign_k > 1`` a gid may appear more than once (replicas with equal
        scores); use :meth:`search_candidates` for a deduplicated top list.
        """
        return _ivf_search_scores(
            q, self.centroids, self.vecs3, self.cols3, self.gid3,
            self.rest_vecs, self.rest_cols, self.rest_gid, self.scales3,
            self.rest_scales, spec, nprobe=min(nprobe, self.n_cells))

    def search_candidates(
        self, q: jax.Array, spec: FilterSpec, *, nprobe: int, limit: int,
        select: str = "exact",
    ) -> tuple[jax.Array, jax.Array]:
        """Deduplicated top-``limit`` candidates (vals [B, limit], gids).

        One jitted program (probe + top-k + dedup): each extra dispatch
        costs milliseconds through a remote-TPU tunnel, and even locally
        splitting hides the scores from XLA's scheduler.

        ``select``: "exact" (default) or "approx" — see
        _ivf_search_candidates for the measured trade.
        """
        return _ivf_search_candidates(
            q, self.centroids, self.vecs3, self.cols3, self.gid3,
            self.rest_vecs, self.rest_cols, self.rest_gid, self.scales3,
            self.rest_scales, spec, nprobe=min(nprobe, self.n_cells),
            limit=limit, assign_k=self.assign_k, select=select)


@functools.partial(jax.jit,
                   static_argnames=("nprobe", "limit", "assign_k", "select"))
def _ivf_search_candidates(q, centroids, vecs3, cols3, gid3, rest_vecs,
                           rest_cols, rest_gid, scales3, rest_scales,
                           spec: FilterSpec,
                           *, nprobe: int, limit: int, assign_k: int,
                           select: str = "exact"):
    from voitta_rag_tpu.ops.topk import dedup_candidates, masked_topk

    scores, gids = _ivf_search_scores(
        q, centroids, vecs3, cols3, gid3, rest_vecs, rest_cols, rest_gid,
        scales3, rest_scales, spec, nprobe=nprobe)
    # Over-fetch to survive dedup dropping replicas.
    k = min(limit * max(assign_k, 1) + (8 if assign_k > 1 else 0),
            scores.shape[-1])
    # Selection policy (VOITTA_IVF_SELECT), measured on v5e at 1M x 384
    # int8, np16, b32, assign_k=2: exact top_k gives recall@10 1.000
    # (score-aware 1.000) at 3.17 ms/batch; approx_max_k gives 0.981
    # (score-aware 0.991) at 1.55 ms — 2x the QPS for ~1% real recall.
    # Over-fetching the approx pass (2x/4x) and recall_target=0.99 recover
    # NONE of the gap (all land on 0.9813 exactly), so there is no
    # intermediate point — it's a binary exact/approx trade. Default is
    # exact: recall is the product headline, and at 10M shapes the probe
    # scan dominates anyway.
    vals, pos = masked_topk(scores, k, approx=(select == "approx"))
    cand_gids = jnp.where(pos >= 0,
                          jnp.take_along_axis(
                              gids, jnp.maximum(pos, 0), axis=1), -1)
    if assign_k > 1:
        vals, cand_gids = dedup_candidates(vals, cand_gids)
    return vals[:, :limit], cand_gids[:, :limit]


@functools.partial(jax.jit, static_argnames=("nprobe",))
def _ivf_search_scores(q, centroids, vecs3, cols3, gid3, rest_vecs, rest_cols,
                       rest_gid, scales3, rest_scales, spec: FilterSpec,
                       *, nprobe: int):
    from voitta_rag_tpu.ops.dense_scan import dense_scan_scores

    B = q.shape[0]
    C, cap, _ = vecs3.shape
    # Cell selection from the (replicated, small) centroid table.
    cell_sims = q.astype(jnp.float32) @ centroids.T           # [B, C]
    _, cells = jax.lax.top_k(cell_sims, nprobe)               # [B, nprobe]

    # Batch-dedup the probed cells: each unique cell's block is DMA'd and
    # scored ONCE for the whole query batch (a per-query loop re-reads hot
    # cells B times — B * nprobe * cap rows of HBM traffic instead of
    # U * cap). U is the static cap on distinct cells; overflow slots repeat
    # a sentinel and are masked out per query below.
    U = min(B * nprobe, C)
    flat = jnp.sort(cells.reshape(-1))                        # [B * nprobe]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    slot = jnp.where(first, jnp.cumsum(first) - 1, U)         # dests; dup -> U
    ucells = (jnp.full((U + 1,), C, jnp.int32)
              .at[slot].set(flat.astype(jnp.int32), mode="drop")[:U])
    # Unfilled slots (when < U distinct cells) scan cell 0 but are masked
    # out entirely — otherwise a pad slot would duplicate a genuinely
    # probed cell 0 and top-k could return duplicate rows.
    pad = ucells == C
    ucells = jnp.where(pad, 0, ucells)

    scores = probe_scan_scores(q, ucells, vecs3, cols3, spec, scales3,
                               nprobe=U)                      # [B, U*cap]
    ugids = jnp.take(gid3, ucells, axis=0)                    # [U, cap]
    # member[b, u]: did query b probe unique cell u? (pad slots never count)
    member = jnp.any(
        ucells[None, :, None] == cells[:, None, :], axis=-1) & ~pad[None, :]
    valid = member[:, :, None] & (ugids[None, :, :] >= 0)     # [B, U, cap]
    probe_scores = jnp.where(valid.reshape(B, -1), scores, NEG_INF)
    probe_gids = jnp.broadcast_to(ugids.reshape(-1)[None, :],
                                  probe_scores.shape)

    rest_scores = dense_scan_scores(q, rest_vecs, rest_cols, spec,
                                    rest_scales)  # [B, R]
    rest_scores = jnp.where(rest_gid[None, :] >= 0, rest_scores, NEG_INF)
    rest_gids = jnp.broadcast_to(rest_gid[None, :], rest_scores.shape)

    scores = jnp.concatenate([probe_scores, rest_scores], axis=1)
    gids = jnp.concatenate([probe_gids, rest_gids], axis=1)
    return scores, gids
