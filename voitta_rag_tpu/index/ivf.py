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

@functools.partial(jax.jit, static_argnames=("n_cells", "iters"))
def spherical_kmeans(
    vecs: jax.Array, n_cells: int, iters: int = 10, seed: int = 0
) -> tuple[jax.Array, jax.Array]:
    """K-means on unit vectors; returns (centroids [C, D], assign [N])."""
    n, d = vecs.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_cells,), replace=False)
    centroids = vecs[init_idx].astype(jnp.float32)

    def step(_, centroids):
        sims = vecs.astype(jnp.float32) @ centroids.T          # [N, C]
        assign = jnp.argmax(sims, axis=1)
        # segment_sum instead of a one-hot matmul: avoids the [N, C] f32
        # one-hot (4 GB at 1M x 1024) — sort+segment reduction instead.
        sums = jax.ops.segment_sum(vecs.astype(jnp.float32), assign,
                                   num_segments=n_cells)       # [C, D]
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), assign,
                                     num_segments=n_cells)[:, None]
        new = jnp.where(counts > 0, sums / jnp.clip(counts, 1.0, None),
                        centroids)
        norms = jnp.linalg.norm(new, axis=1, keepdims=True)
        return new / jnp.clip(norms, 1e-12, None)

    centroids = jax.lax.fori_loop(0, iters, step, centroids)
    assign = jnp.argmax(vecs.astype(jnp.float32) @ centroids.T, axis=1)
    return centroids, assign


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


@functools.partial(jax.jit, static_argnames=("nprobe",))
def probe_scan_scores(
    q: jax.Array,
    cell_ids: jax.Array,
    vecs3: jax.Array,
    cols3: jax.Array,
    spec: FilterSpec,
    *,
    nprobe: int,
) -> jax.Array:
    """Masked scores over the probed cells.

    Args:
        q: [B, D] query embeddings.
        cell_ids: int32 [nprobe] cells to scan (scalar-prefetched).
        vecs3: [C, cell_cap, D]; cols3: int32 [C, NUM_COLS, cell_cap].

    Returns:
        f32 [B, nprobe * cell_cap] scores, slot-major per probed cell.
    """
    B, D = q.shape
    C, cap, _ = vecs3.shape
    tile = pick_tile(cap, 512)
    tiles_per_cell = cap // tile

    if interpret_mode():
        # XLA fallback (CPU tests): gather probed blocks then score.
        v = jnp.take(vecs3, cell_ids, axis=0)          # [nprobe, cap, D]
        c = jnp.take(cols3, cell_ids, axis=0)          # [nprobe, NUM_COLS, cap]
        v2 = v.reshape(nprobe * cap, D)
        c2 = jnp.transpose(c, (1, 0, 2)).reshape(NUM_COLS, nprobe * cap)
        vf = v2.astype(jnp.float32)
        if vecs3.dtype == jnp.int8:
            vf = vf  # int8 IVF uses pre-scaled vectors; see build()
        scores = q.astype(jnp.float32) @ vf.T
        mask = eval_mask(spec.params, spec.inc_ids, spec.exc_ids,
                         spec.exc_if_ids, c2)
        return jnp.where(mask[None, :], scores, NEG_INF)

    grid = (nprobe, tiles_per_cell)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
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
            pl.BlockSpec((1, NUM_COLS, tile), lambda i, j, cid: (cid[i], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, tile), lambda i, j, cid: (0, i * tiles_per_cell + j),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _probe_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nprobe * cap), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nprobe * cap * D,
            bytes_accessed=nprobe * cap * (D * vecs3.dtype.itemsize
                                           + NUM_COLS * 4) + B * nprobe * cap * 4,
            transcendentals=0,
        ),
    )(cell_ids, spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids,
      q, vecs3, cols3)


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
        kmeans_iters: int = 10,
        skew_factor: float = 2.0,
        seed: int = 0,
        dtype: str = "bfloat16",
    ) -> "IVFIndex":
        """Build from live rows: dense [N, D] unit vectors, col_rows
        [N, NUM_COLS], gids [N] global row ids into the owning store.

        The bulk data never round-trips through the host: k-means and the
        cell packing (gather + scatter into the [C, cell_cap, D] layout) run
        on device. The host only pulls the [N] assignment vector and computes
        the permutation indices (a few MB of int32), which matters when the
        host is small or device transfers ride a remote tunnel.
        """
        dense_j = dense if isinstance(dense, jax.Array) else jnp.asarray(dense)
        n, d = dense_j.shape
        assert n_cells >= 2 and n >= n_cells
        centroids, assign = spherical_kmeans(dense_j, n_cells,
                                             iters=kmeans_iters, seed=seed)
        assign = np.asarray(assign)

        cell_cap = round_up(max(int(skew_factor * n / n_cells), 128), 128)

        # Packing permutation on host (int arithmetic on the [N] assignment):
        # stable sort by cell, rank within cell, overflow to the residual.
        order = np.argsort(assign, kind="stable")
        cell_sorted = assign[order]
        counts = np.bincount(assign, minlength=n_cells)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos_in_cell = np.arange(n) - starts[cell_sorted]
        fits = pos_in_cell < cell_cap
        src = order[fits].astype(np.int32)
        dest = (cell_sorted[fits] * cell_cap + pos_in_cell[fits]).astype(np.int32)
        rest_src = order[~fits].astype(np.int32)
        r = round_up(max(len(rest_src), 1), 128)

        store_dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]
        cols_j = (col_rows if isinstance(col_rows, jax.Array)
                  else jnp.asarray(col_rows)).astype(jnp.int32)
        gids_j = (gids if isinstance(gids, jax.Array)
                  else jnp.asarray(gids)).astype(jnp.int32)
        src_j, dest_j = jnp.asarray(src), jnp.asarray(dest)

        vecs3 = (jnp.zeros((n_cells * cell_cap, d), store_dt)
                 .at[dest_j].set(jnp.take(dense_j, src_j, axis=0)
                                 .astype(store_dt))
                 .reshape(n_cells, cell_cap, d))
        cols3 = (jnp.zeros((n_cells * cell_cap, NUM_COLS), jnp.int32)
                 .at[dest_j].set(jnp.take(cols_j, src_j, axis=0))
                 .reshape(n_cells, cell_cap, NUM_COLS)
                 .transpose(0, 2, 1))
        gid3 = (jnp.full((n_cells * cell_cap,), -1, jnp.int32)
                .at[dest_j].set(jnp.take(gids_j, src_j))
                .reshape(n_cells, cell_cap))

        rest_vecs = jnp.zeros((r, d), store_dt)
        rest_cols = jnp.zeros((r, NUM_COLS), jnp.int32)
        rest_gid = jnp.full((r,), -1, jnp.int32)
        if len(rest_src):
            rs = jnp.asarray(rest_src)
            k = len(rest_src)
            rest_vecs = rest_vecs.at[:k].set(
                jnp.take(dense_j, rs, axis=0).astype(store_dt))
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
        )

    def search_scores(
        self, q: jax.Array, spec: FilterSpec, *, nprobe: int
    ) -> tuple[jax.Array, jax.Array]:
        """Masked scores + gids over probed cells and the residual block.

        Returns (scores [B, nprobe*cell_cap + R], gids [same]) — feed into
        masked_topk / fusion. Empty slots carry gid -1 and -inf score.
        """
        return _ivf_search_scores(
            q, self.centroids, self.vecs3, self.cols3, self.gid3,
            self.rest_vecs, self.rest_cols, self.rest_gid, spec,
            nprobe=min(nprobe, self.n_cells))


@functools.partial(jax.jit, static_argnames=("nprobe",))
def _ivf_search_scores(q, centroids, vecs3, cols3, gid3, rest_vecs, rest_cols,
                       rest_gid, spec: FilterSpec, *, nprobe: int):
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

    scores = probe_scan_scores(q, ucells, vecs3, cols3, spec,
                               nprobe=U)                      # [B, U*cap]
    ugids = jnp.take(gid3, ucells, axis=0)                    # [U, cap]
    # member[b, u]: did query b probe unique cell u? (pad slots never count)
    member = jnp.any(
        ucells[None, :, None] == cells[:, None, :], axis=-1) & ~pad[None, :]
    valid = member[:, :, None] & (ugids[None, :, :] >= 0)     # [B, U, cap]
    probe_scores = jnp.where(valid.reshape(B, -1), scores, NEG_INF)
    probe_gids = jnp.broadcast_to(ugids.reshape(-1)[None, :],
                                  probe_scores.shape)

    rest_scores = dense_scan_scores(q, rest_vecs, rest_cols, spec)  # [B, R]
    rest_scores = jnp.where(rest_gid[None, :] >= 0, rest_scores, NEG_INF)
    rest_gids = jnp.broadcast_to(rest_gid[None, :], rest_scores.shape)

    scores = jnp.concatenate([probe_scores, rest_scores], axis=1)
    gids = jnp.concatenate([probe_gids, rest_gids], axis=1)
    return scores, gids
