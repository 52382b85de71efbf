"""Fused scan → in-kernel candidate selection (group-winner reduction).

The flat hybrid path's hidden cost is not the vector read but the score
write-back: a ``[B, N]`` f32 score array at 1M rows is 128 MB per side, and
the fusion stage re-reads both sides — at b32 that is ~400 MB of pure HBM
traffic for scores that are 99.99% discarded (only ``limit * prefetch`` rows
per query survive). On a bandwidth-bound chip this rivals the bf16 vector
read itself and explains why int8 storage barely moved the headline.

This module fuses candidate selection INTO the scan: each group of ``G``
consecutive rows emits one winner ``(max score, argmax row)``, shrinking the
write from ``B*N*4`` bytes to ``B*(N/G)*8`` — 64x smaller at G=128. The
group-winner lists then feed the existing candidate fusion
(:func:`voitta_rag_tpu.ops.fusion.hybrid_fuse_candidates`), which re-cuts to
the exact top-p of the winners.

Recall semantics match ``jax.lax.approx_max_k`` (which the full-score path
already uses above 64k rows): two top-p rows colliding in one group lose the
weaker one. With G=128, N=1M and p=30 the expected per-query loss is ~6% of
the *30th* candidate — far below the min-max fusion's noise floor; bench.py
measures top-10 agreement vs the exact oracle to keep this honest.

The Pallas kernel exists because XLA cannot fuse a reduction epilogue into a
dot: the ``[B, T]`` tile scores would round-trip through HBM between the
matmul and the reduce. In-kernel, they never leave VMEM.

**Measured result (v5e, 1M x 384 bf16, b32, remote tunnel)**: the full-score
XLA path wins — 3.6 ms/b32 queued (3.0 ms device) vs 5.2 ms (4.8 ms device)
for this kernel and 4.7 ms for the XLA grouped variant. Three findings
explain it: (1) ~1.4 ms of the queued time is per-dispatch tunnel overhead,
shrinking every kernel-side difference; (2) Mosaic's B=32 matmul is ~1.5x
slower than XLA's for this tall-skinny shape (the padded 32-row MXU pass),
costing more than the saved score write-back; (3) XLA fuses the
approx_max_k consumer well enough that the [B, N] arrays cost less than the
back-of-envelope 2 passes. Top-10 agreement of the select path vs the full
path measured 0.994. The module therefore defaults OFF
(VOITTA_FLAT_SELECT_GROUP=0) and is kept as a correct, tested alternative
for shapes where the trade flips (larger B amortizing the matmul, locally
attached chips with no dispatch overhead, narrower D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voitta_rag_tpu.ops.filters import FilterSpec, eval_mask
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, interpret_mode, pick_tile

TILE_N = 2048  # rows per grid step (see dense_scan.TILE_N)


def group_compatible(n_rows: int, group: int, use_pallas: bool) -> bool:
    """Whether ``dense_scan_select`` accepts this (segment size, group).

    Callers (search service) use this to fall back to the full-score path
    instead of crashing on configs the kernel cannot tile: the group must
    divide the tile, and the Pallas path additionally needs a lane-aligned
    (multiple-of-128) output block unless the segment is a single tile.
    """
    if group <= 0:
        return False
    tile = pick_tile(n_rows, TILE_N)
    if tile % group:
        return False
    if use_pallas and n_rows != tile and (tile // group) % 128:
        return False
    return True


def _select_groups(scores: jax.Array, group: int, row_base: jax.Array):
    """Per-group (max, argmax-row) of ``scores [B, T]`` → ([B, T/G], [B, T/G]).

    Groups are STRIDED within the tile: winner slot ``w`` covers rows
    ``{w + k * (T/G) : k < G}``. That makes the reduction a single
    sublane-axis ``max`` over the natural ``[B, G, T/G]`` vreg split —
    ``T/G = 128`` lanes stay the minor dimension, no relayout, one pass.
    (A contiguous-group formulation needs either a lane-splitting reshape or
    T/G narrow reduces; both measured 3-6x slower than the whole scan.)
    ``row_base`` is the global row index of tile column 0 (traced scalar).
    """
    B, T = scores.shape
    W = T // group                       # winners per tile (lane width)
    g3 = scores.reshape(B, group, W)
    vals = jnp.max(g3, axis=1)           # [B, W]
    kk = jax.lax.broadcasted_iota(jnp.int32, g3.shape, 1)
    # First max wins (== argmax tie-break of the XLA oracle).
    k_win = jnp.min(jnp.where(g3 == vals[:, None, :], kk, group), axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    rows = row_base + k_win * W + lane
    return vals, rows.astype(jnp.int32)


def _make_select_kernel(group: int, has_scales: bool):
    def kernel(params_ref, inc_ref, exc_ref, excif_ref, q_ref, vecs_ref,
               *rest):
        if has_scales:
            scales_ref, cols_ref, vals_ref, idx_ref = rest
        else:
            cols_ref, vals_ref, idx_ref = rest
            scales_ref = None
        v = vecs_ref[:]
        if v.dtype not in (jnp.float32, jnp.bfloat16):
            v = v.astype(jnp.bfloat16)
        q = q_ref[:]
        if q.dtype != v.dtype:
            q = q.astype(v.dtype)
        scores = jax.lax.dot_general(
            q, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if scales_ref is not None:
            scores = scores * scales_ref[:]
        mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                         cols_ref[:])
        scores = jnp.where(mask[None, :], scores, NEG_INF)
        tile = v.shape[0]
        row_base = pl.program_id(0) * tile
        vals, idxs = _select_groups(scores, group, row_base)
        vals_ref[:] = vals
        idx_ref[:] = idxs

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("group", "use_pallas", "row_offset"))
def dense_scan_select(
    q: jax.Array,
    vecs: jax.Array,
    cols: jax.Array,
    spec: FilterSpec,
    scales: jax.Array | None = None,
    *,
    group: int = 16,
    row_offset: int = 0,
    use_pallas: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Masked cosine scan with fused group-winner selection.

    Args:
        q: query embeddings, unit-normalized, [B, D].
        vecs: segment vectors [N, D] (bf16/f32/int8); N % TILE == 0.
        cols: int32 [NUM_COLS, N] filter columns.
        spec: FilterSpec operands.
        scales: [1, N] f32 dequant scales (int8 segments).
        group: rows per winner group; must divide the tile (2048), and
            tile/group must be lane-aligned (multiple of 128) for the
            Pallas path unless the segment is a single tile — group <= 16
            at the default tile.
        row_offset: added to every returned row index (multi-segment concat
            position = payload gid).

    Returns:
        (vals [B, N/group] f32, rows [B, N/group] int32). Fully-masked
        groups return -inf / their argmax slot; downstream VALID_THRESHOLD
        filtering drops them.
    """
    B, D = q.shape
    N = vecs.shape[0]
    tile = pick_tile(N, TILE_N)
    assert tile % group == 0, (tile, group)
    M = N // group
    if use_pallas and N != tile:
        # Pallas TPU: last output-block dim must be a multiple of 128.
        assert (tile // group) % 128 == 0, (
            f"group={group} with tile={tile} gives a {tile // group}-wide "
            "output block; use group <= tile/128")

    if not use_pallas:
        from voitta_rag_tpu.ops.dense_scan import _xla_scan_scores

        scores = _xla_scan_scores(q, vecs, cols, spec, scales)
        # Same strided-within-tile partition as the kernel (see
        # _select_groups): winner (t, w) covers rows {t*tile + k*W + w}.
        W = tile // group
        nt = N // tile
        g4 = scores.reshape(B, nt, group, W)
        vals = g4.max(axis=2).reshape(B, M)
        k_win = jnp.argmax(g4, axis=2).astype(jnp.int32)  # first max wins
        rows = (jnp.arange(nt, dtype=jnp.int32)[None, :, None] * tile
                + k_win * W
                + jnp.arange(W, dtype=jnp.int32)[None, None, :])
        return vals, rows.reshape(B, M) + row_offset

    grid = (N // tile,)
    filt_specs = [
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(spec.inc_ids.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(spec.exc_ids.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(spec.exc_if_ids.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    q_spec = pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((tile, D), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    cols_spec = pl.BlockSpec((cols.shape[0], tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((B, tile // group), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, tile // group), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, M), jnp.float32),
        jax.ShapeDtypeStruct((B, M), jnp.int32),
    ]
    bytes_per_el = 1 if vecs.dtype == jnp.int8 else vecs.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * B * N * D,
        bytes_accessed=N * D * bytes_per_el + N * cols.shape[0] * 4
        + B * M * 8,
        transcendentals=0,
    )
    has_scales = vecs.dtype == jnp.int8
    if has_scales:
        assert scales is not None, "int8 segment requires per-row scales"
        scale_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        vals, rows = pl.pallas_call(
            _make_select_kernel(group, True),
            grid=grid,
            in_specs=filt_specs + [q_spec, vec_spec, scale_spec, cols_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret_mode(),
        )(spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids, q, vecs,
          scales, cols)
    else:
        vals, rows = pl.pallas_call(
            _make_select_kernel(group, False),
            grid=grid,
            in_specs=filt_specs + [q_spec, vec_spec, cols_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret_mode(),
        )(spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids, q, vecs,
          cols)
    if row_offset:
        rows = rows + row_offset
    return vals, rows
