"""Dense masked-scoring scan: the MXU heart of the query path.

Replaces the reference's Qdrant dense HNSW query
(services/vector_store.py:560-619). Vectors are stored unit-normalized so
cosine similarity is a plain dot product; a query batch ``q [B, D]`` is scored
against a device-resident segment ``vecs [N, D]`` as one tiled matmul on the
MXU, with the filter mask (folder / index-folder / time-range / tombstone,
:mod:`voitta_rag_tpu.ops.filters`) evaluated on the VPU *inside the same
kernel* — masked rows get ``-inf`` before scores ever reach HBM.

Storage dtypes: bf16 (default), f32, or int8 with a per-row scale (halves HBM
traffic — the scan is bandwidth-bound, so int8 is ~2x faster at <1% recall
cost; compute stays bf16/f32 on the MXU).

Measured negative result (v5e, 2M x 768, B=32): quantizing the *query* to
int8 as well and running the matmul int8 x int8 -> int32 (2x the MXU's bf16
rate) changes nothing — 3.37 vs 3.39 ms, both at ~455 GB/s of int8 reads.
The scan is DMA-bound at this batch size, not MXU-bound, and int8 queries
cost 1.2% top-10 agreement vs exact dequant. bf16 compute (int8 values are
exact in bf16) stays the right operating point; do not "optimize" this into
an int8-compute path without re-measuring at much larger B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voitta_rag_tpu.ops.filters import FilterSpec, eval_mask
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, interpret_mode, pick_tile

# Rows per grid step. 2048 rows x 768 dims x 2B = 3 MB of VMEM for the vector
# tile — still double-bufferable within the ~16 MB budget, and measurably
# closer to peak HBM bandwidth than smaller tiles (fewer grid steps).
TILE_N = 2048


def _scan_kernel(params_ref, inc_ref, exc_ref, excif_ref, q_ref, vecs_ref,
                 cols_ref, out_ref):
    v = vecs_ref[:]
    if v.dtype != jnp.float32:
        v = v.astype(jnp.bfloat16)
    q = q_ref[:]
    if q.dtype != v.dtype:
        q = q.astype(v.dtype)
    # [B, T] = [B, D] @ [T, D]^T on the MXU.
    scores = jax.lax.dot_general(
        q, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # params_ref lives in SMEM: eval_mask indexes it scalar-by-scalar.
    mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                     cols_ref[:])
    out_ref[:] = jnp.where(mask[None, :], scores, NEG_INF)


def _scan_kernel_int8(params_ref, inc_ref, exc_ref, excif_ref, q_ref, vecs_ref,
                      scales_ref, cols_ref, out_ref):
    v = vecs_ref[:].astype(jnp.bfloat16)
    q = q_ref[:].astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scales_ref[:]  # [1, T] per-row dequant scale
    mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                     cols_ref[:])
    out_ref[:] = jnp.where(mask[None, :], scores, NEG_INF)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def dense_scan_scores(
    q: jax.Array,
    vecs: jax.Array,
    cols: jax.Array,
    spec: FilterSpec,
    scales: jax.Array | None = None,
    *,
    use_pallas: bool = False,
) -> jax.Array:
    """Masked cosine scores of ``q [B, D]`` against ``vecs [N, D]``.

    Args:
        q: query embeddings, unit-normalized, [B, D] f32/bf16.
        vecs: segment vectors, unit-normalized, [N, D]; N % TILE_N == 0
            (segments are padded with tombstoned rows).
        cols: int32 [NUM_COLS, N] filter columns (see ops.filters).
        spec: FilterSpec query filter operands.
        scales: per-row dequantization scales [1, N] f32 (int8 segments only).

    Returns:
        f32 [B, N] scores; masked rows = -inf.

    Default path is XLA's fused matmul + mask: measured 2.7 ms vs the
    Pallas kernel's 3.6 ms per b32 dispatch at 1M x 384 bf16 (the scan is
    memory-bound; XLA's fusion/pipelining wins at this shape and "let the
    compiler fuse" is the rule). The Pallas kernel remains for parity
    testing and as the template for the IVF probe, whose scalar-prefetch
    cell DMA is NOT expressible in XLA and earns its keep there.
    """
    B, D = q.shape
    N = vecs.shape[0]
    tile = pick_tile(N, TILE_N)
    assert cols.shape[1] == N

    if not use_pallas:
        return _xla_scan_scores(q, vecs, cols, spec, scales)

    grid = (N // tile,)
    filt_specs = [
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(spec.inc_ids.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(spec.exc_ids.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(spec.exc_if_ids.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    q_spec = pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cols_spec = pl.BlockSpec((cols.shape[0], tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((B, tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    bytes_per_el = 1 if vecs.dtype == jnp.int8 else vecs.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * B * N * D,
        bytes_accessed=N * D * bytes_per_el + N * cols.shape[0] * 4 + B * N * 4,
        transcendentals=0,
    )

    if vecs.dtype == jnp.int8:
        assert scales is not None, "int8 segment requires per-row scales"
        scale_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _scan_kernel_int8,
            grid=grid,
            in_specs=filt_specs + [q_spec, vec_spec, scale_spec, cols_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            cost_estimate=cost,
            interpret=interpret_mode(),
        )(spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids, q, vecs,
          scales, cols)

    return pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=filt_specs + [q_spec, vec_spec, cols_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=cost,
        interpret=interpret_mode(),
    )(spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids, q, vecs, cols)


def _xla_scan_scores(q, vecs, cols, spec: FilterSpec, scales) -> jax.Array:
    """Pure-XLA path with the Pallas kernels' compute semantics.

    bf16/int8 storage computes in bf16 on the MXU with f32 accumulation —
    f32 compute runs at 1/4 the MXU rate and turns the 10M x 768 scan from
    memory-bound (~9 ms/batch-32 at roofline) into compute-bound (~10 ms of
    pure matmul); int8 values are exact in bf16, and the per-row dequant
    scale is applied to the f32 scores (identical to _scan_kernel_int8).
    f32 storage keeps full f32 compute.
    """
    v = vecs
    if v.dtype == jnp.int8:
        scores = jax.lax.dot_general(
            q.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scales
    elif v.dtype == jnp.bfloat16:
        scores = jax.lax.dot_general(
            q.astype(jnp.bfloat16), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        scores = jnp.einsum(
            "bd,nd->bn", q.astype(jnp.float32), v.astype(jnp.float32)
        )
    mask = eval_mask(spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids,
                     cols)
    return jnp.where(mask[None, :], scores, NEG_INF)
