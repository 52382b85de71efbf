"""Binary (sign-bit) quantization: 1-bit coarse tier for the dense scan.

The reference's Qdrant engine offers binary quantization with exact rescore
("oversampling") for >=768-d embeddings; this is the TPU-native analogue.
Each row stores one sign bit per dimension plus a per-row f32 scale, and the
coarse score is the *asymmetric* estimate (query stays full-precision):

    score_i ~= s_i * (q . sign(v_i))  =  s_i * (2 * sum_{d: bit=1} q_d - sum_d q_d)

with ``s_i = mean_d |v_i[d]|`` — the L2-optimal 1-bit dequant scale. The
masked-sum term is exactly a matmul of q against the unpacked {0,1} bit
matrix, so the scan runs on the MXU like the dense scan; bits are unpacked
in-kernel on the VPU (HBM only ever sees the packed bytes).

Layout: packed uint8-as-int8 ``[N, D//8]`` — byte j of row i holds dims
``j*8 .. j*8+7`` LSB-first. For D=768 that is 96 bytes/row (the TPU pads the
lane dim to 128, so true compression vs int8 storage is 6x, vs bf16 12x).

A coarse scan is NEVER the final answer: callers over-fetch top-K' candidates
and rescore them against the exact tier with :mod:`voitta_rag_tpu.ops.rerank`
(Qdrant's ``rescore: true`` semantics). Filters are applied inside the coarse
kernel (masked rows -> -inf) so selective filters cannot crowd the candidate
set out, same as :mod:`voitta_rag_tpu.ops.dense_scan`.

Measured (v5e, 2M x 768, B=32): the coarse scan is MXU-bound, not DMA-bound
— at serving batch 32 the systolic array runs ~25% occupied, so every
compressed format converges to the same ~2 ms/2M-rows matmul floor; BQ's win
is *capacity* (6x rows per chip) and large-batch throughput, not b=32
latency. See bench.py's bq section for current numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voitta_rag_tpu.ops.filters import FilterSpec, eval_mask
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, interpret_mode, pick_tile

TILE_N = 2048


def encode_sign(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack sign bits of ``vecs [N, D]`` -> (packed int8 [N, D//8], scales).

    D must be a multiple of 8. scales is [1, N] f32 (mean |v_d| per row).
    Host-side (NumPy): encoding happens at segment write time.
    """
    n, d = vecs.shape
    assert d % 8 == 0, "bitq requires dim % 8 == 0"
    bits = (vecs >= 0).astype(np.uint8).reshape(n, d // 8, 8)
    weights = (1 << np.arange(8, dtype=np.uint8))[None, None, :]
    packed = (bits * weights).sum(axis=2).astype(np.uint8)
    scales = np.abs(vecs).mean(axis=1, dtype=np.float32).reshape(1, n)
    return packed.view(np.int8), scales


def encode_sign_device(vecs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device-side :func:`encode_sign` (for bench/bulk encode paths)."""
    n, d = vecs.shape
    bits = (vecs >= 0).astype(jnp.int32).reshape(n, d // 8, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, None, :]
    # Wrap the unsigned byte value into int8 range via uint8 intermediate.
    packed = jnp.sum(bits * weights, axis=2).astype(jnp.uint8).astype(jnp.int8)
    scales = jnp.mean(jnp.abs(vecs.astype(jnp.float32)), axis=1).reshape(1, n)
    return packed, scales


def encode_int4(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int4 quant -> (codes int8 in [-7, 7], scales [1, N]).

    Codes are returned widened to int8 (NumPy has no int4); convert with
    ``jnp.asarray(codes).astype(jnp.int4)`` inside jit when XLA-native int4
    storage is wanted.
    """
    vmax = np.abs(vecs).max(axis=1, keepdims=True)
    vmax = np.where(vmax == 0, 1.0, vmax)
    codes = np.clip(np.round(vecs / vmax * 7.0), -7, 7).astype(np.int8)
    scales = (vmax / 7.0).astype(np.float32).reshape(1, -1)
    return codes, scales


def _unpack_bits_bf16(packed: jax.Array, d: int) -> jax.Array:
    """[T, D//8] int8 -> [T, D] bf16 in {0, 1} (LSB-first per byte)."""
    t = packed.shape[0]
    # int8 -> unsigned byte value (astype sign-extends; mask it off) — avoids
    # a bitcast, which does not lower inside Pallas kernels.
    w = packed.astype(jnp.int32) & 0xFF                 # [T, D//8]
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2)
    bits = (w[:, :, None] >> shifts) & 1                # [T, D//8, 8]
    return bits.reshape(t, d).astype(jnp.bfloat16)


def _bitq_kernel(params_ref, inc_ref, exc_ref, excif_ref, q_ref, qsum_ref,
                 packed_ref, scales_ref, cols_ref, out_ref):
    d = q_ref.shape[1]
    u = _unpack_bits_bf16(packed_ref[:], d)             # [T, D]
    q = q_ref[:]                                        # [B, D] bf16
    masked_sum = jax.lax.dot_general(
        q, u,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [B, T]
    scores = (2.0 * masked_sum - qsum_ref[:]) * scales_ref[:]
    mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                     cols_ref[:])
    out_ref[:] = jnp.where(mask[None, :], scores, NEG_INF)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def bitq_scan_scores(
    q: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    cols: jax.Array,
    spec: FilterSpec,
    *,
    use_pallas: bool = True,
) -> jax.Array:
    """Masked coarse scores of ``q [B, D]`` against sign bits ``[N, D//8]``.

    Returns f32 [B, N]; masked rows = -inf. Same contract as
    :func:`voitta_rag_tpu.ops.dense_scan.dense_scan_scores`, coarse values.
    """
    B, D = q.shape
    N, W = packed.shape
    assert W * 8 == D and cols.shape[1] == N
    qb = q.astype(jnp.bfloat16)
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)  # [B, 1]

    if not use_pallas:
        u = _unpack_bits_bf16(packed, D)
        masked_sum = jax.lax.dot_general(
            qb, u, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = (2.0 * masked_sum - qsum) * scales
        mask = eval_mask(spec.params, spec.inc_ids, spec.exc_ids,
                         spec.exc_if_ids, cols)
        return jnp.where(mask[None, :], scores, NEG_INF)

    tile = pick_tile(N, TILE_N)
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
    cost = pl.CostEstimate(
        flops=2 * B * N * D,
        bytes_accessed=N * W + N * cols.shape[0] * 4 + B * N * 4,
        transcendentals=0,
    )
    return pl.pallas_call(
        _bitq_kernel,
        grid=grid,
        in_specs=filt_specs + [
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cols.shape[0], tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=cost,
        interpret=interpret_mode(),
    )(spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids, qb, qsum,
      packed, scales, cols)
