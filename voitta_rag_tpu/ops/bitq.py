"""Binary (sign-bit) quantization: 1-bit coarse tier for the dense scan.

The reference's Qdrant engine offers binary quantization with exact rescore
("oversampling") for >=768-d embeddings; this is the TPU-native analogue.
Each row stores one sign bit per dimension plus a per-row f32 scale, and the
coarse score is the *asymmetric* estimate (query stays full-precision):

    score_i ~= s_i * (q . sign(v_i))  =  s_i * (2 * sum_{d: bit=1} q_d - sum_d q_d)

with ``s_i = mean_d |v_i[d]|`` — the L2-optimal 1-bit dequant scale. The
masked-sum term is a matmul of q against the {0,1} bit matrix, so the scan
runs on the MXU like the dense scan; bits are unpacked on the VPU in-kernel
(HBM only ever sees the packed bytes).

**Plane-major layout** (chosen for Mosaic): ``packed [N, W]`` int8 where
byte ``j`` of a row holds the sign bits of dims ``k*W + j`` in bit ``k``,
for ``k < P = D // W`` bit-planes. ``W`` is a multiple of 128 (W = 128 for
D <= 1024), so every plane extraction ``(w >> k) & 1`` is a full-width 2D
lane op and every per-plane dot is a K=W-aligned MXU matmul — no reshapes,
no lane concatenation, no K padding. (The naive byte-per-8-dims layout
needs a [T, W, 8] -> [T, D] shape cast that Mosaic's vector layout
inference rejects, and its K=96 dots waste 25% of the MXU's K tile.)
The query needs NO permutation: plane ``k`` scores q's contiguous slice
``q[:, k*W:(k+1)*W]``.

A coarse scan is NEVER the final answer: callers over-fetch top-K'
candidates and rescore them against the exact tier with
:mod:`voitta_rag_tpu.ops.rerank` (Qdrant's ``rescore: true`` semantics).
Filters are applied inside the coarse kernel (masked rows -> -inf) so
selective filters cannot crowd the candidate set out, same as
:mod:`voitta_rag_tpu.ops.dense_scan`.

Measured (v5e, B=32): at serving batch 32 the systolic array runs ~25%
occupied, so the coarse scan is MXU-bound, not DMA-bound — 2M x 768 takes
5.3 ms vs 3.4 ms for the int8 dense scan at the same shape (the unpack VPU
work shows, the 8x traffic cut does not). BQ's win is *capacity* (~6x rows
per chip incl. filter cols) and large-batch throughput, not b=32 latency.
Candidate selection MUST use approx_max_k at scale: exact top-120 over 2M
costs 24 ms, 4.5x the scan itself. Coarse quality on a clustered 1M x 768
corpus: top-120 holds 0.980 of the exact top-10, top-480 holds 1.000 —
rescoring makes those the served recalls. See bench.py's bq section.
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


def plane_width(d: int) -> int:
    """Lane width W of the packed layout (P = d // W bit-planes, P <= 8).

    Prefers the largest plane count whose width is a multiple of 128 (full
    TPU lanes: 384 -> W=128/P=3, 768 -> 128/6, 1024 -> 128/8, 1536 ->
    256/6); small/odd dims fall back to the widest dividing plane count
    (correct everywhere, lane-padded on TPU — fine for tests)."""
    for p in range(8, 0, -1):
        if d % p == 0 and (d // p) % 128 == 0:
            return d // p
    for p in range(8, 0, -1):
        if d % p == 0:
            return d // p
    raise ValueError(f"bitq cannot tile dim {d}")


def encode_sign(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack sign bits of ``vecs [N, D]`` -> (packed int8 [N, W], scales).

    Plane-major: bit ``k`` of byte ``j`` = sign(vecs[:, k*W + j]).
    ``scales`` is [1, N] f32 (mean |v_d| per row). Host-side NumPy.
    """
    n, d = vecs.shape
    w = plane_width(d)
    p = d // w
    bits = (vecs >= 0).astype(np.uint8).reshape(n, p, w)
    weights = (1 << np.arange(p, dtype=np.uint8))[None, :, None]
    packed = (bits * weights).sum(axis=1, dtype=np.uint8)
    scales = np.abs(vecs).mean(axis=1, dtype=np.float32).reshape(1, n)
    return packed.view(np.int8), scales


def encode_sign_device(vecs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device-side :func:`encode_sign` (for bench/bulk encode paths)."""
    n, d = vecs.shape
    w = plane_width(d)
    p = d // w
    bits = (vecs >= 0).astype(jnp.int32).reshape(n, p, w)
    weights = (1 << jnp.arange(p, dtype=jnp.int32))[None, :, None]
    packed = jnp.sum(bits * weights, axis=1).astype(jnp.uint8).astype(jnp.int8)
    scales = jnp.mean(jnp.abs(vecs.astype(jnp.float32)), axis=1).reshape(1, n)
    return packed, scales


def _make_bitq_kernel(n_planes: int, w: int):
    def kernel(params_ref, inc_ref, exc_ref, excif_ref, q_ref, qsum_ref,
               packed_ref, scales_ref, cols_ref, out_ref):
        # int8 -> unsigned byte (astype sign-extends; mask it off).
        words = packed_ref[:].astype(jnp.int32) & 0xFF      # [T, W]
        b = q_ref.shape[0]
        t = words.shape[0]
        acc = jnp.zeros((b, t), jnp.float32)
        for k in range(n_planes):
            bits_k = ((words >> k) & 1).astype(jnp.bfloat16)   # [T, W]
            qk = q_ref[:, k * w:(k + 1) * w]                   # [B, W] bf16
            acc = acc + jax.lax.dot_general(
                qk, bits_k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        scores = (2.0 * acc - qsum_ref[:]) * scales_ref[:]
        mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                         cols_ref[:])
        out_ref[:] = jnp.where(mask[None, :], scores, NEG_INF)

    return kernel


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
    """Masked coarse scores of ``q [B, D]`` against sign planes ``[N, W]``.

    Returns f32 [B, N]; masked rows = -inf. Same contract as
    :func:`voitta_rag_tpu.ops.dense_scan.dense_scan_scores`, coarse values.
    """
    B, D = q.shape
    N, W = packed.shape
    P = D // W
    assert W * P == D and cols.shape[1] == N
    qb = q.astype(jnp.bfloat16)
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)  # [B, 1]

    if not use_pallas:
        words = packed.astype(jnp.int32) & 0xFF
        acc = jnp.zeros((B, N), jnp.float32)
        for k in range(P):
            bits_k = ((words >> k) & 1).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                qb[:, k * W:(k + 1) * W], bits_k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        scores = (2.0 * acc - qsum) * scales
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
        _make_bitq_kernel(P, W),
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
