"""Multi-bit quantized sketches: the coarse tier for the dense scan.

The reference's Qdrant engine offers binary/scalar quantization with exact
rescore ("oversampling"); this is the TPU-native analogue, generalized to
``b`` bits per dimension. A row stores a b-bit *midrise* code per dim plus
a per-row f32 step, quantizing the WHITENED residual (see
:func:`whitening_transform` — raw sign bits collapse on real embedding
distributions, which are low-effective-rank cones). The coarse score is the
asymmetric estimate (query stays full-precision):

    u_i   = W (v_i - mu)                       (whitened residual)
    code  = clip(floor(u_i / s_i), -L/2, L/2-1),  L = 2^b
    u_i  ~= (code + 0.5) * s_i
    score_i ~= (A q) . u_i_hat,   A = W^-1 (symmetric)
            =  s_i * ( sum_k 2^k * (q' . bitplane_k) - (L/2 - 0.5) * sum q' )

so the whole scan is ``b * (D/W)`` lane-aligned MXU matmuls against {0,1}
bit-planes unpacked on the VPU in-kernel — HBM only ever sees packed bytes.

**Plane-major layout** (chosen for Mosaic): ``packed [N, b*W]`` int8.
Byte column ``kb*W + j`` holds bit ``kb`` of the codes of dims
``k*W + j`` in its bit ``k`` (k < P = D/W bit-planes per byte). ``W`` is a
multiple of 128 (W = 128 for D <= 1024) so every plane extraction
``(w >> k) & 1`` is a full-width 2D lane op and every dot is a K=W-aligned
MXU matmul — no reshapes, no lane concatenation, no K padding. (A naive
byte-per-8-dims layout needs a [T, W, 8] -> [T, D] shape cast that
Mosaic's vector layout inference rejects.) The query needs NO dim
permutation: plane ``k`` scores q's contiguous slice ``q[:, k*W:(k+1)*W]``.

A coarse scan is NEVER the final answer: callers over-fetch top-K'
candidates and rescore them against the exact tier with
:mod:`voitta_rag_tpu.ops.rerank` (Qdrant's ``rescore: true`` semantics).
Filters are applied inside the coarse kernel (masked rows -> -inf) so
selective filters cannot crowd the candidate set out.

Measured (v5e): at serving batch 32 the coarse scan is MXU-bound, not
DMA-bound (the 1-bit 2M x 768 scan takes 5.3 ms vs 3.4 ms for the int8
dense scan — the capacity win is the point, not b=32 latency). Candidate
selection MUST use approx_max_k at scale (exact top-120 over 2M costs
24 ms, 4.5x the scan). Sketch quality at K'=480 oversampling on the HARD
case — a real-text corpus whose random-init-encoder embeddings have 56% of
variance in 8 of 768 directions: raw sign bits 0.494 recall@10, whitened
1-bit midrise 0.777, whitened 2-bit 0.972, 4-bit 1.000. On the clustered
synthetic corpus all variants measure 0.98 (os=4) / 1.000 (os=16).
Default bits=2 (VOITTA_BQ_BITS): 292 B/row at 768-d incl. scale + filter
cols (each plane group stores plane_width=128 bytes — P=6 of 8 bits per
byte used, the price of lane alignment) vs 772 B/row for int8 — ~2.6x
more rows shadowed per chip at 0.97+ worst-case recall (~4.7x at 1 bit).
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


def _step_factor(bits: int) -> float:
    """Per-row quantizer step = mean|u| * this. bits=1 reduces to the sign
    sketch (step = mean|u| puts the two midrise levels at +-0.5 mean|u|);
    for b > 1 the step spans ~2.5 mean-absolute-deviations across L levels
    (measured best on the hard real corpus: 0.972 at 2 bits)."""
    if bits == 1:
        return 1.0
    return 5.0 / (1 << bits)


def _quantize(u, bits: int, xp):
    """u [N, D] -> (codes int [N, D] in [0, L-1], step [N, 1])."""
    levels = 1 << bits
    step = xp.mean(xp.abs(u), axis=1, keepdims=True) * _step_factor(bits)
    step = xp.maximum(step, 1e-12)
    code = xp.clip(xp.floor(u / step), -(levels // 2), levels // 2 - 1)
    return (code + levels // 2).astype(xp.int32 if xp is jnp else np.int32), step


def _pack_planes_np(code: np.ndarray, bits: int) -> np.ndarray:
    n, d = code.shape
    w = plane_width(d)
    p = d // w
    c3 = code.reshape(n, p, w)
    out = np.zeros((n, bits * w), np.uint8)
    for kb in range(bits):
        plane_bits = ((c3 >> kb) & 1).astype(np.uint8)          # [n, p, w]
        weights = (1 << np.arange(p, dtype=np.uint8))[None, :, None]
        out[:, kb * w:(kb + 1) * w] = (plane_bits * weights).sum(
            axis=1, dtype=np.uint8)
    return out.view(np.int8)


def encode_planes(
    vecs: np.ndarray, bits: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Quantize (already-transformed) rows -> (packed int8 [N, bits*W],
    scales [1, N] f32 = per-row step). Host-side NumPy.

    Callers apply the whitening transform FIRST (sign/codes are taken of
    whatever is passed in); the matching query transform is A = W^-1.
    """
    code, step = _quantize(vecs.astype(np.float32), bits, np)
    return _pack_planes_np(code, bits), step.reshape(1, -1).astype(np.float32)


def encode_planes_device(
    vecs: jax.Array, bits: int = 1
) -> tuple[jax.Array, jax.Array]:
    """Device-side :func:`encode_planes` (bench/bulk paths)."""
    n, d = vecs.shape
    w = plane_width(d)
    p = d // w
    code, step = _quantize(vecs.astype(jnp.float32), bits, jnp)
    c3 = code.reshape(n, p, w)
    planes = []
    weights = (1 << jnp.arange(p, dtype=jnp.int32))[None, :, None]
    for kb in range(bits):
        pb = (c3 >> kb) & 1
        planes.append(jnp.sum(pb * weights, axis=1))
    packed = jnp.concatenate(planes, axis=1)
    packed = packed.astype(jnp.uint8).astype(jnp.int8)
    return packed, step.reshape(1, -1)


# Backward-compatible 1-bit names (sign-sketch era API).
def encode_sign(vecs, mu=None, sigma=None):
    """1-bit :func:`encode_planes` with optional diag centering/scaling
    (kept for tests; production uses whitening + encode_planes)."""
    v = vecs.astype(np.float32)
    if mu is not None:
        v = v - mu.reshape(1, -1)
    if sigma is not None:
        v = v / np.maximum(sigma.reshape(1, -1), 1e-9)
    return encode_planes(v, bits=1)


def encode_sign_device(vecs, mu=None, sigma=None):
    v = vecs.astype(jnp.float32)
    if mu is not None:
        v = v - mu.reshape(1, -1)
    if sigma is not None:
        v = v / jnp.maximum(sigma.reshape(1, -1), 1e-9)
    return encode_planes_device(v, bits=1)


def bq_query_transform(q, sigma):
    """Diag query-side counterpart of encode_sign's sigma (tests only)."""
    if sigma is None:
        return q
    return q * sigma.reshape(1, -1)


def whitening_transform(
    cov: np.ndarray, alpha: float = 0.5, eps_frac: float = 1e-2,
) -> tuple[np.ndarray, np.ndarray]:
    """Partial-whitening pair (W, A) for quantized sketches.

    Real embedding distributions are low-effective-rank cones; raw sign
    bits stop discriminating there (measured 0.494 recall@10 on a real
    corpus). Full whitening over-amplifies near-null noise directions
    (0.59-0.60); ``alpha=0.5`` partial whitening — ``W = (cov+eps)^(-1/4)``
    — measured best (0.714 at 1 bit, and the multi-bit sweet spots in the
    module docstring). Eigenvalues are floored at ``eps_frac * max(eig)``;
    the earlier 1e-4 floor let noise directions explode (0.069 recall).

    Rows encode as ``encode_planes(W @ (v - mu))``; a query scores with
    ``q' = A @ q`` (A = W^-1, symmetric). The rank-constant ``q . mu``
    term is dropped.
    """
    e, v = np.linalg.eigh(cov.astype(np.float64))
    eps = eps_frac * max(float(e.max()), 1e-12)
    lam = np.maximum(e, 0) + eps
    w = (v * lam ** (-alpha / 2)) @ v.T
    a = (v * lam ** (alpha / 2)) @ v.T
    return w.astype(np.float32), a.astype(np.float32)


def _acc_planes(qb, packed_vals, bits: int, n_planes: int, w: int):
    """Shared plane-dot accumulation: sum_k 2^kb (q_k . bitplane_{kb,k}).

    Pure jnp so the SAME code runs inside the Pallas kernel (on loaded
    tiles) and in the XLA fallback (on whole arrays) — one copy of the
    unpack/dot math to keep correct.
    """
    acc = jnp.zeros((qb.shape[0], packed_vals.shape[0]), jnp.float32)
    for kb in range(bits):
        # int8 -> unsigned byte (astype sign-extends; mask it off).
        words = (packed_vals[:, kb * w:(kb + 1) * w]
                 .astype(jnp.int32) & 0xFF)                      # [T, W]
        for k in range(n_planes):
            bits_k = ((words >> k) & 1).astype(jnp.bfloat16)     # [T, W]
            qk = qb[:, k * w:(k + 1) * w]                        # [B, W]
            acc = acc + (float(1 << kb)) * jax.lax.dot_general(
                qk, bits_k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _make_planes_kernel(bits: int, n_planes: int, w: int):
    offset = (1 << bits) / 2 - 0.5

    def kernel(params_ref, inc_ref, exc_ref, excif_ref, q_ref, qsum_ref,
               packed_ref, scales_ref, cols_ref, out_ref):
        acc = _acc_planes(q_ref[:], packed_ref[:], bits, n_planes, w)
        scores = (acc - offset * qsum_ref[:]) * scales_ref[:]
        mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                         cols_ref[:])
        out_ref[:] = jnp.where(mask[None, :], scores, NEG_INF)

    return kernel


@functools.partial(jax.jit, static_argnames=("bits", "use_pallas"))
def bitq_scan_scores(
    q: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    cols: jax.Array,
    spec: FilterSpec,
    *,
    bits: int = 1,
    use_pallas: bool = True,
) -> jax.Array:
    """Masked coarse scores of ``q [B, D]`` against code planes
    ``[N, bits*W]``. ``q`` must already carry the query transform (A q).

    Returns f32 [B, N]; masked rows = -inf. Same contract as
    :func:`voitta_rag_tpu.ops.dense_scan.dense_scan_scores`, coarse values.
    """
    B, D = q.shape
    N, WB = packed.shape
    W = WB // bits
    P = D // W
    assert W * P == D and cols.shape[1] == N, (q.shape, packed.shape, bits)
    levels = 1 << bits
    offset = levels / 2 - 0.5
    qb = q.astype(jnp.bfloat16)
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)  # [B, 1]

    if not use_pallas:
        acc = _acc_planes(qb, packed, bits, P, W)
        scores = (acc - offset * qsum) * scales
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
        flops=2 * B * N * D * bits,
        bytes_accessed=N * WB + N * cols.shape[0] * 4 + B * N * 4,
        transcendentals=0,
    )
    return pl.pallas_call(
        _make_planes_kernel(bits, P, W),
        grid=grid,
        in_specs=filt_specs + [
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, WB), lambda i: (i, 0),
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
