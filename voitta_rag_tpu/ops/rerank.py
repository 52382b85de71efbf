"""Exact re-rank of a compressed first-pass candidate set.

The reference's Qdrant engine pairs every lossy-compressed index (scalar,
product, or binary quantization) with an exact rescoring pass over the
original vectors ("rescore: true", the default when quantization is on).
This op is the TPU-native analogue: a coarse scan over a compressed
representation (sign-bit planes, :mod:`voitta_rag_tpu.ops.bitq`)
selects ``K'`` candidate rows per query, then this kernel gathers those
rows' *exact* vectors (bf16 / f32 / int8-with-scale) and rescores them in
f32 before the final top-``limit``.

Shapes are serving-friendly: ``B x K'`` candidates gather ``B*K'`` rows of
``D`` — tens of KB to a few MB — so the gather is a row-DMA, not a scan.
The exact rows may live on device or (cold tier) on host; the host variant
gathers with NumPy and ships only the gathered block.

Everything here is jit-safe and static-shaped: invalid candidates carry
gid -1 and are scored -inf, exactly like the masked scan kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voitta_rag_tpu.ops.pallas_utils import NEG_INF


def rerank_exact(
    q: jax.Array,
    cand_gids: jax.Array,
    vecs: jax.Array,
    scales: jax.Array | None = None,
    *,
    limit: int,
) -> tuple[jax.Array, jax.Array]:
    """Rescore candidate rows exactly and return the top ``limit``.

    Args:
        q: [B, D] query embeddings (unit-normalized, any float dtype).
        cand_gids: [B, K'] int32 row ids into ``vecs``; -1 = empty slot.
        vecs: [N, D] exact stored vectors (f32 / bf16 / int8).
        scales: [1, N] per-row dequant scales when ``vecs`` is int8.
        limit: final k. Must be <= K'.

    Returns:
        (vals [B, limit] f32 desc-sorted, gids [B, limit] int32, -1 padded).
    """
    safe = jnp.maximum(cand_gids, 0)                       # [B, K']
    rows = jnp.take(vecs, safe, axis=0).astype(jnp.float32)  # [B, K', D]
    s = jnp.einsum("bd,bkd->bk", q.astype(jnp.float32), rows)
    if scales is not None:
        # Per-row dequant scale commutes with the dot: apply to the [B, K']
        # result, not the [B, K', D] rows (D x less work).
        s = s * jnp.take(scales[0], safe, axis=0)
    s = jnp.where(cand_gids >= 0, s, NEG_INF)
    vals, pos = jax.lax.top_k(s, limit)
    gids = jnp.take_along_axis(cand_gids, pos, axis=1)
    invalid = vals <= NEG_INF / 2
    return (jnp.where(invalid, NEG_INF, vals),
            jnp.where(invalid, -1, gids))


@functools.partial(jax.jit, static_argnames=("limit",))
def rerank_exact_jit(q, cand_gids, vecs, scales=None, *, limit: int):
    """Standalone-jitted :func:`rerank_exact` (one dispatch when not fused)."""
    return rerank_exact(q, cand_gids, vecs, scales, limit=limit)


def rerank_exact_host(
    q: np.ndarray,
    cand_gids: np.ndarray,
    vecs_host: np.ndarray,
    scales_host: np.ndarray | None = None,
    *,
    limit: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Cold-tier variant: exact rows live in host RAM (offloaded segment).

    Gathers the candidate rows with NumPy (B*K' rows — microseconds) and
    rescores in f32 on host; only useful when the exact tier is offloaded,
    where shipping B*K'*D bytes to the device would cost more than the
    flops saved. Semantics identical to :func:`rerank_exact`.
    """
    B, Kp = cand_gids.shape
    safe = np.maximum(cand_gids, 0)
    rows = vecs_host[safe.reshape(-1)].astype(np.float32)
    rows = rows.reshape(B, Kp, -1)
    # BLAS batched matmul, per-row scale applied to the [B, K'] result (a
    # pre-dot [B, K', D] scale broadcast measured ~10x slower on a 1-vCPU
    # host than the dot itself).
    s = np.matmul(rows, q.astype(np.float32)[:, :, None])[..., 0]
    if scales_host is not None:
        s = s * scales_host[0][safe]
    s = np.where(cand_gids >= 0, s, NEG_INF)
    pos = np.argsort(-s, axis=1)[:, :limit]
    vals = np.take_along_axis(s, pos, axis=1)
    gids = np.take_along_axis(cand_gids, pos, axis=1)
    invalid = vals <= NEG_INF / 2
    return (np.where(invalid, NEG_INF, vals).astype(np.float32),
            np.where(invalid, -1, gids).astype(np.int32))
