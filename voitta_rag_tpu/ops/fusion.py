"""Hybrid dense+sparse fusion, computed in-jit on the candidate set.

Behavior contract: VectorStoreService._hybrid_search
(/root/reference/src/voitta/services/vector_store.py:621-697):

1. over-fetch ``P = limit * prefetch_multiplier`` candidates from the dense
   and sparse retrievers independently (vector_store.py:636),
2. min-max normalize scores *within each candidate list* (spread == 0 →
   everything maps to 1.0, vector_store.py:662-672),
3. union the two id sets, combine ``(1-w) * dense_norm + w * sparse_norm``
   with 0.0 for a missing side, sort, take top ``limit``.

Here both retrievers produce full masked score arrays on device, so the
candidate lists are exact ``top_k`` results and the whole fusion runs inside
the same jitted program — no host round-trip between retrieval and fusion.
RRF fusion (BASELINE config 2) is provided as an alternative.

Static shapes throughout: the union is materialized as the ``2P`` concat with
sort-based dedupe (each id occurs at most once per list, so merging adjacent
equal ids after an id-sort is an exact union-merge).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from voitta_rag_tpu.ops.pallas_utils import NEG_INF
from voitta_rag_tpu.ops.topk import VALID_THRESHOLD


#: Above this row width, candidate selection uses ``jax.lax.approx_max_k``
#: (TPU-optimized partial reduction, ~2-4x faster than the sort-based exact
#: TopK at 1M rows). The ``limit * prefetch_multiplier`` over-fetch keeps the
#: final top-``limit`` recall far above the per-op 0.95 target — mirroring
#: the reference, whose dense candidates come from approximate HNSW anyway.
APPROX_TOPK_THRESHOLD = 1 << 16


def _candidates(scores_row: jax.Array, p: int):
    """Top-p (value, index, valid) of one score row."""
    if scores_row.shape[-1] >= APPROX_TOPK_THRESHOLD:
        vals, idxs = jax.lax.approx_max_k(scores_row, p)
    else:
        vals, idxs = jax.lax.top_k(scores_row, p)
    valid = vals > VALID_THRESHOLD
    return vals, idxs, valid


def _candidates_from_lists(vals_row: jax.Array, ids_row: jax.Array, p: int):
    """Top-p re-selection from a pre-gathered candidate list [C] (sharded
    path: C = n_shards * p_local). Entries with id < 0 are invalid."""
    vals_row = jnp.where(ids_row >= 0, vals_row, NEG_INF)
    vals, pos = jax.lax.top_k(vals_row, p)
    ids = ids_row[pos]
    valid = vals > VALID_THRESHOLD
    return vals, ids, valid


def _minmax_norm(vals: jax.Array, valid: jax.Array) -> jax.Array:
    """Min-max normalize over valid entries (vector_store.py:662-672)."""
    big = jnp.float32(3e38)
    mn = jnp.min(jnp.where(valid, vals, big))
    mx = jnp.max(jnp.where(valid, vals, -big))
    spread = mx - mn
    normed = jnp.where(spread > 0, (vals - mn) / jnp.where(spread > 0, spread, 1.0), 1.0)
    return jnp.where(valid, normed, 0.0)


def _union_merge(d_idx, d_contrib, s_idx, s_contrib, d_valid, s_valid, k: int):
    """Union the two candidate lists, summing per-id contributions, top-k.

    Returns (scores [k], ids [k]) with -1 ids for empty slots.
    """
    p = d_idx.shape[0]
    # Unique negative ids for invalid slots so they never merge with real ids.
    slot = jnp.arange(2 * p, dtype=jnp.int32)
    ids = jnp.concatenate([d_idx, s_idx]).astype(jnp.int32)
    valid = jnp.concatenate([d_valid, s_valid])
    ids = jnp.where(valid, ids, -2 - slot)
    contrib = jnp.where(valid, jnp.concatenate([d_contrib, s_contrib]), 0.0)

    order = jnp.argsort(ids)
    ids_s = ids[order]
    contrib_s = contrib[order]
    valid_s = valid[order]

    # An id appears at most twice (once per list): fold position i+1 into i.
    nxt_same = jnp.concatenate([ids_s[1:] == ids_s[:-1], jnp.array([False])])
    prv_same = jnp.concatenate([jnp.array([False]), ids_s[1:] == ids_s[:-1]])
    merged = contrib_s + jnp.where(
        nxt_same, jnp.concatenate([contrib_s[1:], jnp.zeros((1,))]), 0.0
    )
    final = jnp.where(valid_s & ~prv_same, merged, NEG_INF)

    top_vals, top_pos = jax.lax.top_k(final, k)
    top_ids = jnp.where(top_vals > VALID_THRESHOLD, ids_s[top_pos], -1)
    top_vals = jnp.where(top_vals > VALID_THRESHOLD, top_vals, NEG_INF)
    return top_vals, top_ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("limit", "prefetch_multiplier"))
def hybrid_fuse(
    dense_scores: jax.Array,
    sparse_scores: jax.Array,
    sparse_weight: jax.Array | float,
    *,
    limit: int,
    prefetch_multiplier: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """Weighted min-max fusion of masked score arrays.

    Args:
        dense_scores: f32 [B, N] (-inf masked).
        sparse_scores: f32 [B, N] (-inf masked). Pass a NEG_INF-filled array
            for dense-only search.
        sparse_weight: scalar in [0, 1]; dense weight is 1 - w
            (reference config.py:44, default 0.1).
        limit: top results to return.
        prefetch_multiplier: candidate over-fetch (reference ``limit * 3``).

    Returns:
        (scores [B, limit] f32, ids [B, limit] int32, -1 = empty slot).
    """
    w = jnp.asarray(sparse_weight, jnp.float32)
    p = min(limit * prefetch_multiplier, dense_scores.shape[-1])
    k = min(limit, 2 * p)

    def fuse_row(d_row, s_row):
        d_vals, d_idx, d_valid = _candidates(d_row, p)
        s_vals, s_idx, s_valid = _candidates(s_row, p)
        d_norm = _minmax_norm(d_vals, d_valid) * (1.0 - w)
        s_norm = _minmax_norm(s_vals, s_valid) * w
        return _union_merge(d_idx, d_norm, s_idx, s_norm, d_valid, s_valid, k)

    return jax.vmap(fuse_row)(dense_scores, sparse_scores)


@functools.partial(jax.jit, static_argnames=("limit", "prefetch_multiplier"))
def hybrid_fuse_candidates(
    d_vals: jax.Array,
    d_ids: jax.Array,
    s_vals: jax.Array,
    s_ids: jax.Array,
    sparse_weight: jax.Array | float,
    *,
    limit: int,
    prefetch_multiplier: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """Weighted fusion over pre-gathered candidate lists [B, C] (C >= p).

    Used by the sharded path: each shard contributes its local top-p; the
    all-gathered union is re-cut to the global top-p here so normalization
    happens over exactly the candidates a single-device search would use.
    """
    w = jnp.asarray(sparse_weight, jnp.float32)
    # Clamp to BOTH list widths: an IVF probe can be wider than the sparse
    # fallback list (top_k with k > row width is an error).
    p = min(limit * prefetch_multiplier, d_vals.shape[-1], s_vals.shape[-1])
    k = min(limit, 2 * p)

    def fuse_row(dv, di, sv, si):
        d_vals_r, d_idx, d_valid = _candidates_from_lists(dv, di, p)
        s_vals_r, s_idx, s_valid = _candidates_from_lists(sv, si, p)
        d_norm = _minmax_norm(d_vals_r, d_valid) * (1.0 - w)
        s_norm = _minmax_norm(s_vals_r, s_valid) * w
        return _union_merge(d_idx, d_norm, s_idx, s_norm, d_valid, s_valid, k)

    return jax.vmap(fuse_row)(d_vals, d_ids, s_vals, s_ids)


@functools.partial(jax.jit, static_argnames=("limit", "prefetch_multiplier", "rrf_k"))
def rrf_fuse_candidates(
    d_vals: jax.Array,
    d_ids: jax.Array,
    s_vals: jax.Array,
    s_ids: jax.Array,
    *,
    limit: int,
    prefetch_multiplier: int = 3,
    rrf_k: int = 60,
) -> tuple[jax.Array, jax.Array]:
    """Reciprocal-rank fusion over pre-gathered candidate lists [B, C]."""
    p = min(limit * prefetch_multiplier, d_vals.shape[-1], s_vals.shape[-1])
    k = min(limit, 2 * p)

    def fuse_row(dv, di, sv, si):
        _, d_idx, d_valid = _candidates_from_lists(dv, di, p)
        _, s_idx, s_valid = _candidates_from_lists(sv, si, p)
        ranks = jnp.arange(1, p + 1, dtype=jnp.float32)
        d_rrf = jnp.where(d_valid, 1.0 / (rrf_k + ranks), 0.0)
        s_rrf = jnp.where(s_valid, 1.0 / (rrf_k + ranks), 0.0)
        return _union_merge(d_idx, d_rrf, s_idx, s_rrf, d_valid, s_valid, k)

    return jax.vmap(fuse_row)(d_vals, d_ids, s_vals, s_ids)


@functools.partial(jax.jit, static_argnames=("limit", "prefetch_multiplier", "rrf_k"))
def rrf_fuse(
    dense_scores: jax.Array,
    sparse_scores: jax.Array,
    *,
    limit: int,
    prefetch_multiplier: int = 3,
    rrf_k: int = 60,
) -> tuple[jax.Array, jax.Array]:
    """Reciprocal-rank fusion: score = sum over lists of 1 / (rrf_k + rank)."""
    p = min(limit * prefetch_multiplier, dense_scores.shape[-1])
    k = min(limit, 2 * p)

    def fuse_row(d_row, s_row):
        d_vals, d_idx, d_valid = _candidates(d_row, p)
        s_vals, s_idx, s_valid = _candidates(s_row, p)
        ranks = jnp.arange(1, p + 1, dtype=jnp.float32)
        d_rrf = jnp.where(d_valid, 1.0 / (rrf_k + ranks), 0.0)
        s_rrf = jnp.where(s_valid, 1.0 / (rrf_k + ranks), 0.0)
        return _union_merge(d_idx, d_rrf, s_idx, s_rrf, d_valid, s_valid, k)

    return jax.vmap(fuse_row)(dense_scores, sparse_scores)
