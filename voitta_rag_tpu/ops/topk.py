"""Top-k selection over masked score arrays.

XLA's TopK on TPU is already near speed-of-light for the [B, N] f32 arrays the
scan kernels emit (score write-back is ~1/D of the scan's read traffic, so
top-k never dominates). ``approx=True`` routes to ``jax.lax.approx_max_k``
(TPU-optimized partial-sort, ~10x faster at N >= 1M for recall_target 0.99)
— the analogue of the reference's reliance on approximate HNSW retrieval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from voitta_rag_tpu.ops.pallas_utils import NEG_INF

#: Scores below this are considered masked-out.
VALID_THRESHOLD = NEG_INF / 2


@functools.partial(jax.jit, static_argnames=("k", "approx", "recall_target"))
def masked_topk(
    scores: jax.Array,
    k: int,
    *,
    approx: bool = False,
    recall_target: float = 0.99,
) -> tuple[jax.Array, jax.Array]:
    """Top-k of masked scores.

    Args:
        scores: f32 [B, N], masked entries = -inf (NEG_INF).
        k: number of results (static).

    Returns:
        (values [B, k] f32, indices [B, k] int32); slots whose value is
        below VALID_THRESHOLD found no valid candidate and carry index -1.
    """
    k = min(k, scores.shape[-1])
    if approx:
        vals, idxs = jax.lax.approx_max_k(
            scores, k, recall_target=recall_target
        )
    else:
        vals, idxs = jax.lax.top_k(scores, k)
    idxs = jnp.where(vals > VALID_THRESHOLD, idxs, -1).astype(jnp.int32)
    return vals, idxs


# Two-stage exact selection: per-group top-k, then top-k of the group
# winners. A row's global top-k is a subset of the union of per-group
# top-ks, so this is EXACT. MEASURED NEGATIVE RESULT on v5e — do not wire
# into masked_topk: standalone at B=32 W=1.4M it is 5.30 ms vs 2.75 ms for
# one full-width lax.top_k, and inside the fused IVF probe (synthetic 2.1M
# rows, 768-d int8, b32) 37.8 vs 31.5 ms at np16 / 47.5 vs 35.0 ms at np32.
# TPU TopK with small k is a streaming reduce whose cost is linear in
# elements, not sort-width; the grouped pass reads the same bytes AND adds
# a [.., n_groups, k] intermediate, so it can only lose. Kept because it is
# exact and useful where a future backend has sort-based TopK.
_TOPK_GROUP = 2048
_TOPK_2STAGE_MIN = 1 << 17


def exact_topk(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the last axis; two-stage above _TOPK_2STAGE_MIN."""
    n = scores.shape[-1]
    if n < _TOPK_2STAGE_MIN or k * 4 > _TOPK_GROUP:
        return jax.lax.top_k(scores, k)
    g = _TOPK_GROUP
    n_groups = -(-n // g)
    pad = n_groups * g - n
    if pad:
        scores = jnp.pad(scores, [(0, 0)] * (scores.ndim - 1) + [(0, pad)],
                         constant_values=NEG_INF)
    grouped = scores.reshape(*scores.shape[:-1], n_groups, g)
    gv, gi = jax.lax.top_k(grouped, k)                # [..., n_groups, k]
    base = (jnp.arange(n_groups, dtype=jnp.int32) * g)[:, None]
    flat_i = (gi.astype(jnp.int32) + base).reshape(*scores.shape[:-1],
                                                   n_groups * k)
    flat_v = gv.reshape(*scores.shape[:-1], n_groups * k)
    vals, pos = jax.lax.top_k(flat_v, k)
    idxs = jnp.take_along_axis(flat_i, pos, axis=-1)
    return vals, idxs


@functools.partial(jax.jit, static_argnames=("k",))
def topk_from_lists(
    vals: jax.Array, ids: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Top-k of a (values, ids) candidate list [B, C] (ids < 0 or -inf vals
    invalid). Used by the group-winner select path (ops/scan_select.py)."""
    k = min(k, vals.shape[-1])
    masked = jnp.where(ids >= 0, vals, NEG_INF)
    top_vals, pos = jax.lax.top_k(masked, k)
    top_ids = jnp.take_along_axis(ids, pos, axis=-1)
    top_ids = jnp.where(top_vals > VALID_THRESHOLD, top_ids, -1)
    return top_vals, top_ids.astype(jnp.int32)


@jax.jit
def dedup_candidates(
    vals: jax.Array, ids: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Drop duplicate ids from candidate lists, keeping the best value.

    Multi-assignment IVF (index/ivf.py assign_k > 1) can return the same gid
    more than once (replicas in different probed cells, equal scores). Sort
    by (id asc, val desc), keep the first entry of each id run, then restore
    value ordering. Entries with id < 0 stay invalid.

    Args:
        vals: f32 [B, K]; ids: int32 [B, K] (-1 = invalid).

    Returns:
        (vals [B, K], ids [B, K]) value-sorted, dup slots pushed to the tail
        as (-inf, -1).
    """
    big = jnp.iinfo(jnp.int32).max
    key_id = jnp.where(ids >= 0, ids, big)
    ks, nvs, vs, is_ = jax.lax.sort(
        (key_id, -vals, vals, ids), dimension=1, num_keys=2)
    first = jnp.concatenate(
        [jnp.ones(ks.shape[:1] + (1,), bool), ks[:, 1:] != ks[:, :-1]],
        axis=1)
    keep = first & (is_ >= 0)
    vs = jnp.where(keep, vs, NEG_INF)
    out_vals, pos = jax.lax.top_k(vs, vs.shape[-1])
    out_ids = jnp.where(out_vals > VALID_THRESHOLD,
                        jnp.take_along_axis(is_, pos, axis=1), -1)
    return out_vals, out_ids.astype(jnp.int32)
