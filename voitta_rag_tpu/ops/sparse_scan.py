"""Sparse BM25 masked-scoring scan (VPU kernel).

Replaces the reference's Qdrant sparse-vector query with IDF modifier
(services/vector_store.py:95-99, 647-656; fastembed BM25 in
services/sparse_embedding.py). TPU-native layout: instead of an inverted
index (pointer-chasing, dynamic shapes — hostile to XLA), every chunk stores
its top-``S`` BM25 terms in fixed slots, **slot-major**:

    doc_terms   int32 [S, N]  term-hash ids, TERM_PAD in empty slots
    doc_weights f32   [S, N]  per-term BM25 doc weight
                              = tf_sat * ... (tf saturation + length norm
                                baked in at index time)

Slot-major matters on TPU: the row axis ``N`` is the minor (lane) dimension,
so every (8, 128) vector register is fully dense. The row-major alternative
``[N, S]`` with S=32 pads the 32-wide minor dim to 128 lanes — 4x the DMA
bytes and 4x the VPU ops for the same work (measured ~3x end-to-end).

A query is ``(q_terms [1, Qt], q_weights [1, Qt])`` with IDF baked into the
weights at query time (Qdrant's ``Modifier.IDF`` applies IDF on the query
side). The kernel computes, per doc::

    score_i = sum_t q_w[t] * sum_s [doc_terms[s, i] == q_terms[t]] * doc_weights[s, i]

as dense VPU compare-select-reduce over tiles — no gather, no dynamic shapes,
embarrassingly shardable. The query-term loop is unrolled at trace time (Qt
is static), so there is no loop-carried SMEM scalar read stalling the VPU.
Chunks are <= ~100 tokens (512 chars, config.py:39), so S=64 top-weight slots
is near-lossless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voitta_rag_tpu.ops.filters import FilterSpec, eval_mask
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, interpret_mode, pick_tile

TILE_N = 2048  # rows per grid step: 32 x 2048 x (4+4) B x 2(dbuf) = 1 MB VMEM
TERM_PAD = -1  # empty doc slot / empty query slot


def _make_sparse_kernel(n_q: int):
    def kernel(params_ref, inc_ref, exc_ref, excif_ref,
               qt_ref, qw_ref, terms_ref, weights_ref, cols_ref, out_ref):
        terms = terms_ref[:]       # [S, T] int32, lane-dense
        # Unrolled over the (static) query slots: per slot, a broadcast
        # compare + select-accumulate. A PAD query term gets weight 0 so its
        # matches against PAD doc slots contribute nothing.
        acc = jnp.zeros(terms.shape, jnp.float32)
        for i in range(n_q):
            term = qt_ref[0, i]
            w = jnp.where(term != TERM_PAD, qw_ref[0, i], 0.0)
            acc = acc + jnp.where(terms == term, w, 0.0)
        weights = weights_ref[:]   # [S, T] f32 or bf16 (HBM-traffic saver)
        if weights.dtype != jnp.float32:
            weights = weights.astype(jnp.float32)
        scores = jnp.sum(acc * weights, axis=0)  # sublane reduce -> [T]
        mask = eval_mask(params_ref, inc_ref[:], exc_ref[:], excif_ref[:],
                         cols_ref[:])
        out_ref[:] = jnp.where(mask, scores, NEG_INF)[None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def sparse_scan_scores(
    q_terms: jax.Array,
    q_weights: jax.Array,
    doc_terms: jax.Array,
    doc_weights: jax.Array,
    cols: jax.Array,
    spec: FilterSpec,
    *,
    use_pallas: bool = False,
) -> jax.Array:
    """Masked BM25 scores of one sparse query against a segment.

    Default path is XLA (measured 2.5 ms vs the Pallas slot kernel's
    3.9 ms at 1M x 32 slots — see dense_scan_scores for the rationale).

    Args:
        q_terms: int32 [1, Qt] query term ids (TERM_PAD padded).
        q_weights: f32 [1, Qt] query weights (IDF * query-side tf).
        doc_terms: int32 [S, N] slot-major; doc_weights: f32/bf16 [S, N].
        cols: int32 [NUM_COLS, N] filter columns.
        spec: FilterSpec.

    Returns:
        f32 [1, N] scores; masked rows = -inf. (Sparse queries are scored one
        at a time — Qt is tiny and queries fan out across the batch axis at a
        higher level.)
    """
    S, N = doc_terms.shape
    tile = pick_tile(N, TILE_N)

    if not use_pallas:
        return _xla_sparse_scores(q_terms, q_weights, doc_terms, doc_weights,
                                  cols, spec)

    grid = (N // tile,)
    filt_specs = [
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(spec.inc_ids.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(spec.exc_ids.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(spec.exc_if_ids.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=2 * N * S * q_terms.shape[1],
        bytes_accessed=N * S * (4 + doc_weights.dtype.itemsize)
        + N * cols.shape[0] * 4 + N * 4,
        transcendentals=0,
    )
    return pl.pallas_call(
        _make_sparse_kernel(q_terms.shape[1]),
        grid=grid,
        in_specs=filt_specs + [
            pl.BlockSpec(q_terms.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(q_weights.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((cols.shape[0], tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        cost_estimate=cost,
        interpret=interpret_mode(),
    )(spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids,
      q_terms, q_weights, doc_terms, doc_weights, cols)


def _xla_sparse_scores(q_terms, q_weights, doc_terms, doc_weights, cols,
                       spec: FilterSpec) -> jax.Array:
    """Pure-XLA fallback with identical semantics (doc arrays [S, N])."""
    # [S, N, Qt] hit tensor contracted in two steps to keep memory sane.
    hit = (doc_terms[:, :, None] == q_terms[0][None, None, :]) & (
        q_terms[0][None, None, :] != TERM_PAD
    )
    per_term = jnp.sum(
        jnp.where(hit, doc_weights.astype(jnp.float32)[:, :, None], 0.0),
        axis=0
    )  # [N, Qt]
    scores = per_term @ q_weights[0]
    mask = eval_mask(spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids,
                     cols)
    return jnp.where(mask, scores, NEG_INF)[None, :]
