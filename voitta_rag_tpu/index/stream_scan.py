"""Streaming scan over host-resident (cold-tier) segments.

Beyond-HBM serving: when a corpus exceeds the device budget
(``VOITTA_DEVICE_ROWS_BUDGET``), full segments are offloaded to host RAM
(segment.py:offload) and searches stream them through fixed-size device
staging blocks — the analogue of the mmap storage Qdrant gives the
reference for bigger-than-RAM collections (reference layer 0,
docker-compose.yml:2-9), built on H2D transfers instead of page faults.

The loop exploits JAX's async dispatch for double buffering: each block's
H2D transfer and scan are enqueued without blocking, so block i+1's
transfer overlaps block i's compute. A sliding window bounds the number of
staged-but-unconsumed blocks so peak HBM use stays at ~3 staging blocks
regardless of cold-tier size. Results are bit-identical to the resident
path: the same scan kernels run on the same rows, only the residency of
the inputs differs (asserted in tests/test_cold_tier.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from voitta_rag_tpu.ops.dense_scan import dense_scan_scores
from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores

_MAX_IN_FLIGHT = 2


def stream_segment_scores(q_dense, seg, spec, qt=None, qw=None,
                          block_rows: int = 262144):
    """Masked scores for one offloaded segment, streamed block-wise.

    Returns (dense_scores [B, cap], sparse_scores [B, cap] | None) — the
    same shapes the resident path produces, so callers concatenate them
    interchangeably and gid arithmetic is untouched.
    """
    assert not seg.resident, "stream_segment_scores expects a cold segment"
    assert block_rows % 128 == 0, "staging block must be lane-aligned"
    cap = seg.capacity
    d_parts, s_parts, window = [], [], []
    for lo in range(0, cap, block_rows):
        hi = min(lo + block_rows, cap)
        vecs = jnp.asarray(seg.vecs[lo:hi])
        cols = jnp.asarray(seg.cols[:, lo:hi])
        scales = (jnp.asarray(seg.scales[:, lo:hi])
                  if seg.scales is not None else None)
        d = dense_scan_scores(q_dense, vecs, cols, spec, scales)
        d_parts.append(d)
        window.append(d)
        if qt is not None:
            s = sparse_scan_scores(qt, qw, jnp.asarray(seg.terms[:, lo:hi]),
                                   jnp.asarray(seg.weights[:, lo:hi]),
                                   cols, spec)
            s_parts.append(s)
            window.append(s)
        # Bound staged memory: block until the oldest in-flight block's
        # scores land, which releases its staging buffers. Transfers for
        # the next blocks are already enqueued (async dispatch), so the
        # pipeline stays full.
        while len(window) > _MAX_IN_FLIGHT * (2 if qt is not None else 1):
            window.pop(0).block_until_ready()
    dense = d_parts[0] if len(d_parts) == 1 else jnp.concatenate(d_parts, 1)
    sparse = None
    if s_parts:
        sparse = (s_parts[0] if len(s_parts) == 1
                  else jnp.concatenate(s_parts, 1))
    return dense, sparse
