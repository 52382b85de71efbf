"""Host-RAM inverted postings for cold segments' sparse (BM25) side.

When a segment is offloaded beyond HBM (index/segment.py cold tier), its
slot-major sparse arrays live in host memory. Streaming them through device
staging blocks moves S*8 bytes per row over PCIe per query — the sparse side
then dominates the cold scan. But sparse queries are *sparse*: a query
touches only its ~dozen terms' posting lists. On the host that is a handful
of vectorized gathers — microseconds, no transfer at all.

This is the host twin of :class:`voitta_rag_tpu.index.postings.SparsePostings`
(the device snapshot), exact rather than impact-truncated: host gathers are
cheap enough that no ``max_postings`` cap is needed, so scores match
``ops.sparse_scan.sparse_scan_scores`` bit-for-bit in f32.

Build cost is one argsort of the segment's (term, row, weight) triples —
done once at offload time, O(S * cap log) on the host.
"""

from __future__ import annotations

import numpy as np

from voitta_rag_tpu.ops.sparse_scan import TERM_PAD


class HostPostings:
    """Exact inverted postings over one segment's host sparse arrays."""

    def __init__(self, terms: np.ndarray, weights: np.ndarray):
        """``terms`` int32 [S, cap] (TERM_PAD in empty slots),
        ``weights`` f32 [S, cap] — the segment's slot-major host arrays."""
        s, cap = terms.shape
        self.capacity = cap
        flat_t = np.ascontiguousarray(terms).reshape(-1)
        flat_w = np.asarray(weights, np.float32).reshape(-1)
        rows = np.tile(np.arange(cap, dtype=np.int32), s)
        keep = flat_t != TERM_PAD
        flat_t, flat_w, rows = flat_t[keep], flat_w[keep], rows[keep]
        order = np.argsort(flat_t, kind="stable")
        self._terms = flat_t[order]
        self._rows = rows[order]
        self._weights = flat_w[order]

    def scores(self, q_terms: np.ndarray, q_weights: np.ndarray) -> np.ndarray:
        """Dense [cap] f32 accumulation: sum of qw * doc_weight per row.

        Matches sparse_scan_scores' unmasked values (0 for rows matching no
        query term). Filters/masking are the caller's job
        (ops.filters.eval_mask_host)."""
        qt = np.asarray(q_terms).reshape(-1)
        qw = np.asarray(q_weights, np.float32).reshape(-1)
        rows_parts, val_parts = [], []
        for t, w in zip(qt, qw):
            if t == TERM_PAD:
                continue
            lo = np.searchsorted(self._terms, t, side="left")
            hi = np.searchsorted(self._terms, t, side="right")
            if lo == hi:
                continue
            rows_parts.append(self._rows[lo:hi])
            val_parts.append(w * self._weights[lo:hi])
        if not rows_parts:
            return np.zeros(self.capacity, np.float32)
        # One buffered accumulation over all runs — np.add.at (the
        # unbuffered ufunc path) is ~10-30x slower on the long posting runs
        # of frequent terms.
        return np.bincount(
            np.concatenate(rows_parts),
            weights=np.concatenate(val_parts),
            minlength=self.capacity).astype(np.float32)

    def nbytes(self) -> int:
        return self._terms.nbytes + self._rows.nbytes + self._weights.nbytes
