"""Device-resident index segment: struct-of-arrays chunk storage in HBM.

One segment holds up to ``capacity`` chunk rows as:

- ``vecs``  [cap, D]  unit-normalized dense embeddings (bf16 / f32 / int8),
- ``scales``[1, cap]  per-row dequant scales (int8 mode only),
- ``terms`` [S, cap]  top-S BM25 term ids, ``weights`` [S, cap] f32
  (slot-major so the row axis is the TPU lane dimension — see
  ops/sparse_scan.py),
- ``cols``  [NUM_COLS, cap] int32 filter columns (ops/filters.py layout).

Mutation strategy (the reference's Qdrant handles upsert/delete internally;
here it's explicit and XLA-friendly): updates are *donated* scatter programs —
``buf.at[rows].set(vals, mode='drop')`` with the input buffer donated, so XLA
updates HBM in place; batches are padded to power-of-two buckets with
out-of-bounds row ids (dropped by the scatter) so only a handful of programs
ever compile. Deletes are tombstones: ``COL_VALID=0`` rows that the scan
kernels mask in-kernel; freed rows go on a host-side free list and are reused
by later upserts (compaction is implicit through reuse).

Write-through host mirrors: every device array has a full host-RAM twin
(``vecs_np``/``scales_np``/``terms_np``/``weights_np``/``cols_np``), updated
by the same mutations that update HBM. All the data arrives FROM the host
(upserts) so the mirror costs a memcpy, never a transfer — and it makes
spill (``to_host``), cold-tier offload, and compaction **pure host reads**:
no device→host pull ever happens on the serving path, so none of them
stalls searches for transfer time. This is the Qdrant storage split
(RAM/mmap copy behind the in-memory index, reference docker-compose.yml:2-9)
mapped to TPU: HBM holds the scan arrays, host RAM holds the durable twin.
TPU hosts carry multiples of HBM in RAM, so the twin is capacity-free.
"""

from __future__ import annotations

import functools
from typing import Any

import ml_dtypes
import numpy as np
import jax
import jax.numpy as jnp

from voitta_rag_tpu.ops.filters import COL_DOC, COL_VALID, NUM_COLS

# Power-of-two ladder: a batch pads to the next bucket, so padding never
# more than doubles the host→device transfer. (A 256→4096 two-rung ladder
# made the watcher's 512-row upserts ship 8× their bytes through the
# tunnel — measured as the p95 tail of concurrent searches.)
UPDATE_BUCKETS = (256, 512, 1024, 2048, 4096)


def _bucket(n: int) -> int:
    for b in UPDATE_BUCKETS:
        if n <= b:
            return b
    return UPDATE_BUCKETS[-1]


@functools.cache
def _updaters(bucket: int):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def set_rows(buf, rows, vals):
        return buf.at[rows].set(vals, mode="drop")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def set_cols(cols, rows, vals):
        # cols [K, cap] row-minor buffers (filter cols, terms, weights);
        # vals [n, K]
        return cols.at[:, rows].set(vals.T, mode="drop")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def set_scales(scales, rows, vals):
        return scales.at[0, rows].set(vals, mode="drop")

    return set_rows, set_cols, set_scales


class StagedRows:
    """A chunk batch converted + uploaded, ready to scatter into a segment.

    Built by :func:`stage_rows` outside the store lock: the host→device
    transfer (the expensive part on a tunneled TPU — ~13 MB for a padded
    4096-row 768-d batch) completes before the lock is taken, so the
    under-lock work is scatter *dispatch* only. Device arrays are padded to
    the scatter bucket; host copies feed the segment's write-through
    mirrors."""

    __slots__ = ("n", "bucket", "vecs_host", "scales_host", "terms_host",
                 "weights_host", "cols_host", "vecs_dev", "scales_dev",
                 "terms_dev", "weights_dev", "cols_dev")

    def block_until_ready(self) -> "StagedRows":
        jax.block_until_ready(self.cols_dev)
        return self


def stage_rows(dense: np.ndarray, col_rows: np.ndarray, terms: np.ndarray,
               weights: np.ndarray, *, dim: int, sparse_slots: int,
               dtype: str) -> StagedRows:
    """Convert one ≤bucket-sized batch host-side and upload it padded.

    dense [n, D] f32 (unit-norm), col_rows [n, NUM_COLS] int32, terms
    [n, S] int32, weights [n, S] f32. int8 mode quantizes here (host), so
    the upload is 1 byte/element; bfloat16 converts here (ml_dtypes), so
    the upload is 2 bytes/element — the device never sees f32 rows."""
    n = len(dense)
    b = _bucket(n)
    assert n <= b, "stage_rows takes one scatter bucket at most"
    st = StagedRows()
    st.n, st.bucket = n, b

    if dtype == "int8":
        scale = np.abs(dense).max(axis=1) / 127.0
        scale = np.where(scale == 0, 1.0, scale)
        q = np.clip(np.round(dense / scale[:, None]), -127, 127)
        vals = np.zeros((b, dim), np.int8)
        vals[:n] = q
        sv = np.zeros(b, np.float32)
        sv[:n] = scale
        st.vecs_host, st.scales_host = vals[:n], sv[:n]
        st.vecs_dev, st.scales_dev = jnp.asarray(vals), jnp.asarray(sv)
    else:
        np_dt = ml_dtypes.bfloat16 if dtype == "bfloat16" else np.float32
        vals = np.zeros((b, dim), np_dt)
        vals[:n] = dense.astype(np_dt)
        st.vecs_host, st.scales_host = vals[:n], None
        st.vecs_dev, st.scales_dev = jnp.asarray(vals), None

    tv = np.full((b, sparse_slots), -1, np.int32)
    tv[:n] = terms
    wv = np.zeros((b, sparse_slots), np.float32)
    wv[:n] = weights
    cv = np.zeros((b, NUM_COLS), np.int32)
    cv[:n] = col_rows
    st.terms_host, st.weights_host, st.cols_host = tv[:n], wv[:n], cv[:n]
    st.terms_dev = jnp.asarray(tv)
    st.weights_dev = jnp.asarray(wv)
    st.cols_dev = jnp.asarray(cv)
    return st


@functools.cache
def _repackers(bucket: int):
    """Device-side gather-scatter programs for compaction repack: copy
    ``bucket`` rows from a source segment's buffers straight into a
    destination segment's — HBM-to-HBM at memory bandwidth, ZERO bytes
    through the host tunnel (the host-upload rebuild shipped the whole
    corpus back through it). Out-of-range dst rows drop (padding); src
    rows are pre-clamped by the caller."""
    @functools.partial(jax.jit, donate_argnums=(0,))
    def take_rows(dst, src, src_rows, dst_rows):
        return dst.at[dst_rows].set(src[src_rows], mode="drop")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def take_cols(dst, src, src_rows, dst_rows):
        return dst.at[:, dst_rows].set(src[:, src_rows], mode="drop")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def take_scales(dst, src, src_rows, dst_rows):
        return dst.at[0, dst_rows].set(src[0, src_rows], mode="drop")

    return take_rows, take_cols, take_scales


def gather_rows_into(seg: "Segment", dst_rows: np.ndarray,
                     src_vecs, src_scales, src_terms, src_weights,
                     src_rows: np.ndarray) -> None:
    """Copy src rows (device buffers of a sealed segment) into ``seg`` at
    ``dst_rows``, entirely on device. int8 codes copy verbatim — the
    host-upload path's dequantize→requantize round-trip (second-order
    error) disappears."""
    n = len(dst_rows)
    max_b = UPDATE_BUCKETS[-1]
    for s in range(0, n, max_b):
        sc = src_rows[s:s + max_b]
        dc = dst_rows[s:s + max_b]
        b = _bucket(len(sc))
        sr = np.zeros(b, np.int32)
        sr[: len(sc)] = sc
        dr = np.full(b, seg.capacity, np.int32)  # pad -> dropped
        dr[: len(dc)] = dc
        sr_j, dr_j = jnp.asarray(sr), jnp.asarray(dr)
        take_rows, take_cols, take_scales = _repackers(b)
        seg.vecs = take_rows(seg.vecs, src_vecs, sr_j, dr_j)
        if seg.scales is not None:
            seg.scales = take_scales(seg.scales, src_scales, sr_j, dr_j)
        seg.terms = take_cols(seg.terms, src_terms, sr_j, dr_j)
        seg.weights = take_cols(seg.weights, src_weights, sr_j, dr_j)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(1,))
def _tombstone_matching(cols, col_idx: int, match_id):
    hit = cols[col_idx] == match_id
    valid = jnp.where(hit, 0, cols[COL_VALID])
    return cols.at[COL_VALID].set(valid)


@functools.partial(jax.jit, donate_argnums=(0,))
def _tombstone_rows(cols, rows):
    return cols.at[COL_VALID, rows].set(0, mode="drop")


def _bq_dequant_slice(vecs, scales, cols, lo, blk: int, is_int8: bool):
    """Device slice [blk, D] of live rows in f32 (dead rows zeroed)."""
    d = vecs.shape[1]
    v = jax.lax.dynamic_slice(vecs, (lo, 0), (blk, d)).astype(jnp.float32)
    if is_int8:
        sc = jax.lax.dynamic_slice(scales, (0, lo), (1, blk))
        v = v * sc[0][:, None]
    valid = jax.lax.dynamic_slice(
        cols, (COL_VALID, lo), (1, blk))[0] > 0
    return jnp.where(valid[:, None], v, 0.0), valid


@functools.partial(jax.jit, static_argnames=("blk", "is_int8"))
def _bq_moments_block(vecs, scales, cols, lo, s1, s2, n_live, *,
                      blk: int, is_int8: bool):
    """Accumulate sum / sum-of-outer-products / live count for one block
    (device-side; only the final [D] + [D, D] cross to the host)."""
    v, valid = _bq_dequant_slice(vecs, scales, cols, lo, blk, is_int8)
    return (s1 + v.sum(axis=0), s2 + v.T @ v,
            n_live + valid.sum().astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("blk", "bits", "is_int8"))
def _bq_encode_block(vecs, scales, cols, mu, w, lo, *,
                     blk: int, bits: int, is_int8: bool):
    """Whiten + quantize one block on device (ops/bitq encode)."""
    from voitta_rag_tpu.ops.bitq import encode_planes_device

    v, _ = _bq_dequant_slice(vecs, scales, cols, lo, blk, is_int8)
    return encode_planes_device((v - mu) @ w.T, bits=bits)


class Segment:
    """Host handle for one device segment."""

    def __init__(self, capacity: int, dim: int, sparse_slots: int,
                 dtype: str = "bfloat16"):
        assert capacity % 128 == 0, "capacity must be lane-aligned (128)"
        self.capacity = capacity
        self.dim = dim
        self.sparse_slots = sparse_slots
        self.dtype = dtype
        store_dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                    "int8": jnp.int8}[dtype]
        self.np_dtype = {"bfloat16": ml_dtypes.bfloat16,
                         "float32": np.float32, "int8": np.int8}[dtype]
        self.vecs = jnp.zeros((capacity, dim), store_dt)
        self.scales = (jnp.zeros((1, capacity), jnp.float32)
                       if dtype == "int8" else None)
        self.terms = jnp.full((sparse_slots, capacity), -1, jnp.int32)
        self.weights = jnp.zeros((sparse_slots, capacity), jnp.float32)
        self.cols = jnp.zeros((NUM_COLS, capacity), jnp.int32)
        # Write-through host mirrors of every device array (module
        # docstring): spill/offload/compaction read these, never the device.
        self.vecs_np = np.zeros((capacity, dim), self.np_dtype)
        self.scales_np = (np.zeros((1, capacity), np.float32)
                          if dtype == "int8" else None)
        self.weights_np = np.zeros((sparse_slots, capacity), np.float32)
        self.cols_np = np.zeros((NUM_COLS, capacity), np.int32)
        self.valid_np = np.zeros(capacity, bool)
        self.doc_np = self.cols_np[COL_DOC]  # view; writes go through cols_np
        self.terms_np = np.full((capacity, sparse_slots), -1, np.int32)
        self._next = 0
        self._free: list[int] = []
        self._sealed = False  # sealed by an in-flight compaction
        # Cold tier: an offloaded segment keeps the same arrays as numpy in
        # host RAM (beyond-HBM serving; the Qdrant-mmap analogue). Searches
        # stream it through device staging blocks (index/stream_scan.py);
        # it takes no new writes until compaction.
        self._resident = True
        # Optional cold-tier BQ shadow (offload(bq=True)): a device-resident
        # 1-bit sketch + filter cols that replaces the streaming scan with a
        # coarse in-HBM scan + exact host rescore (index/bq_serve.py).
        self.bq_packed = None      # [cap, bits*W] int8 code planes (device)
        self.bq_bits = 0           # bits per dim of the sketch
        self.bq_scales = None      # [1, cap] f32 per-row 1-bit scale (device)
        self.bq_qmat = None        # [D, D] f32 whitening query transform (device)
        self.bq_cols = None        # [NUM_COLS, cap] int32 (device)
        self.host_postings = None  # HostPostings over host sparse arrays

    # -- cold tier ----------------------------------------------------------
    @property
    def resident(self) -> bool:
        return self._resident

    def offload(self, bq: bool = False) -> None:
        """Move this segment's arrays to host RAM, freeing their HBM.

        Pending donated scatters are drained first so the host copy is the
        settled state. bf16 vectors stay bf16 (ml_dtypes numpy).

        With ``bq=True`` (VOITTA_COLD_BQ), a device-resident binary sketch
        stays behind: sign bits (D/8 bytes/row) + per-row scale + the filter
        columns, plus host inverted postings for the sparse side — together
        they serve searches without streaming the full rows back
        (index/bq_serve.py)."""
        if not self._resident:
            return
        jax.block_until_ready(self.cols)
        if bq:
            # WHITENED multi-bit sketch, built ON DEVICE while the segment
            # is still HBM-resident: the moments + the cap x D x D whitening
            # transform are MXU matmuls (milliseconds), where the host
            # equivalent is an O(cap*D^2) f64 GEMM that would stall every
            # search for the tens of seconds offload holds the store lock.
            # Only the [D, D] covariance crosses to the host (for eigh).
            # Row blocks bound the f32 transients to ~blk * D.
            from voitta_rag_tpu.config import get_settings
            from voitta_rag_tpu.index.host_postings import HostPostings
            from voitta_rag_tpu.ops.bitq import whitening_transform

            bits = get_settings().bq_bits  # validated in config
            is_int8 = self.dtype == "int8"
            scales_arg = (self.scales if self.scales is not None
                          else jnp.ones((1, 1), jnp.float32))

            def blocks():
                lo, cap, pref = 0, self.capacity, min(32768, self.capacity)
                while lo < cap:
                    size = min(pref, cap - lo)
                    yield lo, size
                    lo += size

            s1 = jnp.zeros((self.dim,), jnp.float32)
            s2 = jnp.zeros((self.dim, self.dim), jnp.float32)
            n_live_dev = jnp.zeros((), jnp.float32)
            for lo, size in blocks():
                s1, s2, n_live_dev = _bq_moments_block(
                    self.vecs, scales_arg, self.cols, lo, s1, s2,
                    n_live_dev, blk=size, is_int8=is_int8)
            n_live = max(float(n_live_dev), 1.0)
            mu_np = np.asarray(s1, np.float64) / n_live
            cov = (np.asarray(s2, np.float64) / n_live
                   - np.outer(mu_np, mu_np))
            w_mat, a_mat = whitening_transform(cov)
            mu_dev = jnp.asarray(mu_np.astype(np.float32))
            w_dev = jnp.asarray(w_mat)

            parts = []
            for lo, size in blocks():
                parts.append(_bq_encode_block(
                    self.vecs, scales_arg, self.cols, mu_dev, w_dev, lo,
                    blk=size, bits=bits, is_int8=is_int8))
            if len(parts) == 1:
                packed, scales_bq = parts[0]
            else:
                packed = jnp.concatenate([p for p, _ in parts], axis=0)
                scales_bq = jnp.concatenate([s for _, s in parts], axis=1)
            self.bq_packed = packed
            self.bq_scales = scales_bq
            self.bq_bits = bits
            self.bq_qmat = jnp.asarray(a_mat)  # [D, D]; query transform
            self.bq_cols = self.cols  # device copy stays for the scan
            jax.block_until_ready(self.bq_packed)
        # Adopt the write-through host mirrors as primary storage: offload
        # frees HBM by DROPPING the device refs — zero device→host transfer
        # (the mirrors already hold the settled state; the
        # block_until_ready above drained pending scatters).
        self.vecs = self.vecs_np
        if self.scales is not None:
            self.scales = self.scales_np
        self.terms = np.ascontiguousarray(self.terms_np.T)
        self.weights = self.weights_np
        self.cols = self.cols_np
        if bq:
            from voitta_rag_tpu.index.host_postings import HostPostings

            self.host_postings = HostPostings(self.terms, self.weights)
        self._resident = False

    def ensure_resident(self) -> None:
        """Bring an offloaded segment back into HBM (compaction/rebuild).

        Uploads from the host mirrors (which carried any tombstones applied
        while cold — offload made them the primary storage)."""
        if self._resident:
            return
        self.vecs = jnp.asarray(self.vecs_np)
        if self.scales is not None:
            self.scales = jnp.asarray(self.scales_np)
        self.terms = jnp.asarray(np.ascontiguousarray(self.terms_np.T))
        self.weights = jnp.asarray(self.weights_np)
        self.cols = jnp.asarray(self.cols_np)
        self.bq_packed = self.bq_scales = self.bq_cols = None
        self.bq_qmat = None
        self.host_postings = None
        self._resident = True

    # -- allocation ---------------------------------------------------------
    @property
    def live_count(self) -> int:
        return int(self.valid_np.sum())

    def seal(self) -> None:
        """Stop accepting new rows (tombstones still apply).

        Compaction seals the segments it snapshotted so concurrent upserts
        land in FRESH segments (whose rows carry over untouched) — the
        snapshot→rebuild mapping stays stable while the rebuild runs
        outside the store lock."""
        self._sealed = True

    def unseal(self) -> None:
        self._sealed = False

    def rows_available(self) -> int:
        if not self._resident or self._sealed:
            return 0  # cold/sealed segments take no new writes
        return (self.capacity - self._next) + len(self._free)

    def allocate(self, n: int) -> np.ndarray:
        """Allocate n rows (freed rows first, then the tail)."""
        assert n <= self.rows_available()
        rows = []
        while self._free and len(rows) < n:
            rows.append(self._free.pop())
        tail = n - len(rows)
        if tail:
            rows.extend(range(self._next, self._next + tail))
            self._next += tail
        return np.asarray(rows, np.int32)

    # -- mutation -----------------------------------------------------------
    def write_rows(
        self,
        rows: np.ndarray,
        dense: np.ndarray,
        col_rows: np.ndarray,
        terms: np.ndarray,
        weights: np.ndarray,
    ) -> None:
        """Write n chunk rows. dense [n, D] f32 (unit-norm), col_rows
        [n, NUM_COLS] int32, terms [n, S] int32, weights [n, S] f32.

        Batches larger than the biggest scatter bucket are split here so
        every caller (bulk upsert, compaction) can pass arbitrary sizes.
        """
        assert self._resident, "write_rows on an offloaded (cold) segment"
        n = len(rows)
        max_b = UPDATE_BUCKETS[-1]
        if n > max_b:
            for s in range(0, n, max_b):
                e = min(s + max_b, n)
                self.write_rows(rows[s:e], dense[s:e], col_rows[s:e],
                                terms[s:e], weights[s:e])
            return
        self.write_staged(rows, stage_rows(
            dense, col_rows, terms, weights, dim=self.dim,
            sparse_slots=self.sparse_slots, dtype=self.dtype))

    def write_staged(self, rows: np.ndarray, staged: "StagedRows",
                     offset: int = 0) -> None:
        """Scatter ``len(rows)`` staged rows (``staged`` rows
        [offset, offset+len(rows))) into this segment.

        The staged device arrays were uploaded (and host-converted) by
        :func:`stage_rows` — OUTSIDE the store lock — so the critical
        section here is scatter dispatch + host-mirror memcpy, never a
        host→device transfer. The full staged batch is passed to every
        scatter with non-selected positions mapped to an out-of-range row
        (dropped), so a batch split across segments reuses the same staged
        buffers with no reslicing."""
        assert self._resident, "write_staged on an offloaded (cold) segment"
        n = len(rows)
        b = staged.bucket
        assert offset + n <= b
        # Pad with out-of-range rows -> dropped by scatter mode='drop'.
        rows_p = np.full(b, self.capacity, np.int32)
        rows_p[offset:offset + n] = rows
        set_rows, set_cols, set_scales = _updaters(b)

        self.vecs = set_rows(self.vecs, rows_p, staged.vecs_dev)
        if self.dtype == "int8":
            self.scales = set_scales(self.scales, rows_p, staged.scales_dev)
        self.terms = set_cols(self.terms, rows_p, staged.terms_dev)
        self.weights = set_cols(self.weights, rows_p, staged.weights_dev)
        self.cols = set_cols(self.cols, rows_p, staged.cols_dev)

        sl = slice(offset, offset + n)
        self.vecs_np[rows] = staged.vecs_host[sl]
        if self.scales_np is not None:
            self.scales_np[0, rows] = staged.scales_host[sl]
        self.weights_np[:, rows] = staged.weights_host[sl].T
        self.cols_np[:, rows] = staged.cols_host[sl].T
        self.valid_np[rows] = staged.cols_host[sl, COL_VALID] > 0
        self.terms_np[rows] = staged.terms_host[sl]

    def tombstone_rows(self, rows: np.ndarray, free: bool = True) -> None:
        """Invalidate rows. ``free=False`` defers the free-list release
        (see :meth:`release_rows`): the store's 3-phase delete must not
        let an upsert reuse a row before its payload row is deleted."""
        if len(rows) == 0:
            return
        if not self._resident:
            self.cols[COL_VALID, rows] = 0
            self.valid_np[rows] = False
            self._bq_tombstone(rows)
            # No free-list reuse while cold: the segment takes no writes.
            return
        max_b = UPDATE_BUCKETS[-1]
        for s in range(0, len(rows), max_b):  # split over scatter buckets
            chunk = rows[s:s + max_b]
            b = _bucket(len(chunk))
            rows_p = np.full(b, self.capacity, np.int32)
            rows_p[: len(chunk)] = chunk
            self.cols = _tombstone_rows(self.cols, jnp.asarray(rows_p))
        self.cols_np[COL_VALID, rows] = 0
        self.valid_np[rows] = False
        if free:
            self._free.extend(int(r) for r in rows)

    def release_rows(self, rows: np.ndarray) -> None:
        """Put deferred-freed tombstoned rows on the free list (the second
        locked phase of the store's 3-phase delete)."""
        if not self._resident:
            return
        self._free.extend(int(r) for r in rows)

    def _bq_tombstone(self, rows: np.ndarray) -> None:
        """Mirror cold tombstones into the device BQ-shadow filter cols."""
        if self.bq_cols is None or len(rows) == 0:
            return
        max_b = UPDATE_BUCKETS[-1]
        for s in range(0, len(rows), max_b):
            chunk = rows[s:s + max_b]
            b = _bucket(len(chunk))
            rows_p = np.full(b, self.capacity, np.int32)
            rows_p[: len(chunk)] = chunk
            self.bq_cols = _tombstone_rows(self.bq_cols, jnp.asarray(rows_p))

    def tombstone_matching(self, col_idx: int, match_id: int) -> np.ndarray:
        """Tombstone all rows whose cols[col_idx] == match_id; returns rows."""
        # cols_np mirror: no device pull for ANY column.
        rows = np.nonzero(self.valid_np
                          & (self.cols_np[col_idx] == match_id))[0]
        if len(rows) == 0:
            return rows.astype(np.int32)
        if not self._resident:
            self.cols[COL_VALID, rows] = 0
            self.valid_np[rows] = False
            self._bq_tombstone(rows)
            return rows.astype(np.int32)
        self.cols = _tombstone_matching(self.cols, col_idx, match_id)
        self.cols_np[COL_VALID, rows] = 0
        self.valid_np[rows] = False
        self._free.extend(int(r) for r in rows)
        return rows.astype(np.int32)

    # -- persistence --------------------------------------------------------
    def to_host(self) -> dict[str, Any]:
        """Snapshot this segment as host arrays — PURE HOST READS.

        Reads the write-through mirrors, never the device: spill and
        compaction cost memcpy, not a device→host transfer under the store
        lock. Arrays are COPIED because save() compresses them outside the
        lock while mutations keep landing in the mirrors — the snapshot
        must stay consistent-at-capture."""
        out = {
            "capacity": self.capacity, "dim": self.dim,
            "sparse_slots": self.sparse_slots, "dtype": self.dtype,
            "next": self._next, "free": np.asarray(self._free, np.int32),
            # bf16 spills as f32 (npz has no bf16); int8/f32 spill as-is.
            "vecs": self.vecs_np.astype(np.float32)
            if self.dtype == "bfloat16" else self.vecs_np.copy(),
            "terms": np.ascontiguousarray(self.terms_np.T),  # [S, cap]
            "weights": self.weights_np.copy(),
            "cols": self.cols_np.copy(),
        }
        if self.scales_np is not None:
            out["scales"] = self.scales_np.copy()
        return out

    @classmethod
    def from_host(cls, data: dict[str, Any]) -> "Segment":
        seg = cls(int(data["capacity"]), int(data["dim"]),
                  int(data["sparse_slots"]), str(data["dtype"]))
        store_dt = seg.vecs.dtype
        seg.vecs = jnp.asarray(data["vecs"], store_dt)
        terms = np.asarray(data["terms"])
        weights = np.asarray(data["weights"])
        if terms.shape[0] == seg.capacity != seg.sparse_slots:
            # Legacy row-major [cap, S] snapshot: migrate to slot-major.
            terms, weights = terms.T, weights.T
        seg.terms = jnp.asarray(np.ascontiguousarray(terms))
        seg.weights = jnp.asarray(np.ascontiguousarray(weights))
        seg.cols = jnp.asarray(data["cols"])
        if "scales" in data and seg.scales is not None:
            seg.scales = jnp.asarray(data["scales"])
        seg._next = int(data["next"])
        seg._free = [int(x) for x in data["free"]]
        # Rebuild the write-through host mirrors (doc_np stays the cols_np
        # view set by __init__ — it must alias, not copy).
        seg.vecs_np[:] = np.asarray(data["vecs"]).astype(seg.np_dtype)
        if seg.scales_np is not None and "scales" in data:
            seg.scales_np[:] = np.asarray(data["scales"])
        seg.weights_np[:] = weights
        seg.cols_np[:] = np.asarray(data["cols"], np.int32)
        seg.valid_np = seg.cols_np[COL_VALID] > 0
        seg.terms_np = np.ascontiguousarray(terms.T)  # host mirror: [cap, S]
        return seg
