"""IVF probing over cold-tier BQ sketches — the composed 100M-scale path.

The three scale mechanisms this framework replaces Qdrant with — IVF cell
probing (index/ivf.py), beyond-HBM cold segments (index/segment.py offload),
and quantized sketch serving (index/bq_serve.py) — compose here into ONE
query path, mirroring how the reference's engine composes mmap storage +
ANN graph + quantized rescore in a single store
(/root/reference/src/voitta/services/vector_store.py:88-115,
docker-compose.yml:2-9):

    probe:   q @ centroids.T -> top-nprobe cells        (tiny MXU matmul)
    coarse:  gather the probed cells' PACKED BIT-PLANES from the cell-major
             sketch in HBM -> multi-bit coarse scan (ops/bitq.py kernel) over
             nprobe*cell_cap rows instead of the whole segment
    select:  top-K' candidate rows (exact or approx; VOITTA_BQ_SELECT)
    rescore: exact f32 dot against the HOST rows of only those candidates
             (ops/rerank.py) — the segment's full vectors never re-enter HBM

Why this is the 100M architecture: a flat BQ coarse scan is O(N) HBM reads
per query (~300 ms at 100M rows); probing cuts it to O(nprobe * cell_cap)
(milliseconds), while the sketch (292 B/row at 768-d/2-bit incl. cols)
keeps ~100M rows/chip shadow-resident on a 16 GB part. The exact tier stays
in host RAM. Per-segment whitening is preserved: each cold segment's shadow
is probed with the segment's own transformed query (seg.bq_qmat), while the
CELL probe runs in the original embedding space against shared centroids —
coarse cell geometry and sketch quantization are independent concerns.

Layout: per segment, ``packed3 [C, cell_cap, bits*W] int8`` cell-major bit
planes (gathered cells reshape straight into the flat layout
ops/bitq.py::bitq_scan_scores expects — no bit repacking at query time),
plus ``cols3/row3/scales3`` and a flat always-scanned residual for cell
overflow, exactly like index/ivf.py's exact-tier layout. Capacity spilling,
margin-gated boundary replicas, and batch cell-dedup are inherited from the
exact IVF's measured design (ivf.py docstrings).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from voitta_rag_tpu.ops.bitq import bitq_scan_scores
from voitta_rag_tpu.ops.filters import COL_VALID, NUM_COLS, FilterSpec
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, round_up
from voitta_rag_tpu.ops.topk import dedup_candidates, masked_topk

TRAIN_SAMPLE = 262144
ASSIGN_BLOCK = 32768


@functools.partial(jax.jit, static_argnames=("k",))
def _assign_block(v: jax.Array, centroids: jax.Array, k: int):
    """Top-k cell assignment of one uploaded f32 block [blk, D]."""
    sims = v @ centroids.T
    if k == 1:
        idx = jnp.argmax(sims, axis=1).astype(jnp.int32)[:, None]
        return idx, jnp.take_along_axis(sims, idx, axis=1)
    top, idx = jax.lax.top_k(sims, k)
    return idx.astype(jnp.int32), top


def _host_rows_f32(seg, rows: np.ndarray) -> np.ndarray:
    """f32 host rows of an OFFLOADED segment (int8 dequantized)."""
    v = np.asarray(seg.vecs[rows], np.float32)
    if seg.dtype == "int8" and seg.scales is not None:
        v = v * np.asarray(seg.scales, np.float32)[0][rows][:, None]
    return v


@dataclass
class BqIvfShadow:
    """Cell-major IVF layout over ONE cold segment's sketch (device)."""

    bits: int
    assign_k: int
    qmat: jax.Array | None  # [D, D] whitening query transform (seg.bq_qmat)
    packed3: jax.Array      # [C, cell_cap, bits*W] int8
    cols3: jax.Array        # [C, NUM_COLS, cell_cap] int32
    row3: jax.Array         # [C, cell_cap] int32 segment-local row, -1 empty
    scales3: jax.Array      # [C, 1, cell_cap] f32
    rest_packed: jax.Array  # [R, bits*W]
    rest_cols: jax.Array    # [NUM_COLS, R]
    rest_row: jax.Array     # [R] int32, -1 pad
    rest_scales: jax.Array  # [1, R] f32

    @property
    def n_cells(self) -> int:
        return self.packed3.shape[0]

    @property
    def cell_cap(self) -> int:
        return self.packed3.shape[1]

    def nbytes_device(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in (self.packed3, self.cols3, self.row3,
                             self.scales3, self.rest_packed, self.rest_cols,
                             self.rest_row, self.rest_scales))


class ColdIvf:
    """Shared centroids + per-cold-segment sketch shadows for one store."""

    def __init__(self, centroids: jax.Array,
                 shadows: dict[int, BqIvfShadow]):
        self.centroids = centroids          # [C, D] f32, original space
        self.shadows = shadows              # seg index -> shadow

    @property
    def n_cells(self) -> int:
        return self.centroids.shape[0]

    @classmethod
    def build(cls, segments, n_cells: int, *, kmeans_iters: int = 25,
              assign_k: int = 1, assign_margin: float | None = None,
              skew_factor: float = 2.0, spill_levels: int = 2,
              seed: int = 0) -> "ColdIvf":
        """Build from a store's segment list (cold ones get shadows).

        Centroids are trained ONCE in the original embedding space on a
        sample drawn across all cold segments' host rows; each segment's
        sketch is then permuted cell-major on device (the packed planes
        never leave HBM — only row-index permutations cross the host
        boundary, as in index/ivf.py's exact build).
        """
        from voitta_rag_tpu.index.ivf import _kmeans_train

        cold = [(i, s) for i, s in enumerate(segments) if not s.resident]
        if not cold:
            raise ValueError("no cold segments to build a cold IVF over")
        for i, s in cold:
            if s.bq_packed is None:
                raise ValueError(
                    f"cold segment {i} has no BQ shadow; the composed "
                    "IVF x BQ path needs VOITTA_COLD_BQ=true offloads "
                    "(streaming-only cold segments stay flat-scanned)")

        # Proportional host-side sample across cold segments.
        live = [(i, np.nonzero(s.valid_np)[0]) for i, s in cold]
        total = sum(len(r) for _, r in live)
        if total < max(n_cells, 256):
            raise ValueError(
                f"need >= max(n_cells, 256) cold rows for IVF "
                f"(have {total}, n_cells={n_cells})")
        ns = min(total, max(TRAIN_SAMPLE, n_cells * 4))
        rng = np.random.default_rng(seed)
        parts = []
        for (i, s), (_, rows) in zip(cold, live):
            take = max(1, int(round(ns * len(rows) / total)))
            sel = rows if take >= len(rows) else np.sort(
                rng.choice(rows, take, replace=False))
            parts.append(_host_rows_f32(s, sel))
        sample = jnp.asarray(np.concatenate(parts))
        n_blocks = max(1, sample.shape[0] // ASSIGN_BLOCK)
        centroids = _kmeans_train(sample, None, n_cells, kmeans_iters,
                                  n_blocks, seed)
        jax.block_until_ready(centroids)

        shadows = {
            i: build_shadow(s, centroids, assign_k=assign_k,
                            assign_margin=assign_margin,
                            skew_factor=skew_factor,
                            spill_levels=spill_levels)
            for i, s in cold
        }
        return cls(centroids, shadows)

    def coarse_candidates(self, q: jax.Array, seg_index: int,
                          spec: FilterSpec, *, k_prime: int, nprobe: int,
                          select: str = "exact",
                          use_pallas: bool = True) -> jax.Array:
        """Phase 1 (device, async): probe + coarse + select for one segment.

        Returns [B, K'] segment-local candidate rows WITHOUT a host sync —
        callers enqueue every cold segment's phase 1 before the first
        np.asarray, exactly like index/bq_serve.py's flat flow.
        """
        sh = self.shadows[seg_index]
        qmat = (sh.qmat if sh.qmat is not None
                else jnp.eye(q.shape[-1], dtype=jnp.float32))
        return _bq_ivf_candidates(
            q, self.centroids, qmat, sh.packed3, sh.cols3, sh.row3,
            sh.scales3, sh.rest_packed, sh.rest_cols, sh.rest_row,
            sh.rest_scales, spec, nprobe=min(nprobe, self.n_cells),
            k_prime=k_prime, bits=sh.bits, assign_k=sh.assign_k,
            select=select, use_pallas=use_pallas)


def build_shadow(seg, centroids: jax.Array, *, assign_k: int = 1,
                 assign_margin: float | None = None,
                 skew_factor: float = 2.0,
                 spill_levels: int = 2) -> BqIvfShadow:
    """Cell-major permutation of one cold segment's packed sketch.

    Assignment streams the segment's HOST rows to the device in blocks
    (f32 block in, [blk, k] indices out); the permutation itself is host
    int arithmetic (index/ivf.py::pack_permutation — same spilling +
    margin-replica policy as the exact tier); the gather of packed planes,
    filter cols, and scales runs on device over the HBM-resident shadow.
    """
    from voitta_rag_tpu.index.ivf import pack_permutation

    assert seg.bq_packed is not None and not seg.resident
    n_cells = int(centroids.shape[0])
    rows_live = np.nonzero(seg.valid_np)[0].astype(np.int32)
    n = len(rows_live)
    assert n > 0, "empty segment"

    k_all = min(max(assign_k, 1 + max(spill_levels, 0)), n_cells)
    idx_parts, sim_parts = [], []
    for lo in range(0, n, ASSIGN_BLOCK):
        blk = rows_live[lo:lo + ASSIGN_BLOCK]
        idx, sims = _assign_block(jnp.asarray(_host_rows_f32(seg, blk)),
                                  centroids, k_all)
        idx_parts.append(np.asarray(idx))
        sim_parts.append(np.asarray(sims))
    assign_all = np.concatenate(idx_parts)          # [n, k_all]
    sims = np.concatenate(sim_parts)

    assign = np.ascontiguousarray(assign_all[:, :assign_k])
    if assign_k > 1 and assign_margin is not None:
        gate = sims[:, 1:assign_k] >= (sims[:, :1] - assign_margin)
        assign[:, 1:] = np.where(gate, assign[:, 1:], -1)
    spill = None
    if spill_levels > 0 and k_all > 1:
        margin = assign_margin if assign_margin is not None else 0.05
        spill = np.ascontiguousarray(assign_all[:, 1:1 + spill_levels])
        sgate = sims[:, 1:1 + spill_levels] >= (sims[:, :1] - margin)
        spill = np.where(sgate, spill, -1)

    n_replicas = (int((assign[:, 1:] >= 0).sum()) if assign_k > 1 else 0)
    cell_cap = round_up(max(int(skew_factor * (n + n_replicas) / n_cells),
                            128), 128)
    src, dest, _prio, rest_src = pack_permutation(assign, n_cells, cell_cap,
                                                  spill)

    perm = np.full(n_cells * cell_cap, -1, np.int32)
    perm[dest] = rows_live[src]
    rest_rows = rows_live[rest_src]
    r_pad = round_up(max(len(rest_rows), 128), 128)
    rest = np.full(r_pad, -1, np.int32)
    rest[:len(rest_rows)] = rest_rows

    sh = _gather_shadow(seg.bq_packed, seg.bq_cols, seg.bq_scales,
                        jnp.asarray(perm), jnp.asarray(rest),
                        n_cells=n_cells, cell_cap=cell_cap,
                        bits=max(1, seg.bq_bits), assign_k=assign_k)
    sh.qmat = getattr(seg, "bq_qmat", None)
    return sh


def _gather_shadow(packed, cols, scales, perm, rest, *, n_cells: int,
                   cell_cap: int, bits: int, assign_k: int) -> BqIvfShadow:
    """Device gather of the permuted sketch (one jittable round)."""
    pw = packed.shape[1]
    safe = jnp.maximum(perm, 0)
    packed3 = jnp.take(packed, safe, axis=0).reshape(n_cells, cell_cap, pw)
    cols_g = jnp.take(cols, safe, axis=1)               # [NUM_COLS, C*cap]
    cols_g = cols_g.at[COL_VALID].set(
        jnp.where(perm >= 0, cols_g[COL_VALID], 0))
    cols3 = cols_g.reshape(NUM_COLS, n_cells, cell_cap).transpose(1, 0, 2)
    scales3 = jnp.take(scales[0], safe).reshape(n_cells, 1, cell_cap)
    row3 = perm.reshape(n_cells, cell_cap)

    safe_r = jnp.maximum(rest, 0)
    rest_packed = jnp.take(packed, safe_r, axis=0)
    rest_cols = jnp.take(cols, safe_r, axis=1)
    rest_cols = rest_cols.at[COL_VALID].set(
        jnp.where(rest >= 0, rest_cols[COL_VALID], 0))
    rest_scales = jnp.take(scales[0], safe_r).reshape(1, -1)
    out = BqIvfShadow(bits=bits, assign_k=assign_k, qmat=None,
                      packed3=packed3, cols3=cols3, row3=row3,
                      scales3=scales3, rest_packed=rest_packed,
                      rest_cols=rest_cols, rest_row=rest,
                      rest_scales=rest_scales)
    jax.block_until_ready(packed3)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "k_prime", "bits", "assign_k", "select",
                     "use_pallas"))
def _bq_ivf_candidates(q, centroids, qmat, packed3, cols3, row3, scales3,
                       rest_packed, rest_cols, rest_row, rest_scales,
                       spec: FilterSpec, *, nprobe: int, k_prime: int,
                       bits: int, assign_k: int, select: str,
                       use_pallas: bool):
    """Jit wrapper over :func:`bq_ivf_select` returning candidate rows only
    (the flat store path rescores and therefore never needs coarse values).
    """
    _, cand = bq_ivf_select(
        q, centroids, qmat, packed3, cols3, row3, scales3, rest_packed,
        rest_cols, rest_row, rest_scales, spec, nprobe=nprobe,
        k_prime=k_prime, bits=bits, assign_k=assign_k, select=select,
        use_pallas=use_pallas)
    return cand


def bq_ivf_select(q, centroids, qmat, packed3, cols3, row3, scales3,
                  rest_packed, rest_cols, rest_row, rest_scales,
                  spec: FilterSpec, *, nprobe: int, k_prime: int,
                  bits: int, assign_k: int, select: str,
                  use_pallas: bool, q_coarse=None):
    """Probe -> gather -> coarse scan -> select, as one traceable body.

    Pure (un-jitted) so the mesh-sharded cold tier can inline it per chip
    under ``shard_map`` (parallel/sharded_cold.py) — there the coarse VALUES
    are needed too, for the hierarchical candidate cut before the DCN hop,
    and the whitened query ``q_coarse`` arrives pre-transformed (shared
    mesh-wide whitening; ``qmat`` is then None).
    Returns ``(vals [B, k_prime] f32, cand [B, k_prime] int32)`` with
    segment-local candidate rows (-1 invalid).

    The gathered cells reshape DIRECTLY into bitq_scan_scores's flat
    [T, bits*W] layout (cell-major storage is chosen for exactly this), so
    the coarse kernel is byte-identical to the flat sketch scan — only its
    row count shrinks from the segment capacity to nprobe * cell_cap.
    Batch cell-dedup mirrors index/ivf.py::_ivf_search_scores: each unique
    probed cell is gathered and scored once for the whole batch.
    """
    B = q.shape[0]
    C, cap2, pw = packed3.shape
    qf = q.astype(jnp.float32)
    # Cell probe in the ORIGINAL embedding space; coarse scan with the
    # segment's whitened query (ops/bitq.py asymmetric-estimate contract).
    if q_coarse is None:
        q_coarse = qf @ qmat.T

    cell_sims = qf @ centroids.T                              # [B, C]
    _, cells = jax.lax.top_k(cell_sims, nprobe)               # [B, nprobe]
    U = min(B * nprobe, C)
    flat = jnp.sort(cells.reshape(-1))
    first = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    slot = jnp.where(first, jnp.cumsum(first) - 1, U)
    ucells = (jnp.full((U + 1,), C, jnp.int32)
              .at[slot].set(flat.astype(jnp.int32), mode="drop")[:U])
    pad = ucells == C
    ucells = jnp.where(pad, 0, ucells)

    packed_u = jnp.take(packed3, ucells, axis=0).reshape(U * cap2, pw)
    cols_u = (jnp.take(cols3, ucells, axis=0)
              .transpose(1, 0, 2).reshape(NUM_COLS, U * cap2))
    scales_u = jnp.take(scales3, ucells, axis=0).reshape(1, U * cap2)
    rows_u = jnp.take(row3, ucells, axis=0)                   # [U, cap2]

    probe = bitq_scan_scores(q_coarse, packed_u, scales_u, cols_u, spec,
                             bits=bits, use_pallas=use_pallas)  # [B, U*cap2]
    member = jnp.any(
        ucells[None, :, None] == cells[:, None, :], axis=-1) & ~pad[None, :]
    valid = member[:, :, None] & (rows_u[None, :, :] >= 0)
    probe = jnp.where(valid.reshape(B, -1), probe, NEG_INF)

    rest = bitq_scan_scores(q_coarse, rest_packed, rest_scales, rest_cols,
                            spec, bits=bits, use_pallas=use_pallas)  # [B, R]
    rest = jnp.where(rest_row[None, :] >= 0, rest, NEG_INF)

    scores = jnp.concatenate([probe, rest], axis=1)
    rows_vec = jnp.concatenate([rows_u.reshape(-1), rest_row])

    k = min(k_prime * max(assign_k, 1) + (8 if assign_k > 1 else 0),
            scores.shape[-1])
    vals, pos = masked_topk(
        scores, k, approx=(select == "approx" and scores.shape[-1] > (1 << 16)))
    cand = jnp.where(pos >= 0, jnp.take(rows_vec, jnp.maximum(pos, 0)),
                     -1).astype(jnp.int32)
    if assign_k > 1:
        vals, cand = dedup_candidates(vals, cand)
    return vals[:, :k_prime], cand[:, :k_prime]
