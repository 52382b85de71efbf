"""Beyond-HBM cold tier for the mesh-sharded index (the 100M architecture).

Composes all three scale mechanisms over a device mesh — the last leg of the
composition the single store already has (index/ivf_bq.py): per-chip IVF
probing x quantized coarse sketches x host-RAM exact rows, merged over ICI.
The reference serves its 100M configs by pointing Qdrant (mmap storage + HNSW
+ binary-quantized rescore, one composed engine) at bigger disks
(/root/reference/src/voitta/services/vector_store.py:88-115,
docker-compose.yml:2-9); this is the TPU-pod-shaped equivalent:

  device (per chip, sharded ``[n_shards, ...]`` on the mesh's shard axis):
      packed multi-bit sketch planes (ops/bitq.py — 292 B/row at 768-d/2-bit
      vs 772 B/row int8), per-row quantizer steps, filter columns. Optionally
      a cell-major IVF permutation of the sketch (probe instead of scan).
  host:   exact rows (original dtype), sparse inverted postings
      (index/host_postings.py), filter-column mirror.

  query:  q' = A q (shared whitening, one [D, D] matvec)
          -> shard_map: per-chip coarse scan (flat sketch, or probed cells of
             the cell-major sketch) -> local top-K' candidate gids
          -> all-gather the (coarse val, gid) pairs over ICI (+ a re-cut DCN
             hop on a pod mesh — parallel/sharded.py::_gather_pairs)
          -> host: exact f32 rescore of the gathered union against the host
             rows (ops/rerank.py::rerank_exact_host — gathers only B*K rows)
          -> sparse candidates from per-shard host postings
          -> hybrid fusion in candidate space (ops/fusion.py)

Whitening is SHARED across shards (one mesh-wide moment pass, psum'd by
GSPMD), unlike the per-segment whitening of the flat cold tier: shards are a
uniform random partition of one corpus, so their row distributions are
identical and a single transform loses nothing — while letting every chip
probe with the same transformed query (no per-shard query matmuls).

Approximation contract (same as index/bq_serve.py): a cold shard contributes
its coarse-top-K' candidates, exactly rescored; the union over shards is a
superset of what a single device with the same sketch would keep, so sharding
can only help recall. On a pod mesh the slice-level cut ranks by COARSE
values (the exact values don't exist until the host rescore); the cut keeps
``K'`` of ``shards_per_slice * K'`` candidates, the same oversampled pool a
single-slice mesh rescores.

Measured knobs inherit the flat cold tier's (config.py): VOITTA_BQ_BITS,
VOITTA_BQ_OVERSAMPLE, VOITTA_BQ_SELECT.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voitta_rag_tpu.index.host_postings import HostPostings
from voitta_rag_tpu.ops.bitq import (
    encode_planes_device, bitq_scan_scores, whitening_transform,
)
from voitta_rag_tpu.ops.filters import (
    COL_VALID, NUM_COLS, FilterSpec, eval_mask_host,
)
from voitta_rag_tpu.ops.fusion import (
    hybrid_fuse_candidates, _candidates_from_lists,
)
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, round_up
from voitta_rag_tpu.ops.rerank import rerank_exact_host
from voitta_rag_tpu.ops.topk import VALID_THRESHOLD, masked_topk
from voitta_rag_tpu.parallel.mesh import REPLICA_AXIS
from voitta_rag_tpu.parallel.sharded import (
    _gather_pairs, _global_shard, _index_spec,
)

MOMENT_BLOCK = 32768


@dataclass
class ColdShardedIvf:
    """Cell-major IVF permutation of the per-chip sketches (device).

    The sharded twin of index/ivf_bq.py::BqIvfShadow: one shared centroid
    set (replicated — every chip probes the SAME cells, no communication),
    per-chip cell blocks stacked ``[n_shards, ...]`` and sharded on axis 0.
    ``row3``/``rest_row`` hold shard-LOCAL rows; the search body offsets
    them to store-global gids with the chip's shard index.
    """

    centroids: jax.Array    # [C, D] f32 replicated, original space
    packed3: jax.Array      # [n, C, cell_cap, bits*W] int8 sharded
    cols3: jax.Array        # [n, C, NUM_COLS, cell_cap] int32
    row3: jax.Array         # [n, C, cell_cap] int32 local rows, -1 empty
    scales3: jax.Array      # [n, C, 1, cell_cap] f32
    rest_packed: jax.Array  # [n, R, bits*W]
    rest_cols: jax.Array    # [n, NUM_COLS, R]
    rest_row: jax.Array     # [n, R] int32, -1 pad
    rest_scales: jax.Array  # [n, 1, R] f32
    assign_k: int = 1

    @property
    def n_cells(self) -> int:
        return self.centroids.shape[0]


@dataclass
class ColdShards:
    """Cold-tier state hung off a ShardedIndex by ``offload(bq=True)``."""

    bits: int
    qmat: jax.Array            # [D, D] f32 replicated (query transform A)
    packed: jax.Array          # [n, cap, bits*W] int8 sharded
    bq_scales: jax.Array       # [n, 1, cap] f32 sharded
    host_vecs: np.ndarray      # [n, cap, D] storage dtype
    host_scales: np.ndarray | None  # [n, 1, cap] f32 (int8 rows)
    host_cols: np.ndarray      # [n, NUM_COLS, cap] int32 mirror
    host_terms: np.ndarray     # [n, S, cap] int32 (persistence/resume)
    host_weights: np.ndarray   # [n, S, cap] f32
    postings: list[HostPostings]
    ivf: ColdShardedIvf | None = None

    @property
    def n_shards(self) -> int:
        return self.host_vecs.shape[0]

    @property
    def cap(self) -> int:
        return self.host_vecs.shape[1]

    def flat_rows(self) -> tuple[np.ndarray, np.ndarray | None]:
        """(vecs [n*cap, D], scales [1, n*cap]|None) views for the host
        rescore — store-global gids index them directly."""
        n, cap, d = self.host_vecs.shape
        vecs = self.host_vecs.reshape(n * cap, d)
        scales = (self.host_scales.reshape(1, n * cap)
                  if self.host_scales is not None else None)
        return vecs, scales

    def nbytes_device(self) -> int:
        arrs = [self.packed, self.bq_scales]
        if self.ivf is not None:
            iv = self.ivf
            arrs += [iv.packed3, iv.cols3, iv.row3, iv.scales3,
                     iv.rest_packed, iv.rest_cols, iv.rest_row,
                     iv.rest_scales]
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrs)


# ---------------------------------------------------------------------------
# offload: shared whitening moments + per-chip sketch encode
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("blk", "is_int8"))
def _moments_block(vecs, scales, cols, lo, s1, s2, cnt, *, blk: int,
                   is_int8: bool):
    """One [n, blk, D] slab of the mesh-wide masked moment accumulation.

    Runs on the SHARDED arrays — GSPMD turns the full-axis reductions into
    per-chip partials + psum, so the f32 transient is blk * D per chip.
    """
    v = jax.lax.dynamic_slice_in_dim(vecs, lo, blk, axis=1)
    v = v.astype(jnp.float32)
    if is_int8:
        sc = jax.lax.dynamic_slice_in_dim(scales, lo, blk, axis=2)
        v = v * sc[:, 0, :, None]
    valid = jax.lax.dynamic_slice_in_dim(
        cols[:, COL_VALID, :], lo, blk, axis=1) > 0
    vm = jnp.where(valid[..., None], v, 0.0)
    s1 = s1 + vm.sum(axis=(0, 1))
    s2 = s2 + jnp.einsum("ncd,nce->de", vm, vm,
                         preferred_element_type=jnp.float32)
    return s1, s2, cnt + valid.sum()


@functools.partial(
    jax.jit, static_argnames=("mesh", "blk", "bits", "is_int8"))
def _encode_block_sharded(mesh: Mesh, vecs, scales, cols, mu, w, lo, *,
                          blk: int, bits: int, is_int8: bool):
    """Encode one [n, blk, D] slab into packed planes, per chip."""

    def body(vecs, scales, cols, mu, w, lo):
        v = jax.lax.dynamic_slice_in_dim(vecs[0], lo, blk, axis=0)
        v = v.astype(jnp.float32)
        if is_int8:
            sc = jax.lax.dynamic_slice_in_dim(scales[0, 0], lo, blk)
            v = v * sc[:, None]
        u = (v - mu) @ w.T
        packed, step = encode_planes_device(u, bits)
        return packed[None], step[:, None, :]

    sp = _index_spec(mesh)
    rep = P()
    return jax.shard_map(
        body, mesh=mesh, in_specs=(sp, sp, sp, rep, rep, rep),
        out_specs=(sp, sp), check_vma=False)(vecs, scales, cols, mu, w, lo)


def offload_sharded(idx, bits: int) -> ColdShards:
    """Build the cold state for a resident ShardedIndex (device work first,
    then one host pull of the exact arrays). Caller swaps the index's
    device arrays for placeholders."""
    mesh = idx.mesh
    is_int8 = idx.dtype == "int8"
    cap, dim = idx.cap, idx.dim
    scales_arg = idx.scales

    # --- shared whitening: one mesh-wide masked moment pass ---
    s1 = jnp.zeros((dim,), jnp.float32)
    s2 = jnp.zeros((dim, dim), jnp.float32)
    cnt = jnp.zeros((), jnp.float32)
    for lo in range(0, cap, MOMENT_BLOCK):
        blk = min(MOMENT_BLOCK, cap - lo)
        s1, s2, cnt = _moments_block(idx.vecs, scales_arg, idx.cols,
                                     lo, s1, s2, cnt, blk=blk,
                                     is_int8=is_int8)
    n_live = max(float(cnt), 1.0)
    mu_np = np.asarray(s1, np.float64) / n_live
    cov = np.asarray(s2, np.float64) / n_live - np.outer(mu_np, mu_np)
    w_mat, a_mat = whitening_transform(cov)
    mu_dev = jnp.asarray(mu_np.astype(np.float32))
    w_dev = jnp.asarray(w_mat)

    # --- per-chip sketch encode (blocked; packed planes stay sharded) ---
    packed_parts, scale_parts = [], []
    for lo in range(0, cap, MOMENT_BLOCK):
        blk = min(MOMENT_BLOCK, cap - lo)
        pk, st = _encode_block_sharded(mesh, idx.vecs, scales_arg, idx.cols,
                                       mu_dev, w_dev, lo, blk=blk,
                                       bits=bits, is_int8=is_int8)
        packed_parts.append(pk)
        scale_parts.append(st)
    packed = (packed_parts[0] if len(packed_parts) == 1
              else jnp.concatenate(packed_parts, axis=1))
    bq_scales = (scale_parts[0] if len(scale_parts) == 1
                 else jnp.concatenate(scale_parts, axis=2))
    jax.block_until_ready(packed)

    # --- host pull of the exact tier ---
    host_vecs = np.array(idx.vecs)          # original dtype (ml_dtypes bf16)
    host_scales = np.array(idx.scales) if is_int8 else None
    host_cols = np.array(idx.cols)
    host_terms = np.array(idx.terms)
    host_weights = np.array(idx.weights)
    postings = [HostPostings(host_terms[s], host_weights[s])
                for s in range(idx.n_shards)]
    return ColdShards(bits=bits, qmat=jnp.asarray(a_mat), packed=packed,
                      bq_scales=bq_scales, host_vecs=host_vecs,
                      host_scales=host_scales, host_cols=host_cols,
                      host_terms=host_terms, host_weights=host_weights,
                      postings=postings)


# ---------------------------------------------------------------------------
# cold IVF build: shared centroids + per-chip cell-major sketch permutation
# ---------------------------------------------------------------------------

def build_cold_ivf_sharded(idx, cold: ColdShards, n_cells: int, *,
                           kmeans_iters: int = 25, assign_k: int = 1,
                           assign_margin: float | None = None,
                           skew_factor: float = 2.0, spill_levels: int = 2,
                           train_sample: int = 262144, seed: int = 0) -> dict:
    """Permute each chip's packed sketch cell-major behind shared centroids.

    Mirrors index/ivf_bq.py::ColdIvf.build per shard: centroids train once
    in the ORIGINAL embedding space on a host-row sample; assignment streams
    host rows through the device in blocks; pack_permutation (capacity
    spilling + margin-gated boundary replicas) computes per-shard slot
    destinations on the host; the permutation gather of the packed planes
    runs under shard_map — the sketch never leaves HBM.
    """
    from voitta_rag_tpu.index.ivf import _kmeans_train, pack_permutation
    from voitta_rag_tpu.index.ivf_bq import ASSIGN_BLOCK, _assign_block

    mesh = idx.mesh
    n, cap = cold.n_shards, cold.cap
    valid = cold.host_cols[:, COL_VALID, :] > 0            # [n, cap]
    live_rows = [np.nonzero(valid[s])[0].astype(np.int32) for s in range(n)]
    total = sum(len(r) for r in live_rows)
    if n_cells <= 1 or total < max(n_cells, 256):
        raise ValueError(
            f"need >= max(n_cells, 256) live rows for a cold IVF "
            f"(have {total}, n_cells={n_cells})")

    def host_f32(s: int, rows: np.ndarray) -> np.ndarray:
        v = np.asarray(cold.host_vecs[s][rows], np.float32)
        if cold.host_scales is not None:
            v = v * cold.host_scales[s, 0][rows][:, None]
        return v

    # --- shared centroids from a proportional cross-shard host sample ---
    rng = np.random.default_rng(seed)
    ns = min(total, max(train_sample, n_cells * 4))
    parts = []
    for s in range(n):
        rows = live_rows[s]
        if len(rows) == 0:
            continue
        take = max(1, int(round(ns * len(rows) / total)))
        sel = rows if take >= len(rows) else np.sort(
            rng.choice(rows, take, replace=False))
        parts.append(host_f32(s, sel))
    sample = jnp.asarray(np.concatenate(parts))
    centroids = _kmeans_train(sample, None, n_cells, kmeans_iters,
                              max(1, sample.shape[0] // ASSIGN_BLOCK), seed)
    jax.block_until_ready(centroids)

    # --- per-shard assignment (host rows -> device blocks -> host ints) ---
    k_all = min(max(assign_k, 1 + max(spill_levels, 0)), n_cells)
    assigns, sims_l = [], []
    for s in range(n):
        rows = live_rows[s]
        idx_parts, sim_parts = [], []
        for lo in range(0, len(rows), ASSIGN_BLOCK):
            blk = rows[lo:lo + ASSIGN_BLOCK]
            ix, sm = _assign_block(jnp.asarray(host_f32(s, blk)),
                                   centroids, k_all)
            idx_parts.append(np.asarray(ix))
            sim_parts.append(np.asarray(sm))
        assigns.append(np.concatenate(idx_parts) if idx_parts
                       else np.empty((0, k_all), np.int32))
        sims_l.append(np.concatenate(sim_parts) if sim_parts
                      else np.empty((0, k_all), np.float32))

    n_replicas = 0
    gated = []
    spills = []
    for s in range(n):
        assign = np.ascontiguousarray(assigns[s][:, :assign_k])
        sims = sims_l[s]
        if assign_k > 1 and assign_margin is not None and len(assign):
            gate = sims[:, 1:assign_k] >= (sims[:, :1] - assign_margin)
            assign[:, 1:] = np.where(gate, assign[:, 1:], -1)
        if assign_k > 1:
            n_replicas += int((assign[:, 1:] >= 0).sum())
        sp = None
        if spill_levels > 0 and k_all > 1 and len(assign):
            margin = assign_margin if assign_margin is not None else 0.05
            sp = np.ascontiguousarray(assigns[s][:, 1:1 + spill_levels])
            sgate = sims[:, 1:1 + spill_levels] >= (sims[:, :1] - margin)
            sp = np.where(sgate, sp, -1)
        gated.append(assign)
        spills.append(sp)

    # Uniform geometry across shards (stacked arrays): size the cell cap for
    # the MEAN per-shard load (waterfilled writes keep shards balanced).
    cell_cap = round_up(
        max(int(skew_factor * (total + n_replicas) / (n * n_cells)), 128),
        128)
    perm = np.full((n, n_cells * cell_cap), -1, np.int32)
    rest_lists = []
    for s in range(n):
        rows = live_rows[s]
        if len(rows) == 0:
            rest_lists.append(np.empty(0, np.int32))
            continue
        src, dest, _prio, rest_src = pack_permutation(
            gated[s], n_cells, cell_cap, spills[s])
        perm[s, dest] = rows[src]
        rest_lists.append(rows[rest_src].astype(np.int32))
    rest_cap = round_up(max(max((len(r) for r in rest_lists), default=0), 1),
                        128)
    rest = np.full((n, rest_cap), -1, np.int32)
    for s, rl in enumerate(rest_lists):
        rest[s, :len(rl)] = rl

    sh = NamedSharding(mesh, _index_spec(mesh))
    (packed3, cols3, row3, scales3, rest_packed, rest_cols, rest_row,
     rest_scales) = _gather_cold_shadow_sharded(
        mesh, cold.packed, idx.cols, cold.bq_scales,
        jax.device_put(jnp.asarray(perm), sh),
        jax.device_put(jnp.asarray(rest), sh),
        n_cells=n_cells, cell_cap=cell_cap)
    cold.ivf = ColdShardedIvf(
        centroids=centroids, packed3=packed3, cols3=cols3, row3=row3,
        scales3=scales3, rest_packed=rest_packed, rest_cols=rest_cols,
        rest_row=rest_row, rest_scales=rest_scales, assign_k=assign_k)
    return {"cells": n_cells, "rows": total, "cell_cap": cell_cap,
            "residual": int((rest >= 0).sum()), "shards": n,
            "boundary_replicas": n_replicas}


@functools.partial(jax.jit, static_argnames=("mesh", "n_cells", "cell_cap"))
def _gather_cold_shadow_sharded(mesh: Mesh, packed, cols, scales, perm,
                                rest, *, n_cells: int, cell_cap: int):
    """Per-chip cell-major permutation gather (index/ivf_bq.py layout)."""

    def body(packed, cols, scales, perm, rest):
        pk, cl, sc = packed[0], cols[0], scales[0, 0]
        pm, rs = perm[0], rest[0]
        pw = pk.shape[1]
        safe = jnp.maximum(pm, 0)
        packed3 = jnp.take(pk, safe, axis=0).reshape(n_cells, cell_cap, pw)
        cols_g = jnp.take(cl, safe, axis=1)
        cols_g = cols_g.at[COL_VALID].set(
            jnp.where(pm >= 0, cols_g[COL_VALID], 0))
        cols3 = cols_g.reshape(NUM_COLS, n_cells, cell_cap).transpose(1, 0, 2)
        scales3 = jnp.take(sc, safe).reshape(n_cells, 1, cell_cap)
        row3 = pm.reshape(n_cells, cell_cap)

        safe_r = jnp.maximum(rs, 0)
        rest_packed = jnp.take(pk, safe_r, axis=0)
        rest_cols = jnp.take(cl, safe_r, axis=1)
        rest_cols = rest_cols.at[COL_VALID].set(
            jnp.where(rs >= 0, rest_cols[COL_VALID], 0))
        rest_scales = jnp.take(sc, safe_r).reshape(1, -1)
        return (packed3[None], cols3[None], row3[None], scales3[None],
                rest_packed[None], rest_cols[None], rs[None],
                rest_scales[None])

    sp = _index_spec(mesh)
    return jax.shard_map(body, mesh=mesh, in_specs=(sp,) * 5,
                         out_specs=(sp,) * 8, check_vma=False)(
        packed, cols, scales, perm, rest)


# ---------------------------------------------------------------------------
# cold search: per-chip coarse -> ICI gather -> host rescore -> fusion
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k_local", "bits", "select", "use_pallas"))
def _cold_coarse_sharded(mesh: Mesh, q_coarse, spec: FilterSpec, packed,
                         scales, cols, *, k_local: int, bits: int,
                         select: str, use_pallas: bool):
    """Flat per-chip sketch scan -> local top-K' -> gathered (vals, gids)."""
    cap = packed.shape[1]
    k = min(k_local, cap)

    def body(q, params, inc, exc, excif, packed, scales, cols):
        local = FilterSpec(params, inc, exc, excif)
        scores = bitq_scan_scores(q, packed[0], scales[0], cols[0], local,
                                  bits=bits, use_pallas=use_pallas)
        vals, rows = masked_topk(
            scores, k, approx=(select == "approx" and cap > (1 << 16)))
        shard = _global_shard(mesh)
        gids = jnp.where(rows >= 0, shard * cap + rows, -1).astype(jnp.int32)
        return _gather_pairs(vals, gids, k, mesh)

    sp = _index_spec(mesh)
    rep = P()
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, sp, sp, sp),
        out_specs=(rep, rep), check_vma=False)
    return fn(q_coarse, spec.params, spec.inc_ids, spec.exc_ids,
              spec.exc_if_ids, packed, scales, cols)


def search_cold(idx, q, spec: FilterSpec, qt=None, qw=None,
                sparse_weight=0.1, *, limit: int = 10,
                prefetch_multiplier: int = 3, fusion: bool = True,
                nprobe: int | None = None, oversample: int | None = None,
                select: str | None = None, use_pallas: bool = True):
    """Serve a query batch against a cold ShardedIndex.

    Returns (scores [B, limit] f32, gids [B, limit] int32), replicated.
    """
    from voitta_rag_tpu.config import get_settings

    cold: ColdShards = idx.cold
    st = get_settings()
    os_ = oversample if oversample is not None else st.bq_oversample
    sel = select if select is not None else st.bq_select
    mesh = idx.mesh
    assert mesh.shape.get(REPLICA_AXIS, 1) == 1, (
        "cold sharded serving does not batch-shard over replica groups; "
        "use replicated meshes without a replica axis for cold indexes")
    p = limit * prefetch_multiplier
    k_local = p * os_

    q = jnp.asarray(q)
    q_coarse = q.astype(jnp.float32) @ cold.qmat.T

    if nprobe is not None and cold.ivf is not None:
        iv = cold.ivf
        g_vals, g_gids = _cold_ivf_probe(
            mesh, q, q_coarse, spec, iv.centroids, iv.packed3, iv.cols3,
            iv.row3, iv.scales3, iv.rest_packed, iv.rest_cols, iv.rest_row,
            iv.rest_scales, cap=cold.cap,
            nprobe=min(nprobe, iv.n_cells), k_local=k_local,
            bits=cold.bits, assign_k=iv.assign_k, select=sel,
            use_pallas=use_pallas)
    else:
        g_vals, g_gids = _cold_coarse_sharded(
            mesh, q_coarse, spec, cold.packed, cold.bq_scales, idx.cols,
            k_local=k_local, bits=cold.bits, select=sel,
            use_pallas=use_pallas)

    # Host exact rescore of the gathered union (disjoint shards -> no
    # cross-chip duplicate gids; assign_k replicas are deduped per chip).
    cand = np.asarray(g_gids)                       # [B, shards * k_local]
    vecs_flat, scales_flat = cold.flat_rows()
    q_np = np.asarray(q, np.float32)
    d_vals, d_gids = rerank_exact_host(q_np, cand, vecs_flat, scales_flat,
                                       limit=min(p, cand.shape[1]))

    s_lists = None
    if qt is not None:
        s_lists = _sparse_cold_candidates(cold, spec, np.asarray(qt),
                                          np.asarray(qw, np.float32),
                                          q_np.shape[0], p)

    if s_lists is not None and fusion:
        s_vals, s_gids = s_lists
        return hybrid_fuse_candidates(
            jnp.asarray(d_vals), jnp.asarray(d_gids),
            jnp.asarray(s_vals), jnp.asarray(s_gids),
            jnp.asarray(sparse_weight, jnp.float32),
            limit=limit, prefetch_multiplier=prefetch_multiplier)

    def row(dv, di):
        vals, ids, valid = _candidates_from_lists(dv, di, limit)
        return jnp.where(valid, vals, NEG_INF), jnp.where(valid, ids, -1)

    return jax.vmap(row)(jnp.asarray(d_vals), jnp.asarray(d_gids))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cap", "nprobe", "k_local", "bits", "assign_k",
                     "select", "use_pallas"))
def _cold_ivf_probe(mesh: Mesh, q, q_coarse, spec: FilterSpec, centroids,
                    packed3, cols3, row3, scales3, rest_packed, rest_cols,
                    rest_row, rest_scales, *, cap: int, nprobe: int,
                    k_local: int, bits: int, assign_k: int, select: str,
                    use_pallas: bool):
    """Per-chip probed coarse scan -> gathered (coarse vals, global gids).

    Centroids are replicated, so every chip probes the SAME nprobe cells of
    its OWN cell-major partition — identical cell selection, zero
    communication before the candidate gather (the exact-tier sharded IVF's
    contract, parallel/sharded.py::sharded_ivf_search).
    """
    from voitta_rag_tpu.index.ivf_bq import bq_ivf_select

    def body(q, qc, params, inc, exc, excif, centroids, packed3, cols3,
             row3, scales3, rest_packed, rest_cols, rest_row, rest_scales):
        local = FilterSpec(params, inc, exc, excif)
        vals, cand = bq_ivf_select(
            q, centroids, None, packed3[0], cols3[0], row3[0], scales3[0],
            rest_packed[0], rest_cols[0], rest_row[0], rest_scales[0],
            local, nprobe=nprobe, k_prime=k_local, bits=bits,
            assign_k=assign_k, select=select, use_pallas=use_pallas,
            q_coarse=qc)
        shard = _global_shard(mesh)
        gids = jnp.where(cand >= 0, shard * cap + cand, -1).astype(jnp.int32)
        return _gather_pairs(vals, gids, k_local, mesh)

    sp = _index_spec(mesh)
    rep = P()
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep,) * 7 + (sp,) * 8,   # q, qc, 4 spec fields, centroids
        out_specs=(rep, rep), check_vma=False)
    return fn(q, q_coarse, spec.params, spec.inc_ids, spec.exc_ids,
              spec.exc_if_ids, centroids, packed3, cols3, row3, scales3,
              rest_packed, rest_cols, rest_row, rest_scales)


def _sparse_cold_candidates(cold: ColdShards, spec: FilterSpec,
                            qt: np.ndarray, qw: np.ndarray, b: int,
                            p: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-shard host-postings sparse candidates as [B, n*p] lists.

    Full batch width (the flat cold tier's round-3 contract,
    index/bq_serve.py::bq_candidate_lists): one sparse query broadcasts
    across the dense batch, a [B, T] batch scores per query — each pass
    touches only that query's term runs in each shard's postings.
    """
    n, cap = cold.n_shards, cold.cap
    bq = qt.shape[0]
    assert bq in (1, b), f"sparse batch {bq} vs dense batch {b}"
    k = min(p, cap)
    vals = np.full((b, n * p), NEG_INF, np.float32)
    gids = np.full((b, n * p), -1, np.int32)
    masks = [eval_mask_host(spec, cold.host_cols[s]) for s in range(n)]
    for i in range(bq):
        for s in range(n):
            sc = cold.postings[s].scores(qt[i], qw[i])
            sc = np.where(masks[s], sc, NEG_INF).astype(np.float32)
            top = np.argpartition(-sc, k - 1)[:k].astype(np.int32)
            sv = sc[top]
            keep = sv > float(VALID_THRESHOLD)
            row_v = np.where(keep, sv, NEG_INF)
            row_g = np.where(keep, s * cap + top, -1)
            if bq == 1:
                vals[:, s * p:s * p + k] = row_v
                gids[:, s * p:s * p + k] = row_g
            else:
                vals[i, s * p:s * p + k] = row_v
                gids[i, s * p:s * p + k] = row_g
    return vals, gids
