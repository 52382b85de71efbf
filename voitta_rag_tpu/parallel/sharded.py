"""ShardedIndex: corpus segments sharded across chips, merged over ICI.

The communication-backend component the reference lacks (SURVEY.md §2.6):
chunk rows live in stacked arrays ``[n_shards, cap, ...]`` sharded on axis 0
over the mesh's ``shard`` axis. A query is replicated to every chip; under
``shard_map`` each chip runs the Pallas masked-scan kernels over its local
rows and selects its local top-p candidates; candidate (score, gid) sets are
**all-gathered over ICI** and the final top-k / hybrid fusion runs replicated
on the gathered union. Correctness: every global top-p row lives on some
shard and therefore appears in that shard's local top-p, so the gathered
union is a superset of the global candidate set — the merge is exact, and
min-max fusion normalizes over exactly the candidates a single-device search
would use (ops/fusion.py:hybrid_fuse_candidates).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voitta_rag_tpu.ops.dense_scan import dense_scan_scores
from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores, TERM_PAD
from voitta_rag_tpu.ops.filters import COL_DOC, COL_VALID, NUM_COLS, FilterSpec
from voitta_rag_tpu.ops.fusion import hybrid_fuse_candidates, _candidates_from_lists
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, round_up
from voitta_rag_tpu.ops.topk import VALID_THRESHOLD, dedup_candidates, masked_topk
from voitta_rag_tpu.parallel.mesh import REPLICA_AXIS, SHARD_AXIS, SLICE_AXIS


def _has_slice(mesh: Mesh) -> bool:
    return SLICE_AXIS in mesh.axis_names


def _n_replicas(mesh: Mesh) -> int:
    return mesh.shape.get(REPLICA_AXIS, 1)


def _index_spec(mesh: Mesh) -> P:
    """PartitionSpec of the index arrays' leading (shard) axis. The replica
    axis is never mentioned: index arrays are replicated across replica
    groups (each group holds a full copy)."""
    return (P((SLICE_AXIS, SHARD_AXIS)) if _has_slice(mesh)
            else P(SHARD_AXIS))


def _query_spec(mesh: Mesh) -> P:
    """PartitionSpec of the query batch (and result) leading axis: sharded
    over replica groups when the mesh has them — each group serves B/R
    queries against its own full index copy, so batch throughput scales
    with replicas (index data parallelism)."""
    return P(REPLICA_AXIS) if _n_replicas(mesh) > 1 else P()


def _global_shard(mesh: Mesh) -> jax.Array:
    """Global shard index of this device (= slot in the [n_total, ...]
    stacked arrays), valid inside a shard_map body."""
    idx = jax.lax.axis_index(SHARD_AXIS)
    if _has_slice(mesh):
        idx = jax.lax.axis_index(SLICE_AXIS) * mesh.shape[SHARD_AXIS] + idx
    return idx


def _gather_axis(x, axis_name: str):
    """[B, p] per device → replicated-along-axis [B, group * p]."""
    g = jax.lax.all_gather(x, axis_name)         # [group, B, p]
    return jnp.transpose(g, (1, 0, 2)).reshape(x.shape[0], -1)


def _gather_pairs(vals, gids, p: int, mesh: Mesh):
    """Merge per-chip candidate lists across the mesh.

    1-axis mesh: one all-gather over ICI. 2-axis pod mesh: hierarchical —
    all-gather over the intra-slice ``shard`` axis (ICI), re-cut the slice
    union to top-p (bounding the expensive hop's payload), then one small
    all-gather over the ``slice`` axis (DCN). Exact: a global top-p row is
    top-p on its chip AND top-p within its slice union, so it survives
    both cuts (SURVEY §7 "hierarchical merge, intra-slice ICI first").
    """
    vg = _gather_axis(vals, SHARD_AXIS)
    gg = _gather_axis(gids, SHARD_AXIS)
    if not _has_slice(mesh):
        return vg, gg
    k = min(p, vg.shape[-1])
    v, pos = jax.lax.top_k(vg, k)
    g = jnp.where(v > VALID_THRESHOLD,
                  jnp.take_along_axis(gg, pos, axis=1), -1).astype(jnp.int32)
    return _gather_axis(v, SLICE_AXIS), _gather_axis(g, SLICE_AXIS)


def _local_sparse_candidates(q, qt, qw, terms, weights, cols_flat,
                             post_terms, post_gids, post_weights, local_spec,
                             d_vals, d_gids, p: int, cap: int, shard, *,
                             has_sparse: bool, use_postings: bool,
                             max_postings: int):
    """Per-chip sparse candidates (local top-p rows as store-global gids):
    inverted postings when a snapshot is live, exact slot scan otherwise."""
    if not has_sparse:
        return (jnp.full_like(d_vals, NEG_INF),
                jnp.full_like(d_gids, -1))
    if use_postings:
        from voitta_rag_tpu.index.postings import postings_candidates

        s_vals, s_rows = postings_candidates(
            qt, qw, post_terms[0], post_gids[0],
            post_weights[0], cols_flat[0], local_spec,
            limit=p, max_postings=max_postings)
        s_vals = jnp.broadcast_to(s_vals, (q.shape[0], s_vals.shape[-1]))
        s_rows = jnp.broadcast_to(s_rows, (q.shape[0], s_rows.shape[-1]))
        s_gids = jnp.where(s_rows >= 0, shard * cap + s_rows,
                           -1).astype(jnp.int32)
        return s_vals, s_gids
    s_scores = sparse_scan_scores(qt, qw, terms[0], weights[0],
                                  cols_flat[0], local_spec)
    s_scores = jnp.broadcast_to(s_scores, (q.shape[0], cap))
    s_vals, s_rows = jax.lax.top_k(s_scores, min(p, cap))
    s_gids = jnp.where(s_vals > VALID_THRESHOLD,
                       shard * cap + s_rows, -1).astype(jnp.int32)
    return s_vals, s_gids


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "limit", "prefetch_multiplier", "has_sparse",
                     "use_fusion", "use_postings", "max_postings"),
)
def sharded_search(
    mesh: Mesh,
    q: jax.Array,
    spec: FilterSpec,
    vecs: jax.Array,
    cols: jax.Array,
    scales: jax.Array | None,
    terms: jax.Array,
    weights: jax.Array,
    post_terms: jax.Array,
    post_gids: jax.Array,
    post_weights: jax.Array,
    qt: jax.Array,
    qw: jax.Array,
    sparse_weight: jax.Array,
    *,
    limit: int,
    prefetch_multiplier: int = 3,
    has_sparse: bool = True,
    use_fusion: bool = True,
    use_postings: bool = False,
    max_postings: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Search the sharded index; returns (scores, gids) [B, limit] —
    replicated within a replica group, batch-sharded across groups."""
    cap = vecs.shape[1]
    p = min(limit * prefetch_multiplier, cap)
    shard_spec = _index_spec(mesh)
    rep = P()
    qspec = _query_spec(mesh)

    def body(q, params, inc, exc, excif, vecs, cols, scales, terms, weights,
             post_terms, post_gids, post_weights, qt, qw, w):
        local_spec = FilterSpec(params, inc, exc, excif)
        is_int8 = vecs.dtype == jnp.int8
        shard = _global_shard(mesh)
        d_scores = dense_scan_scores(q, vecs[0], cols[0],
                                     local_spec,
                                     scales[0] if is_int8 else None)
        d_vals, d_rows = jax.lax.top_k(d_scores, p)
        d_gids = jnp.where(d_vals > VALID_THRESHOLD,
                           shard * cap + d_rows, -1).astype(jnp.int32)
        s_vals, s_gids = _local_sparse_candidates(
            q, qt, qw, terms, weights, cols, post_terms, post_gids,
            post_weights, local_spec, d_vals, d_gids, p, cap, shard,
            has_sparse=has_sparse, use_postings=use_postings,
            max_postings=max_postings)
        # ---- candidate merge: ICI all-gather (+ DCN hop on a pod mesh) ----
        d_vals, d_gids = _gather_pairs(d_vals, d_gids, p, mesh)
        s_vals, s_gids = _gather_pairs(s_vals, s_gids, p, mesh)
        if has_sparse and use_fusion:
            return hybrid_fuse_candidates(
                d_vals, d_gids, s_vals, s_gids, w,
                limit=limit, prefetch_multiplier=prefetch_multiplier)
        # dense-only: exact global top-limit over the gathered union
        def row(dv, di):
            vals, ids, valid = _candidates_from_lists(dv, di, limit)
            return jnp.where(valid, vals, NEG_INF), jnp.where(valid, ids, -1)
        return jax.vmap(row)(d_vals, d_gids)

    args_specs = (
        qspec,                   # q (batch-sharded over replica groups)
        rep, rep, rep, rep,      # FilterSpec fields
        shard_spec, shard_spec,  # vecs, cols
        shard_spec,              # scales
        shard_spec, shard_spec,  # terms, weights
        shard_spec, shard_spec, shard_spec,  # postings
        rep, rep, rep,           # qt, qw, sparse_weight
    )
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=args_specs,
        out_specs=(qspec, qspec),
        check_vma=False,
    )
    return fn(q, spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids,
              vecs, cols, scales, terms, weights,
              post_terms, post_gids, post_weights, qt, qw,
              jnp.asarray(sparse_weight, jnp.float32))


# ---------------------------------------------------------------------------
# per-chip IVF (lifts the flat-scan ceiling at large per-shard capacities)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("mesh", "nprobe", "limit", "prefetch_multiplier",
                     "has_sparse", "use_fusion", "assign_k", "use_postings",
                     "max_postings"),
)
def sharded_ivf_search(
    mesh: Mesh,
    q: jax.Array,
    spec: FilterSpec,
    centroids: jax.Array,
    vecs3: jax.Array,
    cols3: jax.Array,
    gid3: jax.Array,
    scales3: jax.Array,
    rest_vecs: jax.Array,
    rest_cols: jax.Array,
    rest_gid: jax.Array,
    rest_scales: jax.Array,
    terms: jax.Array,
    weights: jax.Array,
    cols_flat: jax.Array,
    post_terms: jax.Array,
    post_gids: jax.Array,
    post_weights: jax.Array,
    qt: jax.Array,
    qw: jax.Array,
    sparse_weight: jax.Array,
    *,
    nprobe: int,
    limit: int,
    prefetch_multiplier: int = 3,
    has_sparse: bool = True,
    use_fusion: bool = True,
    assign_k: int = 1,
    use_postings: bool = False,
    max_postings: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Probe-limited sharded search: per-chip IVF scan + ICI candidate merge.

    Centroids are replicated, so every chip selects the SAME ``nprobe`` cell
    ids from the query (no communication) and probes them in its LOCAL
    cell-major blocks; gid3 already stores store-global row ids, so the
    gathered candidate union merges exactly like the flat sharded path. The
    sparse side uses each chip's inverted postings when a snapshot is live
    (``use_postings``), else the exact per-shard slot scan.

    Correctness caveat vs the flat sharded scan: per-chip recall is that of
    the per-chip IVF probe (the union of per-chip probes is a superset of a
    single-device IVF probe of the union — each chip probes nprobe cells of
    its OWN partition, so sharding can only increase the probed fraction).
    """
    from voitta_rag_tpu.index.ivf import _ivf_search_scores

    cap = cols_flat.shape[2]
    p = limit * prefetch_multiplier

    def body(q, params, inc, exc, excif, centroids, vecs3, cols3, gid3,
             scales3, rest_vecs, rest_cols, rest_gid, rest_scales, terms,
             weights, cols_flat, post_terms, post_gids, post_weights,
             qt, qw, w):
        local_spec = FilterSpec(params, inc, exc, excif)
        is_int8 = vecs3.dtype == jnp.int8
        scores, gids = _ivf_search_scores(
            q, centroids, vecs3[0], cols3[0], gid3[0], rest_vecs[0],
            rest_cols[0], rest_gid[0], scales3[0] if is_int8 else None,
            rest_scales[0] if is_int8 else None,
            local_spec, nprobe=nprobe)
        k = min(p * max(assign_k, 1), scores.shape[-1])
        # Exact selection over the probed scores (same finding as the flat
        # IVF path, index/ivf.py: cost-neutral inside the fused program,
        # recovers the candidates approx_max_k drops).
        d_vals, pos = masked_topk(scores, k)
        d_gids = jnp.where(
            pos >= 0,
            jnp.take_along_axis(gids, jnp.maximum(pos, 0), axis=1),
            -1).astype(jnp.int32)
        if assign_k > 1:
            d_vals, d_gids = dedup_candidates(d_vals, d_gids)
        d_vals, d_gids = d_vals[:, :p], d_gids[:, :p]
        s_vals, s_gids = _local_sparse_candidates(
            q, qt, qw, terms, weights, cols_flat, post_terms, post_gids,
            post_weights, local_spec, d_vals, d_gids, p, cap,
            _global_shard(mesh),
            has_sparse=has_sparse, use_postings=use_postings,
            max_postings=max_postings)
        # ---- candidate merge: ICI all-gather (+ DCN hop on a pod mesh) ----
        d_vals, d_gids = _gather_pairs(d_vals, d_gids, p, mesh)
        s_vals, s_gids = _gather_pairs(s_vals, s_gids, p, mesh)
        if has_sparse and use_fusion:
            return hybrid_fuse_candidates(
                d_vals, d_gids, s_vals, s_gids, w,
                limit=limit, prefetch_multiplier=prefetch_multiplier)

        def row(dv, di):
            vals, ids, valid = _candidates_from_lists(dv, di, limit)
            return jnp.where(valid, vals, NEG_INF), jnp.where(valid, ids, -1)

        return jax.vmap(row)(d_vals, d_gids)

    shard_spec = _index_spec(mesh)
    rep = P()
    qspec = _query_spec(mesh)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(
            qspec,                   # q (batch-sharded over replica groups)
            rep, rep, rep, rep,      # FilterSpec fields
            rep,                     # centroids (replicated: tiny, read-only)
            shard_spec, shard_spec, shard_spec, shard_spec,  # cell blocks
            shard_spec, shard_spec, shard_spec, shard_spec,  # residual
            shard_spec, shard_spec, shard_spec,  # terms, weights, cols_flat
            shard_spec, shard_spec, shard_spec,  # postings
            rep, rep, rep,           # qt, qw, sparse_weight
        ),
        out_specs=(qspec, qspec),
        check_vma=False,
    )
    return fn(q, spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids,
              centroids, vecs3, cols3, gid3, scales3, rest_vecs, rest_cols,
              rest_gid, rest_scales, terms, weights, cols_flat,
              post_terms, post_gids, post_weights, qt, qw,
              jnp.asarray(sparse_weight, jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "nprobe", "limit", "probe_cap",
                     "prefetch_multiplier", "has_sparse", "use_fusion",
                     "use_postings", "max_postings"),
)
def sharded_ivf_flat_search(
    mesh: Mesh,
    q: jax.Array,
    spec: FilterSpec,
    centroids3: jax.Array,
    fvecs: jax.Array,
    fcols: jax.Array,
    fgids: jax.Array,
    fscales: jax.Array,
    fstarts: jax.Array,
    terms: jax.Array,
    weights: jax.Array,
    cols_flat: jax.Array,
    post_terms: jax.Array,
    post_gids: jax.Array,
    post_weights: jax.Array,
    qt: jax.Array,
    qw: jax.Array,
    sparse_weight: jax.Array,
    *,
    nprobe: int,
    limit: int,
    probe_cap: int,
    prefetch_multiplier: int = 3,
    has_sparse: bool = True,
    use_fusion: bool = True,
    use_postings: bool = False,
    max_postings: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Probe-limited sharded search over per-chip variable-length lists.

    The flat-layout twin of :func:`sharded_ivf_search`: each chip probes its
    OWN virtual centroids (``centroids3`` is SHARDED, not replicated — hot
    cells split positionally per shard, so virtual cell sets differ across
    chips) and gathers fixed ``probe_cap``-row windows of its local
    cell-major corpus (index/ivf_flat.py). Candidates carry store-global
    gids, so the ICI merge and fusion are identical to the padded path.
    """
    from voitta_rag_tpu.index.ivf_flat import _ivf_flat_candidates

    cap = cols_flat.shape[2]
    p = limit * prefetch_multiplier

    def body(q, params, inc, exc, excif, centroids3, fvecs, fcols, fgids,
             fscales, fstarts, terms, weights, cols_flat, post_terms,
             post_gids, post_weights, qt, qw, w):
        local_spec = FilterSpec(params, inc, exc, excif)
        # limit=p is already the prefetch-expanded candidate count;
        # prefetch_multiplier=1 keeps the in-probe top-k at p+8.
        d_vals, d_gids = _ivf_flat_candidates(
            q, centroids3[0], fvecs[0], fcols[0], fgids[0], fscales[0],
            fstarts[0], local_spec, nprobe=nprobe, limit=p,
            probe_cap=probe_cap, prefetch_multiplier=1)
        s_vals, s_gids = _local_sparse_candidates(
            q, qt, qw, terms, weights, cols_flat, post_terms, post_gids,
            post_weights, local_spec, d_vals, d_gids, p, cap,
            _global_shard(mesh),
            has_sparse=has_sparse, use_postings=use_postings,
            max_postings=max_postings)
        # ---- candidate merge: ICI all-gather (+ DCN hop on a pod mesh) ----
        d_vals, d_gids = _gather_pairs(d_vals, d_gids, p, mesh)
        s_vals, s_gids = _gather_pairs(s_vals, s_gids, p, mesh)
        if has_sparse and use_fusion:
            return hybrid_fuse_candidates(
                d_vals, d_gids, s_vals, s_gids, w,
                limit=limit, prefetch_multiplier=prefetch_multiplier)

        def row(dv, di):
            vals, ids, valid = _candidates_from_lists(dv, di, limit)
            return jnp.where(valid, vals, NEG_INF), jnp.where(valid, ids, -1)

        return jax.vmap(row)(d_vals, d_gids)

    shard_spec = _index_spec(mesh)
    rep = P()
    qspec = _query_spec(mesh)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(
            qspec,                   # q (batch-sharded over replica groups)
            rep, rep, rep, rep,      # FilterSpec fields
            shard_spec,              # centroids3 (per-shard virtual cells)
            shard_spec, shard_spec, shard_spec, shard_spec,  # flat arrays
            shard_spec,              # starts
            shard_spec, shard_spec, shard_spec,  # terms, weights, cols_flat
            shard_spec, shard_spec, shard_spec,  # postings
            rep, rep, rep,           # qt, qw, sparse_weight
        ),
        out_specs=(qspec, qspec),
        check_vma=False,
    )
    return fn(q, spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids,
              centroids3, fvecs, fcols, fgids, fscales, fstarts,
              terms, weights, cols_flat, post_terms, post_gids, post_weights,
              qt, qw, jnp.asarray(sparse_weight, jnp.float32))


@dataclass
class ShardedIVFFlat:
    """Per-chip variable-length inverted lists over a ShardedIndex.

    The flat-layout twin of :class:`ShardedIVF` (index/ivf_flat.py
    rationale: padded cell blocks overflow 40% of rows on Zipf-skewed real
    corpora at any affordable cap). Every array is stacked ``[n_shards,
    ...]`` and sharded on axis 0; ``centroids3`` holds each shard's VIRTUAL
    cells (hot cells split positionally per shard, zero-padded to the mesh
    max), so it is sharded rather than replicated — each chip probes its
    own cell set, which costs no communication either.
    """

    centroids3: jax.Array  # [n, Cv_max, D] f32 per-shard virtual centroids
    vecs: jax.Array        # [n, M_pad, D] cell-major flat rows
    cols: jax.Array        # [n, NUM_COLS, M_pad] int32
    gids: jax.Array        # [n, M_pad] int32 store-global ids (-1 pad)
    scales: jax.Array      # [n, 1, M_pad] f32 (int8 rows)
    starts: jax.Array      # [n, Cv_max + 1] int32 prefix offsets
    probe_cap: int = 0     # window rows per probed cell (static)

    @property
    def n_cells(self) -> int:
        return self.centroids3.shape[1]


@dataclass
class ShardedIVF:
    """Per-chip IVF snapshot over a ShardedIndex (read-optimized).

    Shared f32 centroids (replicated — tiny, and identical cell selection on
    every chip costs no communication); cell-major blocks, filter columns,
    store-global row ids, and the exact overflow residual are all stacked
    ``[n_shards, ...]`` and sharded on axis 0 like the flat arrays. The
    reference's analogue is Qdrant's background-built HNSW graph
    (services/vector_store.py:88-100).
    """

    centroids: jax.Array   # [C, D] f32, replicated
    vecs3: jax.Array       # [n, C, cell_cap, D] sharded
    cols3: jax.Array       # [n, C, NUM_COLS, cell_cap] int32
    gid3: jax.Array        # [n, C, cell_cap] int32 store-gids (-1 = empty)
    scales3: jax.Array     # [n, C, 1, cell_cap] f32 (read only for int8)
    rest_vecs: jax.Array   # [n, R, D] (same dtype as cells)
    rest_cols: jax.Array   # [n, NUM_COLS, R] int32
    rest_gid: jax.Array    # [n, R] int32
    rest_scales: jax.Array | None = None  # [n, 1, R] f32 (int8 cells)
    assign_k: int = 1

    @property
    def n_cells(self) -> int:
        return self.centroids.shape[0]


@functools.partial(jax.jit, static_argnames=("mesh",))
def _build_postings_sharded(mesh: Mesh, terms, weights, cols):
    """Per-chip inverted impact-ordered postings (index/postings.py) built
    under shard_map: each chip sorts its OWN (term, row, weight) triples —
    the [S*cap] sort never crosses ICI. Postings store LOCAL row ids;
    the search body offsets them to store-global gids."""
    from voitta_rag_tpu.index.postings import _build_sorted

    def body(terms, weights, cols):
        cap = terms.shape[2]
        valid = cols[0, COL_VALID, :] > 0
        rows_local = jnp.where(valid, jnp.arange(cap, dtype=jnp.int32), -1)
        # Weights stay f32, matching the single-chip build_postings: the
        # snapshot path promises bit-exact parity with the slot scan, and a
        # bf16 weight (8-bit mantissa) can swap near-tied ranks.
        t, g, w, _ = _build_sorted(terms[0], weights[0], rows_local)
        return t[None], g[None], w[None]

    sp = _index_spec(mesh)
    return jax.shard_map(body, mesh=mesh, in_specs=(sp, sp, sp),
                         out_specs=(sp, sp, sp), check_vma=False)(
        terms, weights, cols)


@functools.partial(jax.jit, static_argnames=("is_int8",))
def _gather_rows_f32(vecs, scales, si, ri, is_int8: bool):
    v = vecs[si, ri].astype(jnp.float32)
    if is_int8:
        v = v * scales[si, 0, ri][:, None]
    return v


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_cells", "cell_cap", "rest_cap", "assign_k"),
)
def _pack_ivf_sharded(mesh, vecs, scales, cols, dest, rest_dest, *,
                      n_cells: int, cell_cap: int, rest_cap: int,
                      assign_k: int):
    """Scatter each shard's rows into its cell-major blocks ON DEVICE.

    The bulk vector data never leaves HBM; the host only computed the
    per-row destination slots (``dest`` [n, assign_k, cap] int32, OOB =
    dropped/tombstoned; ``rest_dest`` [n, cap] for primary overflow).
    """
    n_slots = n_cells * cell_cap

    def body(vecs, scales, cols, dest, rest_dest):
        shard = _global_shard(mesh)
        v = vecs[0]               # [cap, D]
        sc = scales[0, 0]         # [cap]
        ct = cols[0].T            # [cap, NUM_COLS]
        cap = v.shape[0]
        d = v.shape[1]
        gid_local = (shard * cap + jnp.arange(cap)).astype(jnp.int32)
        main_v = jnp.zeros((n_slots, d), v.dtype)
        main_s = jnp.zeros((n_slots,), jnp.float32)
        main_c = jnp.zeros((n_slots, NUM_COLS), jnp.int32)
        main_g = jnp.full((n_slots,), -1, jnp.int32)
        for j in range(assign_k):
            dj = dest[0, j]
            main_v = main_v.at[dj].set(v, mode="drop")
            main_s = main_s.at[dj].set(sc, mode="drop")
            main_c = main_c.at[dj].set(ct, mode="drop")
            main_g = main_g.at[dj].set(gid_local, mode="drop")
        rd = rest_dest[0]
        # Residual stays in the cell dtype (int8 residual + scales) — it is
        # scanned on every query, so bf16 would double its HBM share.
        rest_v = jnp.zeros((rest_cap, d), v.dtype).at[rd].set(v, mode="drop")
        rest_s = jnp.zeros((rest_cap,), jnp.float32).at[rd].set(
            sc, mode="drop")
        rest_c = jnp.zeros((rest_cap, NUM_COLS), jnp.int32).at[rd].set(
            ct, mode="drop")
        rest_g = jnp.full((rest_cap,), -1, jnp.int32).at[rd].set(
            gid_local, mode="drop")
        return (main_v.reshape(1, n_cells, cell_cap, d),
                main_s.reshape(1, n_cells, 1, cell_cap),
                main_c.reshape(n_cells, cell_cap, NUM_COLS)
                .transpose(0, 2, 1)[None],
                main_g.reshape(1, n_cells, cell_cap),
                rest_v[None], rest_s.reshape(1, 1, rest_cap),
                rest_c.T[None], rest_g[None])

    sp = _index_spec(mesh)
    return jax.shard_map(body, mesh=mesh, in_specs=(sp,) * 5,
                         out_specs=(sp,) * 8, check_vma=False)(
        vecs, scales, cols, dest, rest_dest)


@functools.partial(jax.jit, static_argnames=("mesh", "m_pad"))
def _pack_flat_sharded(mesh, vecs, scales, cols, dest, *, m_pad: int):
    """Scatter each shard's rows into its flat cell-major layout ON DEVICE.

    The flat-layout twin of :func:`_pack_ivf_sharded`: ``dest`` [n, 2, cap]
    int32 carries the host-planned primary (slot 0) and replica (slot 1)
    positions per row (OOB = dropped / no replica / tombstoned); the bulk
    vector data never leaves HBM.
    """

    def body(vecs, scales, cols, dest):
        shard = _global_shard(mesh)
        v = vecs[0]               # [cap, D]
        sc = scales[0, 0]         # [cap]
        ct = cols[0].T            # [cap, NUM_COLS]
        cap = v.shape[0]
        d = v.shape[1]
        gid_local = (shard * cap + jnp.arange(cap)).astype(jnp.int32)
        fv = jnp.zeros((m_pad, d), v.dtype)
        fs = jnp.zeros((m_pad,), jnp.float32)
        fc = jnp.zeros((m_pad, NUM_COLS), jnp.int32)
        fg = jnp.full((m_pad,), -1, jnp.int32)
        for j in range(2):
            dj = dest[0, j]
            fv = fv.at[dj].set(v, mode="drop")
            fs = fs.at[dj].set(sc, mode="drop")
            fc = fc.at[dj].set(ct, mode="drop")
            fg = fg.at[dj].set(gid_local, mode="drop")
        return (fv[None], fs.reshape(1, 1, m_pad),
                fc.T[None], fg[None])

    sp = _index_spec(mesh)
    return jax.shard_map(body, mesh=mesh, in_specs=(sp,) * 4,
                         out_specs=(sp,) * 4, check_vma=False)(
        vecs, scales, cols, dest)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(buf, shard_idx, rows, vals):
    return buf.at[shard_idx, rows].set(vals, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_cols(cols, shard_idx, rows, vals):
    # cols [n, NUM_COLS, cap]; vals [u, NUM_COLS]
    return cols.at[shard_idx, :, rows].set(vals, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_scales(scales, shard_idx, rows, vals):
    return scales.at[shard_idx, 0, rows].set(vals, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(1,))
def _tombstone_matching(cols, col_idx: int, match_id):
    hit = cols[:, col_idx, :] == match_id
    valid = jnp.where(hit, 0, cols[:, COL_VALID, :])
    return cols.at[:, COL_VALID, :].set(valid)


class ShardedIndex:
    """Host handle for a mesh-sharded index (uniform per-shard capacity)."""

    UPDATE_BUCKETS = (256, 4096)

    def __init__(self, mesh: Mesh, cap_per_shard: int, dim: int,
                 sparse_slots: int, dtype: str = "bfloat16"):
        assert cap_per_shard % 128 == 0, "capacity must be lane-aligned"
        self.mesh = mesh
        # Total shards across the mesh (slice x shard on a pod mesh).
        self.n_shards = (mesh.shape[SHARD_AXIS]
                         * mesh.shape.get(SLICE_AXIS, 1))
        self.cap = cap_per_shard
        self.dim = dim
        self.sparse_slots = sparse_slots
        self.dtype = dtype
        store_dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                    "int8": jnp.int8}[dtype]
        sh = lambda: NamedSharding(mesh, _index_spec(mesh))
        n, cap = self.n_shards, cap_per_shard
        self.vecs = jax.device_put(jnp.zeros((n, cap, dim), store_dt), sh())
        # Always allocated (tiny) so shard_map arg structure is static; the
        # dense kernel only reads it for int8 segments.
        self.scales = jax.device_put(jnp.zeros((n, 1, cap), jnp.float32), sh())
        # Slot-major [S, cap] per shard (lane-dense; see ops/sparse_scan.py).
        self.terms = jax.device_put(
            jnp.full((n, sparse_slots, cap), TERM_PAD, jnp.int32), sh())
        self.weights = jax.device_put(
            jnp.zeros((n, sparse_slots, cap), jnp.float32), sh())
        self.cols = jax.device_put(jnp.zeros((n, NUM_COLS, cap), jnp.int32), sh())
        self._next = np.zeros(n, np.int64)
        self._free: list[list[int]] = [[] for _ in range(n)]
        # Per-chip IVF snapshot (build_ivf); staleness is governed by the
        # owning store's dirty flag, mirroring the flat IVFIndex contract.
        self.ivf: ShardedIVF | None = None
        # Per-chip inverted postings (build_postings): (terms, rows,
        # weights) stacked [n, S*cap]; None until built. Same staleness
        # contract as the IVF snapshot.
        self.postings: tuple | None = None
        self._postings_placeholder: tuple | None = None
        # Cold tier (offload(bq=True)): device keeps only the per-chip
        # quantized sketch + filter cols; exact rows live in host RAM
        # (parallel/sharded_cold.py). None while resident.
        self.cold = None

    # -- allocation: waterfill so shards stay evenly loaded (balanced scans) -
    def _allocate(self, count: int) -> tuple[np.ndarray, np.ndarray]:
        avail = np.asarray([(self.cap - self._next[s]) + len(self._free[s])
                            for s in range(self.n_shards)], np.int64)
        if count > int(avail.sum()):
            raise RuntimeError("sharded index full")
        used = self.cap - avail
        # Smallest level L with sum(clip(L - used, 0, avail)) >= count.
        lo, hi = int(used.min()), int(used.max()) + count
        while lo < hi:
            mid = (lo + hi) // 2
            if int(np.clip(mid - used, 0, avail).sum()) >= count:
                hi = mid
            else:
                lo = mid + 1
        take = np.clip(lo - used, 0, avail).astype(np.int64)
        # Trim overshoot from the smallest takers (preserves bulk free-list
        # reuse in the shards that need it most).
        over = int(take.sum()) - count
        for s in np.argsort(take):
            if over == 0:
                break
            cut = min(over, int(take[s]))
            take[s] -= cut
            over -= cut

        shard_idx = np.empty(count, np.int32)
        rows = np.empty(count, np.int32)
        pos = 0
        for s in range(self.n_shards):
            t = int(take[s])
            taken = 0
            while self._free[s] and taken < t:
                shard_idx[pos + taken] = s
                rows[pos + taken] = self._free[s].pop()
                taken += 1
            tail = t - taken
            if tail:
                r0 = self._next[s]
                shard_idx[pos + taken: pos + t] = s
                rows[pos + taken: pos + t] = np.arange(r0, r0 + tail)
                self._next[s] += tail
            pos += t
        return shard_idx, rows

    def _bucket(self, n: int) -> int:
        for b in self.UPDATE_BUCKETS:
            if n <= b:
                return b
        return self.UPDATE_BUCKETS[-1]

    def write_rows(self, dense: np.ndarray, col_rows: np.ndarray,
                   terms: np.ndarray, weights: np.ndarray) -> np.ndarray:
        """Insert n rows; returns their global ids (shard * cap + row)."""
        assert self.cold is None, (
            "write_rows on an offloaded (cold) sharded index — "
            "ensure_resident() first (index/segment.py's write contract)")
        n = len(dense)
        shard_idx, rows = self._allocate(n)
        b = self._bucket(n)
        si = np.zeros(b, np.int32)
        ri = np.full(b, self.cap, np.int32)  # OOB rows → dropped
        si[:n], ri[:n] = shard_idx, rows

        if self.dtype == "int8":
            scale = np.abs(dense).max(axis=1) / 127.0
            scale = np.where(scale == 0, 1.0, scale)
            q = np.clip(np.round(dense / scale[:, None]), -127, 127).astype(np.int8)
            v = np.zeros((b, self.dim), np.int8)
            v[:n] = q
            self.vecs = _scatter_rows(self.vecs, si, ri, jnp.asarray(v))
            sv = np.zeros(b, np.float32)
            sv[:n] = scale
            self.scales = _scatter_scales(self.scales, si, ri, jnp.asarray(sv))
        else:
            v = np.zeros((b, self.dim), np.float32)
            v[:n] = dense
            self.vecs = _scatter_rows(self.vecs, si, ri,
                                      jnp.asarray(v, self.vecs.dtype))

        tv = np.full((b, self.sparse_slots), TERM_PAD, np.int32)
        tv[:n] = terms
        self.terms = _scatter_cols(self.terms, si, ri, jnp.asarray(tv))
        wv = np.zeros((b, self.sparse_slots), np.float32)
        wv[:n] = weights
        self.weights = _scatter_cols(self.weights, si, ri, jnp.asarray(wv))
        cv = np.zeros((b, NUM_COLS), np.int32)
        cv[:n] = col_rows
        self.cols = _scatter_cols(self.cols, si, ri, jnp.asarray(cv))
        return shard_idx.astype(np.int64) * self.cap + rows

    def tombstone_doc(self, doc_id: int) -> None:
        """Tombstone every row of a document across all shards."""
        self.cols = _tombstone_matching(self.cols, COL_DOC, doc_id)
        if self.cold is not None:
            hc = self.cold.host_cols
            hit = hc[:, COL_DOC, :] == doc_id
            hc[:, COL_VALID, :] = np.where(hit, 0, hc[:, COL_VALID, :])

    def gather_terms(self, gids: np.ndarray) -> np.ndarray:
        """Sparse term ids of the given rows → host int32 [len(gids), S].

        A tiny device→host gather (len(gids) * S int32) that lets the store
        keep document frequencies EXACT on sharded deletes — the sharded
        index keeps no host term mirror, so the terms of dying rows are read
        back from the device right before they are tombstoned.
        """
        if len(gids) == 0:
            return np.empty((0, self.sparse_slots), np.int32)
        if self.cold is not None:  # terms live on host while cold
            return self.cold.host_terms[
                (gids // self.cap).astype(np.int64), :,
                (gids % self.cap).astype(np.int64)]
        si = jnp.asarray((gids // self.cap).astype(np.int32))
        ri = jnp.asarray((gids % self.cap).astype(np.int32))
        return np.asarray(_gather_terms_sharded(self.terms, si, ri))

    def tombstone_gids(self, gids: np.ndarray) -> None:
        if len(gids) == 0:
            return
        shard_idx = (gids // self.cap).astype(np.int32)
        rows = (gids % self.cap).astype(np.int32)
        b = self._bucket(len(gids))
        si = np.zeros(b, np.int32)
        ri = np.full(b, self.cap, np.int32)
        si[: len(gids)], ri[: len(gids)] = shard_idx, rows
        self.cols = _tombstone_rows_sharded(self.cols, jnp.asarray(si),
                                            jnp.asarray(ri))
        if self.cold is not None:
            self.cold.host_cols[shard_idx, COL_VALID, rows] = 0
        for s, r in zip(shard_idx, rows):
            self._free[int(s)].append(int(r))

    # -- persistence (host spill/restore, mirrors Segment.to_host) ----------
    def to_host(self) -> dict:
        if self.cold is not None:
            # The exact tier is already host-resident; cols come from the
            # device copy (carries tombstones applied while cold).
            c = self.cold
            vecs = np.asarray(c.host_vecs, np.float32)
            return {
                "n_shards": self.n_shards, "cap": self.cap, "dim": self.dim,
                "sparse_slots": self.sparse_slots, "dtype": self.dtype,
                "vecs": vecs,
                "scales": (c.host_scales if c.host_scales is not None
                           else np.zeros((self.n_shards, 1, self.cap),
                                         np.float32)),
                "terms": c.host_terms, "weights": c.host_weights,
                "cols": np.asarray(self.cols),
                "next": self._next,
                "free": np.asarray(
                    [[s, r] for s in range(self.n_shards)
                     for r in self._free[s]], np.int64).reshape(-1, 2),
            }
        vecs = self.vecs
        if self.dtype == "bfloat16":
            vecs = vecs.astype(jnp.float32)
        return {
            "n_shards": self.n_shards, "cap": self.cap, "dim": self.dim,
            "sparse_slots": self.sparse_slots, "dtype": self.dtype,
            "vecs": np.asarray(vecs), "scales": np.asarray(self.scales),
            "terms": np.asarray(self.terms),
            "weights": np.asarray(self.weights),
            "cols": np.asarray(self.cols),
            "next": self._next,
            "free": np.asarray(
                [[s, r] for s in range(self.n_shards)
                 for r in self._free[s]], np.int64).reshape(-1, 2),
        }

    @classmethod
    def from_host(cls, mesh: Mesh, data: dict) -> "ShardedIndex":
        idx = cls(mesh, int(data["cap"]), int(data["dim"]),
                  int(data["sparse_slots"]), str(data["dtype"]))
        sh = NamedSharding(mesh, _index_spec(mesh))
        put = lambda x, dt=None: jax.device_put(
            jnp.asarray(x, dt) if dt else jnp.asarray(x), sh)
        idx.vecs = put(data["vecs"], idx.vecs.dtype)
        idx.scales = put(data["scales"])
        idx.terms = put(data["terms"])
        idx.weights = put(data["weights"])
        idx.cols = put(data["cols"])
        idx._next = np.asarray(data["next"], np.int64)
        for s, r in np.asarray(data["free"]).reshape(-1, 2):
            idx._free[int(s)].append(int(r))
        return idx

    @property
    def live_count(self) -> int:
        return int(np.asarray(
            (self.cols[:, COL_VALID, :] > 0).sum()))

    # -- cold tier: device sketch + host exact rows (sharded_cold.py) -------
    def offload(self, bq: bool = True, bits: int | None = None) -> dict:
        """Move the exact tier to host RAM, leaving a per-chip quantized
        sketch (+ filter cols) in HBM — the sharded twin of
        index/segment.py::offload(bq=True). Device memory drops from
        ~cap*(D + 8S + ...) bytes/shard to the sketch's ~bits*W + 4 bytes/row.

        Only the BQ-coarse serving mode exists for sharded indexes (the
        flat store's per-query PCIe streaming alternative has no sensible
        mesh analogue — every chip would stream every block)."""
        assert bq, "sharded cold tier requires the BQ sketch (bq=True)"
        if self.cold is not None:
            return {"already": True}
        from voitta_rag_tpu.config import get_settings
        from voitta_rag_tpu.parallel.sharded_cold import offload_sharded

        b = bits if bits is not None else get_settings().bq_bits
        self.cold = offload_sharded(self, b)
        # Free the exact device tier (the sketch + cols stay in HBM); the
        # read-optimized snapshots are rebuilt cold via build_ivf.
        self.vecs = self.scales = self.terms = self.weights = None
        self.ivf = None
        self.postings = None
        return {"bits": b, "device_bytes": self.cold.nbytes_device(),
                "host_bytes": self.cold.host_vecs.nbytes}

    def ensure_resident(self) -> None:
        """Re-upload the host exact tier and drop the cold state."""
        if self.cold is None:
            return
        cold = self.cold
        sh = NamedSharding(self.mesh, _index_spec(self.mesh))
        put = lambda x, dt=None: jax.device_put(
            jnp.asarray(np.asarray(x), dt) if dt else
            jnp.asarray(np.asarray(x)), sh)
        store_dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                    "int8": jnp.int8}[self.dtype]
        self.vecs = put(cold.host_vecs, store_dt)
        self.scales = (put(cold.host_scales) if cold.host_scales is not None
                       else jax.device_put(
                           jnp.zeros((self.n_shards, 1, self.cap),
                                     jnp.float32), sh))
        self.terms = put(cold.host_terms)
        self.weights = put(cold.host_weights)
        # The device cols carry tombstones applied while cold — keep them.
        self.cold = None

    def build_ivf(self, n_cells: int, *, kmeans_iters: int = 25,
                  skew_factor: float = 2.0, seed: int = 0, assign_k: int = 1,
                  assign_margin: float | None = None,
                  train_sample: int = 262144,
                  spill_levels: int = 2, layout: str | None = None,
                  probe_cap: int = 0) -> dict:
        """Build the per-chip IVF snapshot from live rows.

        Centroids train on a cross-shard device sample; the full assignment
        runs blocked on device; the host computes only the per-row slot
        destinations (int32, a few MB); the cell-major packing scatter runs
        under ``shard_map`` so the vector data never leaves HBM.
        ``assign_margin`` gates secondary replicas to boundary rows, same
        semantics as the flat build (index/ivf.py).

        ``layout`` (default: ``settings.ivf_layout``) selects the per-chip
        device layout: "flat" variable-length lists (index/ivf_flat.py) or
        "padded" fixed cell blocks + residual. The cold (sketch) build is
        layout-independent (its permutation is over sketch words).
        """
        if self.cold is not None:
            # Cold composition: permute each chip's SKETCH cell-major behind
            # shared centroids (parallel/sharded_cold.py) — the 100M path.
            from voitta_rag_tpu.parallel.sharded_cold import (
                build_cold_ivf_sharded,
            )

            return build_cold_ivf_sharded(
                self, self.cold, n_cells, kmeans_iters=kmeans_iters,
                assign_k=assign_k, assign_margin=assign_margin,
                skew_factor=skew_factor, spill_levels=spill_levels,
                train_sample=train_sample, seed=seed)
        if layout is None:
            from voitta_rag_tpu.config import get_settings

            layout = get_settings().ivf_layout
        if layout == "flat":
            return self._build_ivf_flat(
                n_cells, kmeans_iters=kmeans_iters,
                assign_margin=assign_margin, train_sample=train_sample,
                seed=seed, probe_cap=probe_cap)

        from voitta_rag_tpu.index.ivf import (
            _assign_topk_cells, _block_rows_for, _kmeans_train,
            pack_permutation,
        )

        n, cap = self.n_shards, self.cap
        valid = np.asarray(self.cols[:, COL_VALID, :] > 0)   # [n, cap]
        n_live = int(valid.sum())
        if n_cells <= 1 or n_live < max(n_cells, 256):
            raise ValueError(
                f"need >= max(n_cells, 256) live rows for IVF "
                f"(have {n_live}, n_cells={n_cells})")
        is_int8 = self.dtype == "int8"

        # --- centroids from a cross-shard sample (device gather) ---
        flat_valid = np.flatnonzero(valid.reshape(-1))
        rng = np.random.default_rng(seed)
        ns = min(n_live, max(train_sample, n_cells * 4))
        pick = rng.choice(flat_valid, ns, replace=False)
        train_v = _gather_rows_f32(
            self.vecs, self.scales,
            jnp.asarray((pick // cap).astype(np.int32)),
            jnp.asarray((pick % cap).astype(np.int32)), is_int8)
        br = _block_rows_for(n_cells)
        centroids = _kmeans_train(train_v, None, n_cells, kmeans_iters,
                                  max(1, ns // br), seed)

        # --- full blocked assignment (host pulls [n*cap, k] int32 only) ---
        flat_vecs = self.vecs.reshape(n * cap, self.dim)
        flat_scales = self.scales.reshape(n * cap) if is_int8 else None
        n_blocks_a = max(1, -(-(n * cap) // br))
        k_all = min(max(assign_k, 1 + max(spill_levels, 0)), n_cells)
        need_sims = ((assign_k > 1 and assign_margin is not None)
                     or spill_levels > 0)
        if need_sims:
            assign_all_d, sims_d = _assign_topk_cells(
                flat_vecs, flat_scales, centroids, k_all, n_blocks_a,
                with_sims=True)
            assign_all = np.array(assign_all_d)
            sims = np.asarray(sims_d)
        else:
            assign_all = np.asarray(_assign_topk_cells(
                flat_vecs, flat_scales, centroids, k_all, n_blocks_a))
            sims = None
        assign = np.ascontiguousarray(assign_all[:, :assign_k])
        if assign_k > 1 and assign_margin is not None:
            gate = sims[:, 1:assign_k] >= (sims[:, :1] - assign_margin)
            assign[:, 1:] = np.where(gate, assign[:, 1:], -1)
            total_rows = n_live + int(
                (gate.reshape(n, cap, assign_k - 1)
                 & valid[:, :, None]).sum())
        else:
            total_rows = n_live * assign_k
        # Margin-gated spill fallbacks (same semantics + rationale as the
        # flat build, index/ivf.py): overflow rows home into a boundary
        # neighbor cell instead of the always-scanned residual.
        spill3 = None
        if spill_levels > 0 and k_all > 1:
            sm = assign_margin if assign_margin is not None else 0.05
            sp = np.where(sims[:, 1:1 + spill_levels] >= sims[:, :1] - sm,
                          assign_all[:, 1:1 + spill_levels], -1)
            spill3 = sp.reshape(n, cap, -1)
        assign = assign.reshape(n, cap, assign_k)
        assign_all = sims = None

        # --- per-shard packing permutation (host int arithmetic) ---
        cell_cap = round_up(
            max(int(skew_factor * total_rows / (n * n_cells)), 128),
            128)
        n_slots = n_cells * cell_cap
        dest_of = np.full((n, assign_k, cap), n_slots, np.int32)  # OOB drop
        rest_lists = []
        for s in range(n):
            rows_v = np.flatnonzero(valid[s]).astype(np.int64)
            if len(rows_v) == 0:
                rest_lists.append(np.empty(0, np.int64))
                continue
            src, dest, prio, rest_src = pack_permutation(
                assign[s][rows_v], n_cells, cell_cap,
                spill=None if spill3 is None else spill3[s][rows_v])
            dest_of[s, prio, rows_v[src]] = dest
            rest_lists.append(rows_v[rest_src])
        rest_cap = round_up(
            max(max((len(r) for r in rest_lists), default=0), 1), 128)
        rest_of = np.full((n, cap), rest_cap, np.int32)  # OOB → dropped
        for s, rl in enumerate(rest_lists):
            rest_of[s, rl] = np.arange(len(rl), dtype=np.int32)

        # --- device packing under shard_map ---
        sh = NamedSharding(self.mesh, _index_spec(self.mesh))
        (vecs3, scales3, cols3, gid3, rest_vecs, rest_scales, rest_cols,
         rest_gid) = _pack_ivf_sharded(
            self.mesh, self.vecs, self.scales, self.cols,
            jax.device_put(jnp.asarray(dest_of), sh),
            jax.device_put(jnp.asarray(rest_of), sh),
            n_cells=n_cells, cell_cap=cell_cap, rest_cap=rest_cap,
            assign_k=assign_k)
        self.ivf = ShardedIVF(
            centroids=centroids, vecs3=vecs3, cols3=cols3, gid3=gid3,
            scales3=scales3, rest_vecs=rest_vecs, rest_cols=rest_cols,
            rest_gid=rest_gid, rest_scales=rest_scales, assign_k=assign_k)
        return {"layout": "padded", "cells": n_cells, "rows": n_live,
                "cell_cap": cell_cap,
                "residual": int(np.asarray((rest_gid >= 0).sum())),
                "shards": n}

    def _build_ivf_flat(self, n_cells: int, *, kmeans_iters: int,
                        assign_margin: float | None, train_sample: int,
                        seed: int, probe_cap: int = 0) -> dict:
        """Per-chip variable-length inverted lists (ShardedIVFFlat).

        Shared k-means centroids (cross-shard sample, identical to the
        padded build); each shard then plans its OWN flat cell-major layout
        on the host (index/ivf_flat.py::plan_layout — hot-cell positional
        splitting, margin-boundary replicas) and the packing scatter runs
        under ``shard_map``. Per-shard memory is exactly its row count, so
        Zipf-skewed real corpora neither overflow nor pad (the padded
        layout measured 40% row overflow at any affordable cap on the
        harvested 10M corpus). ``probe_cap`` is mesh-uniform (the search
        program's window shape is static): auto-sized from the per-shard
        cell-size distributions when 0.
        """
        from voitta_rag_tpu.index.ivf import (
            _assign_topk_cells, _block_rows_for, _kmeans_train,
        )
        from voitta_rag_tpu.index.ivf_flat import plan_layout

        n, cap = self.n_shards, self.cap
        valid = np.asarray(self.cols[:, COL_VALID, :] > 0)   # [n, cap]
        n_live = int(valid.sum())
        if n_cells <= 1 or n_live < max(n_cells, 256):
            raise ValueError(
                f"need >= max(n_cells, 256) live rows for IVF "
                f"(have {n_live}, n_cells={n_cells})")
        is_int8 = self.dtype == "int8"

        # --- shared centroids from a cross-shard sample (device gather) ---
        flat_valid = np.flatnonzero(valid.reshape(-1))
        rng = np.random.default_rng(seed)
        ns = min(n_live, max(train_sample, n_cells * 4))
        pick = rng.choice(flat_valid, ns, replace=False)
        train_v = _gather_rows_f32(
            self.vecs, self.scales,
            jnp.asarray((pick // cap).astype(np.int32)),
            jnp.asarray((pick % cap).astype(np.int32)), is_int8)
        br = _block_rows_for(n_cells)
        centroids = _kmeans_train(train_v, None, n_cells, kmeans_iters,
                                  max(1, ns // br), seed)

        # --- top-2 blocked assignment (host pulls [n*cap, 2] + sims) ---
        flat_vecs = self.vecs.reshape(n * cap, self.dim)
        flat_scales = self.scales.reshape(n * cap) if is_int8 else None
        k2 = min(2, n_cells)
        a2_d, s2_d = _assign_topk_cells(
            flat_vecs, flat_scales, centroids, k2,
            max(1, -(-(n * cap) // br)), with_sims=True)
        a2 = np.asarray(a2_d).reshape(n, cap, k2)
        s2 = np.asarray(s2_d).reshape(n, cap, k2)
        if k2 == 1:  # n_cells == 1 degenerate
            a2 = np.repeat(a2, 2, axis=2)
            s2 = np.repeat(s2, 2, axis=2)
        margin = 0.05 if assign_margin is None else assign_margin
        if probe_cap <= 0:
            # Auto window (same policy as IVFFlatIndex.build), sized by the
            # worst shard so full probes of even cells stay exact.
            max_c, total = 0, 0
            for s in range(n):
                aa, ss = a2[s][valid[s]], s2[s][valid[s]]
                counts = np.bincount(np.concatenate([
                    aa[:, 0],
                    aa[(ss[:, 0] - ss[:, 1]) <= margin, 1],
                ]).astype(np.int64), minlength=n_cells)
                max_c = max(max_c, int(counts.max()) if counts.size else 0)
                total += int(counts.sum())
            mean = max(total // max(n * n_cells, 1), 1)
            probe_cap = min(round_up(max(max_c, 1), 128),
                            max(1024, round_up(4 * mean, 128)))

        # --- per-shard host plans -> one mesh-wide scatter ---
        plans = []
        for s in range(n):
            rows_v = np.flatnonzero(valid[s]).astype(np.int64)
            plans.append((rows_v, *plan_layout(
                a2[s][rows_v], s2[s][rows_v], n_cells=n_cells,
                probe_cap=probe_cap, margin=margin)))
        m_pad = round_up(max(max(pl[4] for pl in plans), 128), 128)
        cv_max = max(len(pl[5]) for pl in plans)
        dest_of = np.full((n, 2, cap), m_pad, np.int32)  # OOB → dropped
        starts_pad = np.empty((n, cv_max + 1), np.int32)
        cents_np = np.asarray(centroids)
        cents3 = np.zeros((n, cv_max, cents_np.shape[1]), np.float32)
        for s, (rows_v, ppos, rpos, starts_s, m_s, cmap) in enumerate(plans):
            dest_of[s, 0, rows_v] = ppos
            has_rep = rpos >= 0
            dest_of[s, 1, rows_v[has_rep]] = rpos[has_rep]
            cv = len(cmap)
            starts_pad[s, :cv + 1] = starts_s
            starts_pad[s, cv + 1:] = starts_s[-1]  # pad cells: empty windows
            cents3[s, :cv] = cents_np[cmap]

        sh = NamedSharding(self.mesh, _index_spec(self.mesh))
        fvecs, fscales, fcols, fgids = _pack_flat_sharded(
            self.mesh, self.vecs, self.scales, self.cols,
            jax.device_put(jnp.asarray(dest_of), sh), m_pad=m_pad)
        self.ivf = ShardedIVFFlat(
            centroids3=jax.device_put(jnp.asarray(cents3), sh),
            vecs=fvecs, cols=fcols, gids=fgids, scales=fscales,
            starts=jax.device_put(jnp.asarray(starts_pad), sh),
            probe_cap=probe_cap)
        return {"layout": "flat", "cells": n_cells, "virtual_cells": cv_max,
                "rows": n_live, "probe_cap": probe_cap,
                "replicas": int(np.asarray((fgids >= 0).sum())) - n_live,
                "shards": n}

    def build_postings(self) -> dict:
        """Build the per-chip inverted-postings snapshot (device-side sorts
        under shard_map; nothing crosses ICI)."""
        assert self.cold is None, (
            "cold sharded indexes serve sparse from exact host postings "
            "already (sharded_cold.py) — no device snapshot to build")
        t, g, w = _build_postings_sharded(self.mesh, self.terms,
                                          self.weights, self.cols)
        self.postings = (t, g, w)
        n_live = int(np.asarray((g >= 0).sum()))
        return {"postings": n_live, "rows": self.live_count,
                "shards": self.n_shards}

    def _postings_or_placeholder(self, use_postings: bool):
        if use_postings and self.postings is not None:
            return self.postings
        if self._postings_placeholder is None:
            # Cached: allocating + device_put-ing per query would tax the
            # hot search path in the default (no-snapshot) state.
            sh = NamedSharding(self.mesh, _index_spec(self.mesh))
            n = self.n_shards
            z = jax.device_put(jnp.zeros((n, 1), jnp.int32), sh)
            self._postings_placeholder = (
                z, z, jax.device_put(jnp.zeros((n, 1), jnp.float32), sh))
        return self._postings_placeholder

    def search(self, q, spec, qt=None, qw=None, sparse_weight=0.1, *,
               limit=10, prefetch_multiplier=3, fusion=True, nprobe=None,
               use_postings=False, max_postings=4096, oversample=None):
        if self.cold is not None:
            from voitta_rag_tpu.parallel.sharded_cold import search_cold

            return search_cold(
                self, q, spec, qt, qw, sparse_weight, limit=limit,
                prefetch_multiplier=prefetch_multiplier, fusion=fusion,
                nprobe=nprobe, oversample=oversample)
        # Replica-parallel serving: the query batch is sharded across
        # replica groups, so it must divide evenly — pad with the first
        # query (cheap; identical work profile) and trim the rows after.
        n_rep = _n_replicas(self.mesh)
        b = q.shape[0]
        if n_rep > 1 and b % n_rep:
            pad = n_rep - b % n_rep
            q = jnp.concatenate(
                [q, jnp.broadcast_to(q[:1], (pad,) + q.shape[1:])])
            scores, gids = self.search(
                q, spec, qt, qw, sparse_weight, limit=limit,
                prefetch_multiplier=prefetch_multiplier, fusion=fusion,
                nprobe=nprobe, use_postings=use_postings,
                max_postings=max_postings)
            return scores[:b], gids[:b]
        has_sparse = qt is not None
        if qt is None:
            qt = jnp.full((1, 1), TERM_PAD, jnp.int32)
            qw = jnp.zeros((1, 1), jnp.float32)
        use_postings = bool(use_postings and has_sparse
                            and self.postings is not None)
        pt, pg, pw = self._postings_or_placeholder(use_postings)
        if nprobe is not None and self.ivf is not None:
            iv = self.ivf
            if isinstance(iv, ShardedIVFFlat):
                return sharded_ivf_flat_search(
                    self.mesh, q, spec, iv.centroids3, iv.vecs, iv.cols,
                    iv.gids, iv.scales, iv.starts,
                    self.terms, self.weights, self.cols,
                    pt, pg, pw,
                    jnp.asarray(qt), jnp.asarray(qw), sparse_weight,
                    nprobe=min(nprobe, iv.n_cells), limit=limit,
                    probe_cap=iv.probe_cap,
                    prefetch_multiplier=prefetch_multiplier,
                    has_sparse=has_sparse, use_fusion=fusion,
                    use_postings=use_postings, max_postings=max_postings)
            return sharded_ivf_search(
                self.mesh, q, spec, iv.centroids, iv.vecs3, iv.cols3,
                iv.gid3, iv.scales3, iv.rest_vecs, iv.rest_cols, iv.rest_gid,
                iv.rest_scales, self.terms, self.weights, self.cols,
                pt, pg, pw,
                jnp.asarray(qt), jnp.asarray(qw), sparse_weight,
                nprobe=min(nprobe, iv.n_cells), limit=limit,
                prefetch_multiplier=prefetch_multiplier,
                has_sparse=has_sparse, use_fusion=fusion,
                assign_k=iv.assign_k, use_postings=use_postings,
                max_postings=max_postings)
        return sharded_search(
            self.mesh, q, spec, self.vecs, self.cols, self.scales,
            self.terms, self.weights, pt, pg, pw,
            jnp.asarray(qt), jnp.asarray(qw),
            sparse_weight, limit=limit,
            prefetch_multiplier=prefetch_multiplier,
            has_sparse=has_sparse, use_fusion=fusion,
            use_postings=use_postings, max_postings=max_postings)


@functools.partial(jax.jit, donate_argnums=(0,))
def _tombstone_rows_sharded(cols, shard_idx, rows):
    return cols.at[shard_idx, COL_VALID, rows].set(0, mode="drop")


@jax.jit
def _gather_terms_sharded(terms, shard_idx, rows):
    # terms [n, S, cap] → [len(gids), S]; XLA inserts the cross-shard gather.
    return terms[shard_idx, :, rows]
