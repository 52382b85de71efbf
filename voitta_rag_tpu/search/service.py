"""SearchService: the full query hot path, fused on device.

Reference call stack (SURVEY.md §3.2): embed_query (torch) → sparse embed
(ONNX) → two Qdrant HTTP round-trips → host-side fusion. Here the dense
path — query encode (Pallas fused-attention encoder), masked segment scans,
candidate selection, hybrid fusion — executes as ONE jitted device program
per segment-count: tokens in, (scores, gids) out. The only host work is
tokenization, BM25 query hashing + IDF lookup, and payload materialization.
That single-dispatch structure is what the p50 < 5 ms target (BASELINE.md)
rides on: no host↔device ping-pong between encode and scan.
"""

from __future__ import annotations

import functools
import threading

import numpy as np
import jax
import jax.numpy as jnp

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.core_types import StoredChunk
from voitta_rag_tpu.index.store import TpuVectorStore, get_vector_store
from voitta_rag_tpu.models.encoder import EncoderConfig, encode_tokens
from voitta_rag_tpu.ops.dense_scan import dense_scan_scores
from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores, TERM_PAD
from voitta_rag_tpu.ops.filters import FilterSpec, make_filter_spec
from voitta_rag_tpu.ops.fusion import hybrid_fuse, rrf_fuse
from voitta_rag_tpu.ops.topk import masked_topk
from voitta_rag_tpu.search.sparse_text import get_sparse_embedding_service
from voitta_rag_tpu.services.embedding import EmbeddingService, get_embedding_service


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "limit", "prefetch_multiplier", "has_sparse",
                     "fusion", "select_group", "select_pallas"),
)
def fused_query(
    params,
    cfg: EncoderConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    seg_vecs: tuple,
    seg_cols: tuple,
    seg_scales: tuple,
    seg_terms: tuple,
    seg_weights: tuple,
    spec: FilterSpec,
    qt: jax.Array,
    qw: jax.Array,
    sparse_weight: jax.Array,
    *,
    limit: int,
    prefetch_multiplier: int,
    has_sparse: bool,
    fusion: str = "weighted",
    select_group: int = 0,
    select_pallas: bool = False,
):
    """Encode the query and search all segments in one device program.

    With ``select_group > 0`` the dense side runs the fused scan→group-winner
    kernel (ops/scan_select.py) and fusion happens on candidate LISTS — the
    [B, N] f32 score arrays (and the [1, N]→[B, N] sparse broadcast) never
    materialize in HBM. The sparse side still scores all rows (its slot-array
    read dominates; its [1, N] f32 output is N*4 bytes, not B*N*4) and is cut
    to one top-p list broadcast across the batch.
    """
    from voitta_rag_tpu.ops.fusion import (
        hybrid_fuse_candidates, rrf_fuse_candidates,
    )
    from voitta_rag_tpu.ops.scan_select import dense_scan_select
    from voitta_rag_tpu.ops.topk import topk_from_lists

    q = encode_tokens(params, cfg, input_ids, attention_mask)  # [1, D]

    if select_group:
        dv, di, offset = [], [], 0
        for v, c, s in zip(seg_vecs, seg_cols, seg_scales):
            vals, rows = dense_scan_select(
                q, v, c, spec, s, group=select_group, row_offset=offset,
                use_pallas=select_pallas)
            dv.append(vals)
            di.append(rows)
            offset += v.shape[0]
        d_vals = jnp.concatenate(dv, axis=1)
        d_ids = jnp.concatenate(di, axis=1)
        if not has_sparse:
            return topk_from_lists(d_vals, d_ids, limit)
        s_parts = [sparse_scan_scores(qt, qw, t, w, c, spec)
                   for t, w, c in zip(seg_terms, seg_weights, seg_cols)]
        sparse_scores = jnp.concatenate(s_parts, axis=1)  # [1, N]
        p = min(limit * prefetch_multiplier, sparse_scores.shape[-1])
        s_vals, s_gids = masked_topk(
            sparse_scores, p, approx=sparse_scores.shape[-1] > (1 << 16))
        s_vals = jnp.broadcast_to(s_vals, (d_vals.shape[0], p))
        s_gids = jnp.broadcast_to(s_gids, (d_vals.shape[0], p))
        if fusion == "rrf":
            return rrf_fuse_candidates(
                d_vals, d_ids, s_vals, s_gids, limit=limit,
                prefetch_multiplier=prefetch_multiplier)
        return hybrid_fuse_candidates(
            d_vals, d_ids, s_vals, s_gids, sparse_weight, limit=limit,
            prefetch_multiplier=prefetch_multiplier)

    d_parts = [dense_scan_scores(q, v, c, spec, s)
               for v, c, s in zip(seg_vecs, seg_cols, seg_scales)]
    dense_scores = jnp.concatenate(d_parts, axis=1)
    if has_sparse:
        s_parts = [sparse_scan_scores(qt, qw, t, w, c, spec)
                   for t, w, c in zip(seg_terms, seg_weights, seg_cols)]
        sparse_scores = jnp.broadcast_to(
            jnp.concatenate(s_parts, axis=1), dense_scores.shape)
        if fusion == "rrf":
            return rrf_fuse(dense_scores, sparse_scores, limit=limit,
                            prefetch_multiplier=prefetch_multiplier)
        return hybrid_fuse(dense_scores, sparse_scores, sparse_weight,
                           limit=limit,
                           prefetch_multiplier=prefetch_multiplier)
    return masked_topk(dense_scores, limit)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "limit", "prefetch_multiplier", "has_sparse",
                     "fusion", "nprobe", "assign_k", "max_postings",
                     "use_ivf", "ivf_select", "ivf_layout", "ivf_probe_cap",
                     "ivf_flat_pallas"),
)
def fused_snapshot_query(
    params,
    cfg: EncoderConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    # dense side: either IVF operands or flat segment tuples
    ivf_ops: tuple | None,
    seg_vecs: tuple,
    seg_cols: tuple,
    seg_scales: tuple,
    # sparse side: postings arrays + gid-indexed cols
    post_terms: jax.Array,
    post_gids: jax.Array,
    post_weights: jax.Array,
    post_cols: jax.Array,
    spec: FilterSpec,
    qt: jax.Array,
    qw: jax.Array,
    sparse_weight: jax.Array,
    *,
    limit: int,
    prefetch_multiplier: int,
    has_sparse: bool,
    fusion: str,
    nprobe: int,
    assign_k: int,
    max_postings: int,
    use_ivf: bool,
    ivf_select: str = "exact",
    ivf_layout: str = "padded",
    ivf_probe_cap: int = 0,
    ivf_flat_pallas: bool = False,
):
    """Encode + snapshot retrieval + fusion as ONE device program.

    Every extra dispatch costs milliseconds through a remote-TPU tunnel (and
    even locally costs a launch + scheduler barrier), so the serving hot
    path — the p50 < 5 ms target (BASELINE.md) — is a single jitted program:
    tokens in, (scores, gids) out.
    """
    from voitta_rag_tpu.index.ivf import _ivf_search_candidates
    from voitta_rag_tpu.index.postings import postings_candidates
    from voitta_rag_tpu.ops.fusion import (
        hybrid_fuse_candidates, rrf_fuse_candidates,
    )

    q = encode_tokens(params, cfg, input_ids, attention_mask)  # [1, D]
    p = limit * prefetch_multiplier
    if use_ivf and ivf_layout == "flat":
        from voitta_rag_tpu.index.ivf_flat import _ivf_flat_candidates

        # limit=p is already prefetch-expanded; prefetch_multiplier=1
        # keeps the in-probe top-k at p+8 (see store._search_snapshot).
        d_vals, d_gids = _ivf_flat_candidates(
            q, *ivf_ops, spec, nprobe=nprobe, limit=p,
            probe_cap=ivf_probe_cap, prefetch_multiplier=1,
            use_pallas=ivf_flat_pallas)
    elif use_ivf:
        d_vals, d_gids = _ivf_search_candidates(
            q, *ivf_ops, spec, nprobe=nprobe, limit=p, assign_k=assign_k,
            select=ivf_select)
    else:
        d_parts = [dense_scan_scores(q, v, c, spec, s)
                   for v, c, s in zip(seg_vecs, seg_cols, seg_scales)]
        dense_scores = jnp.concatenate(d_parts, axis=1)
        d_vals, d_gids = masked_topk(
            dense_scores, min(p, dense_scores.shape[-1]),
            approx=dense_scores.shape[-1] > (1 << 16))
    if not has_sparse:
        return d_vals[:, :limit], d_gids[:, :limit]
    s_vals, s_gids = postings_candidates(
        qt, qw, post_terms, post_gids, post_weights, post_cols, spec,
        limit=p, max_postings=max_postings)
    if fusion == "rrf":
        return rrf_fuse_candidates(d_vals, d_gids, s_vals, s_gids,
                                   limit=limit,
                                   prefetch_multiplier=prefetch_multiplier)
    return hybrid_fuse_candidates(d_vals, d_gids, s_vals, s_gids,
                                  sparse_weight, limit=limit,
                                  prefetch_multiplier=prefetch_multiplier)


class SearchService:
    """Query-text-in → StoredChunk-list-out, with the reference's filter and
    fusion semantics (mcp_server.py:373-526 behavior contract)."""

    def __init__(self, store: TpuVectorStore | None = None,
                 embedder: EmbeddingService | None = None):
        self.store = store or get_vector_store()
        self.embedder = embedder or get_embedding_service()
        self.sparse = get_sparse_embedding_service()
        settings = get_settings()
        self.prefetch_multiplier = settings.prefetch_multiplier
        self.default_sparse_weight = settings.sparse_weight

    def search(
        self,
        query: str,
        limit: int = 10,
        include_folders: list[str] | None = None,
        exclude_folders: list[str] | None = None,
        exclude_index_folders: list[str] | None = None,
        sparse_weight: float | None = None,
        date_start: int | None = None,
        date_end: int | None = None,
        date_field: str | None = None,
        hybrid: bool = True,
        fusion: str = "weighted",
    ) -> list[StoredChunk]:
        return self._search_impl(
            query, limit, include_folders, exclude_folders,
            exclude_index_folders, sparse_weight, date_start, date_end,
            date_field, hybrid, fusion)

    def _search_impl(self, query, limit, include_folders, exclude_folders,
                     exclude_index_folders, sparse_weight, date_start,
                     date_end, date_field, hybrid, fusion):
        store = self.store
        store._ensure_open()
        if store.count() == 0 or (not store.segments
                                  and not store.sharded_active):
            return []
        if sparse_weight is None:
            sparse_weight = self.default_sparse_weight

        # Cold segments present? Route to the store path (it streams or
        # BQ-serves them and resolves filters itself) — decided up front so
        # filter ids / the FilterSpec are never built twice per query.
        # Sharded stores have an empty segment list, so the routes are
        # mutually exclusive. This pre-lock check only decides whether to
        # build the FilterSpec; the routing decision is RE-CHECKED under
        # the store lock below — a segment offloading between here and the
        # lock must not let the fused path jit-capture a host-resident
        # seg.vecs (that re-uploads the whole segment, which on a genuinely
        # beyond-HBM store can OOM the device, not just run slow).
        cold_route = any(not seg.resident for seg in store.segments)
        spec = None
        if not cold_route:
            include_ids, exclude_ids, exclude_if_ids, impossible = (
                store._resolve_filter_ids(None, include_folders,
                                          exclude_folders,
                                          exclude_index_folders))
            if impossible:
                return []
            spec = make_filter_spec(
                include_folder_ids=include_ids,
                exclude_folder_ids=exclude_ids,
                exclude_index_folder_ids=exclude_if_ids,
                date_start=date_start, date_end=date_end,
                date_field=date_field)

        from voitta_rag_tpu.utils.profiling import trace

        with trace("search.tokenize"):
            ids, mask = self.embedder.tokenize_query(query)
        cfg, params = self.embedder.encoder

        qt = qw = sv = None
        has_sparse = False
        if hybrid:
            sv = self.sparse.embed_query(query)
            if len(sv):
                qt, qw = store._sparse_query_arrays(sv)
                has_sparse = True
        if qt is None:
            qt = np.full((1, 1), TERM_PAD, np.int32)
            qw = np.zeros((1, 1), np.float32)

        # Store lock for ref-capture + DISPATCH only: segment mutations are
        # donated scatter programs, so capturing seg buffers (or snapshot
        # arrays) must be atomic against them ("Array has been deleted",
        # see TpuVectorStore.search). Tokenization/sparse prep above and
        # the device SYNC + payload materialization below run lock-free,
        # so queries neither serialize on each other's device time nor
        # queue behind writers' under-lock work.
        deferred = None
        with store._lock:
            if store.sharded_active:
                # Multi-chip path: encode, then per-shard scans + ICI merge.
                with trace("search.encode"):
                    q = np.asarray(encode_tokens(
                        params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
                with trace("search.sharded"):
                    deferred = store._search_sharded(
                        q, spec, qt, qw, limit,
                        jnp.asarray(sparse_weight, jnp.float32), has_sparse)

            elif cold_route or any(not seg.resident
                                   for seg in store.segments):
                # Cold tier present: every fused path below captures
                # seg.vecs directly, which for an offloaded segment is a
                # HOST array — the jit boundary would re-upload the whole
                # segment on every query. Route to the store path instead,
                # which streams cold segments block-wise or serves their
                # BQ shadows (index/bq_serve.py) and only re-reads the
                # candidate rows. Re-checked here under the lock: an
                # offload racing the pre-lock check flips this query to
                # the (still-correct) store path instead of letting the
                # fused path capture host arrays. A stale True (segment
                # re-warmed meanwhile) also takes the store path — spec
                # is None in that case, and the store resolves filters
                # itself.
                with trace("search.encode"):
                    q = np.asarray(encode_tokens(
                        params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
                with trace("search.cold"):
                    res = store._search_locked(
                        q[0], limit, None, include_folders, exclude_folders,
                        exclude_index_folders, sv if has_sparse else None,
                        sparse_weight, date_start, date_end, date_field,
                        fusion)
                if isinstance(res, list):  # resolved (empty/edge) result
                    return res
                deferred = res

            else:
                deferred = self._dispatch_hot(
                    store, params, cfg, ids, mask, spec, qt, qw,
                    sparse_weight, limit, has_sparse, fusion)
        scores, gids, gen = deferred
        with trace("search.materialize"):
            return store._materialize(np.asarray(scores)[0],
                                      np.asarray(gids)[0],
                                      expected_generation=gen)

    def _dispatch_hot(self, store, params, cfg, ids, mask, spec, qt, qw,
                      sparse_weight, limit, has_sparse, fusion):
        """Dispatch the hot (all-resident) serving paths under the caller's
        store lock; returns (scores, gids, gen) device arrays to sync
        outside it."""
        from voitta_rag_tpu.utils.profiling import trace

        gen = store.generation  # detect gid reuse racing this search
        # ivf_active may reflect a COLD IVF snapshot (ivf_bq.py); the
        # fused path only knows the exact-tier IVF layout. Cold stores
        # were routed to the store path above, so this only differs in
        # the (transient) all-segments-rewarmed-while-clean state.
        use_ivf = store.ivf_active and store._ivf is not None
        use_postings = store.postings_active
        if (use_ivf and not has_sparse) or (has_sparse and use_postings):
            # Snapshot hot path: encode + probe-limited dense + inverted-
            # postings sparse + fusion, ONE jitted dispatch.
            ivf_ops = None
            ivf_layout = "padded"
            ivf_probe_cap = 0
            ivf_flat_pallas = False
            if use_ivf:
                from voitta_rag_tpu.index.ivf_flat import IVFFlatIndex

                ivf = store._ivf
                if isinstance(ivf, IVFFlatIndex):
                    ivf_layout = "flat"
                    ivf_probe_cap = ivf.probe_cap
                    ivf_flat_pallas = ivf.pallas_ok()
                    ivf_ops = (ivf.centroids, ivf.vecs, ivf.cols,
                               ivf.gids, ivf.scales, ivf.starts)
                else:
                    ivf_ops = (ivf.centroids, ivf.vecs3, ivf.cols3,
                               ivf.gid3, ivf.rest_vecs, ivf.rest_cols,
                               ivf.rest_gid, ivf.scales3,
                               ivf.rest_scales)
            if use_postings:
                post = store._postings
                post_arrays = (post.terms, post.gids, post.weights,
                               store._postings_cols)
            else:  # dense-only query: tiny placeholders, path unused
                z = jnp.zeros((1,), jnp.int32)
                post_arrays = (z, z, jnp.zeros((1,), jnp.float32),
                               jnp.zeros((8, 1), jnp.int32))
            segs = store.segments
            with trace("search.snapshot"):
                scores, gids = fused_snapshot_query(
                    params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                    ivf_ops,
                    tuple(s.vecs for s in segs) if not use_ivf else (),
                    tuple(s.cols for s in segs) if not use_ivf else (),
                    tuple(s.scales for s in segs) if not use_ivf else (),
                    *post_arrays,
                    spec, jnp.asarray(qt), jnp.asarray(qw),
                    jnp.asarray(sparse_weight, jnp.float32),
                    limit=limit,
                    prefetch_multiplier=self.prefetch_multiplier,
                    has_sparse=has_sparse, fusion=fusion,
                    nprobe=(min(store._ivf_nprobe, store._ivf.n_cells)
                            if use_ivf else 0),
                    assign_k=(store._ivf.assign_k
                              if use_ivf and ivf_layout == "padded"
                              else 1),
                    max_postings=store._sparse_max_postings,
                    use_ivf=use_ivf,
                    ivf_select=store._ivf_select,
                    ivf_layout=ivf_layout,
                    ivf_probe_cap=ivf_probe_cap,
                    ivf_flat_pallas=ivf_flat_pallas)
            return scores, gids, gen
        if use_ivf or (has_sparse and use_postings):
            # Mixed snapshot states (e.g. IVF active, postings stale with a
            # sparse query) fall back to the store's multi-dispatch path.
            with trace("search.encode"):
                q = np.asarray(encode_tokens(
                    params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
            with trace("search.snapshot"):
                return store._search_snapshot(
                    q, spec, qt, qw, limit,
                    jnp.asarray(sparse_weight, jnp.float32), has_sparse,
                    fusion)

        segs = store.segments
        total_rows = sum(s.vecs.shape[0] for s in segs)
        settings = get_settings()
        select_group = settings.flat_select_group
        select_pallas = jax.default_backend() == "tpu"
        from voitta_rag_tpu.ops.scan_select import group_compatible
        if total_rows < settings.flat_select_min_rows or not all(
                group_compatible(s.vecs.shape[0], select_group, select_pallas)
                for s in segs):
            select_group = 0
        with trace("search.device"):
            scores, gids = fused_query(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                tuple(s.vecs for s in segs),
                tuple(s.cols for s in segs),
                tuple(s.scales for s in segs),
                tuple(s.terms for s in segs),
                tuple(s.weights for s in segs),
                spec, jnp.asarray(qt), jnp.asarray(qw),
                jnp.asarray(sparse_weight, jnp.float32),
                limit=limit, prefetch_multiplier=self.prefetch_multiplier,
                has_sparse=has_sparse, fusion=fusion,
                select_group=select_group,
                select_pallas=select_pallas)
        return scores, gids, gen

_search_service: SearchService | None = None
_create_lock = threading.Lock()


def get_search_service() -> SearchService:
    global _search_service
    # Double-checked creation lock: executor threads can race
    # first-touch; two instances would hold independent locks
    # (and, for the store, two device copies of the index).
    if _search_service is None:
        with _create_lock:
            if _search_service is None:
                _search_service = SearchService()
    return _search_service


def reset_search_service() -> None:
    global _search_service
    _search_service = None
