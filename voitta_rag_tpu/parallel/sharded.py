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

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voitta_rag_tpu.ops.dense_scan import dense_scan_scores
from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores, TERM_PAD
from voitta_rag_tpu.ops.filters import COL_DOC, COL_VALID, NUM_COLS, FilterSpec
from voitta_rag_tpu.ops.fusion import hybrid_fuse_candidates, _candidates_from_lists
from voitta_rag_tpu.ops.pallas_utils import NEG_INF
from voitta_rag_tpu.ops.topk import VALID_THRESHOLD
from voitta_rag_tpu.parallel.mesh import SHARD_AXIS


def _local_candidates(q, spec, vecs, cols, scales, terms, weights, qt, qw,
                      p: int, has_sparse: bool, cap: int):
    """Per-shard body: scan local rows, return local top-p (vals, gids)."""
    shard = jax.lax.axis_index(SHARD_AXIS)
    d_scores = dense_scan_scores(q, vecs, cols, spec, scales)  # [B, cap]
    d_vals, d_rows = jax.lax.top_k(d_scores, p)
    d_gids = jnp.where(d_vals > VALID_THRESHOLD,
                       shard * cap + d_rows, -1).astype(jnp.int32)
    if has_sparse:
        s_scores = sparse_scan_scores(qt, qw, terms, weights, cols, spec)
        s_scores = jnp.broadcast_to(s_scores, d_scores.shape)
        s_vals, s_rows = jax.lax.top_k(s_scores, p)
        s_gids = jnp.where(s_vals > VALID_THRESHOLD,
                           shard * cap + s_rows, -1).astype(jnp.int32)
    else:
        s_vals = jnp.full_like(d_vals, NEG_INF)
        s_gids = jnp.full_like(d_gids, -1)
    return d_vals, d_gids, s_vals, s_gids


def _gather(x):
    """[B, p] per shard → replicated [B, n_shards * p]."""
    g = jax.lax.all_gather(x, SHARD_AXIS)        # [n, B, p]
    return jnp.transpose(g, (1, 0, 2)).reshape(x.shape[0], -1)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "limit", "prefetch_multiplier", "has_sparse",
                     "use_fusion"),
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
    qt: jax.Array,
    qw: jax.Array,
    sparse_weight: jax.Array,
    *,
    limit: int,
    prefetch_multiplier: int = 3,
    has_sparse: bool = True,
    use_fusion: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Search the sharded index; returns replicated (scores, gids) [B, limit]."""
    cap = vecs.shape[1]
    p = min(limit * prefetch_multiplier, cap)
    shard_spec = P(SHARD_AXIS)
    rep = P()

    def body(q, params, inc, exc, excif, vecs, cols, scales, terms, weights,
             qt, qw, w):
        local_spec = FilterSpec(params, inc, exc, excif)
        is_int8 = vecs.dtype == jnp.int8
        d_vals, d_gids, s_vals, s_gids = _local_candidates(
            q, local_spec, vecs[0], cols[0],
            scales[0] if is_int8 else None,
            terms[0], weights[0], qt, qw, p, has_sparse, cap)
        # ---- ICI all-gather of per-chip candidates ----
        d_vals, d_gids = _gather(d_vals), _gather(d_gids)
        s_vals, s_gids = _gather(s_vals), _gather(s_gids)
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
        rep,                     # q
        rep, rep, rep, rep,      # FilterSpec fields
        shard_spec, shard_spec,  # vecs, cols
        shard_spec,              # scales
        shard_spec, shard_spec,  # terms, weights
        rep, rep, rep,           # qt, qw, sparse_weight
    )
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=args_specs,
        out_specs=(rep, rep),
        check_vma=False,
    )
    return fn(q, spec.params, spec.inc_ids, spec.exc_ids, spec.exc_if_ids,
              vecs, cols, scales, terms, weights, qt, qw,
              jnp.asarray(sparse_weight, jnp.float32))


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
        self.n_shards = mesh.shape[SHARD_AXIS]
        self.cap = cap_per_shard
        self.dim = dim
        self.sparse_slots = sparse_slots
        self.dtype = dtype
        store_dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                    "int8": jnp.int8}[dtype]
        sh = lambda: NamedSharding(mesh, P(SHARD_AXIS))
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
        for s, r in zip(shard_idx, rows):
            self._free[int(s)].append(int(r))

    # -- persistence (host spill/restore, mirrors Segment.to_host) ----------
    def to_host(self) -> dict:
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
        sh = NamedSharding(mesh, P(SHARD_AXIS))
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

    def search(self, q, spec, qt=None, qw=None, sparse_weight=0.1, *,
               limit=10, prefetch_multiplier=3, fusion=True):
        has_sparse = qt is not None
        if qt is None:
            qt = jnp.full((1, 1), TERM_PAD, jnp.int32)
            qw = jnp.zeros((1, 1), jnp.float32)
        return sharded_search(
            self.mesh, q, spec, self.vecs, self.cols, self.scales,
            self.terms, self.weights, jnp.asarray(qt), jnp.asarray(qw),
            sparse_weight, limit=limit,
            prefetch_multiplier=prefetch_multiplier,
            has_sparse=has_sparse, use_fusion=fusion)


@functools.partial(jax.jit, donate_argnums=(0,))
def _tombstone_rows_sharded(cols, shard_idx, rows):
    return cols.at[shard_idx, COL_VALID, rows].set(0, mode="drop")
