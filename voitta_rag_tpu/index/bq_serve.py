"""Cold-tier serving via binary-quantization shadows.

Upgrades the beyond-HBM tier (index/stream_scan.py): instead of streaming a
cold segment's full rows through PCIe staging blocks per query, the device
coarse-scans the segment's quantized sketch (segment.offload(bq=True) keeps
``bq_packed``/``bq_scales``/``bq_cols`` in HBM — ~38% of the int8 footprint
at the default 2 bits, ~21% at 1 bit), over-fetches the top candidates, and
rescores exactly those rows
against the *host* copy of the exact vectors (ops/rerank.py host variant).
The sparse side is served by host inverted postings
(index/host_postings.py) — a sparse query touches only its own terms' runs.

This mirrors Qdrant's "binary quantization + rescore with oversampling"
serving mode (the reference's engine, layer 0), laid out TPU-first: the
coarse pass is an MXU scan over bit-planes, the exact pass is a host gather
of B*K' rows, and what returns to the flat search path is a score-shaped
``[B, cap]`` array carrying exact values at candidate positions and -inf
elsewhere — so fusion, gid arithmetic, and payload materialization are
untouched.

Approximation contract: a cold-BQ segment contributes its coarse-top-K'
candidates (K' = limit * prefetch * oversample), exactly rescored. Rows the
coarse scan misses are absent — recall is the oversampling-bounded BQ
recall, measured in tests/test_bq_cold.py and bench.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from voitta_rag_tpu.ops.bitq import bitq_scan_scores
from voitta_rag_tpu.ops.filters import FilterSpec, eval_mask_host
from voitta_rag_tpu.ops.pallas_utils import NEG_INF
from voitta_rag_tpu.ops.rerank import rerank_exact_host
from voitta_rag_tpu.ops.topk import masked_topk


@functools.partial(jax.jit, static_argnames=("cap",))
def _scatter_scores(rows: jax.Array, vals: jax.Array, cap: int) -> jax.Array:
    """[B, K'] (rows, vals) -> [B, cap] f32, -inf off-candidates.

    Invalid slots (row < 0) are redirected out of range and dropped by the
    scatter, so they can never clobber row 0.
    """
    b = rows.shape[0]
    safe = jnp.where(rows >= 0, rows, cap)
    out = jnp.full((b, cap), NEG_INF, jnp.float32)
    return out.at[jnp.arange(b)[:, None], safe].set(vals, mode="drop")


def bq_segment_scores(
    q_dense: jax.Array,
    seg,
    spec: FilterSpec,
    qt: np.ndarray | None = None,
    qw: np.ndarray | None = None,
    *,
    k_prime: int,
    use_pallas: bool = True,
    select: str = "exact",
) -> tuple[jax.Array, jax.Array | None]:
    """Score one cold-BQ segment. Returns ([B, cap] dense, [B, cap] sparse|None).

    Dense: device coarse scan over the bit sketch -> top-K' -> exact host
    rescore -> scatter back to score shape. Sparse: host postings -> top-K'
    (host) -> scatter. Both sides carry exact values at candidate positions.
    """
    cand = bq_coarse_candidates(q_dense, seg, spec, k_prime=k_prime,
                                use_pallas=use_pallas, select=select)
    return bq_finish_segment(q_dense, seg, spec, np.asarray(cand), qt, qw,
                             k_prime=k_prime)


def bq_coarse_candidates(q_dense, seg, spec: FilterSpec, *, k_prime: int,
                         use_pallas: bool = True,
                         select: str = "exact") -> jax.Array:
    """Phase 1 (device, async): coarse scan + candidate select.

    Returns the [B, K'] candidate-row array WITHOUT forcing it to host, so
    a caller with several cold segments can enqueue every segment's coarse
    pass before the first host sync (one overlapped round of device work
    instead of a serial sync per segment — the tunnel/PCIe hop is the cold
    path's fixed cost).
    """
    assert seg.bq_packed is not None, "segment has no BQ shadow"
    cap = seg.capacity
    kp = min(k_prime, cap)
    # Whitened sketch: the query-side half of the transform is one [D, D]
    # matvec (ops/bitq.py::whitening_transform) — the q.mu term is
    # rank-constant and the coarse scores only pick candidates.
    q_coarse = q_dense
    if getattr(seg, "bq_qmat", None) is not None:
        q_coarse = q_dense.astype(jnp.float32) @ seg.bq_qmat.T
    coarse = bitq_scan_scores(q_coarse, seg.bq_packed, seg.bq_scales,
                              seg.bq_cols, spec,
                              bits=max(1, getattr(seg, "bq_bits", 1)),
                              use_pallas=use_pallas)
    # Selection policy (VOITTA_BQ_SELECT): exact top-K' is the default —
    # the store serves B=1 where it is nearly free, and on the hardest real
    # corpus it holds recall 0.973 vs approx_max_k's 0.891 (approx binning
    # drops near-tied candidates the oversampled rescore needed; measured
    # at 1M x 768, 2-bit, K'=480, b32: 51 ms exact vs 7 ms approx — a
    # batch-throughput trade only).
    _, cand = masked_topk(coarse, kp,
                          approx=(select == "approx" and cap > (1 << 16)))
    return cand


def bq_candidate_lists(
    q_dense: jax.Array,
    seg,
    spec: FilterSpec,
    cand_np: np.ndarray,
    qt: np.ndarray | None = None,
    qw: np.ndarray | None = None,
    *,
    k_prime: int,
) -> tuple[tuple[np.ndarray, np.ndarray],
           tuple[np.ndarray, np.ndarray] | None]:
    """Phase 2 (host): exact rescore of phase-1 candidates, as CANDIDATE
    LISTS ((dense_vals [B, kp], rows), (sparse_vals, rows) | None) with
    segment-LOCAL row ids (-1 invalid).

    The candidate form feeds the composed IVF x BQ path's candidate-space
    fusion (index/store.py::_search_cold_ivf) directly; the flat cold path
    scatters it back to [B, cap] score shape via :func:`bq_finish_segment`.
    """
    cap = seg.capacity
    kp = min(k_prime, cap)
    q_np = np.asarray(q_dense, np.float32)
    b = q_np.shape[0]
    scales_host = (np.asarray(seg.scales)
                   if getattr(seg, "scales", None) is not None else None)
    # seg.vecs stays in its storage dtype (int8 / ml_dtypes bf16 / f32):
    # rerank_exact_host gathers only the B*K' candidate rows and casts just
    # that block to f32 — never the whole segment.
    vals, rows = rerank_exact_host(q_np, cand_np, seg.vecs, scales_host,
                                   limit=kp)

    sparse = None
    if qt is not None:
        # offload(bq=True) sets bq_packed and host_postings together; a
        # segment with only the dense shadow would return a sparse block
        # narrower than the dense one and fusion's indices would map to
        # wrong gids. Fail loudly instead of corrupting the gid mapping.
        assert seg.host_postings is not None, (
            "cold-BQ segment has bq_packed but no host_postings")
        qt_np = np.asarray(qt)
        qw_np = np.asarray(qw, np.float32)
        bq = qt_np.shape[0]
        # One sparse query broadcasts across the dense batch (the store's
        # B=1 serving contract); a full [B, Qt] batch is scored per query —
        # each host-postings pass touches only that query's term runs, so
        # the cold hybrid serves full batch width (not just batch 1).
        assert bq in (1, b), f"sparse batch {bq} vs dense batch {b}"
        mask = eval_mask_host(spec, seg.cols)
        s_rows = np.full((b, kp), -1, np.int32)
        s_vals = np.full((b, kp), NEG_INF, np.float32)
        for i in range(bq):
            s_host = seg.host_postings.scores(qt_np[i], qw_np[i])  # [cap]
            s_host = np.where(mask, s_host, NEG_INF).astype(np.float32)
            top = np.argpartition(-s_host, kp - 1)[:kp].astype(np.int32)
            sv = s_host[top]
            keep = sv > NEG_INF / 2
            top = np.where(keep, top, -1)
            sv = np.where(keep, sv, NEG_INF)
            if bq == 1:
                s_rows[:] = top
                s_vals[:] = sv
            else:
                s_rows[i] = top
                s_vals[i] = sv
        sparse = (s_vals, s_rows)
    return (vals, rows), sparse


def bq_finish_segment(
    q_dense: jax.Array,
    seg,
    spec: FilterSpec,
    cand_np: np.ndarray,
    qt: np.ndarray | None = None,
    qw: np.ndarray | None = None,
    *,
    k_prime: int,
) -> tuple[jax.Array, jax.Array | None]:
    """Phase 2 (host + scatter): exact rescore of phase-1 candidates,
    scattered back to the [B, cap] score shape the flat search path
    concatenates (index/store.py::_score_all_segments)."""
    cap = seg.capacity
    (vals, rows), sp = bq_candidate_lists(
        q_dense, seg, spec, cand_np, qt, qw, k_prime=k_prime)
    dense = _scatter_scores(jnp.asarray(rows), jnp.asarray(vals), cap)
    sparse = None
    if sp is not None:
        s_vals, s_rows = sp
        sparse = _scatter_scores(jnp.asarray(s_rows), jnp.asarray(s_vals),
                                 cap)
    return dense, sparse
