"""Headline benchmark: filtered hybrid search QPS on one chip.

Measures the full device query path of the framework — masked dense scan
(Pallas, bf16) + sparse BM25 scan + in-kernel folder filtering + hybrid
fusion + top-k — over a synthetic 1M-chunk, 384-d corpus (BASELINE.md
config 3 shape), batched 32 queries per dispatch.

Baseline: the same hybrid search computed by an optimized CPU implementation
(NumPy BLAS dense matmul + vectorized sparse scoring + fusion) on this host —
the stand-in for the reference's CPU Qdrant stack (the reference publishes no
numbers, BASELINE.md). vs_baseline = TPU QPS / CPU QPS.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

Anti-caching hygiene: every timed dispatch uses a distinct query slice and
results are fetched to host at the end of each timed block.
"""

from __future__ import annotations

import json
import time

import numpy as np

from voitta_rag_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from voitta_rag_tpu.ops.dense_scan import dense_scan_scores  # noqa: E402
from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores, TERM_PAD  # noqa: E402
from voitta_rag_tpu.ops.filters import (  # noqa: E402
    COL_FOLDER, COL_VALID, NUM_COLS, make_filter_spec,
)
from voitta_rag_tpu.ops.fusion import hybrid_fuse  # noqa: E402
from voitta_rag_tpu.ops.pallas_utils import NEG_INF  # noqa: E402

N = 1_048_576  # 2^20 rows (scan-tile aligned)
D = 384
S = 32          # sparse slots per doc
QT = 16         # query terms
B = 32          # query batch per dispatch
LIMIT = 10
N_FOLDERS = 64
INCLUDE = [1, 2, 3, 5, 8, 13, 21, 34]  # folder-scope filter
SPARSE_W = 0.1


def build_corpus(seed=0):
    """Generate the synthetic corpus ON DEVICE (host RNG for 400M floats
    takes minutes on a small VM; jax.random on the accelerator is ~instant).
    Host copies are pulled once for the CPU baseline."""
    import jax
    import jax.numpy as jnp

    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    vecs = jax.random.normal(k[0], (N, D), jnp.float32)
    vecs = vecs / jnp.linalg.norm(vecs, axis=1, keepdims=True)
    folder = jax.random.randint(k[1], (N,), 0, N_FOLDERS, jnp.int32)
    cols = jnp.zeros((NUM_COLS, N), jnp.int32)
    cols = cols.at[COL_VALID].set(1).at[COL_FOLDER].set(folder)
    terms = jax.random.randint(k[2], (N, S), 0, 100_000, jnp.int32)
    weights = jax.random.uniform(k[3], (N, S), jnp.float32)
    rng = np.random.default_rng(seed)
    return (np.asarray(vecs), np.asarray(cols), np.asarray(terms),
            np.asarray(weights), rng)


def device_hybrid(q, qt, qw, vecs, cols, terms, weights, spec):
    d = dense_scan_scores(q, vecs, cols, spec)
    s = sparse_scan_scores(qt, qw, terms, weights, cols, spec)
    return hybrid_fuse(d, jnp.broadcast_to(s, d.shape), SPARSE_W, limit=LIMIT)


def cpu_hybrid(q, qt, qw, vecs, cols, terms, weights, inc_mask):
    """NumPy/BLAS reference implementation of the same search (vectorized
    sparse scoring via sorted-membership lookup — a fair CPU baseline)."""
    d = q @ vecs.T                       # [B, N]
    d[:, ~inc_mask] = NEG_INF
    live = qt[0] != TERM_PAD
    q_terms = qt[0][live]
    order = np.argsort(q_terms)
    q_sorted, w_sorted = q_terms[order], qw[0][live][order]
    pos = np.searchsorted(q_sorted, terms)
    pos_c = np.clip(pos, 0, len(q_sorted) - 1)
    hit = q_sorted[pos_c] == terms
    s = (weights * w_sorted[pos_c] * hit).sum(axis=1).astype(np.float32)
    s_masked = np.where(inc_mask, s, NEG_INF)

    p = LIMIT * 3
    out = []
    for b in range(len(q)):
        d_idx = np.argpartition(-d[b], p)[:p]
        s_idx = np.argpartition(-s_masked, p)[:p]

        def norm(vals):
            vals = vals[vals > NEG_INF / 2]
            if len(vals) == 0:
                return None, None, None
            return vals.min(), vals.max(), vals

        combined = {}
        dv = d[b][d_idx]
        ok = dv > NEG_INF / 2
        if ok.any():
            mn, mx = dv[ok].min(), dv[ok].max()
            spread = mx - mn
            for i, v in zip(d_idx[ok], dv[ok]):
                combined[i] = (1 - SPARSE_W) * ((v - mn) / spread if spread > 0 else 1.0)
        sv = s_masked[s_idx]
        ok = sv > NEG_INF / 2
        if ok.any():
            mn, mx = sv[ok].min(), sv[ok].max()
            spread = mx - mn
            for i, v in zip(s_idx[ok], sv[ok]):
                combined[i] = combined.get(i, 0.0) + SPARSE_W * (
                    (v - mn) / spread if spread > 0 else 1.0)
        top = sorted(combined.items(), key=lambda kv: -kv[1])[:LIMIT]
        out.append(top)
    return out


def _fetch(outs):
    """Force-complete queued executions by pulling results to host."""
    for out in outs:
        for x in (out if isinstance(out, tuple) else (out,)):
            np.asarray(x)


def main():
    on_tpu = jax.default_backend() == "tpu"
    vecs_np, cols_np, terms_np, weights_np, rng = build_corpus()

    # Query pool (distinct queries per dispatch to defeat any exec caching).
    n_pool = B * 24
    qpool = rng.standard_normal((n_pool, D), dtype=np.float32)
    qpool /= np.linalg.norm(qpool, axis=1, keepdims=True)
    qt = np.full((1, QT), TERM_PAD, np.int32)
    qt[0, :QT] = rng.choice(100_000, QT, replace=False)
    qw = np.zeros((1, QT), np.float32)
    qw[0, :QT] = rng.random(QT).astype(np.float32) + 0.2

    spec = make_filter_spec(include_folder_ids=INCLUDE)
    store_dt = jnp.bfloat16 if on_tpu else jnp.float32
    vecs = jnp.asarray(vecs_np, store_dt)
    cols = jnp.asarray(cols_np)
    terms = jnp.asarray(terms_np)
    weights = jnp.asarray(weights_np)
    qt_j, qw_j = jnp.asarray(qt), jnp.asarray(qw)
    qpool_j = jnp.asarray(qpool)

    # Warmup / compile.
    scores, gids = device_hybrid(qpool_j[:B], qt_j, qw_j, vecs, cols, terms,
                                 weights, spec)
    jax.block_until_ready((scores, gids))

    # Timed: distinct query batches; every result is FETCHED to host (through
    # the remote-execution tunnel, block_until_ready alone can under-report —
    # only a host fetch guarantees the dispatch actually ran).
    n_iters = 20
    outs = []
    t0 = time.perf_counter()
    for i in range(n_iters):
        start = (i * B) % (n_pool - B)
        q = jax.lax.dynamic_slice_in_dim(qpool_j, start, B)
        outs.append(device_hybrid(q, qt_j, qw_j, vecs, cols, terms, weights,
                                  spec))
    _fetch(outs)
    dt = time.perf_counter() - t0
    tpu_qps = n_iters * B / dt

    # Sanity: device result matches CPU oracle on one batch.
    inc_mask = np.isin(cols_np[COL_FOLDER], INCLUDE)
    cpu_top = cpu_hybrid(qpool[:2], qt, qw, vecs_np, cols_np, terms_np,
                         weights_np, inc_mask)
    dev_scores, dev_gids = device_hybrid(
        qpool_j[:2], qt_j, qw_j, vecs, cols, terms, weights, spec)
    dev_gids = np.asarray(dev_gids)
    agree = 0
    for b in range(2):
        cpu_ids = {int(i) for i, _ in cpu_top[b]}
        dev_ids = {int(g) for g in dev_gids[b] if g >= 0}
        agree += len(cpu_ids & dev_ids) / max(len(cpu_ids), 1)
    recall_vs_cpu = agree / 2

    # CPU baseline QPS (same search, BLAS + vectorized sparse), few queries.
    n_cpu = 2
    t0 = time.perf_counter()
    cpu_hybrid(qpool[:n_cpu], qt, qw, vecs_np, cols_np, terms_np, weights_np,
               inc_mask)
    cpu_qps = n_cpu / (time.perf_counter() - t0)

    extra = {
        "batch": B, "limit": LIMIT, "corpus": N, "dim": D,
        "cpu_baseline_qps": round(cpu_qps, 2),
        "recall_vs_cpu_oracle": round(recall_vs_cpu, 3),
        "backend": jax.default_backend(),
    }

    # ---- int8 storage variant (halves dense HBM traffic) ----
    try:
        scale = jnp.max(jnp.abs(jnp.asarray(vecs_np)), axis=1) / 127.0
        v8 = jnp.clip(jnp.round(jnp.asarray(vecs_np) / scale[:, None]),
                      -127, 127).astype(jnp.int8)
        scales = scale[None, :].astype(jnp.float32)
        w16 = weights.astype(jnp.bfloat16)

        def int8_hybrid(q):
            d = dense_scan_scores(q, v8, cols, spec, scales)
            s = sparse_scan_scores(qt_j, qw_j, terms, w16, cols, spec)
            return hybrid_fuse(d, jnp.broadcast_to(s, d.shape), SPARSE_W,
                               limit=LIMIT)

        out = int8_hybrid(qpool_j[:B])
        _fetch([out])
        outs = []
        t0 = time.perf_counter()
        for i in range(n_iters):
            start = (i * B) % (n_pool - B)
            outs.append(int8_hybrid(
                jax.lax.dynamic_slice_in_dim(qpool_j, start, B)))
        _fetch(outs)
        extra["int8_hybrid_qps"] = round(n_iters * B / (time.perf_counter() - t0), 1)
        _, gids8 = int8_hybrid(qpool_j[:2])
        gids8 = np.asarray(gids8)
        ov = np.mean([
            len(set(gids8[b].tolist())
                & set(np.asarray(dev_gids)[b].tolist())) / LIMIT
            for b in range(2)])
        extra["int8_vs_bf16_overlap"] = round(float(ov), 3)
    except Exception as e:  # keep the headline metric robust
        extra["int8_error"] = str(e)[:200]

    # ---- IVF variant (probe-limited dense; BASELINE config 4 shape) ----
    try:
        from voitta_rag_tpu.index.ivf import IVFIndex
        from voitta_rag_tpu.ops.topk import masked_topk

        gids_all = np.arange(N, dtype=np.int64)
        ivf = IVFIndex.build(vecs_np, cols_np.T, gids_all, n_cells=512,
                             kmeans_iters=3, skew_factor=2.0)
        NPROBE = 32

        def ivf_dense(q):
            s, g = ivf.search_scores(q, spec, nprobe=NPROBE)
            vals, pos = masked_topk(s, LIMIT)
            return vals, jnp.take_along_axis(g, jnp.maximum(pos, 0), axis=1)

        out = ivf_dense(qpool_j[:B])
        _fetch([out])
        outs = []
        t0 = time.perf_counter()
        for i in range(n_iters):
            start = (i * B) % (n_pool - B)
            outs.append(ivf_dense(
                jax.lax.dynamic_slice_in_dim(qpool_j, start, B)))
        _fetch(outs)
        extra["ivf_dense_qps"] = round(n_iters * B / (time.perf_counter() - t0), 1)
        # recall vs exact flat dense top-10 on 8 queries
        _, giv = ivf_dense(qpool_j[:8])
        giv = np.asarray(giv)
        d_exact = np.asarray(dense_scan_scores(qpool_j[:8], vecs, cols, spec))
        oracle = np.argsort(-d_exact, axis=1)[:, :LIMIT]
        extra["ivf_recall10"] = round(float(np.mean([
            len(set(giv[b].tolist()) & set(oracle[b].tolist())) / LIMIT
            for b in range(8)])), 3)
    except Exception as e:
        extra["ivf_error"] = str(e)[:200]

    result = {
        "metric": "filtered_hybrid_search_qps_1M_384d" + ("" if on_tpu else "_cpu"),
        "value": round(tpu_qps, 1),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / cpu_qps, 1),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
