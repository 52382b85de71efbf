"""Headline benchmark: filtered hybrid search QPS on one chip.

Measures the full device query path of the framework — masked dense scan
(Pallas, bf16) + sparse BM25 scan (slot-major VPU kernel) + in-kernel folder
filtering + hybrid fusion (approx_max_k candidates) + top-k — over a
synthetic 1M-chunk, 384-d corpus (BASELINE.md config 3 shape), batched 32
queries per dispatch, as ONE jitted device program per batch.

Baseline: the same hybrid search computed by an optimized CPU implementation
(NumPy BLAS dense matmul + vectorized sparse scoring + fusion) on this host —
the stand-in for the reference's CPU Qdrant stack (the reference publishes no
numbers, BASELINE.md). vs_baseline = TPU QPS / CPU QPS.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

Timing notes (remote-TPU tunnel environment):
- block_until_ready alone under-reports through the tunnel; only a host fetch
  guarantees a dispatch ran. Executions are queued in order, so fetching the
  LAST output forces all prior queued programs.
- Large device constants must be passed as jit ARGUMENTS — closing over a
  GB-scale corpus array embeds it as an XLA constant and hangs compilation.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    """Progress to stderr; stdout carries only the final JSON line."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

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
N_ITERS = 20


def build_corpus(seed=0):
    """Generate the synthetic corpus ON DEVICE (host RNG for 400M floats
    takes minutes on a small VM; jax.random on the accelerator is ~instant).
    Host copies for the CPU baseline are pulled once, as fp16 where lossless
    enough (the device->host pull rides a slow tunnel)."""
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    vecs = jax.random.normal(k[0], (N, D), jnp.float32)
    vecs = vecs / jnp.linalg.norm(vecs, axis=1, keepdims=True)
    folder = jax.random.randint(k[1], (N,), 0, N_FOLDERS, jnp.int32)
    cols = jnp.zeros((NUM_COLS, N), jnp.int32)
    cols = cols.at[COL_VALID].set(1).at[COL_FOLDER].set(folder)
    terms = jax.random.randint(k[2], (S, N), 0, 100_000, jnp.int32)
    weights = jax.random.uniform(k[3], (S, N), jnp.float32)
    rng = np.random.default_rng(seed)
    vecs_np = np.asarray(vecs.astype(jnp.float16)).astype(np.float32)
    weights_np = np.asarray(weights.astype(jnp.float16)).astype(np.float32).T
    return (vecs, cols, terms, weights,
            vecs_np, np.asarray(cols), np.asarray(terms).T, weights_np, rng)


@jax.jit
def device_hybrid(q, qt, qw, vecs, cols, terms, weights, spec, scales=None):
    """The full hybrid query as ONE device program (serving shape)."""
    d = dense_scan_scores(q, vecs, cols, spec, scales)
    s = sparse_scan_scores(qt, qw, terms, weights, cols, spec)
    return hybrid_fuse(d, jnp.broadcast_to(s, d.shape), SPARSE_W, limit=LIMIT)


def cpu_hybrid(q, qt, qw, vecs, cols, terms, weights, inc_mask):
    """NumPy/BLAS reference implementation of the same search (vectorized
    sparse scoring via sorted-membership lookup — a fair CPU baseline).
    terms/weights are row-major [N, S] host views."""
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


def queued_qps(fn, qstack, *args):
    """Throughput via in-order queued dispatches: enqueue every batch, then
    fetch ONE (small) output of the LAST batch. The device stream executes
    in launch order, so that fetch forces every prior batch — and the tunnel
    round-trip (~26 ms here) is paid once, not once per batch (fetching all
    outputs makes a 1M-row scan look 3x slower than it is)."""
    _fetch([fn(qstack[0], *args)])  # compile + warm
    best = float("inf")
    for _ in range(2):  # first loop after a compile carries residual host
        t0 = time.perf_counter()    # work (cache writes); report the best
        outs = [fn(q, *args) for q in qstack]
        np.asarray(jax.tree.leaves(outs[-1])[0])
        best = min(best, time.perf_counter() - t0)
    return qstack.shape[0] * qstack.shape[1] / best, best


def measure_rtt_ms(n=6):
    """Round-trip time of a minimal dispatch+fetch (tunnel overhead)."""
    x = jnp.zeros((8, 8), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    _fetch([f(x)])
    t0 = time.perf_counter()
    for _ in range(n):
        _fetch([f(x)])
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    on_tpu = jax.default_backend() == "tpu"
    log(f"backend={jax.default_backend()}; generating corpus")
    t_all = time.time()
    (vecs_dev, cols, terms, weights,
     vecs_np, cols_np, terms_np, weights_np, rng) = build_corpus()
    log(f"corpus ready ({time.time() - t_all:.0f}s)")

    # Query pool (distinct queries per dispatch to defeat any exec caching).
    n_pool = B * N_ITERS
    qpool = rng.standard_normal((n_pool, D), dtype=np.float32)
    qpool /= np.linalg.norm(qpool, axis=1, keepdims=True)
    qt = np.full((1, QT), TERM_PAD, np.int32)
    qt[0, :QT] = rng.choice(100_000, QT, replace=False)
    qw = np.zeros((1, QT), np.float32)
    qw[0, :QT] = rng.random(QT).astype(np.float32) + 0.2

    spec = make_filter_spec(include_folder_ids=INCLUDE)
    store_dt = jnp.bfloat16 if on_tpu else jnp.float32
    vecs = vecs_dev.astype(store_dt)  # on-device cast, nothing crosses host
    qt_j, qw_j = jnp.asarray(qt), jnp.asarray(qw)
    qstack = jnp.asarray(qpool).reshape(N_ITERS, B, D)

    log("compiling + timing headline hybrid program")
    tpu_qps, dt = queued_qps(device_hybrid, qstack, qt_j, qw_j, vecs, cols,
                             terms, weights, spec)
    rtt_ms = measure_rtt_ms()
    log(f"headline: {tpu_qps:.0f} qps ({dt / N_ITERS * 1000:.2f} ms per "
        f"{B}-query batch; tunnel rtt {rtt_ms:.1f} ms); computing CPU oracle")

    # Sanity: device result matches CPU oracle on one batch.
    inc_mask = np.isin(cols_np[COL_FOLDER], INCLUDE)
    cpu_top = cpu_hybrid(qpool[:2], qt, qw, vecs_np, cols_np, terms_np,
                         weights_np, inc_mask)
    dev_scores, dev_gids = device_hybrid(
        qstack[0][:2], qt_j, qw_j, vecs, cols, terms, weights, spec)
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
        "tunnel_rtt_ms": round(rtt_ms, 2),
        "host_vcpus": __import__("os").cpu_count(),
    }

    # ---- p50 single-query latency, device-side (BASELINE north star:
    # p50 < 5 ms including query embedding). Encoder (MiniLM geometry,
    # 384-d to match the corpus) + B=1 filtered hybrid search.
    log(f"cpu baseline {cpu_qps:.2f} qps; latency probe")
    try:
        from voitta_rag_tpu.models.encoder import (
            PRESETS, encode_tokens, init_params)

        ecfg = PRESETS["sentence-transformers/all-MiniLM-L6-v2"]
        eparams = init_params(jax.random.PRNGKey(0), ecfg)
        L = 64  # tokens; typical short search query padded bucket
        ids_stack = jnp.asarray(
            rng.integers(4, ecfg.vocab_size, (N_ITERS, 1, L)), jnp.int32)
        emask = jnp.ones((1, L), jnp.int32)

        enc = jax.jit(lambda ids, p: encode_tokens(p, ecfg, ids, emask))
        _fetch([enc(ids_stack[0], eparams)])
        encode_ms = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eouts = [enc(ids, eparams) for ids in ids_stack]
            np.asarray(eouts[-1])  # in-order stream: one fetch forces all
            encode_ms = min(encode_ms,
                            (time.perf_counter() - t0) / N_ITERS * 1000)

        # Index-build encode throughput (the reference's operative
        # chunks/sec metric, scripts/build_sparse_vectors.py:221).
        Bi, Li = 256, 128
        istacks = jnp.asarray(
            rng.integers(4, ecfg.vocab_size, (8, Bi, Li)), jnp.int32)
        imask = jnp.ones((Bi, Li), jnp.int32)
        enc_i = jax.jit(lambda ids, p: encode_tokens(p, ecfg, ids, imask))
        np.asarray(enc_i(istacks[0], eparams))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            iouts = [enc_i(s, eparams) for s in istacks]
            np.asarray(iouts[-1][..., :1])
            best = min(best, time.perf_counter() - t0)
        extra["encode_chunks_per_s"] = round(8 * Bi / best, 1)

        q1stack = jnp.asarray(qpool[:N_ITERS]).reshape(N_ITERS, 1, D)
        _, dt1 = queued_qps(device_hybrid, q1stack, qt_j, qw_j, vecs, cols,
                            terms, weights, spec)
        search_ms = dt1 / N_ITERS * 1000
        extra["encode_b1_ms"] = round(encode_ms, 3)
        extra["search_b1_ms"] = round(search_ms, 3)
        extra["p50_query_ms_device"] = round(encode_ms + search_ms, 3)
        log(f"latency b1: encode {encode_ms:.2f} ms + search "
            f"{search_ms:.2f} ms")
    except Exception as e:
        extra["latency_error"] = str(e)[:200]

    # ---- large-batch throughput (index-serving shape) ----
    try:
        B2 = 256
        q2 = jnp.asarray(
            np.vstack([qpool] * ((B2 * 8) // n_pool + 1))[: B2 * 8]
        ).reshape(8, B2, D)
        qps2, _ = queued_qps(device_hybrid, q2, qt_j, qw_j, vecs, cols,
                             terms, weights, spec)
        extra["hybrid_qps_b256"] = round(qps2, 1)
        log(f"b256: {qps2:.0f} qps; int8 variant")
    except Exception as e:
        extra["b256_error"] = str(e)[:200]

    # ---- int8 storage variant (halves dense HBM traffic) ----
    try:
        scale = jnp.max(jnp.abs(vecs_dev), axis=1) / 127.0
        v8 = jnp.clip(jnp.round(vecs_dev / scale[:, None]),
                      -127, 127).astype(jnp.int8)
        scales = scale[None, :].astype(jnp.float32)
        w16 = weights.astype(jnp.bfloat16)

        qps8, _ = queued_qps(device_hybrid, qstack, qt_j, qw_j, v8, cols,
                             terms, w16, spec, scales)
        extra["int8_hybrid_qps"] = round(qps8, 1)
        _, gids8 = device_hybrid(qstack[0][:2], qt_j, qw_j, v8, cols, terms,
                                 w16, spec, scales)
        gids8 = np.asarray(gids8)
        ov = np.mean([
            len(set(gids8[b].tolist())
                & set(np.asarray(dev_gids)[b].tolist())) / LIMIT
            for b in range(2)])
        extra["int8_vs_bf16_overlap"] = round(float(ov), 3)
    except Exception as e:  # keep the headline metric robust
        extra["int8_error"] = str(e)[:200]

    # ---- IVF variant (probe-limited dense; BASELINE config 4 shape) ----
    log(f"int8 done ({extra.get('int8_hybrid_qps')}); building IVF")
    try:
        from voitta_rag_tpu.index.ivf import IVFIndex
        from voitta_rag_tpu.ops.topk import masked_topk

        gids_all = np.arange(N, dtype=np.int32)
        t0 = time.perf_counter()
        ivf = IVFIndex.build(vecs_dev, cols.T, gids_all, n_cells=512,
                             kmeans_iters=3, skew_factor=2.0)
        jax.block_until_ready(ivf.vecs3)
        extra["ivf_build_s"] = round(time.perf_counter() - t0, 1)

        def mk_ivf(nprobe):
            def ivf_dense(q):
                s, g = ivf.search_scores(q, spec, nprobe=nprobe)
                vals, pos = masked_topk(s, LIMIT, approx=True)
                return vals, jnp.take_along_axis(g, jnp.maximum(pos, 0),
                                                 axis=1)
            return ivf_dense

        d_exact = np.asarray(dense_scan_scores(qstack[0][:8], vecs, cols,
                                               spec))
        oracle = np.argsort(-d_exact, axis=1)[:, :LIMIT]
        # Synthetic isotropic vectors have no cluster structure — the worst
        # case for IVF recall — so report the recall/qps CURVE over nprobe.
        for nprobe in (32, 128):
            ivf_dense = mk_ivf(nprobe)
            qps_ivf, _ = queued_qps(ivf_dense, qstack)
            _, giv = ivf_dense(qstack[0][:8])
            giv = np.asarray(giv)
            rec = float(np.mean([
                len(set(giv[b].tolist()) & set(oracle[b].tolist())) / LIMIT
                for b in range(8)]))
            extra[f"ivf_qps_np{nprobe}"] = round(qps_ivf, 1)
            extra[f"ivf_recall10_np{nprobe}"] = round(rec, 3)
    except Exception as e:
        extra["ivf_error"] = str(e)[:200]

    # ---- 10M-row scale probe (BASELINE config 4 shape on ONE chip) ----
    # int8 storage (3.84 GB), filtered hybrid, entirely device-resident —
    # no host transfers, so this adds ~1 min, not another corpus pull.
    if on_tpu:
        log("10M-scale probe")
        try:
            # Free the 1M working set first (HBM is 16 GB). Rebinding to
            # None drops the device references (del on locals() is a no-op
            # inside a function).
            vecs = terms = weights = cols = vecs_dev = None
            v8 = scales = w16 = ivf = None  # try-block locals, may be unset
            import gc

            gc.collect()

            N10 = 10 * 1024 * 1024
            blocks = []
            sc_blocks = []
            kb = jax.random.split(jax.random.PRNGKey(7), 8)
            gen = jax.jit(lambda k: jax.random.normal(
                k, (N10 // 8, D), jnp.float32))
            q8 = jax.jit(lambda v: (
                jnp.clip(jnp.round(v / (jnp.max(jnp.abs(v), axis=1,
                                                keepdims=True) / 127.0)),
                         -127, 127).astype(jnp.int8),
                (jnp.max(jnp.abs(v), axis=1) / 127.0).astype(jnp.float32)))
            for kk in kb:
                blk = gen(kk)
                blk = blk / jnp.linalg.norm(blk, axis=1, keepdims=True)
                v8b, scb = q8(blk)
                blocks.append(v8b)
                sc_blocks.append(scb)
                del blk
            vecs10 = jnp.concatenate(blocks)
            scales10 = jnp.concatenate(sc_blocks)[None, :]
            del blocks, sc_blocks
            k2 = jax.random.split(jax.random.PRNGKey(8), 3)
            folder10 = jax.random.randint(k2[0], (N10,), 0, N_FOLDERS,
                                          jnp.int32)
            cols10 = (jnp.zeros((NUM_COLS, N10), jnp.int32)
                      .at[COL_VALID].set(1).at[COL_FOLDER].set(folder10))
            terms10 = jax.random.randint(k2[1], (S, N10), 0, 1_000_000,
                                         jnp.int32)
            weights10 = jax.random.uniform(k2[2], (S, N10), jnp.bfloat16)
            jax.block_until_ready((vecs10, cols10, terms10, weights10))

            qps10, dt10 = queued_qps(device_hybrid, qstack, qt_j, qw_j,
                                     vecs10, cols10, terms10, weights10,
                                     spec, scales10)
            extra["hybrid_qps_10M_int8"] = round(qps10, 1)
            extra["hybrid_ms_per_batch_10M"] = round(dt10 / N_ITERS * 1000, 2)
            log(f"10M int8 hybrid: {qps10:.0f} qps")
        except Exception as e:
            extra["scale10M_error"] = str(e)[:200]

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
