"""Headline benchmark: filtered hybrid search on one chip, vs a real CPU ANN
baseline, at BASELINE.md's staged configs.

Sections (each logged to stderr; stdout carries ONE JSON line):
1. 1M x 384 clustered corpus (utils/synth.py: mixture-on-the-sphere with
   realistic intra-cluster cosine — isotropic vectors are the worst case for
   every ANN method and say nothing about real embedding corpora).
2. Headline: filtered hybrid QPS, B=32, bf16 flat scan + slot-major sparse
   (the exact-scan serving shape; same metric name as round 1).
3. int8 storage variant + recall vs the f32 oracle.
4. IVF (C=4096 int8 cells): recall@10 + QPS across nprobe.
5. Inverted postings sparse: build, b=1 and B=32 latency.
6. p50 single-query latency: the fused single-dispatch program (encode +
   dense + postings + fusion), reported two ways — wall-clock through the
   remote tunnel AND device-side per-query time measured by chaining 32
   sequential queries inside ONE dispatch via lax.scan (the number a locally
   attached chip would see; the tunnel adds ~3-4 ms of RPC per dispatch that
   is not device work).
7. Real-text corpus: package sources/docs through the production chunker +
   BM25, encoded on-chip (e5-base arch) — recall on a REAL distribution.
8. 10M x 768 (BASELINE config 4 geometry) int8: flat hybrid QPS, postings,
   and IVF (C=8192, margin-gated boundary replicas) recall/QPS. The IVF
   build regenerates the corpus block-by-block from the same PRNG keys so
   the flat corpus (7.7 GB) and the cell-major copy never coexist in HBM.
9. CPU HNSW baseline (native/hnsw_baseline.cpp — single-thread, this host,
   efc=200, ef swept to 512): recall@10 + QPS on a 25-50k subsample.
   vs_baseline = TPU IVF QPS / HNSW QPS at recall@10 >= the baseline's.

Timing notes (remote-TPU tunnel environment):
- block_until_ready alone under-reports through the tunnel; only a host
  fetch guarantees a dispatch ran. Executions queue in order, so fetching
  the LAST output forces all prior queued programs.
- The first timed loop after a compile carries residual host work; report
  the best of two loops.
- Large device constants must be jit ARGUMENTS (a closed-over GB-scale
  array becomes an XLA constant and remote compilation hangs).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


_T0 = time.time()


def log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)

from voitta_rag_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from voitta_rag_tpu.index.ivf import (  # noqa: E402
    IVFIndex, _assign_topk_cells, _block_rows_for, _kmeans_train,
    _ivf_search_candidates,
)
from voitta_rag_tpu.index.postings import (  # noqa: E402
    SparsePostings, postings_candidates,
)
from voitta_rag_tpu.ops.dense_scan import dense_scan_scores  # noqa: E402
from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores, TERM_PAD  # noqa: E402
from voitta_rag_tpu.ops.filters import (  # noqa: E402
    COL_FOLDER, COL_VALID, NUM_COLS, make_filter_spec,
)
from voitta_rag_tpu.ops.fusion import hybrid_fuse, hybrid_fuse_candidates  # noqa: E402
from voitta_rag_tpu.ops.topk import masked_topk  # noqa: E402
from voitta_rag_tpu.ops.pallas_utils import NEG_INF, round_up  # noqa: E402
from voitta_rag_tpu.utils.synth import clustered_unit_vectors, mixture_queries  # noqa: E402

N = 1_048_576   # 2^20 rows (scan-tile aligned)
D = 384
TRUE_CLUSTERS = 4096
INTRA_COS = 0.55  # calibrated: HNSW ~0.97 recall@ef32 — non-trivial, fair
S = 32          # sparse slots per doc
QT = 16         # query terms
B = 32          # query batch per dispatch
LIMIT = 10
N_FOLDERS = 64
INCLUDE = [1, 2, 3, 5, 8, 13, 21, 34]  # folder-scope filter
SPARSE_W = 0.1
N_ITERS = 20
# Tokenized real corpus handoff: bench_real_corpus -> bench_real10m.
_REAL10M_STASH = None
VOCAB = 100_000
IVF_CELLS = 4096
MAX_POST = 512

CORPUS_KEY = jax.random.PRNGKey(0)


def build_corpus(seed=0):
    """Clustered corpus ON DEVICE + host copies for the CPU oracle.

    The host copies are REGENERATED on the in-process CPU backend from the
    same PRNG keys instead of pulled from the device: JAX's threefry PRNG
    is backend-deterministic, and the remote-TPU tunnel moves ~1.2 MB/s —
    pulling the ~1 GB of host copies cost 733 s of the round-3 bench
    deadline. A 4096-row device sample cross-checks the regeneration
    (erf_inv/rsqrt may differ by ulps across backends); divergence beyond
    f16 resolution falls back to the full pull."""
    vecs, _cid = clustered_unit_vectors(
        CORPUS_KEY, N, D, n_clusters=TRUE_CLUSTERS, intra_cos=INTRA_COS)
    k = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    folder = jax.random.randint(k[0], (N,), 0, N_FOLDERS, jnp.int32)
    cols = jnp.zeros((NUM_COLS, N), jnp.int32)
    cols = cols.at[COL_VALID].set(1).at[COL_FOLDER].set(folder)
    terms = jax.random.randint(k[1], (S, N), 0, VOCAB, jnp.int32)
    weights = jax.random.uniform(k[2], (S, N), jnp.float32)
    rng = np.random.default_rng(seed)

    vecs_np = cols_np = terms_np = weights_np = None
    if jax.default_backend() != "cpu":
        try:
            cpu0 = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu0):
                vecs_c, _ = clustered_unit_vectors(
                    CORPUS_KEY, N, D, n_clusters=TRUE_CLUSTERS,
                    intra_cos=INTRA_COS)
                kc = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
                folder_c = jax.random.randint(kc[0], (N,), 0, N_FOLDERS,
                                              jnp.int32)
                terms_c = jax.random.randint(kc[1], (S, N), 0, VOCAB,
                                             jnp.int32)
                weights_c = jax.random.uniform(kc[2], (S, N), jnp.float32)
            vecs_np = np.asarray(vecs_c.astype(jnp.float16)) \
                .astype(np.float32)
            cols_np = np.zeros((NUM_COLS, N), np.int32)
            cols_np[COL_VALID] = 1
            cols_np[COL_FOLDER] = np.asarray(folder_c)
            terms_np = np.asarray(terms_c).T
            weights_np = np.asarray(weights_c.astype(jnp.float16)) \
                .astype(np.float32).T
            # Cross-check a random row sample against the device arrays
            # (own rng: the returned `rng` stream must not depend on
            # which path produced the host copies).
            idx = np.sort(np.random.default_rng(seed + 777)
                          .choice(N, 4096, replace=False))
            idx_j = jnp.asarray(idx)
            dv = np.asarray(
                jnp.take(vecs, idx_j, axis=0).astype(jnp.float16))
            dt = np.asarray(jnp.take(terms, idx_j, axis=1)).T
            dw = np.asarray(
                jnp.take(weights, idx_j, axis=1).astype(jnp.float16)).T
            df = np.asarray(jnp.take(folder, idx_j))
            vdiff = float(np.abs(dv.astype(np.float32)
                                 - vecs_np[idx]).max())
            ok = (vdiff <= 2e-3
                  and np.array_equal(dt, terms_np[idx])
                  and np.array_equal(df, cols_np[COL_FOLDER, idx])
                  and np.abs(dw - weights_np[idx]).max() <= 2e-3)
            if ok:
                log(f"host corpus regenerated on CPU backend "
                    f"(sample max |dvec| {vdiff:.2e}; tunnel pull skipped)")
            else:
                log(f"CPU regeneration diverged (max |dvec| {vdiff:.2e}); "
                    f"falling back to device pull")
                vecs_np = None
        except Exception as e:  # no cpu backend / OOM: pull as before
            log(f"CPU-backend regeneration unavailable ({e}); pulling")
            vecs_np = None
    if vecs_np is None:
        vecs_np = np.asarray(vecs.astype(jnp.float16)).astype(np.float32)
        cols_np = np.asarray(cols)
        terms_np = np.asarray(terms).T
        weights_np = (np.asarray(weights.astype(jnp.float16))
                      .astype(np.float32).T)
    return (vecs, cols, terms, weights,
            vecs_np, cols_np, terms_np, weights_np, rng)


@jax.jit
def device_hybrid(q, qt, qw, vecs, cols, terms, weights, spec, scales=None):
    """The exact-scan hybrid query as ONE device program (serving shape)."""
    d = dense_scan_scores(q, vecs, cols, spec, scales)
    s = sparse_scan_scores(qt, qw, terms, weights, cols, spec)
    return hybrid_fuse(d, jnp.broadcast_to(s, d.shape), SPARSE_W, limit=LIMIT)


SELECT_GROUP = 16


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def device_hybrid_select(q, qt, qw, vecs, cols, terms, weights, spec,
                         scales=None, *, use_pallas=False):
    """Flat hybrid via fused scan→group-winner selection: the [B, N] f32
    score arrays and the [1, N]→[B, N] sparse broadcast never hit HBM
    (ops/scan_select.py)."""
    from voitta_rag_tpu.ops.scan_select import dense_scan_select

    d_vals, d_ids = dense_scan_select(q, vecs, cols, spec, scales,
                                      group=SELECT_GROUP,
                                      use_pallas=use_pallas)
    s = sparse_scan_scores(qt, qw, terms, weights, cols, spec)
    p = LIMIT * 3
    s_vals, s_gids = masked_topk(s, p, approx=s.shape[-1] > (1 << 16))
    Bq = q.shape[0]
    s_vals = jnp.broadcast_to(s_vals, (Bq, p))
    s_gids = jnp.broadcast_to(s_gids, (Bq, p))
    return hybrid_fuse_candidates(d_vals, d_ids, s_vals, s_gids, SPARSE_W,
                                  limit=LIMIT)


def cpu_hybrid(q, qt, qw, vecs, cols, terms, weights, inc_mask):
    """NumPy/BLAS reference implementation of the same search."""
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
    for out in outs:
        for x in (out if isinstance(out, tuple) else (out,)):
            np.asarray(x)


def queued_qps(fn, qstack, *args):
    """Throughput via in-order queued dispatches; fetch once at the end."""
    _fetch([fn(qstack[0], *args)])  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [fn(q, *args) for q in qstack]
        np.asarray(jax.tree.leaves(outs[-1])[0])
        best = min(best, time.perf_counter() - t0)
    return qstack.shape[0] * qstack.shape[1] / best, best


def measure_rtt_ms(n=6):
    x = jnp.zeros((8, 8), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    _fetch([f(x)])
    t0 = time.perf_counter()
    for _ in range(n):
        _fetch([f(x)])
    return (time.perf_counter() - t0) / n * 1000.0


def recall_at10(got_ids: np.ndarray, oracle_ids: np.ndarray) -> float:
    return float(np.mean([
        len(set(got_ids[b].tolist()) & set(oracle_ids[b].tolist())) / LIMIT
        for b in range(len(got_ids))]))


def recall_at10_scoreaware(got_vals: np.ndarray, oracle_vals: np.ndarray,
                           eps: float = 1e-3) -> float:
    """ANN-benchmarks-style recall: a returned row counts iff its score is
    within ``eps`` of the true 10th-best score. Id-set intersection
    undercounts whenever scores tie or near-tie — measured on this
    clustered corpus the id metric loses ~0.5-1% to tie-flips that are not
    ranking errors (two rows with equal scores are interchangeable
    results). Both sides must be scored by the same storage dtype/kernel
    family; eps covers f32 accumulation-order differences between the flat
    and probe kernels."""
    thr = oracle_vals[:, LIMIT - 1] - eps
    return float(np.mean([
        float((got_vals[b] >= thr[b]).mean()) for b in range(len(got_vals))]))


HBM_PEAK_GBPS = 819.0  # TPU v5e (v5 lite) HBM bandwidth


def roofline(extra: dict, key: str, ms_per_batch: float,
             corpus_bytes: int) -> None:
    """Record compulsory-traffic roofline numbers for one scan config:
    ``corpus_bytes`` is the resident data a dispatch MUST read (vectors +
    scales + filter columns + sparse slots), i.e. the bandwidth lower
    bound; achieved = that / time vs the 819 GB/s v5e peak."""
    gbps = corpus_bytes / (ms_per_batch / 1000.0) / 1e9
    extra[f"scan_bytes_{key}"] = int(corpus_bytes)
    extra[f"achieved_gbps_{key}"] = round(gbps, 1)
    extra[f"roofline_frac_{key}"] = round(gbps / HBM_PEAK_GBPS, 3)


def chained_device_ms(fn_one, xs, n_chain: int, *arrays) -> float:
    """Device-side per-call time: run n_chain sequential calls inside ONE
    dispatch (lax.scan is a sequential while loop), so per-dispatch tunnel /
    launch overhead is amortized away. The scan carry consumes each output
    so nothing is dead-code-eliminated. All large operands are passed as
    ``arrays`` ARGUMENTS — closed-over device arrays become XLA constants
    and GB-scale constants hang the remote compile."""

    @jax.jit
    def chain(xs, *arrays):
        def body(carry, x):
            vals, gids = fn_one(x, *arrays)
            return (carry + jnp.sum(vals[:, 0])
                    + jnp.sum(gids[:, 0].astype(jnp.float32)), None)

        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c

    np.asarray(chain(xs, *arrays))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(chain(xs, *arrays))
        best = min(best, time.perf_counter() - t0)
    return best / n_chain * 1000.0


# Live state for the kill-flush path: sections update extra in place, so a
# SIGTERM handler can emit whatever has been measured so far.
_STATE = {"extra": None, "tpu_qps": None, "on_tpu": False, "t_start": None,
          "printed": False}


def compute_vs_baseline(extra, tpu_qps):
    """(vs, definition) against the CPU HNSW baseline.

    Preferred pair (north-star geometry, VERDICT r4 task 3): the 768-d REAL
    corpus — real_ivf_* (TPU IVF over the 1.04M x 768 real-text embeddings)
    vs hnsw768_* (C++ HNSW over the SAME vectors, queries, and oracle;
    graph cache built offline by scripts/build_hnsw_cache.py --real-npz).
    Fallbacks: the 1M x 384 synthetic pair, then flat-hybrid / ef32.
    Matching rule both ways: CPU point = its best recall not exceeding the
    TPU's best (recall parity); TPU point = fastest config at >= that
    recall.
    """
    def matched(tpu_pts, cpu_pts, tname, cname):
        tpu_pts = [p for p in tpu_pts if p[1] is not None and p[2]]
        cpu_pts = [p for p in cpu_pts if p[1] is not None and p[2]]
        max_tpu = max((p[1] for p in tpu_pts), default=0)
        cpu_best = None
        for ef, r, qps in sorted(cpu_pts, key=lambda p: -p[1]):
            if r <= max_tpu:
                cpu_best = (ef, r, qps)
                break
        if not cpu_best:
            return None
        tpu_best = None
        for np_, r, qps in tpu_pts:
            if r >= cpu_best[1] and (tpu_best is None or qps > tpu_best[2]):
                tpu_best = (np_, r, qps)
        if not tpu_best:
            return None
        vs = round(tpu_best[2] / cpu_best[2], 1)
        defn = (f"{tname}{tpu_best[0]} / {cname}{cpu_best[0]} (TPU recall "
                f"{tpu_best[1]} >= CPU recall {cpu_best[1]})")
        return vs, defn

    # 768-d real pair, duplicate-group recall first: the id and score
    # metrics are tie-depressed on BOTH engines by the corpus's
    # byte-identical duplicate chunks (62% of queries hold >=5 duplicate
    # rows in the exact top-10), so the metric that matches what the
    # content-addressing production store serves is "any copy of each
    # distinct top-10 vector" (computed identically for both engines in
    # bench_hnsw768); score-aware and raw-id pairs are the fallbacks.
    for flavor in ("_dedup", "_scoreaware", ""):
        got = matched(
            [(np_, extra.get(f"real_ivf_recall10{flavor}_np{np_}"),
              extra.get(f"real_ivf_qps_np{np_}")) for np_ in (16, 32, 64)],
            [(ef, extra.get(f"hnsw768_recall10{flavor}_ef{ef}"),
              extra.get(f"hnsw768_qps_ef{ef}"))
             for ef in (32, 64, 128, 256, 512)],
            f"real_ivf_qps(rec{flavor})_np", "hnsw768_qps_ef")
        if got:
            return got[0], (got[1] + " [768-d real corpus, same rows/"
                                     "queries/oracle]")
    got = matched(
        [(np_, extra.get(f"ivf_recall10_np{np_}"),
          extra.get(f"ivf_qps_np{np_}")) for np_ in (16, 32, 64, 128)],
        [(ef, extra.get(f"hnsw_recall10_ef{ef}"),
          extra.get(f"hnsw_qps_ef{ef}")) for ef in (32, 64, 128, 256, 512)],
        "ivf_qps_np", "hnsw_qps_ef")
    if got:
        return got[0], got[1] + " [1M x 384 synthetic]"
    hq = extra.get("hnsw_qps_ef32")
    if hq and tpu_qps:
        return round(tpu_qps / hq, 1), "flat hybrid qps / hnsw_qps_ef32"
    return None, None


def finalize_result(extra, tpu_qps, on_tpu, status="complete"):
    """Write BENCH_FULL.json and return the compact headline line.

    Callable at ANY point (including from the SIGTERM handler): computes
    vs_baseline from whatever extra holds. The driver tail-captures only
    the last ~2000 chars of stdout, so the full metric set goes to the
    artifact file and the printed line stays compact.
    """
    from pathlib import Path

    vs, defn = compute_vs_baseline(extra, tpu_qps)
    if defn:
        extra["vs_baseline_definition"] = defn
    if status != "complete":
        extra["bench_status"] = status
    else:
        extra.pop("bench_status", None)
    result = {
        "metric": "filtered_hybrid_search_qps_1M_384d"
                  + ("" if on_tpu else "_cpu"),
        "value": round(tpu_qps, 1) if tpu_qps else None,
        "unit": "qps",
        "vs_baseline": vs,
        "extra": extra,
    }
    full_path = Path(__file__).resolve().parent / "BENCH_FULL.json"
    try:
        full_path.write_text(json.dumps(result, indent=1, sort_keys=True,
                                        default=str))
    except Exception as e:
        log(f"could not write {full_path}: {e}")

    hl_keys = (
        "ivf_qps_np16", "ivf_recall10_np16",
        "real_ivf_qps_np16", "real_ivf_recall10_np16",
        "real10m_ivf_qps_np8", "real10m_ivf_recall10_np8",
        "real10m_recall10_chunk_np8", "real10m_ivf_recall10_scoreaware_np8",
        "bq_coarse_qps", "bq_e2e_qps_tunnel_os4",
        "p50_query_ms_device", "p50_query_ms_device_ivf",
        "p50_query_ms_tunnel", "p99_under_mutation_ms", "p99_idle_ms",
        "trained_recall10", "trained_hybrid_recall10",
        "bm25_only_recall10",
        "hnsw768_rows", "hnsw768_recall10_ef128",
        "hnsw768_recall10_scoreaware_ef128", "hnsw768_qps_ef128",
        "hnsw768_recall10_dedup_ef512", "real_ivf_recall10_dedup_np16",
        "hnsw_recall10_ef128", "hnsw_qps_ef128",
        "vs_baseline_definition", "backend", "bench_status",
    )
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "qps",
        "vs_baseline": vs,
        "full": full_path.name,
        "hl": {k: extra[k] for k in hl_keys if k in extra},
    }
    line = json.dumps(compact, separators=(",", ":"), default=str)
    if len(line) > 1800:  # belt-and-braces: drop hl before risking the tail
        compact.pop("hl")
        line = json.dumps(compact, separators=(",", ":"), default=str)
    return line


def _flush_and_exit(signum, frame):  # pragma: no cover - kill path
    """SIGTERM/SIGINT: flush the headline before dying (VERDICT r4 task 1).

    The driver kills overruns with `timeout` (SIGTERM). r3 and r4 both
    lost their parsed headline to exactly this; the handler guarantees the
    last stdout line is the compact JSON whatever the kill timing.
    """
    import os

    if not _STATE["printed"]:
        try:
            extra = _STATE["extra"] if _STATE["extra"] is not None else {}
            if _STATE["t_start"]:
                extra["killed_at_s"] = round(time.time() - _STATE["t_start"],
                                             1)
            line = finalize_result(extra, _STATE["tpu_qps"],
                                   _STATE["on_tpu"],
                                   status=f"killed_sig{signum}")
            print(line, flush=True)
            _STATE["printed"] = True
        except Exception:
            pass
    os._exit(0)


def main():
    # Self-bounding: if a section would start too close to a driver-side
    # timeout, skip it and still print the result line — a killed process
    # records NOTHING, which is strictly worse than a partial run.
    # Deadline calibration (r4 post-mortem): the driver killed r4 at
    # ~1900-2100 s elapsed while the internal clock (default 2700) believed
    # ~900 s remained. 1550 s keeps >=20% margin under the observed kill.
    import os
    import signal

    t_start = time.time()
    _STATE["t_start"] = t_start
    signal.signal(signal.SIGTERM, _flush_and_exit)
    signal.signal(signal.SIGINT, _flush_and_exit)
    deadline = float(os.environ.get("VOITTA_BENCH_DEADLINE_S", "1550"))

    def time_left() -> float:
        return deadline - (time.time() - t_start)

    def checkpoint_extra(extra):
        """Spill the metric set so far: a driver-killed run must still
        leave evidence on disk (round-3 lost its headline to a truncated
        tail; a hard kill would lose everything)."""
        from pathlib import Path

        try:
            p = Path(__file__).resolve().parent / "BENCH_PARTIAL.json"
            p.write_text(json.dumps(extra, indent=1, sort_keys=True,
                                    default=str))
        except Exception:
            pass

    on_tpu = jax.default_backend() == "tpu"
    _STATE["on_tpu"] = on_tpu
    extra = {"backend": jax.default_backend(),
             "host_vcpus": __import__("os").cpu_count(),
             "corpus_model": f"clustered(intra_cos={INTRA_COS}, "
                             f"clusters={TRUE_CLUSTERS})"}
    _STATE["extra"] = extra
    log(f"backend={jax.default_backend()}; generating clustered corpus")
    t_all = time.time()
    (vecs_dev, cols, terms, weights,
     vecs_np, cols_np, terms_np, weights_np, rng) = build_corpus()
    log(f"corpus ready ({time.time() - t_all:.0f}s)")

    # Query pools: from the same topic mixture as the corpus.
    n_pool = B * N_ITERS
    qpool = np.asarray(mixture_queries(
        jax.random.PRNGKey(101), n_pool, D, n_clusters=TRUE_CLUSTERS,
        intra_cos=INTRA_COS, center_key=CORPUS_KEY))
    qt = np.full((1, QT), TERM_PAD, np.int32)
    qt[0, :QT] = rng.choice(VOCAB, QT, replace=False)
    qw = np.zeros((1, QT), np.float32)
    qw[0, :QT] = rng.random(QT).astype(np.float32) + 0.2

    spec = make_filter_spec(include_folder_ids=INCLUDE)
    pass_all = make_filter_spec()
    store_dt = jnp.bfloat16 if on_tpu else jnp.float32
    vecs = vecs_dev.astype(store_dt)
    qt_j, qw_j = jnp.asarray(qt), jnp.asarray(qw)
    qstack = jnp.asarray(qpool).reshape(N_ITERS, B, D)

    log("timing headline hybrid program (bf16 flat)")
    tpu_qps, dt = queued_qps(device_hybrid, qstack, qt_j, qw_j, vecs, cols,
                             terms, weights, spec)
    _STATE["tpu_qps"] = tpu_qps
    rtt_ms = measure_rtt_ms()
    extra["tunnel_rtt_ms"] = round(rtt_ms, 2)
    log(f"headline: {tpu_qps:.0f} qps ({dt / N_ITERS * 1000:.2f} ms per "
        f"{B}-query batch; tunnel rtt {rtt_ms:.1f} ms)")
    # Compulsory reads: bf16 vectors + filter cols (dense + sparse kernels
    # each read them) + slot-major sparse terms (i32) and weights (f32).
    bytes_flat_bf16 = (N * D * 2 + 2 * N * NUM_COLS * 4
                       + N * S * 4 + N * S * 4)
    roofline(extra, "hybrid_1M_384_bf16", dt / N_ITERS * 1000,
             bytes_flat_bf16)

    # NOTE: a lax.scan-chained "device-side" variant of this measurement was
    # tried and reads WORSE (7.9 ms vs 5.9 ms per batch): the scan carry
    # serializes batches and defeats the DMA/compute pipelining that queued
    # dispatches get. Queued throughput is the honest number; chaining is
    # only used for p50 latency below, where serialization is the point.

    # ---- fused scan→select variant (no [B, N] score materialization) ----
    try:
        sel_fn = functools.partial(device_hybrid_select, use_pallas=on_tpu)
        sel_qps, sel_dt = queued_qps(sel_fn, qstack, qt_j, qw_j, vecs, cols,
                                     terms, weights, spec)
        extra["select_hybrid_qps"] = round(sel_qps, 1)
        log(f"select-hybrid: {sel_qps:.0f} qps "
            f"({sel_dt / N_ITERS * 1000:.2f} ms/batch)")
    except Exception as e:
        extra["select_error"] = str(e)[:200]
        log(f"select variant failed: {e}")

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
    extra["recall_vs_cpu_oracle"] = round(agree / 2, 3)
    try:
        _, sel_gids2 = device_hybrid_select(
            qstack[0][:2], qt_j, qw_j, vecs, cols, terms, weights, spec,
            use_pallas=on_tpu)
        sel_gids2 = np.asarray(sel_gids2)
        s_agree = 0
        for b in range(2):
            cpu_ids = {int(i) for i, _ in cpu_top[b]}
            dev_ids = {int(g) for g in sel_gids2[b] if g >= 0}
            s_agree += len(cpu_ids & dev_ids) / max(len(cpu_ids), 1)
        extra["select_recall_vs_cpu_oracle"] = round(s_agree / 2, 3)
    except Exception as e:
        extra["select_recall_error"] = str(e)[:200]
    extra["batch"] = B
    extra["limit"] = LIMIT
    extra["corpus"] = N
    extra["dim"] = D

    # Exact dense oracle for recall measurements (unfiltered, f32).
    n_oracle = 64
    q_oracle = jnp.asarray(qpool[:n_oracle])
    oracle_scores = dense_scan_scores(q_oracle, vecs_dev, cols, pass_all,
                                      use_pallas=False)
    _, oracle_ids = jax.lax.top_k(oracle_scores, LIMIT)
    oracle_ids = np.asarray(oracle_ids)

    # ---- large-batch throughput ----
    try:
        B2 = 256
        q2 = jnp.asarray(
            np.vstack([qpool] * ((B2 * 8) // n_pool + 1))[: B2 * 8]
        ).reshape(8, B2, D)
        qps2, _ = queued_qps(device_hybrid, q2, qt_j, qw_j, vecs, cols,
                             terms, weights, spec)
        extra["hybrid_qps_b256"] = round(qps2, 1)
        log(f"b256: {qps2:.0f} qps")
    except Exception as e:
        extra["b256_error"] = str(e)[:200]

    # ---- int8 storage variant ----
    scale = jnp.max(jnp.abs(vecs_dev), axis=1) / 127.0
    v8 = jnp.clip(jnp.round(vecs_dev / scale[:, None]),
                  -127, 127).astype(jnp.int8)
    scales = scale[None, :].astype(jnp.float32)
    w16 = weights.astype(jnp.bfloat16)
    try:
        qps8, dt8 = queued_qps(device_hybrid, qstack, qt_j, qw_j, v8, cols,
                               terms, w16, spec, scales)
        extra["int8_hybrid_qps"] = round(qps8, 1)
        bytes_flat_int8 = (N * D * 1 + N * 4 + 2 * N * NUM_COLS * 4
                           + N * S * 4 + N * S * 2)
        roofline(extra, "hybrid_1M_384_int8", dt8 / N_ITERS * 1000,
                 bytes_flat_int8)

        @jax.jit
        def int8_top(q, v8, cols, scales):
            # Arrays are ARGUMENTS: a closed-over GB-scale array becomes an
            # XLA constant and the remote compile payload explodes (HTTP 413).
            sc = dense_scan_scores(q, v8, cols, pass_all, scales)
            return masked_topk(sc, LIMIT, approx=True)

        _, ids8 = int8_top(q_oracle, v8, cols, scales)
        extra["int8_recall10"] = round(recall_at10(np.asarray(ids8),
                                                   oracle_ids), 3)
        log(f"int8: {qps8:.0f} qps, recall {extra['int8_recall10']}")

        # Exact top-k over the int8 scores: the storage-dtype ground truth
        # the IVF probe is measured against (same kernel family → the
        # score-aware recall below compares like with like).
        @jax.jit
        def int8_oracle(q, v8, cols, scales):
            sc = dense_scan_scores(q, v8, cols, pass_all, scales)
            return masked_topk(sc, LIMIT)

        ovals8, oids8 = int8_oracle(q_oracle, v8, cols, scales)
        ovals8, oids8 = np.asarray(ovals8), np.asarray(oids8)
    except Exception as e:
        extra["int8_error"] = str(e)[:200]
        ovals8 = oids8 = None

    # ---- IVF (C=4096 int8 cells) ----
    log("building IVF (C=4096, int8 cells)")
    try:
        gids_all = jnp.arange(N, dtype=jnp.int32)
        t0 = time.perf_counter()
        ivf = IVFIndex.build(vecs_dev, cols.T, gids_all, n_cells=IVF_CELLS,
                             kmeans_iters=20, skew_factor=1.5, dtype="int8",
                             assign_k=1)
        jax.block_until_ready(ivf.vecs3)
        extra["ivf_build_s"] = round(time.perf_counter() - t0, 1)
        for nprobe in (16, 32, 64):
            def ivf_top(q, nprobe=nprobe):
                return ivf.search_candidates(q, pass_all, nprobe=nprobe,
                                             limit=LIMIT)

            vivf, giv = ivf_top(q_oracle)
            rec = recall_at10(np.asarray(giv), oracle_ids)
            qps_ivf, dt_ivf = queued_qps(ivf_top, qstack)
            extra[f"ivf_qps_np{nprobe}"] = round(qps_ivf, 1)
            extra[f"ivf_recall10_np{nprobe}"] = round(rec, 3)
            if oids8 is not None:
                rec_t = recall_at10_scoreaware(np.asarray(vivf), ovals8)
                extra[f"ivf_recall10_scoreaware_np{nprobe}"] = round(rec_t, 3)
            n_rest = ivf.rest_vecs.shape[0]
            u_cells = min(B * nprobe, IVF_CELLS)
            probe_rows = u_cells * ivf.cell_cap + n_rest
            roofline(extra, f"ivf_np{nprobe}", dt_ivf / N_ITERS * 1000,
                     probe_rows * (D + 4 + NUM_COLS * 4))
            log(f"IVF np={nprobe}: recall {rec:.3f}"
                + (f" (score-aware {extra.get(f'ivf_recall10_scoreaware_np{nprobe}')})"
                   if oids8 is not None else "")
                + f", {qps_ivf:.0f} qps")

        # Throughput operating point: approx_max_k candidate selection
        # (VOITTA_IVF_SELECT=approx; measured trade in index/ivf.py).
        def ivf_top_a(q):
            return ivf.search_candidates(q, pass_all, nprobe=16,
                                         limit=LIMIT, select="approx")

        vivf, giv = ivf_top_a(q_oracle)
        rec_a = recall_at10(np.asarray(giv), oracle_ids)
        qps_a, _ = queued_qps(ivf_top_a, qstack)
        extra["ivf_qps_np16_approx"] = round(qps_a, 1)
        extra["ivf_recall10_np16_approx"] = round(rec_a, 3)
        if oids8 is not None:
            extra["ivf_recall10_scoreaware_np16_approx"] = round(
                recall_at10_scoreaware(np.asarray(vivf), ovals8), 3)
        log(f"IVF np=16 approx-select: recall {rec_a:.3f}, {qps_a:.0f} qps")
    except Exception as e:
        extra["ivf_error"] = str(e)[:250]
        ivf = None

    # ---- inverted postings sparse ----
    log("building sparse postings")
    try:
        t0 = time.perf_counter()
        post = SparsePostings.build(terms, weights,
                                    jnp.arange(N, dtype=jnp.int32),
                                    weight_dtype=jnp.bfloat16)
        jax.block_until_ready(post.terms)
        extra["postings_build_s"] = round(time.perf_counter() - t0, 1)

        def post_fn(qtqw):
            return postings_candidates(
                qtqw[0], qtqw[1], post.terms, post.gids, post.weights, cols,
                spec, limit=LIMIT * 3, max_postings=MAX_POST)

        def mk_q(bsz):
            t = np.full((bsz, QT), TERM_PAD, np.int32)
            w = np.zeros((bsz, QT), np.float32)
            for i in range(bsz):
                t[i] = rng.choice(VOCAB, QT, replace=False)
                w[i] = rng.random(QT) + 0.2
            return jnp.asarray(t), jnp.asarray(w)

        q1s = [mk_q(1) for _ in range(N_ITERS)]
        _fetch([post_fn(q1s[0])])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [post_fn(x) for x in q1s]
            np.asarray(outs[-1][0])
            best = min(best, time.perf_counter() - t0)
        extra["postings_b1_ms"] = round(best / N_ITERS * 1000, 2)
        log(f"postings b1 {extra['postings_b1_ms']} ms")
    except Exception as e:
        extra["postings_error"] = str(e)[:250]
        post = None

    # ---- p50 single-query latency: fused single-dispatch program ----
    log("p50 fused query probe")
    try:
        from voitta_rag_tpu.models.encoder import (
            PRESETS, encode_tokens, init_params)

        ecfg = PRESETS["sentence-transformers/all-MiniLM-L6-v2"]
        eparams = init_params(jax.random.PRNGKey(0), ecfg)
        L = 64
        emask = jnp.ones((1, L), jnp.int32)

        def fused_one(x, eparams, v8, cols, scales, pterms, pgids, pweights):
            ids, qt1, qw1 = x
            qv = encode_tokens(eparams, ecfg, ids, emask)
            d = dense_scan_scores(qv, v8, cols, spec, scales)
            d_vals, d_pos = masked_topk(d, LIMIT * 3, approx=True)
            s_vals, s_gids = postings_candidates(
                qt1, qw1, pterms, pgids, pweights, cols, spec,
                limit=LIMIT * 3, max_postings=MAX_POST)
            return hybrid_fuse_candidates(d_vals, d_pos, s_vals, s_gids,
                                          SPARSE_W, limit=LIMIT)

        big = (eparams, v8, cols, scales, post.terms, post.gids,
               post.weights)
        n_chain = 32
        ids_stack = jnp.asarray(
            rng.integers(4, ecfg.vocab_size, (n_chain, 1, L)), jnp.int32)
        qts, qws = zip(*(mk_q(1) for _ in range(n_chain)))
        xs = (ids_stack, jnp.stack(qts), jnp.stack(qws))
        dev_ms = chained_device_ms(fused_one, xs, n_chain, *big)
        extra["p50_query_ms_device"] = round(dev_ms, 3)

        # Tunnel-inclusive wall time per dispatch, for honesty.
        fused_jit = jax.jit(fused_one)
        _fetch([fused_jit((ids_stack[0], qts[0], qws[0]), *big)])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [fused_jit((ids_stack[i % n_chain], qts[i % n_chain],
                               qws[i % n_chain]), *big)
                    for i in range(N_ITERS)]
            np.asarray(outs[-1][0])
            best = min(best, time.perf_counter() - t0)
        extra["p50_query_ms_tunnel"] = round(best / N_ITERS * 1000, 3)

        # Serving-shape variant: IVF probe instead of the flat int8 scan
        # (what the store's fused snapshot path actually runs when an IVF
        # snapshot is live).
        if ivf is not None:
            def fused_ivf_one(x, eparams, pterms, pgids, pweights, cols,
                              centroids, vecs3, cols3, gid3, rest_vecs,
                              rest_cols, rest_gid, scales3, rest_scales):
                ids, qt1, qw1 = x
                qv = encode_tokens(eparams, ecfg, ids, emask)
                d_vals, d_gids = _ivf_search_candidates(
                    qv, centroids, vecs3, cols3, gid3, rest_vecs, rest_cols,
                    rest_gid, scales3, rest_scales, spec,
                    nprobe=32, limit=LIMIT * 3, assign_k=1)
                s_vals, s_gids = postings_candidates(
                    qt1, qw1, pterms, pgids, pweights, cols, spec,
                    limit=LIMIT * 3, max_postings=MAX_POST)
                return hybrid_fuse_candidates(d_vals, d_gids, s_vals, s_gids,
                                              SPARSE_W, limit=LIMIT)

            big_ivf = (eparams, post.terms, post.gids, post.weights, cols,
                       ivf.centroids, ivf.vecs3, ivf.cols3, ivf.gid3,
                       ivf.rest_vecs, ivf.rest_cols, ivf.rest_gid,
                       ivf.scales3, ivf.rest_scales)
            dev_ms_ivf = chained_device_ms(fused_ivf_one, xs, n_chain,
                                           *big_ivf)
            extra["p50_query_ms_device_ivf"] = round(dev_ms_ivf, 3)
            log(f"p50 fused (IVF probe): {dev_ms_ivf:.2f} ms device")
        log(f"p50 fused: device {dev_ms:.2f} ms / tunnel-inclusive "
            f"{extra['p50_query_ms_tunnel']:.2f} ms")

        # Index-build encode throughput (reference's chunks/sec metric) at
        # the serving dtype: bf16 params (the EmbeddingService default on
        # TPU; +50% over f32 on the MXU, b1 latency unchanged).
        eparams16 = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, eparams)
        Bi, Li = 256, 128
        istacks = jnp.asarray(
            rng.integers(4, ecfg.vocab_size, (8, Bi, Li)), jnp.int32)
        imask = jnp.ones((Bi, Li), jnp.int32)
        enc_i = jax.jit(lambda ids, p: encode_tokens(p, ecfg, ids, imask))
        eparams = eparams16
        np.asarray(enc_i(istacks[0], eparams))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            iouts = [enc_i(s2, eparams) for s2 in istacks]
            np.asarray(iouts[-1][..., :1])
            best = min(best, time.perf_counter() - t0)
        extra["encode_chunks_per_s"] = round(8 * Bi / best, 1)

        # e5-base geometry (768-d, 12 layers — the north-star encoder).
        e5cfg = PRESETS["intfloat/e5-base-v2"]
        e5params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x,
            init_params(jax.random.PRNGKey(1), e5cfg))
        e5stacks = jnp.asarray(
            rng.integers(4, e5cfg.vocab_size, (4, Bi, Li)), jnp.int32)
        enc_e5 = jax.jit(lambda ids, p: encode_tokens(p, e5cfg, ids, imask))
        np.asarray(enc_e5(e5stacks[0], e5params))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            iouts = [enc_e5(s2, e5params) for s2 in e5stacks]
            np.asarray(iouts[-1][..., :1])
            best = min(best, time.perf_counter() - t0)
        extra["encode_chunks_per_s_e5base"] = round(4 * Bi / best, 1)
        e5params = e5stacks = None
    except Exception as e:
        extra["latency_error"] = str(e)[:250]

    # ---- CPU HNSW baseline at 384-d (the reference's engine class: Qdrant
    # = Rust HNSW; here from-scratch C++, single-thread, this host). Runs
    # EARLY (host arrays + cached graph only, ~60s) so the vs_baseline
    # evidence is on disk even if a later TPU section dies (r3/r4 both lost
    # their headline to a driver kill in the back half of the run).
    try:
        bench_hnsw384(extra, vecs_np, qpool, n_oracle, time_left)
    except Exception as e:
        extra["hnsw_error"] = str(e)[:250]
    checkpoint_extra(extra)
    finalize_result(extra, tpu_qps, on_tpu, status="in_progress")

    # ---- real-text corpus (round-3: recall numbers on REAL data) ----
    if on_tpu and time_left() < 600:
        extra["real_corpus_skipped"] = (
            f"deadline: {time_left():.0f}s left, section needs ~600s")
        log(extra["real_corpus_skipped"])
    elif on_tpu:
        try:
            # Free the 1M synthetic device arrays first (the real section
            # needs ~4 GB for corpus + encoder + IVF copy).
            import gc

            vecs_dev = vecs = v8 = scales = scale = w16 = None
            qt_j = qw_j = q_oracle = oracle_scores = ivf = post = None
            big = ids_stack = None
            gc.collect()
            extra.update(bench_real_corpus(rng, time_left))
            checkpoint_extra(extra)
        except Exception as e:
            extra["real_corpus_error"] = str(e)[:300]
            log(f"real corpus failed: {e}")

    # ---- matched CPU baseline at the north-star dimension: C++ HNSW over
    # the SAME 1.04M x 768 real vectors, queries, and oracle as real_ivf_*
    # (VERDICT r4 task 3); host-only, cached graph + committed vector dump.
    if time_left() < 160:
        extra["hnsw768_skipped"] = f"deadline ({time_left():.0f}s left)"
        log(extra["hnsw768_skipped"])
    else:
        try:
            extra.update(bench_hnsw768(time_left))
            checkpoint_extra(extra)
            finalize_result(extra, tpu_qps, on_tpu, status="in_progress")
        except Exception as e:
            extra["hnsw768_error"] = str(e)[:300]
            log(f"hnsw768 baseline failed: {e}")

    # ---- learned retrieval: held-out recall of the offline-trained
    # checkpoint (scripts/train_retrieval_ckpt.py) through the production
    # kernels vs BM25-only and random init; trains in-bench only as a
    # fallback when no checkpoint is committed. Runs BEFORE real10m: it is
    # the only bench evidence for VERDICT r4 task 4 (real10m already has a
    # committed complete-run artifact), and a back-half kill must not cost
    # it again ----
    trained_need = 240 if _trained_ckpt_path().exists() else 650
    if on_tpu and time_left() < trained_need:
        extra["trained_skipped"] = f"deadline ({time_left():.0f}s left)"
        log(extra["trained_skipped"])
    elif on_tpu:
        try:
            import gc

            gc.collect()
            extra.update(bench_trained_retrieval(time_left))
            checkpoint_extra(extra)
            finalize_result(extra, tpu_qps, on_tpu, status="in_progress")
        except Exception as e:
            extra["trained_error"] = str(e)[:300]
            log(f"trained-retrieval section failed: {e}")

    # ---- REAL text at 10M x 768 (BASELINE config 4 geometry, real
    # distribution): 12 pooling views per harvested chunk, streamed
    # straight into the flat variable-length IVF layout ----
    if on_tpu and time_left() < 420:
        extra["real10m_skipped"] = (
            f"deadline: {time_left():.0f}s left, section needs ~420s warm "
            "(cached assignment+oracle) / ~850s cold")
        log(extra["real10m_skipped"])
    elif on_tpu:
        try:
            import gc

            gc.collect()
            extra.update(bench_real10m(time_left, rng))
            checkpoint_extra(extra)
        except Exception as e:
            extra["real10m_error"] = str(e)[:300]
            log(f"real-10M section failed: {e}")

    # ---- tail latency under mutation (the serving proof Qdrant is
    # trusted for): p50/p95/p99 with a concurrent writer + compaction ----
    if on_tpu and time_left() < 220:
        extra["mutation_skipped"] = f"deadline ({time_left():.0f}s left)"
        log(extra["mutation_skipped"])
    elif on_tpu:
        try:
            import gc

            gc.collect()
            extra.update(bench_mutation_latency(time_left))
            checkpoint_extra(extra)
        except Exception as e:
            extra["mutation_error"] = str(e)[:300]
            log(f"mutation-latency section failed: {e}")

    # ---- cold-tier BQ shadow (VOITTA_COLD_BQ serving pipeline) ----
    if on_tpu and time_left() < 330:
        extra["bq_skipped"] = f"deadline ({time_left():.0f}s left)"
        log(extra["bq_skipped"])
    elif on_tpu:
        try:
            import gc

            gc.collect()
            extra.update(bench_bq_cold())
            checkpoint_extra(extra)
        except Exception as e:
            extra["bq_error"] = str(e)[:300]
            log(f"bq section failed: {e}")

    # ---- 10M x 768 int8 (BASELINE config 4 geometry on ONE chip) ----
    if on_tpu and time_left() < 1000:
        extra["scale10M_skipped"] = (
            f"deadline: {time_left():.0f}s left of "
            f"VOITTA_BENCH_DEADLINE_S={deadline:.0f}, section needs ~1000s "
            "(warm compile cache)")
        log(extra["scale10M_skipped"])
    elif on_tpu:
        try:
            # Free every 1M-section buffer first: the 10M section needs the
            # whole 16 GB of HBM (7.7 GB corpus + 8 GB cell-major copy,
            # staged) and the 1M arrays above hold ~4-5 GB.
            import gc

            vecs_dev = vecs = v8 = scales = scale = w16 = cols = None
            terms = weights = qt_j = qw_j = qstack = q_oracle = None
            oracle_scores = oracle_ids = ivf = post = None
            # The HNSW baseline already ran (it moved ahead of the TPU-heavy
            # sections), so the host mirrors can go too.
            vecs_np = qpool = weights_np = terms_np = cols_np = None
            big = xs = ids_stack = istacks = qts = qws = eparams = None
            gc.collect()
            ten_m = bench_10m(extra, rng)
            extra.update(ten_m)
            checkpoint_extra(extra)
        except Exception as e:
            extra["scale10M_error"] = str(e)[:300]

    line = finalize_result(extra, tpu_qps, on_tpu)
    print(line)
    _STATE["printed"] = True


def _trained_ckpt_path():
    from pathlib import Path

    return (Path(__file__).resolve().parent / "bench_cache"
            / "trained_minilm.v1.npz")


def bench_hnsw384(extra, vecs_np, qpool, n_oracle, time_left):
    """CPU HNSW baseline on the 1M x 384 synthetic corpus (in place)."""
    from voitta_rag_tpu.utils.hnsw_baseline import HnswBaseline, available

    if time_left() < 120:
        extra["hnsw_skipped"] = f"deadline ({time_left():.0f}s left)"
        log(extra["hnsw_skipped"])
    elif available():
        # ef_construction=200 (hnswlib's default — a properly built
        # graph). Graph-only caches (committed under bench_cache/, built
        # offline — the corpus is deterministic, checksum-verified) let
        # the baseline run at 100k rows for the cost of a load; without
        # a cache the subsample is sized to the remaining deadline
        # (50k efc=200 builds in ~930s single-thread on this host).
        # The ef sweep runs to 512: search cost only, and the clustered
        # corpus needs large ef for the baseline's best recall.
        from pathlib import Path

        cache_dir = Path(__file__).resolve().parent / "bench_cache"
        h = None
        n_sub = 0
        # 1M first: matched corpus size vs the TPU sections (round-3
        # weakness: the headline multiplier divided QPS measured on a
        # 100k CPU corpus vs a 1M TPU corpus). Built offline in 9285s
        # single-thread via scripts/build_hnsw_cache.py.
        for n_try in (1_000_000, 100_000, 50_000, 25_000):
            cp = cache_dir / f"hnsw_{n_try}r_{D}d_m16_efc200.v2.bin"
            if cp.exists():
                h = HnswBaseline.load_graph(cp, vecs_np[:n_try])
                if h is not None:
                    n_sub = n_try
                    extra["hnsw_cache"] = cp.name
                    log(f"CPU HNSW baseline: loaded cached {n_try}-row "
                        f"efc=200 graph")
                    break
        if h is None and time_left() < 240:
            extra["hnsw_skipped"] = f"deadline ({time_left():.0f}s left)"
            log(extra["hnsw_skipped"])
        if h is None and time_left() >= 240:
            n_sub = 50_000 if time_left() > 1150 else 25_000
            log(f"CPU HNSW baseline ({n_sub} rows, efc=200, "
                f"{time_left():.0f}s left)")
            t0 = time.perf_counter()
            h = HnswBaseline(D, n_sub, m=16, ef_construction=200)
            h.add(vecs_np[:n_sub])
            extra["hnsw_build_s"] = round(time.perf_counter() - t0, 1)
            try:
                cache_dir.mkdir(exist_ok=True)
                h.save_graph(
                    cache_dir / f"hnsw_{n_sub}r_{D}d_m16_efc200.v2.bin")
            except Exception:
                pass
        if h is not None:
            sub = vecs_np[:n_sub]
            extra["hnsw_rows"] = n_sub
            sub_oracle = np.argsort(-(qpool[:n_oracle] @ sub.T),
                                    axis=1)[:, :LIMIT]
            for ef in (32, 64, 128, 256, 512):
                t0 = time.perf_counter()
                ids_h, _ = h.search(qpool[:n_oracle], k=LIMIT, ef=ef)
                dt_h = (time.perf_counter() - t0) / n_oracle
                extra[f"hnsw_recall10_ef{ef}"] = round(
                    recall_at10(ids_h, sub_oracle), 3)
                extra[f"hnsw_qps_ef{ef}"] = round(1 / dt_h, 1)
            log(f"HNSW: recall {extra.get('hnsw_recall10_ef512')} at "
                f"{extra.get('hnsw_qps_ef512')} qps ef512 "
                f"(1 thread, {n_sub} rows, efc=200)")
    else:
        extra["hnsw_error"] = "native lib unavailable"


def bench_hnsw768(time_left):
    """Matched CPU baseline at the north-star dimension (VERDICT r4 task 3).

    The SAME 1.04M x 768 REAL-corpus vectors, the SAME 64 held-out query
    vectors, and an exact-scan oracle over the same rows as the real_*
    TPU section: the C++ HNSW graph (native/hnsw_baseline.cpp, M=16,
    efc=200 — hnswlib's defaults, the configuration Qdrant inherits) is
    built OFFLINE from the committed vector dump by
    scripts/build_hnsw_cache.py --real-npz and only LOADED here.

    Scale honesty: 1M rows took ~9,900 s of single-thread insert on this
    1-vCPU host, and the measured per-row cost grows ~1.6x from 200k to
    1M (logs/hnsw768_build.log); extrapolating, a 10M x 768 graph is
    ~30-40 h of build on this box — RAM (125 GB) would fit it, build time
    is what makes the committed baseline stop at 1M. Equal-memory note:
    HNSW serves f32 rows + links (3072 + ~150 B/row); the TPU tier serves
    int8 + scale (772 B/row) — the device side holds the SMALLER
    representation of the same corpus.
    """
    from pathlib import Path

    from voitta_rag_tpu.utils.hnsw_baseline import HnswBaseline, available

    out = {}
    if not available():
        out["hnsw768_error"] = "native lib unavailable"
        return out
    cache_dir = Path(__file__).resolve().parent / "bench_cache"
    dumps = sorted(cache_dir.glob("real_vecs_*x768_int8.v1.npz"))
    if not dumps:
        out["hnsw768_error"] = "no real-vector dump committed"
        return out
    z = np.load(dumps[-1])
    v8, sc, q = z["v8"], z["scales"], np.ascontiguousarray(
        z["q"], np.float32)
    graphs = sorted(cache_dir.glob("hnsw_*r_768d_m16_efc200.real1.bin"),
                    key=lambda p: -int(p.name.split("_")[1][:-1]))
    h, n_sub = None, 0
    for cp in graphs:
        k = int(cp.name.split("_")[1][:-1])
        if k > len(v8):
            continue
        t0 = time.perf_counter()
        vecs_f = np.ascontiguousarray(
            v8[:k].astype(np.float32) * sc[:k, None], np.float32)
        h = HnswBaseline.load_graph(cp, vecs_f)
        if h is not None:
            n_sub = k
            out["hnsw768_cache"] = cp.name
            out["hnsw768_load_s"] = round(time.perf_counter() - t0, 1)
            break
        vecs_f = None
    if h is None:
        out["hnsw768_error"] = "no loadable 768-d graph cache"
        return out
    out["hnsw768_rows"] = n_sub
    log(f"hnsw768: loaded {n_sub}-row graph ({out['hnsw768_cache']}) in "
        f"{out['hnsw768_load_s']}s")

    # Exact oracle over the SAME rows (host, blocked int8 dequant — the
    # identical scoring the TPU real-section oracle uses).
    n_q = len(q)
    run_v = np.full((n_q, LIMIT), -np.inf, np.float32)
    run_i = np.full((n_q, LIMIT), -1, np.int64)
    BLK = 131072
    for lo in range(0, n_sub, BLK):
        blk = v8[lo:lo + BLK].astype(np.float32) * sc[lo:lo + BLK, None]
        s = q @ blk.T
        v = np.concatenate([run_v, s], axis=1)
        i = np.concatenate(
            [run_i, np.broadcast_to(np.arange(lo, lo + blk.shape[0]),
                                    s.shape)], axis=1)
        pos = np.argpartition(-v, LIMIT - 1, axis=1)[:, :LIMIT]
        run_v = np.take_along_axis(v, pos, axis=1)
        run_i = np.take_along_axis(i, pos, axis=1)
    oracle768, oracle768_v = run_i, run_v

    # Both recall flavors, exactly as on the TPU side: the raw id metric is
    # tie-depressed on this corpus (17.7% byte-identical chunks embed to
    # IDENTICAL vectors, so which duplicate id any exact retriever returns
    # is arbitrary), and the score-aware metric (ANN-benchmarks definition)
    # is the one that measures ranking quality. vs_baseline matches
    # score-aware to score-aware.
    ids_by_ef = {}
    for ef in (32, 64, 128, 256, 512):
        t0 = time.perf_counter()
        ids_h, _ = h.search(q, k=LIMIT, ef=ef)
        dt_h = (time.perf_counter() - t0) / n_q
        ids_by_ef[ef] = ids_h
        out[f"hnsw768_recall10_ef{ef}"] = round(
            recall_at10(ids_h, oracle768), 3)
        sc_h = np.einsum("qd,qkd->qk", q,
                         vecs_f[np.maximum(ids_h, 0)])
        sc_h = np.where(ids_h >= 0, sc_h, -np.inf)
        out[f"hnsw768_recall10_scoreaware_ef{ef}"] = round(
            recall_at10_scoreaware(sc_h, oracle768_v), 3)
        out[f"hnsw768_qps_ef{ef}"] = round(1 / dt_h, 1)

    # Duplicate-group recall for BOTH engines on the SAME retrieved sets:
    # 62% of these queries carry >= 5 byte-identical duplicate rows inside
    # the exact top-10 (real RAG corpora are like this: vendored licenses,
    # repeated headers), which caps id- and score-recall for any retriever
    # at which PARTICULAR copies it happens to surface. Ground truth = the
    # distinct vectors of the exact top-10 rows (avg 4.2/query here); a
    # group is hit if ANY byte-identical copy is returned, so the exact
    # scan scores 1.0 by construction and an ANN engine is measured on
    # result-set identity up to the arbitrary duplicate-copy choice — the
    # equivalence the content-addressing production store actually serves.
    st = _REAL10M_STASH or {}
    if st.get("real_rows") == n_sub and "oids64" in st:
        oids64 = st["oids64"]
        groups = []
        for qi in range(n_q):
            groups.append({v8[int(r)].tobytes()
                           for r in oids64[qi][:LIMIT]})

        def dedup_rec(ids_mat) -> float:
            hit = tot = 0
            for qi in range(n_q):
                got = {v8[int(r)].tobytes() for r in ids_mat[qi] if r >= 0}
                hit += len(groups[qi] & got)
                tot += len(groups[qi])
            return hit / max(tot, 1)

        for ef, ids_h in ids_by_ef.items():
            out[f"hnsw768_recall10_dedup_ef{ef}"] = round(dedup_rec(ids_h),
                                                          3)
        for np_ in (16, 32):
            ids_t = st.get(f"real_ivf_ids_np{np_}")
            if ids_t is not None:
                out[f"real_ivf_recall10_dedup_np{np_}"] = round(
                    dedup_rec(ids_t), 3)
        log(f"dedup-group recall@10: TPU ivf np16 "
            f"{out.get('real_ivf_recall10_dedup_np16')} vs HNSW ef128 "
            f"{out.get('hnsw768_recall10_dedup_ef128')} / ef512 "
            f"{out.get('hnsw768_recall10_dedup_ef512')}")
    log(f"hnsw768: recall {out.get('hnsw768_recall10_ef128')} "
        f"(score-aware {out.get('hnsw768_recall10_scoreaware_ef128')}) at "
        f"{out.get('hnsw768_qps_ef128')} qps ef128 / "
        f"{out.get('hnsw768_recall10_ef512')} "
        f"(score-aware {out.get('hnsw768_recall10_scoreaware_ef512')}) at "
        f"{out.get('hnsw768_qps_ef512')} qps ef512 "
        f"(1 thread, {n_sub} rows)")
    return out


def bench_bq_cold():
    """Cold-tier binary-quantization serving (index/bq_serve.py pipeline).

    Measures the beyond-HBM upgrade: a 1M x 768 corpus whose exact int8 rows
    live in HOST RAM while the device holds only the 1-bit sketch (~1/6 the
    int8 footprint incl. filter cols). A query coarse-scans the sketch on
    the MXU (ops/bitq.py Pallas kernel), over-fetches K' candidates, and
    rescores them exactly against the host rows (ops/rerank.py) — Qdrant's
    binary quantization + rescore-with-oversampling, which the reference
    inherits from its engine. Reported: coarse-kernel roofline, end-to-end
    QPS (device-only and tunnel-inclusive — the host hop costs one RTT), and
    recall@10 vs the exact int8 oracle at two oversampling levels.
    """
    out = {}
    from voitta_rag_tpu.ops.bitq import (bitq_scan_scores,
                                         encode_planes_device,
                                         whitening_transform)
    from voitta_rag_tpu.ops.rerank import rerank_exact_host

    BQ_BITS = 2  # production default (VOITTA_BQ_BITS)

    # 1M x 768: the f32 corpus + quant temporaries peak ~7 GB; 2M OOMs a
    # v5e during generation (measured), and 1M already demonstrates the tier.
    N2, D2, B2 = 1 << 20, 768, 32
    log(f"bq cold section: {N2} x {D2}, exact tier on host")
    key = jax.random.PRNGKey(7)
    vecs2, _ = clustered_unit_vectors(key, N2, D2, n_clusters=4096,
                                      intra_cos=INTRA_COS)
    scale2 = jnp.max(jnp.abs(vecs2), axis=1) / 127.0
    v8_2 = jnp.clip(jnp.round(vecs2 / scale2[:, None]),
                    -127, 127).astype(jnp.int8)
    scales2 = scale2[None, :].astype(jnp.float32)

    # Whitened sketch (the production encoding, segment.offload): cov on
    # device (one [D, D] matmul over the corpus), eigh on host (tiny).
    @jax.jit
    def _mu_cov(v):
        mu = jnp.mean(v, axis=0)
        c = v - mu
        return mu, (c.T @ c) / v.shape[0]

    mu2, cov2 = _mu_cov(vecs2)
    w_mat, a_mat = whitening_transform(np.asarray(cov2))
    w_dev, a_dev = jnp.asarray(w_mat), jnp.asarray(a_mat)

    @functools.partial(jax.jit, static_argnames=("bits",))
    def _enc(v, mu, w, bits=BQ_BITS):
        return encode_planes_device((v - mu) @ w.T, bits=bits)

    packed2, bq_scales2 = _enc(vecs2, mu2, w_dev)
    jax.block_until_ready(packed2)
    vecs2 = scale2 = None  # free the f32 corpus
    cols2 = jnp.zeros((NUM_COLS, N2), jnp.int32).at[COL_VALID].set(1)
    pass2 = make_filter_spec()

    # Exact int8 oracle (the exact-tier ground truth) for 64 queries.
    n_o = 64
    qpool2 = np.asarray(mixture_queries(
        jax.random.PRNGKey(71), B2 * N_ITERS, D2, n_clusters=4096,
        intra_cos=INTRA_COS, center_key=key))
    q_o = jnp.asarray(qpool2[:n_o])

    @jax.jit
    def _oracle(q, v8, cols, scales):
        return masked_topk(dense_scan_scores(q, v8, cols, pass2, scales),
                           LIMIT)
    ovals, oids = _fetch2(_oracle(q_o, v8_2, cols2, scales2))

    # Exact tier -> host RAM (this is the serving state being measured).
    t0 = time.perf_counter()
    v8_np = np.asarray(v8_2)
    scales_np = np.asarray(scales2)
    out["bq_exact_tier_pull_s"] = round(time.perf_counter() - t0, 1)
    v8_2 = None

    # TRUE device footprint: each bit-plane group stores plane_width(D)
    # bytes (128 at 768-d; only P=6 of 8 bits per byte used — the lane
    # alignment the Mosaic kernel needs), NOT D/8.
    from voitta_rag_tpu.ops.bitq import plane_width as _pw

    sketch_bytes = (N2 * _pw(D2) * BQ_BITS + N2 * 4 + N2 * NUM_COLS * 4)
    out["bq_bits"] = BQ_BITS
    out["bq_sketch_bytes_per_row"] = round(sketch_bytes / N2, 1)

    # Raw coarse kernel: scan + top-K' in one program.
    for os_factor in (4, 16):
        kp = LIMIT * 3 * os_factor

        @functools.partial(jax.jit, static_argnames=("approx",))
        def coarse_top(q, packed, scales, cols, qmat, kp=kp, approx=True):
            c = bitq_scan_scores(q @ qmat.T, packed, scales, cols, pass2,
                                 bits=BQ_BITS, use_pallas=True)
            return masked_topk(c, kp, approx=approx)

        qstack2 = jnp.asarray(qpool2).reshape(N_ITERS, B2, D2)
        qps_c, dt_c = queued_qps(coarse_top, qstack2, packed2, bq_scales2,
                                 cols2, a_dev)
        if os_factor == 4:
            roofline(out, "bq_coarse_1M_768", dt_c / N_ITERS * 1000,
                     sketch_bytes)
            out["bq_coarse_qps"] = round(qps_c, 1)

        # End-to-end serving, two ways (VERDICT r4 task 7):
        # - serial: dispatch -> pull -> rescore per batch (each batch pays
        #   a full tunnel RTT; r4's 489.7 qps number was this).
        # - pipelined: enqueue EVERY batch's coarse scan first (device
        #   executions queue in order; bq_coarse_candidates is built
        #   async for exactly this), then pull + exact-rescore with a
        #   small thread pool so candidate transfers overlap each other
        #   and the host rescores. This is how a serving frontend drains
        #   a request queue; the per-query tunnel RTT amortizes away.
        from concurrent.futures import ThreadPoolExecutor

        def bq_query(qb_np, kp=kp):
            vals_c, cand = coarse_top(jnp.asarray(qb_np), packed2,
                                      bq_scales2, cols2, a_dev)
            return rerank_exact_host(qb_np, np.asarray(cand), v8_np,
                                     scales_np, limit=LIMIT)

        t0 = time.perf_counter()
        got_v = []
        got_i = []
        for s in range(0, n_o, B2):
            v, g = bq_query(qpool2[s:s + B2])
            got_v.append(v)
            got_i.append(g)
        dt_e2e = (time.perf_counter() - t0) / (n_o // B2)
        got_v, got_i = np.vstack(got_v), np.vstack(got_i)
        rec = recall_at10(got_i, np.asarray(oids))
        rec_s = recall_at10_scoreaware(got_v, np.asarray(ovals))
        out[f"bq_recall10_os{os_factor}"] = round(rec, 3)
        out[f"bq_recall10_scoreaware_os{os_factor}"] = round(rec_s, 3)
        out[f"bq_e2e_qps_serial_os{os_factor}"] = round(B2 / dt_e2e, 1)

        def pipelined_once() -> float:
            t0 = time.perf_counter()
            cands = [coarse_top(qstack2[i], packed2, bq_scales2, cols2,
                                a_dev)[1] for i in range(N_ITERS)]

            def finish(i):
                return rerank_exact_host(
                    np.asarray(qstack2[i]), np.asarray(cands[i]),
                    v8_np, scales_np, limit=LIMIT)

            with ThreadPoolExecutor(4) as ex:
                list(ex.map(finish, range(N_ITERS)))
            return N_ITERS * B2 / (time.perf_counter() - t0)

        pipelined_once()  # warm thread pool + any residual compile
        qps_pipe = max(pipelined_once() for _ in range(2))
        out[f"bq_e2e_qps_tunnel_os{os_factor}"] = round(qps_pipe, 1)
        # Exact candidate selection (VOITTA_BQ_SELECT default; ~free at the
        # store's B=1 serving shape): recall with the same oversampling.
        got_e = []
        for st in range(0, n_o, B2):
            _, cand = coarse_top(jnp.asarray(qpool2[st:st + B2]), packed2,
                                 bq_scales2, cols2, a_dev, approx=False)
            _, g = rerank_exact_host(qpool2[st:st + B2], np.asarray(cand),
                                     v8_np, scales_np, limit=LIMIT)
            got_e.append(g)
        rec_e = recall_at10(np.vstack(got_e), np.asarray(oids))
        out[f"bq_recall10_exactsel_os{os_factor}"] = round(rec_e, 3)
        log(f"bq os={os_factor} (K'={kp}): recall {rec:.3f} approx-sel / "
            f"{rec_e:.3f} exact-sel (score-aware {rec_s:.3f}), e2e "
            f"{qps_pipe:.0f} qps pipelined / {B2 / dt_e2e:.0f} serial "
            f"tunnel-inclusive; coarse {qps_c:.0f} qps device")
    return out


def _fetch2(out):
    return tuple(np.asarray(x) for x in out)


def bench_real_corpus(rng, time_left):
    """Real-text corpus section (round-3 credibility gap closure): every
    other recall number in this file is a property of the synthetic
    Gaussian-mixture generator. Here the corpus is REAL text — installed
    package sources and docs on this host — run through the production
    chunker and the production BM25 pipeline, encoded on-chip with the
    e5-base architecture, and the same IVF/hybrid recall+QPS table is
    reproduced on the resulting (anisotropic, Zipfian, unevenly clustered)
    embedding distribution.

    No pretrained weights exist in this offline image, so the encoder is
    the real e5-base NETWORK (12L/768d, bf16, mean-pool) at random init
    with a CRC-hashed word→id vocab: embeddings are then deterministic
    functions of token statistics — lexically similar chunks embed close —
    which produces the realistic geometry this section exists to test
    (cluster-size skew, anisotropy), unlike pretrained-quality semantics.
    Queries are held-out chunks from the same corpus; the oracle is the
    exact int8 flat scan.
    """
    import gc
    import pathlib
    import re as _re
    import site
    import zlib

    from voitta_rag_tpu.models.encoder import (PRESETS, encode_tokens,
                                               init_params)
    from voitta_rag_tpu.search.sparse_text import SparseEmbeddingService
    from voitta_rag_tpu.services.chunking import ChunkingService

    out = {}
    # Full 1M when the deadline allows; a 512k real corpus still beats a
    # skipped section when the run started late.
    NR = 1_048_576 if time_left() > 1800 else 524_288
    DR = 768
    LTOK, BE = 96, 256
    CR = 8192  # IVF cells
    ecfg = PRESETS["intfloat/e5-base-v2"]

    # --- host-side inputs, cached: harvest + tokenize + BM25 cost ~8-10
    # CPU-bound minutes on this 1-vCPU host and are deterministic for a
    # given image; a cache hit (bench_cache/, uncommitted, rebuilt when
    # absent) returns them in seconds so the TPU sections own the deadline.
    from pathlib import Path as _Path

    cache_dir = _Path(__file__).resolve().parent / "bench_cache"
    cached = sorted(cache_dir.glob(f"real_corpus_*x{LTOK}.v1.npz"),
                    key=lambda p: -int(p.name.split("_")[2].split("x")[0]))
    all_ids = None
    for cp in cached:
        n_c = int(cp.name.split("_")[2].split("x")[0])
        if 262144 <= n_c <= NR:
            try:
                z = np.load(cp)
                all_ids, q_ids = z["ids"], z["q_ids"]
                termsR_np, weightsR_np = z["terms"], z["weights"]
                qtR, qwR = z["qt"], z["qw"]
                NR = len(all_ids)
                out["real_chunks"] = NR
                out["real_files"] = int(z["files"])
                out["real_text_mb"] = float(z["text_mb"])
                out["real_cache"] = cp.name
                log(f"real-corpus inputs: loaded cached {cp.name}")
                break
            except Exception as e:
                log(f"real-corpus cache {cp.name} unreadable ({e}); "
                    "regenerating")
                all_ids = None
    if all_ids is None:
        log(f"real-corpus section: harvesting text (target {NR} chunks, "
            f"{time_left():.0f}s left)")
        # --- harvest + chunk (production chunker) ---
        chunker = ChunkingService(chunk_size=800, chunk_overlap=200)
        roots = [pathlib.Path(p) for p in site.getsitepackages()]
        roots.append(pathlib.Path("/usr/share/doc"))
        exts = {".py", ".md", ".rst", ".txt", ".cfg", ".toml", ".json"}
        texts: list[str] = []
        files = 0
        total_bytes = 0
        t0 = time.time()
        for root in roots:
            if len(texts) >= NR + 64:
                break
            if not root.exists():
                continue
            for p in sorted(root.rglob("*")):
                if len(texts) >= NR + 64:
                    break
                if not (p.is_file()
                        and (p.suffix in exts
                             or p.name in ("LICENSE", "copyright"))):
                    continue
                try:
                    txt = p.read_text(errors="ignore")
                except OSError:
                    continue
                if len(txt) < 200:
                    continue
                files += 1
                total_bytes += len(txt)
                texts.extend(c.text for c in chunker.chunk_text(txt))
        n_q = 64
        # The host may hold slightly less text than the target (measured:
        # 1.038M chunks vs the 1.049M ask) — size the corpus to the
        # harvest, lane-aligned, reserving the tail as held-out queries.
        if len(texts) < NR + n_q:
            NR = ((len(texts) - n_q) // 1024) * 1024
        q_texts = texts[NR:NR + n_q]
        texts = texts[:NR]
        out["real_chunks"] = len(texts)
        out["real_files"] = files
        out["real_text_mb"] = round(total_bytes / 1e6, 1)
        log(f"real corpus: {len(texts)} chunks from {files} files "
            f"({out['real_text_mb']} MB) in {time.time() - t0:.0f}s")
        if NR < 262144 or len(q_texts) < n_q:
            out["real_corpus_error"] = f"only {len(texts)} chunks harvested"
            return out

        # --- tokenize (CRC-hashed vocab; deterministic across runs) ---
        vocab = ecfg.vocab_size
        word_re = _re.compile(r"\w+|[^\w\s]")

        def tok_ids(text: str) -> np.ndarray:
            ids = np.zeros(LTOK, np.int32)
            ids[0] = 1
            for j, w in enumerate(word_re.findall(text.lower())[:LTOK - 1]):
                ids[j + 1] = 2 + (zlib.crc32(w.encode()) % (vocab - 2))
            return ids

        t0 = time.time()
        all_ids = np.stack([tok_ids(t) for t in texts])
        q_ids = np.stack([tok_ids(t) for t in q_texts])
        log(f"tokenized in {time.time() - t0:.0f}s")

        # --- real BM25 sparse (production pipeline, slot-major top-S) ---
        t0 = time.time()
        svc = SparseEmbeddingService()
        termsR_np = np.full((S, NR), TERM_PAD, np.int32)
        weightsR_np = np.zeros((S, NR), np.float32)
        for i, sv in enumerate(svc.embed(texts)):
            if not sv.indices:
                continue
            o = np.argsort(-np.asarray(sv.values))[:S]
            termsR_np[: len(o), i] = np.asarray(sv.indices, np.int64)[o]
            weightsR_np[: len(o), i] = np.asarray(sv.values, np.float32)[o]
        log(f"real BM25 vectors in {time.time() - t0:.0f}s")
        q_sv = svc.embed_query(" ".join(q_texts[0].split()[:24]))
        qtR = np.full((1, QT), TERM_PAD, np.int32)
        qwR = np.zeros((1, QT), np.float32)
        qtR[0, : min(QT, len(q_sv.indices))] = q_sv.indices[:QT]
        qwR[0, : min(QT, len(q_sv.indices))] = q_sv.values[:QT]
        texts = q_texts = None

        try:
            cache_dir.mkdir(exist_ok=True)
            cp = cache_dir / f"real_corpus_{NR}x{LTOK}.v1.npz"
            np.savez(cp, ids=all_ids, q_ids=q_ids, terms=termsR_np,
                     weights=weightsR_np, qt=qtR, qw=qwR,
                     files=out["real_files"], text_mb=out["real_text_mb"])
            log(f"real-corpus inputs cached to {cp.name} "
                f"({cp.stat().st_size / 1e6:.0f} MB)")
        except Exception as e:
            log(f"could not cache real-corpus inputs: {e}")

    # Stash the tokenized corpus for the real-10M section (bench_real10m):
    # it re-encodes these SAME real chunks with 10 pooling views each at
    # the 10M x 768 north-star geometry — no second harvest/tokenize pass.
    global _REAL10M_STASH
    _REAL10M_STASH = {"ids": all_ids, "q_ids": q_ids}

    # --- encode on-chip (bf16), quantize to int8 on device ---
    eparams = init_params(jax.random.PRNGKey(7), ecfg)
    eparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), eparams)

    @jax.jit
    def enc_block(eparams, ids):
        mask = (ids != 0).astype(jnp.int32)
        v = encode_tokens(eparams, ecfg, ids, mask).astype(jnp.float32)
        v = v / jnp.clip(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-9)
        sc = jnp.clip(jnp.max(jnp.abs(v), axis=1), 1e-9) / 127.0
        v8 = jnp.clip(jnp.round(v / sc[:, None]), -127, 127).astype(jnp.int8)
        return v8, sc

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def put_block(vecsR, scR, v8, sc, lo):
        return (jax.lax.dynamic_update_slice(vecsR, v8, (lo, 0)),
                jax.lax.dynamic_update_slice(scR, sc, (lo,)))

    t0 = time.time()
    vecsR = jnp.zeros((NR, DR), jnp.int8)
    scR = jnp.zeros((NR,), jnp.float32)
    for lo in range(0, NR, BE):
        v8, sc = enc_block(eparams, jnp.asarray(all_ids[lo:lo + BE]))
        vecsR, scR = put_block(vecsR, scR, v8, sc, jnp.int32(lo))
    jax.block_until_ready(vecsR)
    enc_s = time.time() - t0
    out["real_encode_s"] = round(enc_s, 1)
    out["real_encode_chunks_per_s"] = round(NR / enc_s, 1)
    log(f"encoded {NR} chunks in {enc_s:.0f}s "
        f"({NR / enc_s:.0f} chunks/s, e5-base bf16 L={LTOK})")
    qv8, qsc = enc_block(eparams, jnp.asarray(q_ids))
    qR = qv8.astype(jnp.float32) * qsc[:, None]
    qR = qR / jnp.clip(jnp.linalg.norm(qR, axis=1, keepdims=True), 1e-9)
    all_ids = q_ids = eparams = None
    n_q = qR.shape[0]
    gc.collect()

    colsR = jnp.zeros((NUM_COLS, NR), jnp.int32).at[COL_VALID].set(1)
    scalesR = scR[None, :]
    passR = make_filter_spec()
    termsR = jnp.asarray(termsR_np)
    weightsR = jnp.asarray(weightsR_np)
    termsR_np = weightsR_np = None

    # --- oracle + flat hybrid QPS ---
    @functools.partial(jax.jit, static_argnames=("k",))
    def flat_topR(q, vecsR, scalesR, colsR, k=LIMIT):
        sc = dense_scan_scores(q, vecsR, colsR, passR, scalesR)
        return masked_topk(sc, k)

    ovalsR, oidsR = flat_topR(qR, vecsR, scalesR, colsR)
    ovalsR, oidsR = np.asarray(ovalsR), np.asarray(oidsR)
    # Deep oracle (top-64) for the duplicate-group recall the hnsw768
    # section computes for BOTH engines: 62% of these queries have >= 5
    # byte-identical duplicate rows inside the exact top-10, which caps
    # id- and score-recall for any retriever that returns each distinct
    # vector once. Nearly free here (same scan, wider select).
    ovals64, oids64 = flat_topR(qR, vecsR, scalesR, colsR, k=64)
    _REAL10M_STASH["oids64"] = np.asarray(oids64)
    _REAL10M_STASH["ovals64"] = np.asarray(ovals64)
    _REAL10M_STASH["real_rows"] = int(NR)
    ovals64 = oids64 = None

    qstackR = jnp.concatenate([qR] * ((N_ITERS * B) // n_q))[: N_ITERS * B]
    qstackR = qstackR.reshape(N_ITERS, B, DR)
    qtRj, qwRj = jnp.asarray(qtR), jnp.asarray(qwR)
    qpsR, dtR = queued_qps(device_hybrid, qstackR, qtRj, qwRj, vecsR, colsR,
                           termsR, weightsR, passR, scalesR)
    out["real_hybrid_qps_768d_int8"] = round(qpsR, 1)   # rows = real_chunks
    roofline(out, "real_hybrid_768_int8", dtR / N_ITERS * 1000,
             NR * DR + NR * 4 + 2 * NR * NUM_COLS * 4 + NR * S * 4
             + NR * S * 4)

    # --- IVF on the real embedding distribution ---
    log("real-corpus IVF build")
    t0 = time.perf_counter()
    ivfR = IVFIndex.build(vecsR, colsR.T, jnp.arange(NR, dtype=jnp.int32),
                          n_cells=CR, kmeans_iters=20, skew_factor=1.5,
                          dtype="int8", scales=scR, assign_k=2,
                          assign_margin=0.05)
    jax.block_until_ready(ivfR.vecs3)
    out["real_ivf_build_s"] = round(time.perf_counter() - t0, 1)
    n_restR = int(np.asarray(ivfR.rest_gid >= 0).sum())
    out["real_ivf_residual_frac"] = round(n_restR / NR, 4)
    out["real_ivf_cell_cap"] = ivfR.cell_cap
    log(f"real IVF: cap={ivfR.cell_cap}, residual {n_restR} "
        f"({100 * n_restR / NR:.1f}%)")
    for nprobe in (16, 32):
        def ivf_topR(q, nprobe=nprobe):
            return ivfR.search_candidates(q, passR, nprobe=nprobe,
                                          limit=LIMIT)

        vivf, giv = ivf_topR(qR)
        _REAL10M_STASH[f"real_ivf_ids_np{nprobe}"] = np.asarray(giv)
        rec = recall_at10(np.asarray(giv), oidsR)
        rec_t = recall_at10_scoreaware(np.asarray(vivf), ovalsR)
        qps_ivf, dt_ivf = queued_qps(ivf_topR, qstackR)
        out[f"real_ivf_qps_np{nprobe}"] = round(qps_ivf, 1)
        out[f"real_ivf_recall10_np{nprobe}"] = round(rec, 3)
        out[f"real_ivf_recall10_scoreaware_np{nprobe}"] = round(rec_t, 3)
        log(f"real IVF np={nprobe}: recall {rec:.3f} "
            f"(score-aware {rec_t:.3f}), {qps_ivf:.0f} qps")

    # --- BQ coarse tier on the REAL distribution (cold-tier sketch
    # quality, index/bq_serve.py): every bq_* recall elsewhere is synthetic;
    # real embeddings are anisotropic low-effective-rank cones — exactly
    # what collapses raw sign sketches (measured 0.48 recall) and what the
    # production WHITENED encoding (segment.offload) exists to fix.
    # Coarse top-K' -> exact rescore, recall vs the int8 oracle.
    try:
        from voitta_rag_tpu.ops.bitq import (bitq_scan_scores,
                                             encode_planes_device,
                                             whitening_transform)
        from voitta_rag_tpu.ops.rerank import rerank_exact

        BQ_BITS = 2  # production default (VOITTA_BQ_BITS)

        @jax.jit
        def _mu_covR(v8, sc):
            v = v8.astype(jnp.float32) * sc[:, None]
            mu = jnp.mean(v, axis=0)
            c = v - mu
            return mu, (c.T @ c) / v.shape[0]

        muR, covR = _mu_covR(vecsR, scR)
        wR, aR = whitening_transform(np.asarray(covR))
        wR_d, aR_d = jnp.asarray(wR), jnp.asarray(aR)

        @functools.partial(jax.jit, static_argnames=("bits",))
        def enc_bq(v8, sc, mu, w, bits=BQ_BITS):
            v = v8.astype(jnp.float32) * sc[:, None]
            return encode_planes_device((v - mu) @ w.T, bits=bits)

        packedR, bq_scalesR = enc_bq(vecsR, scR, muR, wR_d)
        jax.block_until_ready(packedR)
        for os_factor in (4, 16):
            kp = LIMIT * 3 * os_factor

            @functools.partial(jax.jit, static_argnames=("approx",))
            def bq_topR(q, packed, bscales, cols, vecs, scales, qmat,
                        kp=kp, approx=True):
                c = bitq_scan_scores(q @ qmat.T, packed, bscales, cols,
                                     passR, bits=BQ_BITS)
                _, cand = masked_topk(c, kp, approx=approx)
                return rerank_exact(q, cand, vecs, scales, limit=LIMIT)

            bvals, bgids = bq_topR(qR, packedR, bq_scalesR, colsR, vecsR,
                                   scalesR, aR_d)
            rec = recall_at10(np.asarray(bgids), oidsR)
            rec_t = recall_at10_scoreaware(np.asarray(bvals), ovalsR)
            # Production default: exact candidate selection
            # (VOITTA_BQ_SELECT; approx binning drops near-tied rows).
            _, bgids_e = bq_topR(qR, packedR, bq_scalesR, colsR, vecsR,
                                 scalesR, aR_d, approx=False)
            rec_e = recall_at10(np.asarray(bgids_e), oidsR)
            out[f"real_bq_recall10_os{os_factor}"] = round(rec, 3)
            out[f"real_bq_recall10_exactsel_os{os_factor}"] = round(rec_e, 3)
            out[f"real_bq_recall10_scoreaware_os{os_factor}"] = round(rec_t, 3)
            log(f"real BQ (whitened, {BQ_BITS}-bit) os={os_factor} "
                f"(K'={kp}): recall {rec:.3f} approx-sel / {rec_e:.3f} "
                f"exact-sel (score-aware {rec_t:.3f})")
    except Exception as e:
        out["real_bq_error"] = str(e)[:200]
        log(f"real BQ check failed: {e}")
    return out


def bench_10m(extra_main, rng):
    """10M x 768 int8 (BASELINE config 4 geometry): flat hybrid with
    inverted-postings sparse, then IVF (C=8192) recall/QPS.

    HBM staging on a 16 GB chip: postings build BEFORE the dense corpus
    exists (its sort transients need ~6 GB); the IVF cell-major copy (8 GB)
    is packed by REGENERATING the corpus block-by-block from the same PRNG
    keys after the flat corpus is freed — the two 8 GB copies never coexist.
    """
    import gc
    import math

    log("10M x 768 section")
    out = {}
    N10, D10, S10 = 10 * 1024 * 1024, 768, 16
    TC10, C10 = 8192, 8192
    n_blocks = 32   # smaller blocks: the f32 gen transient is bs x 768 x 4
    bs = N10 // n_blocks

    kc, _ = jax.random.split(jax.random.PRNGKey(77))
    centers10 = jax.random.normal(kc, (TC10, D10), jnp.float32)
    centers10 = centers10 / jnp.linalg.norm(centers10, axis=1, keepdims=True)
    alpha10 = math.sqrt(D10 * INTRA_COS ** 2 / (1 - INTRA_COS ** 2))

    @jax.jit
    def gen_block10(k, centers10):
        ka, kb = jax.random.split(k)
        cid = jax.random.randint(ka, (bs,), 0, TC10, jnp.int32)
        v = alpha10 * jnp.take(centers10, cid, axis=0) + jax.random.normal(
            kb, (bs, D10), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        sc = jnp.max(jnp.abs(v), axis=1) / 127.0
        v8b = jnp.clip(jnp.round(v / sc[:, None]), -127, 127).astype(jnp.int8)
        return v8b, sc.astype(jnp.float32)

    # --- sparse postings first (their sort transients want free HBM) ---
    k2 = jax.random.split(jax.random.PRNGKey(79), 3)
    folder10 = jax.random.randint(k2[0], (N10,), 0, N_FOLDERS, jnp.int32)
    cols10 = (jnp.zeros((NUM_COLS, N10), jnp.int32)
              .at[COL_VALID].set(1).at[COL_FOLDER].set(folder10))
    terms10 = jax.random.randint(k2[1], (S10, N10), 0, 1_000_000, jnp.int32)
    weights10 = jax.random.uniform(k2[2], (S10, N10), jnp.float32)
    t0 = time.perf_counter()
    post10 = SparsePostings.build(terms10, weights10,
                                  jnp.arange(N10, dtype=jnp.int32),
                                  weight_dtype=jnp.bfloat16)
    jax.block_until_ready(post10.terms)
    out["postings_build_10M_s"] = round(time.perf_counter() - t0, 1)
    terms10 = weights10 = None
    gc.collect()

    # --- dense corpus: preallocate + donated in-place block fill (a
    # concatenate of the blocks would briefly hold the corpus TWICE) ---
    block_keys = jax.random.split(jax.random.PRNGKey(78), n_blocks)
    t0 = time.time()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def set_block10(vecs10, sc_flat, v8b, scb, lo):
        return (jax.lax.dynamic_update_slice(vecs10, v8b, (lo, 0)),
                jax.lax.dynamic_update_slice(sc_flat, scb, (lo,)))

    vecs10 = jnp.zeros((N10, D10), jnp.int8)
    sc_flat = jnp.zeros((N10,), jnp.float32)
    for i, kk in enumerate(block_keys):
        v8b, scb = gen_block10(kk, centers10)
        vecs10, sc_flat = set_block10(vecs10, sc_flat, v8b, scb,
                                      jnp.int32(i * bs))
    scales10 = sc_flat[None, :]
    sc_flat = None
    jax.block_until_ready(vecs10)
    log(f"10M corpus ready ({time.time() - t0:.0f}s)")

    spec10 = make_filter_spec(include_folder_ids=INCLUDE)
    pass10 = make_filter_spec()
    # Queries from the same 10M mixture.
    ka, kb2 = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(102), 1))
    cidq = jax.random.randint(ka, (B * 8,), 0, TC10, jnp.int32)
    q10 = alpha10 * jnp.take(centers10, cidq, axis=0) + jax.random.normal(
        kb2, (B * 8, D10), jnp.float32)
    q10 = q10 / jnp.linalg.norm(q10, axis=1, keepdims=True)
    qstack10 = q10.reshape(8, B, D10)

    def mk_q10():
        t = np.full((1, QT), TERM_PAD, np.int32)
        t[0] = rng.choice(1_000_000, QT, replace=False)
        w = np.zeros((1, QT), np.float32)
        w[0] = rng.random(QT) + 0.2
        return jnp.asarray(t), jnp.asarray(w)

    qt10, qw10 = mk_q10()

    # The 10M serving hybrid: dense int8 scan + postings candidates + fusion
    # (at this scale the postings path IS the sparse engine; the O(S*N) slot
    # scan is the small-corpus/mutation fallback).
    @jax.jit
    def hybrid10(q, qt1, qw1, vecs10, scales10, cols10, pterms, pgids,
                 pweights):
        d = dense_scan_scores(q, vecs10, cols10, spec10, scales10)
        d_vals, d_pos = masked_topk(d, LIMIT * 3, approx=True)
        s_vals, s_gids = postings_candidates(
            qt1, qw1, pterms, pgids, pweights, cols10, spec10,
            limit=LIMIT * 3, max_postings=MAX_POST)
        s_vals = jnp.broadcast_to(s_vals, (q.shape[0], s_vals.shape[1]))
        s_gids = jnp.broadcast_to(s_gids, (q.shape[0], s_gids.shape[1]))
        return hybrid_fuse_candidates(d_vals, d_pos, s_vals, s_gids,
                                      SPARSE_W, limit=LIMIT)

    qps10, dt10 = queued_qps(hybrid10, qstack10, qt10, qw10, vecs10,
                             scales10, cols10, post10.terms, post10.gids,
                             post10.weights)
    out["hybrid_qps_10M_768d_int8"] = round(qps10, 1)
    out["hybrid_ms_per_batch_10M_768d"] = round(dt10 / 8 * 1000, 2)
    # Compulsory reads: int8 vectors + scales + cols (postings candidates
    # touch only ~max_postings * query-terms rows — noise at this scale).
    roofline(out, "hybrid_10M_768_int8", dt10 / 8 * 1000,
             N10 * D10 + N10 * 4 + N10 * NUM_COLS * 4)
    log(f"10M 768-d int8 hybrid (postings sparse): {qps10:.0f} qps, "
        f"{out['achieved_gbps_hybrid_10M_768_int8']} GB/s "
        f"({out['roofline_frac_hybrid_10M_768_int8']:.0%} of peak)")

    # Oracle over the stored corpus (exact top-k over int8 scores).
    n_oracle = 64

    @jax.jit
    def flat_top10(q, vecs10, scales10, cols10):
        sc = dense_scan_scores(q, vecs10, cols10, pass10, scales10)
        return masked_topk(sc, LIMIT)

    ovals10, oracle10 = flat_top10(q10[:n_oracle], vecs10, scales10, cols10)
    ovals10, oracle10 = np.asarray(ovals10), np.asarray(oracle10)
    # The postings (1.6 GB) are not needed past this point; the IVF
    # cell-major copy (10.5 GB at skew 1.3) needs the room.
    post10 = None
    gc.collect()

    # --- IVF: train on a sample, margin-gated double assignment, then
    # regenerate-and-scatter. The 2M probe study showed the recall floor is
    # nprobe-INVARIANT: the lost neighbors are boundary rows whose own cell
    # the query never probes. Replicating just those rows (secondary
    # centroid within MARGIN cosine of the primary) removed the floor at 1M
    # (0.98 → 1.00 recall at np=8). Replica count adapts to the HBM budget:
    # boundary rows with the smallest centroid gap replicate first. ---
    log("10M IVF: sampled k-means")
    MARGIN10 = 0.05
    SKEW10 = 1.35
    CAP_BUDGET = 1920  # 8192 cells x 1920 slots x 808 B/slot ~ 12.7 GB
    br = _block_rows_for(C10)
    ns = 262_144
    idx_s = jax.random.choice(jax.random.PRNGKey(80), N10, (ns,),
                              replace=False)
    train_v = jnp.take(vecs10, idx_s, axis=0)
    train_s = jnp.take(scales10[0], idx_s)
    centroids = _kmeans_train(train_v, train_s, C10, 20, max(1, ns // br), 0)
    train_v = train_s = None
    # k=3: column 1 feeds margin replicas, columns 1-2 feed margin-gated
    # spill fallbacks for rows whose primary cell overflows (keeps them out
    # of the residual that every query scans; gating keeps recall — see
    # index/ivf.py pack_permutation).
    assign3_d, sims3_d = _assign_topk_cells(
        vecs10, scales10[0], centroids, 3, max(1, -(-N10 // br)),
        with_sims=True)
    assign3 = np.array(assign3_d)
    sims3 = np.asarray(sims3_d)
    assign3_d = sims3_d = None
    gap = sims3[:, 0] - sims3[:, 1]
    budget_total = int(CAP_BUDGET * C10 / SKEW10)
    n_keep = max(0, budget_total - N10)
    gate = gap <= MARGIN10
    if int(gate.sum()) > n_keep:
        thr = np.partition(gap, n_keep)[n_keep]
        gate &= gap < thr
    assign2 = np.ascontiguousarray(assign3[:, :2])
    assign2[:, 1] = np.where(gate, assign2[:, 1], -1)
    n_replicas = int(gate.sum())
    spill10 = np.where(
        sims3[:, 1:3] >= sims3[:, :1] - MARGIN10, assign3[:, 1:3], -1)
    assign3 = None
    out["ivf10_boundary_replicas"] = n_replicas
    log(f"10M IVF: {n_replicas} boundary replicas "
        f"(margin {MARGIN10}); packing via regeneration")

    from voitta_rag_tpu.index.ivf import pack_permutation

    cell_cap = round_up(
        max(int(SKEW10 * (N10 + n_replicas) / C10), 128), 128)
    n_slots = C10 * cell_cap
    src_p, dest_p, prio_p, rest_rows = pack_permutation(
        assign2, C10, cell_cap, spill=spill10)
    spill10 = None
    dest_of_row = np.full(N10, n_slots, np.int64)  # OOB → dropped in scatter
    pmask = prio_p == 0
    dest_of_row[src_p[pmask]] = dest_p[pmask]
    dest2_of_row = np.full(N10, n_slots, np.int64)
    dest2_of_row[src_p[~pmask]] = dest_p[~pmask]
    out["ivf10_spilled"] = int(
        (dest_p[pmask] // cell_cap != assign2[src_p[pmask], 0]).sum())
    assign2 = sims3 = gap = None
    n_rest = len(rest_rows)
    rest_cap = round_up(max(n_rest, 1), 128)
    rest_pos_of_row = np.full(N10, rest_cap, np.int64)  # OOB → dropped
    rest_pos_of_row[rest_rows] = np.arange(n_rest)

    # Free the flat corpus; rebuild per block and scatter with donation so
    # the 8 GB buffers update in place.
    vecs10 = scales10 = None
    gc.collect()
    # Allocate the cell-major 3D layout DIRECTLY — an eager reshape of a
    # 10.5 GB flat buffer at the end would copy it (2x HBM -> OOM).
    vecs3 = jnp.zeros((C10, cell_cap, D10), jnp.int8)
    scales3 = jnp.zeros((C10, 1, cell_cap), jnp.float32)
    gid3 = jnp.full((C10, cell_cap), -1, jnp.int32)
    # int8 residual + per-slot scales: the residual (6% of rows) is scanned
    # EVERY query, so a bf16 copy would carry half the probe-path traffic.
    rest_vecs = jnp.zeros((rest_cap, D10), jnp.int8)
    rest_scales = jnp.zeros((1, rest_cap), jnp.float32)
    rest_gid = jnp.full((rest_cap,), -1, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
    def scatter_block(vecs3, scales3, gid3, rest_vecs, rest_scales, rest_gid,
                      v8b, scb, dests, dests2, rests, gids_b):
        # Flat slot -> (cell, pos); the OOB sentinel n_slots maps to cell
        # C10 which mode="drop" discards.
        for dst in (dests, dests2):
            cells = dst // cell_cap
            poss = dst % cell_cap
            vecs3 = vecs3.at[cells, poss].set(v8b, mode="drop")
            scales3 = scales3.at[cells, 0, poss].set(scb, mode="drop")
            gid3 = gid3.at[cells, poss].set(gids_b, mode="drop")
        rest_vecs = rest_vecs.at[rests].set(v8b, mode="drop")
        rest_scales = rest_scales.at[0, rests].set(scb, mode="drop")
        rest_gid = rest_gid.at[rests].set(gids_b, mode="drop")
        return vecs3, scales3, gid3, rest_vecs, rest_scales, rest_gid

    for i, kk in enumerate(block_keys):
        v8b, scb = gen_block10(kk, centers10)
        lo = i * bs
        vecs3, scales3, gid3, rest_vecs, rest_scales, rest_gid = (
            scatter_block(
                vecs3, scales3, gid3, rest_vecs, rest_scales, rest_gid,
                v8b, scb,
                jnp.asarray(dest_of_row[lo:lo + bs]),
                jnp.asarray(dest2_of_row[lo:lo + bs]),
                jnp.asarray(rest_pos_of_row[lo:lo + bs]),
                jnp.arange(lo, lo + bs, dtype=jnp.int32)))
    # Filter columns in cell-major order: gather from cols10 by gid.
    g_safe = jnp.maximum(gid3.reshape(-1), 0)
    cols3 = (jnp.take(cols10, g_safe, axis=1).T
             .reshape(C10, cell_cap, NUM_COLS).transpose(0, 2, 1))
    cols3 = cols3.at[:, COL_VALID, :].set(
        jnp.where(gid3 >= 0, cols3[:, COL_VALID, :], 0))
    rest_cols = jnp.take(cols10, jnp.maximum(rest_gid, 0), axis=1)
    rest_cols = rest_cols.at[COL_VALID].set(
        jnp.where(rest_gid >= 0, rest_cols[COL_VALID], 0))
    jax.block_until_ready(vecs3)
    out["ivf10_cells"] = C10
    out["ivf10_cell_cap"] = cell_cap
    out["ivf10_residual"] = n_rest
    log(f"10M IVF packed (cap={cell_cap}, residual={n_rest})")

    # Large nprobe at B=32 batch-dedups toward all 8192 cells — the probe
    # score transient grows past what the 12 GB of residents leave free
    # (np=128 OOM'd in fetch), and recall is residual-limited past np=32
    # anyway (0.966 -> 0.967 from 32 -> 64).
    # With boundary replicas recall measured 1.000 at np=16/32/64, so the
    # sweep starts at np=8 to walk the QPS frontier downward instead of
    # probing deeper for recall that is already saturated.
    for nprobe in (8, 16, 32):
        def ivf_top10(q, nprobe=nprobe):
            return _ivf_search_candidates(
                q, centroids, vecs3, cols3, gid3, rest_vecs, rest_cols,
                rest_gid, scales3, rest_scales, pass10, nprobe=nprobe,
                limit=LIMIT, assign_k=2)

        vivf, giv = ivf_top10(q10[:n_oracle])
        rec = recall_at10(np.asarray(giv), oracle10)
        rec_t = recall_at10_scoreaware(np.asarray(vivf), ovals10)
        qps_ivf, dt_ivf = queued_qps(ivf_top10, qstack10)
        out[f"ivf10_qps_np{nprobe}"] = round(qps_ivf, 1)
        out[f"ivf10_recall10_np{nprobe}"] = round(rec, 3)
        out[f"ivf10_recall10_scoreaware_np{nprobe}"] = round(rec_t, 3)
        u_cells = min(B * nprobe, C10)
        probe_rows = u_cells * cell_cap + rest_cap
        roofline(out, f"ivf10_np{nprobe}", dt_ivf / 8 * 1000,
                 probe_rows * (D10 + 4 + NUM_COLS * 4))
        log(f"10M IVF np={nprobe}: recall {rec:.3f} "
            f"(score-aware {rec_t:.3f}), {qps_ivf:.0f} qps")

    # Throughput operating point (VOITTA_IVF_SELECT=approx): approx_max_k
    # candidate selection — measured at 1M ~2x the selection speed for ~1%
    # real recall (index/ivf.py). Reported alongside, default stays exact.
    try:
        def ivf_top10_a(q):
            return _ivf_search_candidates(
                q, centroids, vecs3, cols3, gid3, rest_vecs, rest_cols,
                rest_gid, scales3, rest_scales, pass10, nprobe=8,
                limit=LIMIT, assign_k=2, select="approx")

        vivf, giv = ivf_top10_a(q10[:n_oracle])
        rec = recall_at10(np.asarray(giv), oracle10)
        rec_t = recall_at10_scoreaware(np.asarray(vivf), ovals10)
        qps_ivf, _ = queued_qps(ivf_top10_a, qstack10)
        out["ivf10_qps_np8_approx"] = round(qps_ivf, 1)
        out["ivf10_recall10_np8_approx"] = round(rec, 3)
        out["ivf10_recall10_scoreaware_np8_approx"] = round(rec_t, 3)
        log(f"10M IVF np=8 approx-select: recall {rec:.3f} "
            f"(score-aware {rec_t:.3f}), {qps_ivf:.0f} qps")
    except Exception as e:
        out["ivf10_approx_error"] = str(e)[:200]
    return out


def bench_real10m(time_left, rng, *, c10=16384, be=1024, views=25,
                  probe_cap=2048, d10=768, keep_frac=0.55):
    """REAL text at the north-star geometry: 10M x 768 int8 + IVF.

    Round-3's 10M evidence was synthetic-only (recall saturated at 1.0);
    the hard real-text evidence stopped at 1M. This section re-encodes the
    harvested chunks (token ids stashed by bench_real_corpus; 403,456
    after exact-duplicate removal) with 25 pooling views each — the full
    attention-mask mean plus 24 random-token-subset means, a
    paraphrase-style augmentation computed in the SAME encoder pass —
    yielding a 10.09M-row corpus with real-text geometry (anisotropy,
    Zipfian cluster sizes, near-duplicate groups).

    Index layout: variable-length inverted lists (index/ivf_flat.py) —
    the padded cell layout measured 40% row overflow on this corpus's
    Zipfian cell masses. Build is two streaming encoder passes (encode is
    ~4s/M rows on-chip; the host never holds the corpus): pass A assigns
    every view to its top-2 cells and folds the exact oracle (running
    top-10 per held-out query), one host lexsort plans the flat positions
    (probe-window shell rows and margin-boundary rows get runner-up-cell
    replicas), pass B re-encodes and scatters straight into the flat
    cell-major arrays. Mirrors BASELINE config 4 built the way a 100M
    config must be.
    """
    import gc

    from voitta_rag_tpu.index.ivf import (
        _ivf_search_candidates, _kmeans_train,
    )
    from voitta_rag_tpu.models.encoder import (
        PRESETS, encoder_forward, init_params,
    )

    global _REAL10M_STASH
    out = {}
    if not _REAL10M_STASH:
        out["real10m_error"] = "no stashed corpus (real section skipped?)"
        return out
    ids_np = _REAL10M_STASH["ids"]
    q_ids = _REAL10M_STASH["q_ids"]
    # Deduplicate exact-duplicate chunks (17.7% of the harvest, groups up
    # to ~2000 copies): the production store content-addresses chunks, and
    # duplicate blobs x views otherwise produce degenerate 30k-row cells
    # no clustering can split (identical vectors share one nearest
    # centroid). Views are raised to keep the corpus >= 10M rows.
    v_struct = np.ascontiguousarray(ids_np).view(
        [("", ids_np.dtype)] * ids_np.shape[1])
    _, uniq_idx = np.unique(v_struct, return_index=True)
    ids_np = ids_np[np.sort(uniq_idx)]
    v_struct = None
    NR = len(ids_np)
    VIEWS = views
    D10 = d10
    C10 = c10
    BE = be                        # chunks per block -> BE * views rows
    NR -= NR % BE
    N10 = NR * VIEWS
    out["real10m_rows"] = N10
    log(f"real-10M section: {NR} chunks x {VIEWS} views = {N10} rows "
        f"({time_left():.0f}s left)")

    ecfg = PRESETS["intfloat/e5-base-v2"]
    eparams = init_params(jax.random.PRNGKey(7), ecfg)
    eparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), eparams)

    @functools.partial(jax.jit, static_argnames=("views",))
    def encode_views(eparams, ids, key, views=VIEWS):
        """[B, L] ids -> ([B*views, D] int8 views, [B*views] f32 scales).

        View 0 is the production full-mask mean pool; the other views pool
        over random ~keep_frac token subsets (at least one token kept) —
        distinct embeddings of the same text, the multi-seed encoding the
        corpus tiling needs (keep_frac 0.55: strong enough that a chunk's
        views spread within a cell instead of forming an exact-tie blob).
        Rows are view-major per chunk: gid // VIEWS recovers the chunk.
        """
        mask = (ids != 0).astype(jnp.int32)
        h = encoder_forward(eparams, ecfg, ids, mask).astype(jnp.float32)
        b, l, d = h.shape
        keep = jax.random.bernoulli(key, keep_frac, (views - 1, b, l))
        m = jnp.concatenate(
            [jnp.ones((1, b, l), bool), keep]) & (mask[None] > 0)
        # Guard all-dropped rows: fall back to the full mask.
        m = jnp.where(m.sum(-1, keepdims=True) > 0, m, mask[None] > 0)
        mf = m.astype(jnp.float32)
        v = jnp.einsum("vbl,bld->vbd", mf, h) / mf.sum(-1)[..., None]
        v = v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        v = v.transpose(1, 0, 2).reshape(b * views, d)  # view-major rows
        sc = jnp.clip(jnp.max(jnp.abs(v), axis=1), 1e-9) / 127.0
        v8 = jnp.clip(jnp.round(v / sc[:, None]), -127, 127).astype(jnp.int8)
        return v8, sc

    @jax.jit
    def dequant(v8, sc):
        return v8.astype(jnp.float32) * sc[:, None]

    # Assignment/oracle cache: pass A (encode + assign + streaming oracle,
    # ~275 s) is deterministic for a given corpus and config — the centroid
    # sample uses a LOCAL rng and every encode key is fixed — so its outputs
    # are cached on disk and a warm bench run goes straight to pass B.
    from pathlib import Path as _Path

    # Deep enough that the first 10 DISTINCT chunks exist inside the exact
    # oracle even when consecutive rows are all views of one chunk
    # (25 views/chunk -> worst case 10 x 25 = 250 rows).
    ORACLE_K = 256
    cache_dir = _Path(__file__).resolve().parent / "bench_cache"
    acache = (cache_dir / f"real10m_assign_{NR}c_{VIEWS}v_{C10}_"
                          f"be{BE}_k{ORACLE_K}.v1.npz")
    a2 = None
    if acache.exists():
        try:
            t0 = time.time()
            za = np.load(acache)
            centroids = jnp.asarray(za["centroids"])
            a2, s2 = za["a2"], za["s2"]
            ovals_full, oids_full = za["ovals_full"], za["oids_full"]
            out["real10m_assign_cache"] = acache.name
            log(f"real-10M pass A loaded from {acache.name} "
                f"({time.time() - t0:.0f}s)")
        except Exception as e:
            a2 = None
            log(f"real-10M assign cache unreadable ({e}); recomputing")

    # --- centroids from a 32k-chunk (320k-view) sample ---
    if a2 is None:
        t0 = time.time()
        rng10 = np.random.default_rng(20260819)  # local: cache determinism
        pick = rng10.choice(NR, min(NR, 32768 // BE * BE), replace=False)
        parts = []
        for lo in range(0, len(pick), BE):
            v8s, scs = encode_views(
                eparams, jnp.asarray(ids_np[pick[lo:lo + BE]]),
                jax.random.fold_in(jax.random.PRNGKey(55), lo))
            parts.append(dequant(v8s, scs))
        sample = jnp.concatenate(parts)
        parts = None
        from voitta_rag_tpu.index.ivf import _block_rows_for

        br = _block_rows_for(C10)
        centroids = _kmeans_train(sample, None, C10, 20,
                                  max(1, sample.shape[0] // br), 0)
        jax.block_until_ready(centroids)
        sample = None
        gc.collect()
        out["real10m_kmeans_s"] = round(time.time() - t0, 1)
        log(f"real-10M centroids trained ({out['real10m_kmeans_s']}s)")

    # --- pass A: encode -> top-2 assignment + streaming exact oracle ---
    # The padded cell layout measured 40% row overflow on this corpus
    # (Zipfian cell masses; see index/ivf_flat.py docstring) — the flat
    # variable-length-list layout holds every cell size in exactly M rows.
    from voitta_rag_tpu.index.ivf_flat import IVFFlatIndex, plan_layout

    MARGIN = 0.05
    PROBE_CAP = probe_cap
    REPLICA_BUDGET = 2_500_000

    @functools.partial(jax.jit, static_argnames=("k",))
    def assign_block(v8, sc, centroids, k=2):
        sims = dequant(v8, sc) @ centroids.T
        top, idx = jax.lax.top_k(sims, k)
        return idx.astype(jnp.int32), top

    n_oracle = 64

    @jax.jit
    def oracle_block(q, v8, sc, run_v, run_i, base):
        s = q @ dequant(v8, sc).T                       # [nq, rows]
        ids = base + jnp.arange(s.shape[1], dtype=jnp.int32)
        v = jnp.concatenate([run_v, s], axis=1)
        i = jnp.concatenate([run_i, jnp.broadcast_to(ids, s.shape)], axis=1)
        vals, pos = jax.lax.top_k(v, ORACLE_K)
        return vals, jnp.take_along_axis(i, pos, axis=1)

    qv8, qsc = encode_views(eparams, jnp.asarray(q_ids),
                            jax.random.PRNGKey(57))
    q10 = dequant(qv8, qsc)[::VIEWS][:n_oracle]  # production full pool
    if a2 is None:
        run_v = jnp.full((n_oracle, ORACLE_K), NEG_INF, jnp.float32)
        run_i = jnp.full((n_oracle, ORACLE_K), -1, jnp.int32)
        a2 = np.empty((N10, 2), np.int32)
        s2 = np.empty((N10, 2), np.float32)
        t0 = time.time()
        for bi, lo in enumerate(range(0, NR, BE)):
            v8b, scb = encode_views(
                eparams, jnp.asarray(ids_np[lo:lo + BE]),
                jax.random.fold_in(jax.random.PRNGKey(56), bi))
            a, s = assign_block(v8b, scb, centroids)
            run_v, run_i = oracle_block(q10, v8b, scb, run_v, run_i,
                                        jnp.int32(lo * VIEWS))
            r0 = lo * VIEWS
            a2[r0:r0 + BE * VIEWS] = np.asarray(a)
            s2[r0:r0 + BE * VIEWS] = np.asarray(s)
            if bi % 256 == 0:
                log(f"  real-10M assign {lo}/{NR} chunks "
                    f"({time.time() - t0:.0f}s)")
        ovals_full = np.asarray(run_v)
        oids_full = np.asarray(run_i)
        out["real10m_assign_s"] = round(time.time() - t0, 1)
        try:
            cache_dir.mkdir(exist_ok=True)
            np.savez(acache, centroids=np.asarray(centroids), a2=a2, s2=s2,
                     ovals_full=ovals_full, oids_full=oids_full)
            log(f"real-10M pass A cached to {acache.name} "
                f"({acache.stat().st_size / 1e6:.0f} MB)")
        except Exception as e:
            log(f"could not cache pass A: {e}")
    ovals10 = ovals_full[:, :LIMIT]
    oracle10 = oids_full[:, :LIMIT]
    # Tie ceiling of the ID metric: views of near-duplicate chunks score
    # within eps of the oracle's 10th place, so WHICH of them an exact
    # retriever returns is arbitrary. The strict fraction is the share of
    # oracle rows any retriever is guaranteed to match by id; the
    # score-aware recall (ANN-benchmarks definition) is the metric that
    # ignores that arbitrariness.
    strict = float(np.mean(ovals_full[:, :LIMIT]
                           > ovals_full[:, LIMIT][:, None] + 1e-3))
    out["real10m_oracle_strict_frac"] = round(strict, 3)

    # --- plan the variable-length lists (host lexsort) ---
    t0 = time.time()
    primary_pos, replica_pos, starts, m, cell_map = plan_layout(
        a2, s2, n_cells=C10, probe_cap=PROBE_CAP, margin=MARGIN,
        replica_budget=REPLICA_BUDGET)
    a2 = s2 = None
    gc.collect()
    # PROBE_CAP extra pad rows: the Pallas probe DMAs full windows from
    # any virtual start (see IVFFlatIndex.build).
    m_pad = round_up(m, 128) + PROBE_CAP
    out["real10m_plan_s"] = round(time.time() - t0, 1)
    out["real10m_replicas"] = int(m - N10)   # margin replicas + tile pad
    out["real10m_virtual_cells"] = int(len(cell_map))
    out["real10m_split_cells"] = int(len(cell_map) - C10)
    log(f"real-10M lists planned in {out['real10m_plan_s']}s: {m} rows "
        f"({out['real10m_replicas']} replicas+pad), "
        f"{len(cell_map)} virtual cells "
        f"({out['real10m_split_cells']} hot-cell windows)")

    # --- pass B: re-encode (same keys -> identical vectors) + scatter ---
    vecs_f = jnp.zeros((m_pad, D10), jnp.int8)
    scales_f = jnp.zeros((m_pad,), jnp.float32)
    gids_f = jnp.full((m_pad,), -1, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def scatter_flat(vecs_f, scales_f, gids_f, v8b, scb, p1, p2, gids_b):
        for pos in (p1, p2):
            vecs_f = vecs_f.at[pos].set(v8b, mode="drop")
            scales_f = scales_f.at[pos].set(scb, mode="drop")
            gids_f = gids_f.at[pos].set(gids_b, mode="drop")
        return vecs_f, scales_f, gids_f

    t0 = time.time()
    for bi, lo in enumerate(range(0, NR, BE)):
        v8b, scb = encode_views(
            eparams, jnp.asarray(ids_np[lo:lo + BE]),
            jax.random.fold_in(jax.random.PRNGKey(56), bi))
        r0 = lo * VIEWS
        p1 = primary_pos[r0:r0 + BE * VIEWS]
        p2 = replica_pos[r0:r0 + BE * VIEWS]
        vecs_f, scales_f, gids_f = scatter_flat(
            vecs_f, scales_f, gids_f, v8b, scb,
            jnp.asarray(np.where(p1 >= 0, p1, m_pad)),
            jnp.asarray(np.where(p2 >= 0, p2, m_pad)),
            jnp.arange(r0, r0 + BE * VIEWS, dtype=jnp.int32))
        if bi % 256 == 0:
            log(f"  real-10M scatter {lo}/{NR} chunks "
                f"({time.time() - t0:.0f}s)")
    jax.block_until_ready(vecs_f)
    out["real10m_build_s"] = round(time.time() - t0, 1)
    log(f"real-10M flat lists built in {out['real10m_build_s']}s")
    eparams = None  # primary/replica positions are kept for the miss audit
    gc.collect()

    cols_f = jnp.zeros((NUM_COLS, m_pad), jnp.int32)
    cols_f = cols_f.at[COL_VALID].set((gids_f >= 0).astype(jnp.int32))
    centroids_v = jnp.take(centroids, jnp.asarray(cell_map), axis=0)
    ivf = IVFFlatIndex(centroids=centroids_v, vecs=vecs_f, cols=cols_f,
                       gids=gids_f, scales=scales_f[None],
                       starts=jnp.asarray(starts))
    pass10 = make_filter_spec()

    qstack10 = jnp.concatenate([q10] * ((8 * B) // n_oracle))[: 8 * B]
    qstack10 = qstack10.reshape(8, B, D10)
    for nprobe in (4, 8, 16):
        def ivf_top(q, nprobe=nprobe):
            return ivf.search_candidates(q, pass10, nprobe=nprobe,
                                         limit=LIMIT, probe_cap=PROBE_CAP)

        vivf, giv = ivf_top(q10)
        rec = recall_at10(np.asarray(giv), oracle10)
        rec_t = recall_at10_scoreaware(np.asarray(vivf), ovals10)
        qps_ivf, _ = queued_qps(ivf_top, qstack10)
        out[f"real10m_ivf_qps_np{nprobe}"] = round(qps_ivf, 1)
        out[f"real10m_ivf_recall10_np{nprobe}"] = round(rec, 3)
        out[f"real10m_ivf_recall10_scoreaware_np{nprobe}"] = round(rec_t, 3)
        log(f"real-10M IVF-flat np={nprobe}: recall {rec:.3f} "
            f"(score-aware {rec_t:.3f}), {qps_ivf:.0f} qps")

    # ---- recall-plateau decomposition (VERDICT r4 task 2): why does the
    # id metric sit at ~0.88 regardless of nprobe? Audit every missed
    # oracle row at np=8 into: score TIE with the retrieved 10th (a metric
    # artifact — an exact retriever may legitimately return a different
    # same-score view), probe miss (none of the row's cells probed),
    # window truncation (a probed HOT cell's later window not reached
    # within nprobe), or in-window miss (probed and reachable — a genuine
    # engine defect if nonzero). Also report a dedup-aware CHUNK-level
    # recall: alternate pooling views of one chunk count as one target
    # (the production store returns chunks, not view rows).
    NP_D = 8
    # limit=256 rows: the CHUNK metric needs depth — the top-10 ROWS are
    # mostly duplicate views of 1-3 chunks (25 views/chunk, near-identical
    # embeddings), so deduping only them caps chunk recall at ~0.1 by
    # construction. 10 distinct chunks need up to 10x25 rows; the first 10
    # rows of the deeper list are identical to a limit=10 call, so the tie
    # audit below still reads the true serving top-10.
    LIM_D = 256
    vals_d, gids_d = ivf.search_candidates(q10, pass10, nprobe=NP_D,
                                           limit=LIM_D, probe_cap=PROBE_CAP)
    vals_d, gids_d = np.asarray(vals_d), np.asarray(gids_d)
    probed = np.asarray(
        jax.lax.top_k(q10 @ centroids_v.T, NP_D)[1])       # [nq, NP_D]
    cm = np.asarray(cell_map)
    starts_np = np.asarray(starts)

    def vcell_of(pos: int) -> int:
        return int(np.searchsorted(starts_np, pos, side="right") - 1)

    ties = probe_miss = trunc = inwin = 0
    chunk_hit = chunk_tot = 0
    for qi in range(n_oracle):
        deep = gids_d[qi][gids_d[qi] >= 0]
        got = deep[:LIMIT]
        got_set = set(got.tolist())
        # First 10 DISTINCT chunks of the deep retrieved list (score
        # order), mirroring want_chunks' construction from the oracle.
        got_chunks: list[int] = []
        for g in deep:
            c = int(g) // VIEWS
            if c not in got_chunks:
                got_chunks.append(c)
            if len(got_chunks) == LIMIT:
                break
        tenth = vals_d[qi][LIMIT - 1]
        # Dedup ground truth: first 10 DISTINCT chunks in the deep oracle.
        want_chunks: list[int] = []
        for g in oids_full[qi]:
            c = int(g) // VIEWS
            if c not in want_chunks:
                want_chunks.append(c)
            if len(want_chunks) == LIMIT:
                break
        chunk_hit += len(set(want_chunks) & set(got_chunks))
        chunk_tot += len(want_chunks)
        for v, g in zip(ovals10[qi], oracle10[qi]):
            if int(g) in got_set:
                continue
            if v <= tenth + 1e-3:
                ties += 1
                continue
            vcs = [vcell_of(int(pos[g]))
                   for pos in (primary_pos, replica_pos) if pos[g] >= 0]
            pq = set(probed[qi].tolist())
            if any(vc in pq for vc in vcs):
                inwin += 1
            elif any(int(cm[vc]) in {int(cm[p]) for p in pq} for vc in vcs):
                trunc += 1
            else:
                probe_miss += 1
    out["real10m_recall10_chunk_np8"] = round(chunk_hit / max(chunk_tot, 1),
                                              3)
    out["real10m_miss_tie"] = ties
    out["real10m_miss_probe"] = probe_miss
    out["real10m_miss_window_trunc"] = trunc
    out["real10m_miss_in_window"] = inwin
    log(f"real-10M miss audit (np=8, {n_oracle * LIMIT} oracle rows): "
        f"{ties} ties / {probe_miss} probe misses / {trunc} window "
        f"truncations / {inwin} in-window; dedup CHUNK recall@10 "
        f"{out['real10m_recall10_chunk_np8']}")
    return out


def bench_mutation_latency(time_left, n_rows=65536, dim=768, n_queries=300):
    """Tail latency under concurrent mutation (VERDICT r3 task 7).

    The serving property Qdrant is trusted for: queries keep their tail
    while a writer upserts/deletes and a compaction rewrites segments.
    store.search holds the store lock only for ref-capture + dispatch
    (index/store.py:710-741 — mutation batches hold it "for milliseconds");
    this MEASURES that claim instead of asserting it: p50/p95/p99 of b=1
    hybrid queries through the production TpuVectorStore, idle vs with a
    writer thread doing 512-row upserts, file deletes, and one mid-window
    compaction.
    """
    import shutil
    import tempfile
    import threading
    from datetime import datetime, timezone

    from voitta_rag_tpu.core_types import ChunkMetadata, SparseVector
    from voitta_rag_tpu.index.store import TpuVectorStore

    out = {}
    NROWS, DIM_M = n_rows, dim
    rng = np.random.default_rng(11)
    tmp = tempfile.mkdtemp(prefix="voitta_mutbench_")
    store = TpuVectorStore(index_dir=tmp, collection="mutbench",
                           dimension=DIM_M)
    now = datetime.now(timezone.utc).isoformat()

    def meta_for(fp: str, i: int, total: int) -> ChunkMetadata:
        return ChunkMetadata(
            file_path=fp, folder_path="bench", index_folder="bench",
            file_name=fp.rsplit("/", 1)[-1], chunk_index=i,
            total_chunks=total, start_char=0, end_char=10, indexed_at=now)

    def batch(fp: str, n: int):
        emb = rng.standard_normal((n, DIM_M)).astype(np.float32)
        svs = [SparseVector(
            indices=rng.integers(0, 30000, 8).tolist(),
            values=rng.random(8).astype(np.float32).tolist())
            for _ in range(n)]
        return ([f"chunk {fp} {i}" for i in range(n)], emb,
                [meta_for(fp, i, n) for i in range(n)], svs)

    log(f"mutation-latency: ingesting {NROWS} x {DIM_M} "
        f"({time_left():.0f}s left)")
    t0 = time.time()
    BI = 4096
    for lo in range(0, NROWS, BI):
        texts, emb, metas, svs = batch(f"bench/base_{lo}.md", BI)
        store.store_chunks(texts, emb, metas, svs)
    out["mut_ingest_s"] = round(time.time() - t0, 1)

    q = rng.standard_normal((DIM_M,)).astype(np.float32)
    sq = ([int(x) for x in rng.integers(0, 30000, 8)],
          [float(x) for x in rng.random(8)])

    def run_queries(n: int) -> np.ndarray:
        lat = np.empty(n)
        for i in range(n):
            t = time.perf_counter()
            store.search(q, limit=10, sparse_query=sq, sparse_weight=0.1)
            lat[i] = (time.perf_counter() - t) * 1000
        return lat

    # Warm the writer's program shapes (512-row upsert bucket + tombstone
    # ladder) BEFORE the measured window: first-use XLA compiles are a
    # one-time startup cost (and run outside the store lock since the
    # warmup fix), not steady-state serving behavior — leaving them in
    # the window would stall the WRITER, not queries, and understate the
    # mutation pressure the tail is measured under.
    texts, emb, metas, svs = batch("bench/warm.md", 512)
    store.store_chunks(texts, emb, metas, svs)
    store.delete_by_file("bench/warm.md")
    run_queries(8)  # warm query compiles
    NQ = n_queries
    idle = run_queries(NQ)
    out["p50_idle_ms"] = round(float(np.percentile(idle, 50)), 2)
    out["p95_idle_ms"] = round(float(np.percentile(idle, 95)), 2)
    out["p99_idle_ms"] = round(float(np.percentile(idle, 99)), 2)

    stop = threading.Event()
    stats = {"writes": 0, "deletes": 0, "compactions": 0, "errors": 0}

    def writer():
        wi = 0
        while not stop.is_set():
            try:
                texts, emb, metas, svs = batch(f"bench/w_{wi}.md", 512)
                store.store_chunks(texts, emb, metas, svs)
                stats["writes"] += 1
                # Delete an earlier base file every other round: builds the
                # waste fraction a compaction needs, and exercises the
                # tombstone path under load.
                if wi % 2 == 1:
                    stats["deletes"] += store.delete_by_file(
                        f"bench/base_{(wi // 2) * BI}.md")
                if wi == 12:  # mid-window: a real compaction under queries
                    info = store.compact(min_waste_fraction=0.01)
                    stats["compactions"] += 1
                    stats["compact_info"] = {
                        k: info[k] for k in ("reclaimed", "segments")
                        if k in info}
                wi += 1
            except Exception as e:  # pragma: no cover - diagnostics only
                stats["errors"] += 1
                stats["last_error"] = str(e)[:120]
                stop.set()

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    mut = run_queries(NQ)
    stop.set()
    th.join(timeout=60)
    out["p50_under_mutation_ms"] = round(float(np.percentile(mut, 50)), 2)
    out["p95_under_mutation_ms"] = round(float(np.percentile(mut, 95)), 2)
    out["p99_under_mutation_ms"] = round(float(np.percentile(mut, 99)), 2)
    out["mut_writer_batches"] = stats["writes"]
    out["mut_deleted_rows"] = stats["deletes"]
    out["mut_compactions"] = stats["compactions"]
    if stats["errors"]:
        out["mut_writer_error"] = stats.get("last_error", "?")
    out["mut_tail_ratio"] = round(
        out["p99_under_mutation_ms"] / max(out["p99_idle_ms"], 1e-9), 2)
    log(f"latency idle p50/p99 {out['p50_idle_ms']}/{out['p99_idle_ms']} ms;"
        f" under mutation {out['p50_under_mutation_ms']}/"
        f"{out['p99_under_mutation_ms']} ms (ratio "
        f"{out['mut_tail_ratio']}x; {stats['writes']} write batches, "
        f"{stats['compactions']} compaction)")
    store.close()
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def bench_trained_retrieval(time_left):
    """Learned retrieval, end-to-end and offline (VERDICT r3 task 3).

    Fine-tunes a MiniLM-geometry encoder from random init on self-supervised
    (query, passage) pairs mined from the harvested real-text corpus
    (models/retrieval_proof.py: title + neighbor-chunk words -> chunk), then
    measures held-out recall@10 of four production serving paths over the
    same int8 index: BM25-only, random-init dense, trained dense, trained
    hybrid. The split is by document; a hit credits exact-duplicate chunks.

    This is a capability the reference cannot demonstrate (it serves frozen
    external e5 weights, services/embedding.py:24-42); here the training
    stack is models/training.py's dp x tp InfoNCE step on the same chip.
    """
    import gc

    from voitta_rag_tpu.models.encoder import PRESETS, init_params
    from voitta_rag_tpu.models.retrieval_proof import (
        build_task, crc_tokenize, encode_corpus, harvest_docs,
        load_checkpoint, recall_at10 as proof_recall, train_encoder_online,
    )
    from voitta_rag_tpu.search.sparse_text import SparseEmbeddingService

    out = {}
    t_sec = time.time()
    cfg = PRESETS["sentence-transformers/all-MiniLM-L6-v2"]

    # Offline checkpoint (scripts/train_retrieval_ckpt.py): training moved
    # OFF the bench critical path (VERDICT r4 task 4) — the long hardneg
    # schedule runs offline, checkpoint-selected on the VALIDATION half;
    # here we only re-derive the deterministic task and evaluate on the
    # untouched TEST half.
    params, LT, target = None, 72, None
    ckpt = _trained_ckpt_path()
    if ckpt.exists():
        try:
            params, meta = load_checkpoint(ckpt, cfg)
            LT = int(meta.get("max_len", 96))
            target = int(meta.get("harvest_target", 65536))
            out["trained_ckpt"] = ckpt.name
            for k in ("steps", "batch", "val_recall10", "trainer"):
                if k in meta:
                    out[f"trained_ckpt_{k}"] = meta[k]
            log(f"trained-retrieval: offline checkpoint {ckpt.name} "
                f"(trainer={meta.get('trainer')}, steps={meta.get('steps')},"
                f" val recall {meta.get('val_recall10')})")
        except Exception as e:
            params = None
            out["trained_ckpt_error"] = str(e)[:200]
            log(f"checkpoint load failed ({e}); falling back to in-bench "
                "training")
    if target is None:
        target = 65536 if time_left() > 1100 else 32768
    log(f"trained-retrieval: harvesting ~{target} chunks "
        f"({time_left():.0f}s left)")
    t0 = time.time()
    docs = harvest_docs(target)
    task = build_task(docs, max_eval=512, max_train_pairs=250_000)
    n_corp = len(task.corpus)
    out["trained_corpus_chunks"] = n_corp
    out["trained_eval_queries"] = len(task.eval_queries)
    out["trained_pairs"] = len(task.train_pairs)
    log(f"task: {n_corp} chunks / {len(task.train_pairs)} pairs / "
        f"{len(task.eval_queries)} held-out queries "
        f"({time.time() - t0:.0f}s)")

    if params is None:
        steps = 3500 if time_left() > 900 else (
            2000 if time_left() > 700 else 800)
        t0 = time.time()
        params, losses = train_encoder_online(
            docs, task.train_refs, cfg, steps=steps, batch=256, max_len=LT,
            lr=3e-4, log=log, time_left=time_left)
        out["trained_steps"] = steps
        out["trained_train_s"] = round(time.time() - t0, 1)
        out["trained_loss_first"] = round(losses[0], 3)
        out["trained_loss_last"] = round(losses[-1], 3)
        log(f"trained {steps} steps in {out['trained_train_s']}s "
            f"(loss {losses[0]:.3f} -> {losses[-1]:.3f})")

    # --- encode + index (production int8 serving arrays; rows padded to
    # the scan kernels' 128-lane alignment, pad rows filter-masked) ---
    t0 = time.time()
    ids = crc_tokenize(task.corpus, cfg.vocab_size, LT)
    q_ids = crc_tokenize(task.eval_queries, cfg.vocab_size, LT)
    log(f"tokenized in {time.time() - t0:.0f}s")
    n_pad = round_up(n_corp, 128)

    def int8_index(p):
        emb = encode_corpus(p, cfg, ids)
        sc = jnp.clip(jnp.max(jnp.abs(emb), axis=1), 1e-9) / 127.0
        v8 = jnp.clip(jnp.round(emb / sc[:, None]), -127,
                      127).astype(jnp.int8)
        v8 = jnp.concatenate(
            [v8, jnp.zeros((n_pad - n_corp, v8.shape[1]), jnp.int8)])
        sc = jnp.concatenate([sc, jnp.ones((n_pad - n_corp,), jnp.float32)])
        return v8, sc[None, :]

    t0 = time.time()
    v8_t, sc_t = int8_index(params)
    q_t = encode_corpus(params, cfg, q_ids)
    jax.block_until_ready(q_t)
    log(f"trained encode+index in {time.time() - t0:.0f}s")
    t0 = time.time()
    p0 = init_params(jax.random.PRNGKey(0), cfg)
    v8_r, sc_r = int8_index(p0)
    q_r = encode_corpus(p0, cfg, q_ids)
    jax.block_until_ready(q_r)
    log(f"randinit encode+index in {time.time() - t0:.0f}s")
    p0 = None
    gc.collect()

    # --- production BM25 over the corpus + per-query sparse vectors ---
    t0 = time.time()
    svc = SparseEmbeddingService()
    terms_np = np.full((S, n_pad), TERM_PAD, np.int32)
    weights_np = np.zeros((S, n_pad), np.float32)
    for i, sv in enumerate(svc.embed(task.corpus)):
        if not sv.indices:
            continue
        o = np.argsort(-np.asarray(sv.values))[:S]
        terms_np[: len(o), i] = np.asarray(sv.indices, np.int64)[o]
        weights_np[: len(o), i] = np.asarray(sv.values, np.float32)[o]
    nq = len(task.eval_queries)
    qt_np = np.full((nq, QT), TERM_PAD, np.int32)
    qw_np = np.zeros((nq, QT), np.float32)
    for i, qtext in enumerate(task.eval_queries):
        sv = svc.embed_query(qtext)
        k = min(QT, len(sv.indices))
        if k:
            o = np.argsort(-np.asarray(sv.values))[:k]
            qt_np[i, :k] = np.asarray(sv.indices, np.int64)[o]
            qw_np[i, :k] = np.asarray(sv.values, np.float32)[o]
    log(f"BM25 vectors in {time.time() - t0:.0f}s")

    cols_c = jnp.zeros((NUM_COLS, n_pad), jnp.int32).at[
        COL_VALID, :n_corp].set(1)
    spec_c = make_filter_spec()
    terms_c, weights_c = jnp.asarray(terms_np), jnp.asarray(weights_np)
    terms_np = weights_np = None

    W_SWEEP = (0.1, 0.3, 0.5, 0.6, 0.7, 0.8, 0.9)

    @jax.jit
    def eval_block(qd, qt, qw, v8, sc):
        d = dense_scan_scores(qd, v8, cols_c, spec_c, sc)
        _, d_ids = masked_topk(d, LIMIT)
        # sparse_scan_scores scores ONE query; vmap it per eval query
        # (the XLA path — pure jnp — vmaps cleanly).
        s = jax.vmap(lambda t, w: sparse_scan_scores(
            t[None], w[None], terms_c, weights_c, cols_c, spec_c,
            use_pallas=False)[0])(qt, qw)
        _, s_ids = masked_topk(s, LIMIT)
        h_ids = tuple(hybrid_fuse(d, s, w, limit=LIMIT)[1]
                      for w in W_SWEEP)
        return d_ids, s_ids, h_ids

    BQ = 32
    d_t, d_r, s_only = [], [], []
    h_t = [[] for _ in W_SWEEP]
    for lo in range(0, nq, BQ):
        hiq = min(lo + BQ, nq)
        qt_b = jnp.asarray(qt_np[lo:hiq])
        qw_b = jnp.asarray(qw_np[lo:hiq])
        dt, st, ht = eval_block(q_t[lo:hiq], qt_b, qw_b, v8_t, sc_t)
        dr, _, _ = eval_block(q_r[lo:hiq], qt_b, qw_b, v8_r, sc_r)
        d_t.append(np.asarray(dt))
        d_r.append(np.asarray(dr))
        s_only.append(np.asarray(st))
        for k, h in enumerate(ht):
            h_t[k].append(np.asarray(h))
    tgt = task.eval_targets
    corp = task.corpus
    d_t, d_r, s_only = (np.concatenate(x) for x in (d_t, d_r, s_only))
    h_t = [np.concatenate(x) for x in h_t]
    # The hybrid weight is TUNED on a validation half of the held-out
    # docs and REPORTED on the disjoint test half (tuning on the reported
    # split would leak). Split by document parity.
    q_doc = task.chunk_doc[tgt]
    is_val = (q_doc % 2) == 0
    val, test = np.nonzero(is_val)[0], np.nonzero(~is_val)[0]

    def rec(ids, sel):
        return proof_recall(ids[sel], tgt[sel], corp)

    best_w, best_v = SPARSE_W, -1.0
    for w, ids in zip(W_SWEEP, h_t):
        v = rec(ids, val)
        out[f"trained_hybrid_val_recall10_w{w}"] = round(v, 3)
        if v > best_v:
            best_w, best_v = w, v
    k_best = W_SWEEP.index(best_w)
    out["trained_hybrid_w"] = best_w
    out["trained_recall10"] = round(rec(d_t, test), 3)
    out["randinit_recall10"] = round(rec(d_r, test), 3)
    out["bm25_only_recall10"] = round(rec(s_only, test), 3)
    out["trained_hybrid_recall10"] = round(rec(h_t[k_best], test), 3)
    out["trained_hybrid_recall10_w0.1"] = round(rec(h_t[0], test), 3)
    out["trained_test_queries"] = int(len(test))
    out["trained_section_s"] = round(time.time() - t_sec, 1)
    log(f"held-out (test split) recall@10: trained {out['trained_recall10']}"
        f" / hybrid(w={best_w}) {out['trained_hybrid_recall10']} vs "
        f"bm25-only {out['bm25_only_recall10']} / "
        f"randinit {out['randinit_recall10']} "
        f"({out['trained_section_s']}s total)")
    return out


if __name__ == "__main__":
    main()
