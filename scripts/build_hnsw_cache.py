"""Build the bench's cached CPU-HNSW baseline graph offline.

bench.py's CPU HNSW baseline (the stand-in for the reference's Qdrant
engine) costs ~930 s of single-thread build at 50k rows / efc=200 — too
much of the bench deadline to spend on a baseline. The corpus is
deterministic (fixed PRNG key + the same f16 round-trip bench.build_corpus
does), so the GRAPH can be built once here and committed under
``bench_cache/``; bench.py then loads it in seconds (checksum-verified
against the regenerated corpus, rebuilt from scratch if it mismatches).

Incremental/resumable: a multi-hour target (1M rows ~= 6-8 h on this 1-vCPU
host) is built in checkpointed stages — every ``--checkpoint-every`` rows
the graph is saved as ``hnsw_<k>r_...``, and a fresh invocation RESUMES
from the largest committed checkpoint below the target (hnsw_load_graph
restores a graph that keeps accepting adds; levels keep their original RNG
draws, new rows draw fresh ones — statistically identical graphs).
bench.py picks up whichever checkpoint size is largest at run time.

Usage: python scripts/build_hnsw_cache.py [n_rows] [--corpus path.npy]
       [--checkpoint-every k]
Without --corpus the corpus is regenerated in-process; it must then run
where the generator matches the bench device (the TPU via the axon tunnel).
With --corpus it runs backend-free from a pre-pulled host array (use
scripts/dump_bench_corpus.py on the TPU first).

--real-npz <dump.npz> (from scripts/dump_real_vecs.py) instead builds the
768-d REAL-corpus baseline (VERDICT r4 task 3): rows are the dequantized
int8 real-text embeddings — the exact vectors the TPU real_ivf_* numbers
serve — and checkpoints are named hnsw_<k>r_768d_m16_efc200.real1.bin.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def load_corpus(args) -> np.ndarray:
    import bench  # constants + generator, no sections run

    if args.corpus:
        vecs_np = np.load(args.corpus, mmap_mode="r")
        assert vecs_np.shape[1] == bench.D, vecs_np.shape
        return vecs_np
    from voitta_rag_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from voitta_rag_tpu.utils.synth import clustered_unit_vectors

    print(f"generating bench corpus ({bench.N} x {bench.D}) on "
          f"{jax.default_backend()}", flush=True)
    vecs, _ = clustered_unit_vectors(
        bench.CORPUS_KEY, bench.N, bench.D,
        n_clusters=bench.TRUE_CLUSTERS, intra_cos=bench.INTRA_COS)
    # EXACTLY bench.build_corpus's host mirror: f16 round-trip.
    return np.asarray(vecs.astype(jnp.float16)).astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_rows", nargs="?", type=int, default=100_000)
    ap.add_argument("--corpus", default=None,
                    help=".npy of the bench host corpus (f16 round-tripped)")
    ap.add_argument("--real-npz", default=None,
                    help="scripts/dump_real_vecs.py output: build the 768-d "
                         "real-corpus baseline from dequantized int8 rows")
    ap.add_argument("--checkpoint-every", type=int, default=100_000)
    args = ap.parse_args()
    n_rows = args.n_rows

    from voitta_rag_tpu.utils.hnsw_baseline import HnswBaseline, available

    assert available(), "libhnsw_baseline.so unavailable"

    if args.real_npz:
        z = np.load(args.real_npz)
        vecs_np = (z["v8"].astype(np.float32)
                   * z["scales"][:, None].astype(np.float32))
        dim, suffix = vecs_np.shape[1], "real1"
    else:
        import bench

        vecs_np = load_corpus(args)
        dim, suffix = bench.D, "v2"
    n_rows = min(n_rows, len(vecs_np))

    out_dir = Path(__file__).resolve().parent.parent / "bench_cache"
    out_dir.mkdir(exist_ok=True)

    def path_for(k: int) -> Path:
        return out_dir / f"hnsw_{k}r_{dim}d_m16_efc200.{suffix}.bin"

    # Resume from the largest checkpoint below the target.
    h, start = None, 0
    for cp in sorted(out_dir.glob(f"hnsw_*r_{dim}d_m16_efc200.{suffix}.bin"),
                     key=lambda p: -int(p.name.split("_")[1][:-1])):
        k = int(cp.name.split("_")[1][:-1])
        if k >= n_rows:
            continue
        h = HnswBaseline.load_graph(cp, np.ascontiguousarray(
            vecs_np[:k], np.float32), max_elements=n_rows)
        if h is not None:
            start = k
            print(f"resuming from {cp.name} ({k} rows)", flush=True)
            break
    if h is None:
        h = HnswBaseline(dim, n_rows, m=16, ef_construction=200)

    print(f"building HNSW {start}->{n_rows} rows efc=200 (single thread)...",
          flush=True)
    t0 = time.perf_counter()
    blk = 10_000
    next_cp = ((start // args.checkpoint_every) + 1) * args.checkpoint_every
    for lo in range(start, n_rows, blk):
        h.add(np.ascontiguousarray(vecs_np[lo:lo + blk], np.float32))
        done = min(lo + blk, n_rows)
        print(f"  {done}/{n_rows} ({time.perf_counter() - t0:.0f}s)",
              flush=True)
        if done >= next_cp and done < n_rows:
            cp = path_for(done)
            assert h.save_graph(cp), f"checkpoint save failed: {cp}"
            print(f"  checkpoint {cp.name} "
                  f"({cp.stat().st_size / 1e6:.1f} MB)", flush=True)
            next_cp += args.checkpoint_every
    print(f"built in {time.perf_counter() - t0:.0f}s", flush=True)

    out = path_for(n_rows)
    assert h.save_graph(out), f"save failed: {out}"
    sub = np.ascontiguousarray(vecs_np[:n_rows], np.float32)
    h2 = HnswBaseline.load_graph(out, sub)
    assert h2 is not None and len(h2) == n_rows, "reload verification failed"
    ids1, _ = h.search(sub[:4], k=10, ef=64)
    ids2, _ = h2.search(sub[:4], k=10, ef=64)
    assert (ids1 == ids2).all(), "reload search mismatch"
    print(f"saved + verified {out} ({out.stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
