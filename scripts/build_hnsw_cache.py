"""Build the bench's cached CPU-HNSW baseline graph offline.

bench.py's CPU HNSW baseline (the stand-in for the reference's Qdrant
engine) costs ~930 s of single-thread build at 50k rows / efc=200 — too
much of the bench deadline to spend on a baseline. The corpus is
deterministic (fixed PRNG key + the same f16 round-trip bench.build_corpus
does), so the GRAPH can be built once here and committed under
``bench_cache/``; bench.py then loads it in seconds (checksum-verified
against the regenerated corpus, rebuilt from scratch if it mismatches).

Usage: python scripts/build_hnsw_cache.py [n_rows]   (default 100000)
Must run where the corpus generator matches the bench device (the TPU via
the axon tunnel, or whatever backend the bench will use).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from voitta_rag_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402  (constants + generator, no sections run)
from voitta_rag_tpu.utils.hnsw_baseline import HnswBaseline, available  # noqa: E402
from voitta_rag_tpu.utils.synth import clustered_unit_vectors  # noqa: E402


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    assert available(), "libhnsw_baseline.so unavailable"
    print(f"generating bench corpus ({bench.N} x {bench.D}) on "
          f"{__import__('jax').default_backend()}", flush=True)
    vecs, _ = clustered_unit_vectors(
        bench.CORPUS_KEY, bench.N, bench.D,
        n_clusters=bench.TRUE_CLUSTERS, intra_cos=bench.INTRA_COS)
    # EXACTLY bench.build_corpus's host mirror: f16 round-trip.
    vecs_np = np.asarray(vecs.astype(jnp.float16)).astype(np.float32)
    sub = vecs_np[:n_rows]

    out_dir = Path(__file__).resolve().parent.parent / "bench_cache"
    out_dir.mkdir(exist_ok=True)
    out = out_dir / f"hnsw_{n_rows}r_{bench.D}d_m16_efc200.v2.bin"

    print(f"building HNSW {n_rows} rows efc=200 (single thread)...",
          flush=True)
    t0 = time.perf_counter()
    h = HnswBaseline(bench.D, n_rows, m=16, ef_construction=200)
    blk = 10_000
    for lo in range(0, n_rows, blk):
        h.add(sub[lo:lo + blk])
        print(f"  {min(lo + blk, n_rows)}/{n_rows} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    print(f"built in {time.perf_counter() - t0:.0f}s", flush=True)

    assert h.save_graph(out), f"save failed: {out}"
    h2 = HnswBaseline.load_graph(out, sub)
    assert h2 is not None and len(h2) == n_rows, "reload verification failed"
    ids1, _ = h.search(sub[:4], k=10, ef=64)
    ids2, _ = h2.search(sub[:4], k=10, ef=64)
    assert (ids1 == ids2).all(), "reload search mismatch"
    print(f"saved + verified {out} ({out.stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
