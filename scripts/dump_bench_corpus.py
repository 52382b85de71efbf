"""Dump bench.py's host-mirror corpus to a .npy for offline baseline work.

The CPU-HNSW baseline build (scripts/build_hnsw_cache.py) is a multi-hour
single-thread job that must not hold the TPU tunnel open; this script does
the only device-dependent step — generating the deterministic bench corpus
on the SAME backend bench.py will use and applying its f16 round-trip —
then releases the device. The builder then runs backend-free from the
dumped array (--corpus).

Usage: python scripts/dump_bench_corpus.py /tmp/bench_corpus.npy
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from voitta_rag_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from voitta_rag_tpu.utils.synth import clustered_unit_vectors  # noqa: E402


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_corpus.npy")
    print(f"generating {bench.N} x {bench.D} on {jax.default_backend()}",
          flush=True)
    vecs, _ = clustered_unit_vectors(
        bench.CORPUS_KEY, bench.N, bench.D,
        n_clusters=bench.TRUE_CLUSTERS, intra_cos=bench.INTRA_COS)
    vecs_np = np.asarray(vecs.astype(jnp.float16)).astype(np.float32)
    np.save(out, vecs_np)
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
