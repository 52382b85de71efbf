"""Dump the REAL-corpus 768-d int8 vectors for the offline HNSW baseline.

VERDICT r4 task 3: the CPU baseline must be matched at the north-star
dimension (768-d) on the REAL corpus, not the 384-d synthetic one. The
real-corpus embedding is deterministic — e5-base architecture at
init_params(PRNGKey(7)) in bf16 over the committed token-id cache
(bench_cache/real_corpus_*x96.v1.npz), exactly bench.bench_real_corpus's
encode path — so the vectors can be encoded ONCE on the TPU here, pulled
to host (int8+scales, ~405 MB at 524k rows), and handed to
scripts/build_hnsw_cache.py --real-npz for the multi-hour single-thread
graph build. Both the dump and the graph are committed: bench_hnsw768
loads them host-side, runs its own exact oracle over the dump rows, and
needs no device (the ~100 s tunnel pull happens once, here).

Usage: python scripts/dump_real_vecs.py [out.npz]
       (dump + graph are both committed: bench_hnsw768 loads the dump)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from voitta_rag_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from voitta_rag_tpu.models.encoder import (  # noqa: E402
    PRESETS, encode_tokens, init_params,
)


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1
               else "/tmp/real_vecs_768.npz")
    # Optional row-count selector: the graph, the dump, and the bench's
    # real-corpus section must all describe the SAME corpus, and the bench
    # under its 1550 s internal deadline always runs the 524,288-chunk
    # cache — so the matched baseline is dumped at that size, not at the
    # largest cache on disk.
    want = int(sys.argv[2]) if len(sys.argv) > 2 else None
    cache_dir = Path(__file__).resolve().parent.parent / "bench_cache"
    cached = sorted(cache_dir.glob("real_corpus_*x96.v1.npz"),
                    key=lambda p: -int(p.name.split("_")[2].split("x")[0]))
    if want is not None:
        cached = [p for p in cached
                  if int(p.name.split("_")[2].split("x")[0]) == want]
    assert cached, "no real_corpus cache; run bench_real_corpus first"
    z = np.load(cached[0])
    all_ids, q_ids = z["ids"], z["q_ids"]
    NR = len(all_ids)
    print(f"{cached[0].name}: {NR} chunks", flush=True)

    ecfg = PRESETS["intfloat/e5-base-v2"]
    eparams = init_params(jax.random.PRNGKey(7), ecfg)
    eparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), eparams)
    BE = 256

    @jax.jit
    def enc_block(eparams, ids):
        # EXACTLY bench.bench_real_corpus's enc_block.
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
    vecsR = jnp.zeros((NR, ecfg.hidden_size), jnp.int8)
    scR = jnp.zeros((NR,), jnp.float32)
    for lo in range(0, NR, BE):
        v8, sc = enc_block(eparams, jnp.asarray(all_ids[lo:lo + BE]))
        vecsR, scR = put_block(vecsR, scR, v8, sc, jnp.int32(lo))
        if lo % (BE * 512) == 0:
            print(f"  encoded {lo}/{NR} ({time.time() - t0:.0f}s)",
                  flush=True)
    jax.block_until_ready(vecsR)
    print(f"encoded {NR} in {time.time() - t0:.0f}s", flush=True)

    qv8, qsc = enc_block(eparams, jnp.asarray(q_ids))

    t0 = time.time()
    v8_np = np.asarray(vecsR)
    sc_np = np.asarray(scR)
    q_np = (np.asarray(qv8).astype(np.float32)
            * np.asarray(qsc)[:, None])
    q_np /= np.clip(np.linalg.norm(q_np, axis=1, keepdims=True), 1e-9, None)
    print(f"pulled {v8_np.nbytes / 1e6:.0f} MB in {time.time() - t0:.0f}s",
          flush=True)
    np.savez(out, v8=v8_np, scales=sc_np, q=q_np.astype(np.float32),
             src=cached[0].name)
    print(f"wrote {out} ({out.stat().st_size / 1e6:.0f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
