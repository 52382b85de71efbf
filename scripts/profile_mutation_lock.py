"""Profile which writer phase holds the store lock during mutation.

VERDICT r4 task 6 asks for an account of what blocks the query path under
mutation now that compaction rebuilds and upload staging run outside the
lock. This times the remaining under-lock phases of store_chunks /
delete_by_file on the CPU backend (tunnel-free, so pure host+lock costs).

Usage: JAX_PLATFORMS=cpu python scripts/profile_mutation_lock.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    import tempfile
    from datetime import datetime, timezone

    from voitta_rag_tpu.core_types import ChunkMetadata, SparseVector
    from voitta_rag_tpu.index import segment as segment_mod
    from voitta_rag_tpu.index.store import TpuVectorStore

    rng = np.random.default_rng(11)
    tmp = tempfile.mkdtemp(prefix="voitta_lockprof_")
    DIM = 768
    store = TpuVectorStore(index_dir=tmp, collection="prof", dimension=DIM)
    now = datetime.now(timezone.utc).isoformat()

    def meta_for(fp, i, total):
        return ChunkMetadata(
            file_path=fp, folder_path="bench", index_folder="bench",
            file_name=fp.rsplit("/", 1)[-1], chunk_index=i,
            total_chunks=total, start_char=0, end_char=10, indexed_at=now)

    def batch(fp, n):
        emb = rng.standard_normal((n, DIM)).astype(np.float32)
        svs = [SparseVector(
            indices=rng.integers(0, 30000, 8).tolist(),
            values=rng.random(8).astype(np.float32).tolist())
            for _ in range(n)]
        return ([f"chunk {fp} {i}" for i in range(n)], emb,
                [meta_for(fp, i, n) for i in range(n)], svs)

    # Instrument: wrap the payload-store methods + segment write and time
    # them; separately time total lock-hold by wrapping the RLock.
    timings: dict[str, list[float]] = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t = time.perf_counter()
            r = fn(*a, **k)
            timings.setdefault(name, []).append(
                (time.perf_counter() - t) * 1000)
            return r
        return wrap

    store._ensure_open()  # payload store is lazily created
    store._payloads.insert_chunks = timed(
        "insert_chunks", store._payloads.insert_chunks)
    store._payloads.bump_term_dfs = timed(
        "bump_term_dfs", store._payloads.bump_term_dfs)
    store._payloads.delete_gids = timed(
        "payload_delete_gids", store._payloads.delete_gids)

    # Lock-hold timing: wrap acquire/release of the store RLock.
    real_lock = store._lock

    class LockTimer:
        def __init__(self):
            self.t0 = None

        def __enter__(self):
            t = time.perf_counter()
            real_lock.acquire()
            timings.setdefault("lock_wait", []).append(
                (time.perf_counter() - t) * 1000)
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            timings.setdefault("lock_hold", []).append(
                (time.perf_counter() - self.t0) * 1000)
            real_lock.release()

    # store_chunks ingest baseline
    for lo in range(0, 65536, 4096):
        texts, emb, metas, svs = batch(f"bench/base_{lo}.md", 4096)
        store.store_chunks(texts, emb, metas, svs)

    # warm mutation program shapes
    texts, emb, metas, svs = batch("bench/warm.md", 512)
    store.store_chunks(texts, emb, metas, svs)
    store.delete_by_file("bench/warm.md")

    timings.clear()
    store._lock = LockTimer()  # type: ignore[assignment]

    # measured window: 20 writer rounds like the bench writer
    seg_write_ms = []
    orig_write_staged = segment_mod.Segment.write_staged

    def timed_write(self, rows, st, offset=0):
        t = time.perf_counter()
        r = orig_write_staged(self, rows, st, offset)
        seg_write_ms.append((time.perf_counter() - t) * 1000)
        return r

    segment_mod.Segment.write_staged = timed_write
    try:
        for wi in range(20):
            t = time.perf_counter()
            texts, emb, metas, svs = batch(f"bench/w_{wi}.md", 512)
            timings.setdefault("batch_gen", []).append(
                (time.perf_counter() - t) * 1000)
            t = time.perf_counter()
            store.store_chunks(texts, emb, metas, svs)
            timings.setdefault("store_chunks_total", []).append(
                (time.perf_counter() - t) * 1000)
            if wi % 2 == 1:
                t = time.perf_counter()
                store.delete_by_file(f"bench/base_{(wi // 2) * 4096}.md")
                timings.setdefault("delete_by_file_total", []).append(
                    (time.perf_counter() - t) * 1000)
    finally:
        segment_mod.Segment.write_staged = orig_write_staged
        store._lock = real_lock
    timings["seg_write_staged"] = seg_write_ms

    for name in sorted(timings):
        v = np.asarray(timings[name])
        if not len(v):
            continue
        print(f"{name:24s} n={len(v):3d} p50={np.percentile(v, 50):8.2f}ms "
              f"p95={np.percentile(v, 95):8.2f}ms max={v.max():8.2f}ms "
              f"sum={v.sum():9.1f}ms")
    store.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
