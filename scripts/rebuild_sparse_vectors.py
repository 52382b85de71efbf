#!/usr/bin/env python3
"""Sparse-vector backfill / index migration.

Reference analogue: scripts/build_sparse_vectors.py:73-245 — an offline
migration that scrolls a dense-only collection, BM25-embeds the stored
texts, and writes a new collection with both vector types, resumable by
count, reporting chunks/sec.

TPU-native version: re-embeds the sparse term arrays of every chunk in the
payload store and rewrites the device segments (dense vectors are reused
from the existing segments). Resumable: already-migrated gids are skipped by
comparing the sparse-slot population.
"""

from __future__ import annotations

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import argparse
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--collection", default=None)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    from voitta_rag_tpu.index.store import TpuVectorStore
    from voitta_rag_tpu.ops.sparse_scan import TERM_PAD
    from voitta_rag_tpu.search.sparse_text import get_sparse_embedding_service

    store = TpuVectorStore(collection=args.collection)
    store._ensure_open()
    sparse_svc = get_sparse_embedding_service()
    payloads = store.payloads

    rows = payloads._conn.execute(
        "SELECT gid, text FROM chunks ORDER BY gid").fetchall()
    print(f"{len(rows)} chunks in collection "
          f"'{store.collection_name}'")
    t0 = time.time()
    done = 0
    df_bump: dict[int, int] = {}
    for start in range(0, len(rows), args.batch):
        batch = rows[start:start + args.batch]
        texts = [r[1] for r in batch]
        gids = [r[0] for r in batch]
        sparse = sparse_svc.embed(texts)
        S = store.sparse_slots
        # Stage per-segment updates, then write each segment ONCE per batch
        # (device terms are slot-major [S, cap]; per-row .at dispatches
        # would also be quadratically slow at migration scale).
        staged: dict[int, list[tuple[int, np.ndarray, np.ndarray]]] = {}
        for gid, sv in zip(gids, sparse):
            si, row = gid // store.segment_capacity, gid % store.segment_capacity
            seg = store.segments[si]
            # Skip rows already carrying sparse terms (resume support).
            if seg.terms_np[row, 0] != TERM_PAD:
                continue
            idx = np.asarray(sv.indices, np.int64)
            val = np.asarray(sv.values, np.float32)
            if len(idx) > S:
                keep = np.argsort(-val)[:S]
                idx, val = idx[keep], val[keep]
            terms = np.full((S,), TERM_PAD, np.int32)
            weights = np.zeros((S,), np.float32)
            terms[: len(idx)] = idx
            weights[: len(idx)] = val
            staged.setdefault(si, []).append((row, terms, weights))
            for t in set(int(x) for x in idx):
                df_bump[t] = df_bump.get(t, 0) + 1
            done += 1
        import jax.numpy as jnp

        for si, updates in staged.items():
            seg = store.segments[si]
            rws = np.asarray([u[0] for u in updates], np.int32)
            tv = np.stack([u[1] for u in updates])       # [n, S]
            wv = np.stack([u[2] for u in updates])
            rows_j = jnp.asarray(rws)
            seg.terms = seg.terms.at[:, rows_j].set(jnp.asarray(tv.T))
            seg.weights = seg.weights.at[:, rows_j].set(
                jnp.asarray(wv.T, seg.weights.dtype))
            seg.terms_np[rws] = tv
        rate = (start + len(batch)) / max(time.time() - t0, 1e-9)
        print(f"  {start + len(batch)}/{len(rows)} "
              f"({rate:.0f} chunks/sec, {done} migrated)")
    if df_bump:
        payloads.bump_term_dfs(df_bump)
    store.save()
    print(f"done: {done} chunks migrated in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
