#!/usr/bin/env python3
"""Fine-tune the embedding encoder on in-domain (query, passage) pairs.

Pairs come from a JSONL file (``{"query": ..., "passage": ...}`` per line) or
are mined from the live index (each chunk paired with its file name + folder
as a weak query — a pragmatic zero-annotation starting point).

The resulting checkpoint is loadable via EMBEDDING_MODEL_PATH.
"""

from __future__ import annotations

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import argparse
import json
import sys


def mine_pairs_from_index(limit: int) -> list[tuple[str, str]]:
    from voitta_rag_tpu.index.store import get_vector_store

    store = get_vector_store()
    rows = store.payloads._conn.execute(
        "SELECT file_path, text FROM chunks ORDER BY RANDOM() LIMIT ?",
        (limit,)).fetchall()
    pairs = []
    for file_path, text in rows:
        name = file_path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        folder = file_path.rsplit("/", 1)[0] if "/" in file_path else ""
        query = f"{name} {folder}".replace("_", " ").replace("-", " ")
        pairs.append((query, text))
    return pairs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", help="JSONL of {query, passage} (default: "
                                    "mine weak pairs from the index)")
    ap.add_argument("--model", default="intfloat/e5-base-v2")
    ap.add_argument("--output", required=True)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--mine-limit", type=int, default=10_000)
    args = ap.parse_args()

    from voitta_rag_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from voitta_rag_tpu.models.finetune import finetune

    if args.pairs:
        pairs = []
        with open(args.pairs) as f:
            for line in f:
                d = json.loads(line)
                pairs.append((d["query"], d["passage"]))
    else:
        pairs = mine_pairs_from_index(args.mine_limit)
    print(f"{len(pairs)} training pairs")
    if len(pairs) < args.batch_size:
        print("not enough pairs", file=sys.stderr)
        return 1

    _, _, losses = finetune(
        pairs, model_name=args.model, output_dir=args.output,
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        tp=args.tp)
    print(f"final loss {losses[-1]:.4f}; checkpoint at {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
