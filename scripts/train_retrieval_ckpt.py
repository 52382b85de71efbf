"""Offline encoder training for the bench's learned-retrieval section.

VERDICT r4 task 4: the owned dense encoder must beat BM25-only on the
held-out split (r4: dense 0.231 < BM25 0.288), and training must move OFF
the bench critical path. This script runs the long schedule offline —
neighbor hard negatives (models/retrieval_proof.train_encoder_hardneg),
online query synthesis, periodic validation-half checkpointing — and saves
the best checkpoint to bench_cache/trained_minilm.v1.npz. bench.py's
trained section then loads the checkpoint and only evaluates (~2 min
instead of ~7), reporting recall on the disjoint TEST half.

The harvest/task construction is deterministic for a given image and
target (retrieval_proof.harvest_docs / build_task with seed 0), so the
bench reconstructs the exact same corpus, split, and eval queries from the
metadata stored in the checkpoint.

Usage: python scripts/train_retrieval_ckpt.py [--budget-s 4200]
       [--steps 40000] [--batch 512] [--lr 3e-4] [--max-len 96]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from voitta_rag_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from voitta_rag_tpu.models.encoder import PRESETS  # noqa: E402
from voitta_rag_tpu.models.retrieval_proof import (  # noqa: E402
    build_task, crc_tokenize, encode_corpus, harvest_docs, recall_at10,
    save_checkpoint, train_encoder_hardneg,
)

HARVEST_TARGET = 65536
PRESET = "sentence-transformers/all-MiniLM-L6-v2"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=4200.0)
    ap.add_argument("--steps", type=int, default=40_000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--max-len", type=int, default=96)
    ap.add_argument("--eval-every", type=int, default=1500)
    ap.add_argument("--out", default=None)
    ap.add_argument("--init", default=None,
                    help="warm-start from an existing checkpoint (continue "
                         "training at a lower lr instead of random init)")
    args = ap.parse_args()
    t0 = time.time()

    def log(msg: str) -> None:
        print(f"[train {time.time() - t0:7.0f}s] {msg}", flush=True)

    def time_left() -> float:
        return args.budget_s - (time.time() - t0)

    log(f"harvesting {HARVEST_TARGET} chunks")
    docs = harvest_docs(HARVEST_TARGET)
    task = build_task(docs, max_eval=512, max_train_pairs=250_000)
    log(f"task: {len(task.corpus)} chunks / {len(task.train_refs)} refs / "
        f"{len(task.eval_queries)} eval queries")

    cfg = PRESETS[PRESET]
    LT = args.max_len
    ids = crc_tokenize(task.corpus, cfg.vocab_size, LT)
    q_ids = crc_tokenize(task.eval_queries, cfg.vocab_size, LT)
    tgt = task.eval_targets
    # Validation half only (doc parity): the TEST half stays untouched for
    # the bench's reported number — selecting the checkpoint on it would
    # leak.
    is_val = (task.chunk_doc[tgt] % 2) == 0
    val = np.nonzero(is_val)[0]
    log(f"validation half: {len(val)} queries (test half untouched)")

    out = Path(args.out) if args.out else (
        Path(__file__).resolve().parent.parent
        / "bench_cache" / "trained_minilm.v1.npz")
    out.parent.mkdir(exist_ok=True)
    trainer_tag = "hardneg_online_v1+cont" if args.init else \
        "hardneg_online_v1"
    best_saved = [-1.0]

    def val_recall(params) -> float:
        emb = encode_corpus(params, cfg, ids)
        qv = encode_corpus(params, cfg, q_ids[val])
        sims = jnp.einsum("qd,nd->qn", qv, emb)
        _, ids10 = jax.lax.top_k(sims, 10)
        r = recall_at10(np.asarray(ids10), tgt[val], task.corpus)
        # Save-on-best: a mid-run tunnel stall (observed: the remote-TPU
        # RPC futex-blocks forever) must not lose the whole run — every
        # new validation best lands on disk immediately.
        if r > best_saved[0]:
            best_saved[0] = r
            save_checkpoint(out, jax.tree.map(np.asarray, params),
                            preset=PRESET, max_len=LT,
                            harvest_target=HARVEST_TARGET, steps=args.steps,
                            batch=args.batch, lr=args.lr,
                            val_recall10=round(r, 4), trainer=trainer_tag)
            log(f"  best checkpoint saved ({r:.4f})")
        return r

    init = None
    if args.init:
        from voitta_rag_tpu.models.retrieval_proof import load_checkpoint

        init, init_meta = load_checkpoint(args.init, cfg)
        # Only genuine improvements over the warm-start checkpoint may
        # overwrite the output (the continuation may write straight onto
        # the served checkpoint path).
        if Path(args.init).resolve() == out.resolve():
            best_saved[0] = float(init_meta.get("val_recall10") or 0.0)
        log(f"warm-starting from {args.init} "
            f"(val {init_meta.get('val_recall10')}, save threshold "
            f"{best_saved[0]:.4f})")

    params, losses, best = train_encoder_hardneg(
        docs, task.train_refs, cfg, steps=args.steps, batch=args.batch,
        max_len=LT, lr=args.lr, log=log, time_left=time_left,
        eval_every=args.eval_every, eval_fn=val_recall, init=init)
    final_val = val_recall(params)  # saves if it's a new best
    log(f"final val recall {final_val:.4f}; best eval {best[0]:.4f}")
    log(f"checkpoint: {out} ({out.stat().st_size / 1e6:.1f} MB, "
        f"val recall {best_saved[0]:.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
