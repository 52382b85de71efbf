"""End-to-end encoder fine-tuning driver.

Takes (query, passage) text pairs, tokenizes with the service tokenizer,
runs the dp x tp sharded InfoNCE train step, and writes a native checkpoint
that :class:`voitta_rag_tpu.services.embedding.EmbeddingService` loads
directly — closing the loop from "own the model" to "serve the model".
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import jax

from voitta_rag_tpu.models.encoder import EncoderConfig, Params, config_for, init_params
from voitta_rag_tpu.models.tokenizer import load_tokenizer
from voitta_rag_tpu.models.training import make_optimizer, make_sharded_train_step
from voitta_rag_tpu.models.weights import save_checkpoint
from voitta_rag_tpu.parallel.mesh import train_mesh

logger = logging.getLogger(__name__)


def finetune(
    pairs: list[tuple[str, str]],
    *,
    model_name: str = "test-tiny",
    init: Params | None = None,
    cfg: EncoderConfig | None = None,
    output_dir: str | Path | None = None,
    epochs: int = 1,
    batch_size: int = 32,
    max_seq_len: int = 128,
    lr: float = 2e-5,
    dp: int | None = None,
    tp: int = 1,
    seed: int = 0,
    e5_prefixes: bool = True,
) -> tuple[EncoderConfig, Params, list[float]]:
    """Contrastive fine-tune on (query, passage) pairs; returns
    (cfg, trained_params, losses)."""
    cfg = cfg or config_for(model_name)
    # Same clamp as the serving path (services/embedding.py): a model with
    # a short position table must truncate, not crash mid-training.
    max_seq_len = min(max_seq_len, cfg.max_position - cfg.pos_offset)
    params = init if init is not None else init_params(
        jax.random.PRNGKey(seed), cfg)
    tokenizer = load_tokenizer(None, cfg.vocab_size)

    n_dev = len(jax.devices())
    if dp is None:
        dp = max(n_dev // tp, 1)
    mesh = train_mesh(dp=dp, tp=tp)
    dp = max(dp, 1)
    batch_size = max(batch_size - batch_size % dp, dp)

    steps_per_epoch = max(len(pairs) // batch_size, 1)
    tx = make_optimizer(lr=lr, warmup_steps=min(100, steps_per_epoch),
                        total_steps=max(epochs * steps_per_epoch, 2))
    params, opt_state, step_fn = make_sharded_train_step(mesh, cfg, tx, params)

    rng = np.random.default_rng(seed)
    losses: list[float] = []
    for epoch in range(epochs):
        order = rng.permutation(len(pairs))
        for s in range(steps_per_epoch):
            idx = order[s * batch_size:(s + 1) * batch_size]
            if len(idx) < batch_size:
                break
            qs = [pairs[i][0] for i in idx]
            ps = [pairs[i][1] for i in idx]
            if e5_prefixes:
                qs = [f"query: {q}" for q in qs]
                ps = [f"passage: {p}" for p in ps]
            q_ids, q_mask = tokenizer.encode_batch(qs, max_seq_len)
            p_ids, p_mask = tokenizer.encode_batch(ps, max_seq_len)
            params, opt_state, loss = step_fn(
                params, opt_state, q_ids, q_mask, p_ids, p_mask)
            losses.append(float(loss))
        logger.info("epoch %d: loss %.4f", epoch,
                    float(np.mean(losses[-steps_per_epoch:])))

    if output_dir:
        save_checkpoint(output_dir, cfg, jax.device_get(params))
        logger.info("checkpoint written to %s", output_dir)
    return cfg, params, losses
