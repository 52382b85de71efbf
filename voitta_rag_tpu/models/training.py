"""Contrastive fine-tuning of the embedding encoder (InfoNCE, DP x TP).

The reference treats its encoder as a frozen external artifact
(sentence-transformers checkpoint, services/embedding.py). A TPU-native
framework owns the model, so fine-tuning on in-domain (query, passage) pairs
is a first-class capability: symmetric InfoNCE with in-batch negatives — the
training recipe of the e5/bge embedding family.

Parallelism (the spec the driver's ``dryrun_multichip`` exercises):
- **dp**: batch axis sharded over the ``dp`` mesh axis. The in-batch
  negatives matrix ``q @ p.T`` contracts over the *global* batch — XLA
  inserts the all-gather of passage embeddings over ICI automatically from
  the sharding annotations (this is the standard large-batch contrastive
  pattern).
- **tp**: Megatron-style tensor parallelism on the transformer: qkv/up
  kernels column-sharded, o/down kernels row-sharded, embeddings replicated.
- Optional rematerialization (``jax.checkpoint``) trades FLOPs for HBM on
  long-batch fine-tunes.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voitta_rag_tpu.models.encoder import (
    EncoderConfig, Params, encoder_forward, mean_pool_normalize,
)
from voitta_rag_tpu.parallel.mesh import DP_AXIS, TP_AXIS


# ---------------------------------------------------------------------------
# sharding rules
# ---------------------------------------------------------------------------

def param_specs(params: Params) -> Any:
    """PartitionSpec pytree: Megatron TP sharding for the encoder params.

    Layer params are stacked on a leading layer axis (encoder.stack_layers),
    so every per-layer spec carries a leading ``None``: qkv/up kernels
    column-sharded on the output dim, o/down kernels row-sharded on the
    input dim, norms and embeddings replicated.
    """
    attn_specs = {
        "q": {"kernel": P(None, None, TP_AXIS), "bias": P(None, TP_AXIS)},
        "k": {"kernel": P(None, None, TP_AXIS), "bias": P(None, TP_AXIS)},
        "v": {"kernel": P(None, None, TP_AXIS), "bias": P(None, TP_AXIS)},
        "o": {"kernel": P(None, TP_AXIS, None), "bias": P(None)},
        "ln": {"scale": P(None), "bias": P(None)},
    }
    mlp_specs = {
        "up": {"kernel": P(None, None, TP_AXIS), "bias": P(None, TP_AXIS)},
        "down": {"kernel": P(None, TP_AXIS, None), "bias": P(None)},
        "ln": {"scale": P(None), "bias": P(None)},
    }
    # Adapt to the model family's actual tree: token_type is absent for
    # MPNet, rel_bias present only for MPNet — both replicated.
    emb_specs = {"word": P(), "position": P(),
                 "ln": {"scale": P(), "bias": P()}}
    if "token_type" in params["embeddings"]:
        emb_specs["token_type"] = P()
    specs: dict = {
        "embeddings": emb_specs,
        "layers": {"attn": attn_specs, "mlp": mlp_specs},
    }
    if "rel_bias" in params:
        specs["rel_bias"] = P()
    return specs


def shard_params(params: Params, mesh: Mesh) -> Params:
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, jax.Array))


# ---------------------------------------------------------------------------
# loss + train step
# ---------------------------------------------------------------------------

def info_nce_loss(
    params: Params,
    cfg: EncoderConfig,
    q_ids: jax.Array, q_mask: jax.Array,
    p_ids: jax.Array, p_mask: jax.Array,
    temperature: float = 0.05,
    *,
    use_remat: bool = False,
    use_pallas_attn: bool | None = None,
) -> jax.Array:
    """Symmetric InfoNCE over in-batch negatives.

    ``use_remat`` applies PER-LAYER rematerialization inside the encoder's
    layer scan (encoder_forward remat=True) — the granularity that actually
    caps the backward's live set. (A whole-forward jax.checkpoint, the
    previous shape of this flag, recomputes the forward as one block and
    peaks at the same all-layer activation footprint it was meant to avoid;
    b=512 L=96 MiniLM-L6 OOMed 25.7 GB on a 16 GB chip either way.)
    """
    q_emb = mean_pool_normalize(
        encoder_forward(params, cfg, q_ids, q_mask,
                        use_pallas_attn=use_pallas_attn, remat=use_remat),
        q_mask)
    p_emb = mean_pool_normalize(
        encoder_forward(params, cfg, p_ids, p_mask,
                        use_pallas_attn=use_pallas_attn, remat=use_remat),
        p_mask)

    # Global in-batch negatives: with q/p sharded on dp, XLA all-gathers the
    # passage embeddings over ICI for this contraction.
    logits = (q_emb @ p_emb.T) / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_p = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(loss_q + loss_p) / 2.0


def make_optimizer(lr: float = 2e-5, weight_decay: float = 0.01,
                   warmup_steps: int = 100,
                   total_steps: int = 10_000) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    return optax.adamw(sched, weight_decay=weight_decay)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tx", "temperature", "use_remat",
                     "use_pallas_attn"),
    donate_argnames=("params", "opt_state"),
)
def train_step(
    params: Params,
    opt_state,
    q_ids, q_mask, p_ids, p_mask,
    *,
    cfg: EncoderConfig,
    tx: optax.GradientTransformation,
    temperature: float = 0.05,
    use_remat: bool = False,
    use_pallas_attn: bool | None = None,
):
    """One optimizer step; returns (params, opt_state, loss)."""
    loss, grads = jax.value_and_grad(info_nce_loss)(
        params, cfg, q_ids, q_mask, p_ids, p_mask, temperature,
        use_remat=use_remat, use_pallas_attn=use_pallas_attn)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_sharded_train_step(mesh: Mesh, cfg: EncoderConfig,
                            tx: optax.GradientTransformation,
                            params: Params,
                            use_pallas_attn: bool | None = None,
                            use_remat: bool = False):
    """Bind a train step with explicit dp/tp shardings over ``mesh``.

    Returns (sharded_params, opt_state, step_fn) where
    ``step_fn(params, opt_state, q_ids, q_mask, p_ids, p_mask)``.
    """
    params = shard_params(params, mesh)
    opt_state = tx.init(params)
    batch_sharding = NamedSharding(mesh, P(DP_AXIS))

    def step_fn(params, opt_state, q_ids, q_mask, p_ids, p_mask):
        args = [jax.device_put(x, batch_sharding)
                for x in (q_ids, q_mask, p_ids, p_mask)]
        return train_step(params, opt_state, *args, cfg=cfg, tx=tx,
                          use_pallas_attn=use_pallas_attn,
                          use_remat=use_remat)

    return params, opt_state, step_fn
