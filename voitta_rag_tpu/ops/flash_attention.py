"""Fused bidirectional attention kernel for the embedding encoder.

Replaces the torch/CUDA attention inside sentence-transformers (reference
services/embedding.py:40). Encoder sequences are short by design — chunks are
<=512 chars (config.py:39), so L <= 512 tokens — which means a whole
``[L, L]`` attention matrix fits comfortably in VMEM. The kernel therefore
fuses QK^T, bias/padding mask, softmax, and PV into a single VMEM-resident
program per (batch, head): one HBM read of Q/K/V, one HBM write of O, no
materialized attention scores in HBM. (For long-context models a streaming
online-softmax variant would be needed; the behavior contract never produces
long sequences — SURVEY.md §5.7.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voitta_rag_tpu.ops.pallas_utils import interpret_mode


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # [L, Dh]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + bias_ref[0]  # bias [1, L] broadcasts over query rows
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _xla_attention(q, k, v, bias, rel_bias=None):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    s = s + bias[:, :, None, :]
    if rel_bias is not None:
        s = s + rel_bias
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@jax.custom_vjp
def _pallas_attention(q, k, v, bias):
    return _pallas_attention_fwd_impl(q, k, v, bias)


def _pallas_attention_fwd(q, k, v, bias):
    return _pallas_attention_fwd_impl(q, k, v, bias), (q, k, v, bias)


def _pallas_attention_bwd(res, g):
    """Recompute-based backward (XLA math): cheap at encoder lengths, keeps
    the forward kernel simple while making the encoder trainable."""
    q, k, v, bias = res
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    s = s + bias[:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    dbias = jnp.sum(ds, axis=(1, 2))[:, None, :]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype))


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    *,
    rel_bias: jax.Array | None = None,
    use_pallas: bool = True,
) -> jax.Array:
    """Bidirectional multi-head attention with additive key bias.

    Args:
        q, k, v: [B, H, L, Dh].
        bias: f32 [B, 1, L] additive key-padding bias (0 for real tokens,
            large-negative for padding).
        rel_bias: optional f32 [1, H, L, L] relative-position bias (MPNet
            family), added to post-scale scores. The Pallas kernel streams
            key blocks and has no per-(head, q, k) operand, so a rel_bias
            routes to the XLA path — at encoder lengths (L <= 512) the full
            attention matrix is VMEM-trivial and XLA fuses it well.

    Returns:
        [B, H, L, Dh] attention output, dtype of q.
    """
    if rel_bias is not None:
        return _xla_attention(q, k, v, bias, rel_bias)
    if not use_pallas:
        return _xla_attention(q, k, v, bias)
    return _pallas_attention(q, k, v, bias)


def _pallas_attention_fwd_impl(q, k, v, bias):
    B, H, L, Dh = q.shape
    scale = 1.0 / (Dh ** 0.5)
    grid = (B, H)
    qkv_spec = pl.BlockSpec((1, 1, L, Dh), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, L), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * L * Dh,
            bytes_accessed=4 * B * H * L * Dh * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
        interpret=interpret_mode(),
    )(q, k, v, bias)
