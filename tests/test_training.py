"""Contrastive training: loss behavior and dp/tp sharded step on a 4x2 mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.models.encoder import PRESETS, init_params, encode_tokens
from voitta_rag_tpu.models.training import (
    info_nce_loss, make_optimizer, make_sharded_train_step, param_specs,
    shard_params, train_step,
)
from voitta_rag_tpu.parallel.mesh import train_mesh

TINY = PRESETS["test-tiny"]
B, L = 8, 16


def batch(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: (jnp.asarray(rng.integers(4, TINY.vocab_size, (B, L)),
                              jnp.int32),
                  jnp.ones((B, L), jnp.int32))
    q_ids, q_mask = mk()
    p_ids, p_mask = mk()
    return q_ids, q_mask, p_ids, p_mask


def test_identical_pairs_have_lower_loss_than_random():
    params = init_params(jax.random.PRNGKey(0), TINY)
    q_ids, q_mask, p_ids, p_mask = batch()
    loss_rand = info_nce_loss(params, TINY, q_ids, q_mask, p_ids, p_mask)
    loss_self = info_nce_loss(params, TINY, q_ids, q_mask, q_ids, q_mask)
    assert float(loss_self) < float(loss_rand)


def test_train_step_reduces_loss():
    params = init_params(jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(lr=1e-3, warmup_steps=1, total_steps=100)
    opt_state = tx.init(params)
    q_ids, q_mask, p_ids, p_mask = batch(seed=1)
    losses = []
    for _ in range(8):
        params, opt_state, loss = train_step(
            params, opt_state, q_ids, q_mask, p_ids, p_mask,
            cfg=TINY, tx=tx)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_remat_matches_plain_loss():
    params = init_params(jax.random.PRNGKey(0), TINY)
    q_ids, q_mask, p_ids, p_mask = batch(seed=2)
    a = info_nce_loss(params, TINY, q_ids, q_mask, p_ids, p_mask)
    b = info_nce_loss(params, TINY, q_ids, q_mask, p_ids, p_mask,
                      use_remat=True)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_param_specs_structure_matches_params():
    params = init_params(jax.random.PRNGKey(0), TINY)
    specs = param_specs(params)
    jax.tree.map(lambda *_: None, params, specs)  # same treedef or raises


def test_sharded_train_step_dp4_tp2():
    """Full dp=4, tp=2 sharded train step on the 8-device CPU mesh; loss must
    match the unsharded step (same math, different layout)."""
    mesh = train_mesh(dp=4, tp=2)
    params = init_params(jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(lr=1e-3, warmup_steps=1, total_steps=100)
    q_ids, q_mask, p_ids, p_mask = batch(seed=3)

    ref_opt = tx.init(params)
    _, _, ref_loss = train_step(params, ref_opt, q_ids, q_mask, p_ids, p_mask,
                                cfg=TINY, tx=tx)

    sh_params, sh_opt, step_fn = make_sharded_train_step(
        mesh, TINY, tx, init_params(jax.random.PRNGKey(0), TINY))
    sh_params, sh_opt, loss = step_fn(sh_params, sh_opt, q_ids, q_mask,
                                      p_ids, p_mask)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)

    # Sharding survived the step: a tp-sharded kernel is still tp-sharded.
    k = sh_params["layers"]["mlp"]["up"]["kernel"]
    assert "tp" in str(k.sharding.spec)

    # Second step runs and loss stays finite.
    _, _, loss2 = step_fn(sh_params, sh_opt, q_ids, q_mask, p_ids, p_mask)
    assert np.isfinite(float(loss2))


def test_sharded_encode_matches_unsharded():
    mesh = train_mesh(dp=4, tp=2)
    params = init_params(jax.random.PRNGKey(1), TINY)
    sh_params = shard_params(params, mesh)
    q_ids, q_mask, *_ = batch(seed=4)
    a = np.asarray(encode_tokens(params, TINY, q_ids, q_mask))
    b = np.asarray(encode_tokens(sh_params, TINY, q_ids, q_mask))
    np.testing.assert_allclose(a, b, atol=1e-5)
