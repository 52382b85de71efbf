"""Exact re-rank op: oracle parity, masking, host variant."""

import jax.numpy as jnp
import numpy as np
import pytest

from voitta_rag_tpu.ops.pallas_utils import NEG_INF
from voitta_rag_tpu.ops.rerank import (rerank_exact_host, rerank_exact_jit)


def _mk(seed=0, n=512, d=64, b=4):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q, v


def test_rerank_recovers_exact_order():
    q, v = _mk()
    exact = q @ v.T
    want = np.argsort(-exact, axis=1)[:, :10]
    # candidate set = exact top-64 (superset) in scrambled order
    cand = np.argsort(-exact, axis=1)[:, :64]
    rng = np.random.default_rng(1)
    cand = np.take_along_axis(cand, rng.permutation(64)[None, :].repeat(
        len(q), 0), axis=1).astype(np.int32)
    vals, gids = rerank_exact_jit(jnp.asarray(q), jnp.asarray(cand),
                                  jnp.asarray(v), limit=10)
    np.testing.assert_array_equal(np.asarray(gids), want)
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(exact, want, axis=1), rtol=1e-5)


def test_rerank_int8_scales_dequant():
    q, v = _mk(seed=2)
    vmax = np.abs(v).max(axis=1, keepdims=True)
    v8 = np.clip(np.round(v / vmax * 127), -127, 127).astype(np.int8)
    scales = (vmax / 127.0).astype(np.float32).reshape(1, -1)
    deq = v8.astype(np.float32) * scales.T
    exact = q @ deq.T
    cand = np.argsort(-exact, axis=1)[:, :32].astype(np.int32)
    vals, gids = rerank_exact_jit(jnp.asarray(q), jnp.asarray(cand),
                                  jnp.asarray(v8), jnp.asarray(scales),
                                  limit=5)
    want = np.argsort(-exact, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(gids), want)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(exact, want, axis=1),
        rtol=1e-4, atol=1e-5)


def test_rerank_masks_invalid_candidates():
    q, v = _mk(seed=3, b=2)
    cand = np.full((2, 16), -1, np.int32)
    cand[0, :3] = [5, 9, 2]          # only 3 real candidates
    vals, gids = rerank_exact_jit(jnp.asarray(q), jnp.asarray(cand),
                                  jnp.asarray(v), limit=8)
    vals, gids = np.asarray(vals), np.asarray(gids)
    assert set(gids[0, :3]) == {5, 9, 2}
    assert (gids[0, 3:] == -1).all() and (gids[1] == -1).all()
    assert (vals[0, 3:] == NEG_INF).all() and (vals[1] == NEG_INF).all()


def test_host_variant_matches_device():
    q, v = _mk(seed=4)
    exact = q @ v.T
    cand = np.argsort(-exact, axis=1)[:, :24].astype(np.int32)
    cand[:, 20:] = -1
    dv, dg = rerank_exact_jit(jnp.asarray(q), jnp.asarray(cand),
                              jnp.asarray(v), limit=10)
    hv, hg = rerank_exact_host(q, cand, v, limit=10)
    np.testing.assert_array_equal(np.asarray(dg), hg)
    np.testing.assert_allclose(np.asarray(dv), hv, rtol=1e-5)


def test_host_variant_int8():
    q, v = _mk(seed=5)
    vmax = np.abs(v).max(axis=1, keepdims=True)
    v8 = np.clip(np.round(v / vmax * 127), -127, 127).astype(np.int8)
    scales = (vmax / 127.0).astype(np.float32).reshape(1, -1)
    exact = q @ (v8.astype(np.float32) * scales.T).T
    cand = np.argsort(-exact, axis=1)[:, :16].astype(np.int32)
    hv, hg = rerank_exact_host(q, cand, v8, scales, limit=4)
    want = np.argsort(-exact, axis=1)[:, :4]
    np.testing.assert_array_equal(hg, want)


def test_limit_equals_kprime():
    q, v = _mk(seed=6, b=1)
    exact = q @ v.T
    cand = np.argsort(-exact, axis=1)[:, :10].astype(np.int32)
    vals, gids = rerank_exact_jit(jnp.asarray(q), jnp.asarray(cand),
                                  jnp.asarray(v), limit=10)
    np.testing.assert_array_equal(np.asarray(gids),
                                  np.argsort(-exact, axis=1)[:, :10])
