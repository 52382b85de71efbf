"""Encoder checkpoint save/load roundtrip + EmbeddingService loading."""

import numpy as np
import jax
import jax.numpy as jnp

from voitta_rag_tpu.models.encoder import PRESETS, encode_tokens, init_params
from voitta_rag_tpu.models.weights import load_checkpoint, save_checkpoint

TINY = PRESETS["test-tiny"]


def test_checkpoint_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(3), TINY)
    save_checkpoint(tmp_path / "ckpt", TINY, params)
    cfg2, params2 = load_checkpoint(tmp_path / "ckpt")
    assert cfg2 == TINY
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), params, params2)

    ids = jnp.asarray(np.random.default_rng(0).integers(
        4, TINY.vocab_size, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    a = np.asarray(encode_tokens(params, TINY, ids, mask))
    b = np.asarray(encode_tokens(params2, cfg2, ids, mask))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_embedding_service_loads_native_checkpoint(tmp_path, temp_root,
                                                   monkeypatch):
    from voitta_rag_tpu.services.embedding import EmbeddingService

    params = init_params(jax.random.PRNGKey(7), TINY)
    save_checkpoint(tmp_path / "ft", TINY, params)
    svc = EmbeddingService(model_name="test-tiny",
                           model_path=str(tmp_path / "ft"), max_seq_len=16)
    emb = svc.embed_query_array("hello world")
    assert emb.shape == (TINY.hidden_size,)
    # Deterministic: same checkpoint → same embedding.
    svc2 = EmbeddingService(model_name="test-tiny",
                            model_path=str(tmp_path / "ft"), max_seq_len=16)
    np.testing.assert_allclose(emb, svc2.embed_query_array("hello world"),
                               atol=1e-6)
