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


def test_corrupt_spill_is_quarantined_not_fatal(temp_root, monkeypatch):
    """A truncated/corrupt segment spill must not brick the store: it gets
    quarantined and the store opens with the healthy segments (the indexing
    repair cycle re-indexes the lost chunks, SURVEY §5.3)."""
    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    index_dir = store.index_dir
    store.close()
    index_dir.mkdir(parents=True, exist_ok=True)
    (index_dir / "segment_000.npz").write_bytes(b"not an npz file at all")

    store = TpuVectorStore(dimension=64)
    try:
        assert store.segments == []  # opened despite the corrupt spill
        assert not (index_dir / "segment_000.npz").exists()
        assert list(index_dir.glob("segment_000.corrupt-*"))
    finally:
        store.close()
    get_settings.cache_clear()
