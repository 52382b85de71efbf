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
        # Opened despite the corrupt spill; the slot is held by an EMPTY
        # placeholder segment so later segments' gid ranges stay aligned
        # with the payload store.
        assert len(store.segments) == 1
        assert store.segments[0].live_count == 0
        assert not (index_dir / "segment_000.npz").exists()
        assert list(index_dir.glob("segment_000.corrupt-*"))
    finally:
        store.close()
    get_settings.cache_clear()


def test_corrupt_middle_segment_keeps_gid_alignment(temp_root, monkeypatch):
    """A corrupt MIDDLE segment must not shift later segments' positions:
    gid = slot * capacity + row, so slot integrity is what keeps search
    results pointing at the right payloads."""
    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from datetime import datetime, timezone

    from voitta_rag_tpu.core_types import ChunkMetadata
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    rng = np.random.default_rng(0)

    def add(n, tag):
        vecs = rng.standard_normal((n, 64)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        metas = [ChunkMetadata(
            file_path=f"{tag}/{i}.md", folder_path=tag, index_folder=tag,
            file_name=f"{i}.md", chunk_index=0, total_chunks=1,
            start_char=0, end_char=1,
            indexed_at=datetime.now(timezone.utc).isoformat())
            for i in range(n)]
        store.store_chunks([f"{tag} {i}" for i in range(n)], vecs, metas)
        return vecs

    add(1024, "seg0")           # fills segment 0
    add(1024, "seg1")           # fills segment 1
    v2 = add(10, "seg2")        # lands in segment 2
    store.save()
    index_dir = store.index_dir
    store.close()

    # Corrupt the MIDDLE segment's spill.
    (index_dir / "segment_0001.npz").write_bytes(b"garbage")

    store = TpuVectorStore(dimension=64)
    try:
        assert len(store.segments) == 3  # slot 1 is an empty placeholder
        assert store.segments[1].live_count == 0
        assert store.segments[2].live_count == 10
        # seg2's vectors still resolve to seg2's payloads.
        hits = store.search(v2[3], limit=1)
        assert hits and hits[0].metadata.file_path == "seg2/3.md"
    finally:
        store.close()
    get_settings.cache_clear()
