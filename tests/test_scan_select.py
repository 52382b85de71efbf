"""Fused scan→group-winner selection (ops/scan_select.py): XLA vs NumPy
oracle, Pallas (interpret) vs XLA, masking, int8, and the fused_query
candidate path vs the full-score path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.ops.filters import (
    COL_FOLDER, COL_VALID, NUM_COLS, make_filter_spec,
)
from voitta_rag_tpu.ops.pallas_utils import NEG_INF
from voitta_rag_tpu.ops.scan_select import dense_scan_select
from voitta_rag_tpu.ops.topk import VALID_THRESHOLD, topk_from_lists


def make_segment(n=512, d=64, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cols = np.zeros((NUM_COLS, n), np.int32)
    cols[COL_VALID] = 1
    cols[COL_FOLDER] = rng.integers(0, 4, n)
    q = rng.standard_normal((3, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(vecs), jnp.asarray(cols), rng


def oracle_select(q, vecs, cols, group, folder_include=None, tile=2048):
    """Strided-within-tile group winners (ops/scan_select.py partition)."""
    scores = np.asarray(q) @ np.asarray(vecs).T
    valid = np.asarray(cols)[COL_VALID].astype(bool)
    if folder_include is not None:
        valid &= np.isin(np.asarray(cols)[COL_FOLDER], folder_include)
    scores = np.where(valid[None, :], scores, -np.inf)
    B, N = scores.shape
    t = tile
    while t > 128 and N % t:
        t //= 2
    t = min(t, N)
    W = t // group
    nt = N // t
    g4 = scores.reshape(B, nt, group, W)
    vals = g4.max(axis=2).reshape(B, N // group)
    k_win = g4.argmax(axis=2)
    rows = (np.arange(nt)[None, :, None] * t + k_win * W
            + np.arange(W)[None, None, :]).reshape(B, N // group)
    return vals, rows


def test_xla_select_matches_oracle():
    q, vecs, cols, _ = make_segment()
    spec = make_filter_spec()
    vals, rows = dense_scan_select(q, vecs, cols, spec, group=64)
    ovals, orows = oracle_select(q, vecs, cols, 64)
    finite = np.isfinite(ovals)
    np.testing.assert_allclose(np.asarray(vals)[finite], ovals[finite],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), orows)


def test_pallas_interpret_matches_xla():
    q, vecs, cols, _ = make_segment()
    spec = make_filter_spec(include_folder_ids=[1, 2])
    v_x, r_x = dense_scan_select(q, vecs, cols, spec, group=64)
    v_p, r_p = dense_scan_select(q, vecs, cols, spec, group=64,
                                 use_pallas=True)
    ok = np.asarray(v_x) > VALID_THRESHOLD
    np.testing.assert_allclose(np.asarray(v_p)[ok], np.asarray(v_x)[ok],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(r_p)[ok], np.asarray(r_x)[ok])
    # Both agree on which groups are fully masked out.
    np.testing.assert_array_equal(np.asarray(v_p) > VALID_THRESHOLD, ok)


def test_filter_masks_whole_groups_invalid():
    q, vecs, cols, _ = make_segment(n=256)
    spec = make_filter_spec(include_folder_ids=[99])  # matches nothing
    vals, rows = dense_scan_select(q, vecs, cols, spec, group=32)
    assert (np.asarray(vals) <= VALID_THRESHOLD).all()
    tv, ti = topk_from_lists(vals, rows, 5)
    assert (np.asarray(ti) == -1).all()


def test_row_offset_and_int8():
    q, vecs, cols, rng = make_segment()
    spec = make_filter_spec()
    scale = np.abs(np.asarray(vecs)).max(axis=1, keepdims=True) / 127.0
    v8 = np.round(np.asarray(vecs) / scale).astype(np.int8)
    scales = jnp.asarray(scale.T.astype(np.float32))  # [1, N]
    vals, rows = dense_scan_select(q, jnp.asarray(v8), cols, spec,
                                   scales, group=64, row_offset=1024)
    ovals, orows = oracle_select(q, vecs, cols, 64)
    assert (np.asarray(rows) >= 1024).all()
    # int8 quantization: winner rows agree with f32 oracle on >90% of groups.
    agree = (np.asarray(rows) - 1024 == orows).mean()
    assert agree > 0.9, agree


def test_topk_from_lists_recall_vs_exact():
    q, vecs, cols, _ = make_segment(n=2048, d=32, seed=3)
    spec = make_filter_spec()
    vals, rows = dense_scan_select(q, vecs, cols, spec, group=8)
    tv, ti = topk_from_lists(vals, rows, 10)
    scores = np.asarray(q) @ np.asarray(vecs).T
    exact = np.argsort(-scores, axis=1)[:, :10]
    recall = np.mean([
        len(set(np.asarray(ti)[b]) & set(exact[b])) / 10
        for b in range(q.shape[0])])
    assert recall >= 0.8, recall  # group=8 on 2048 rows: rare collisions only


def test_fused_query_select_path_matches_full(monkeypatch, temp_root):
    """End-to-end: SearchService with the select path returns the same top
    hits as the full-score path on a small corpus with distinct topics."""
    from datetime import datetime, timezone

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_MODEL", "test-tiny")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    monkeypatch.setenv("VOITTA_FLAT_SELECT_MIN_ROWS", "1")
    monkeypatch.setenv("VOITTA_FLAT_SELECT_GROUP", "16")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.core_types import ChunkMetadata
    from voitta_rag_tpu.index.store import TpuVectorStore
    from voitta_rag_tpu.search.service import SearchService
    from voitta_rag_tpu.search.sparse_text import get_sparse_embedding_service
    from voitta_rag_tpu.services.embedding import EmbeddingService

    store = TpuVectorStore(dimension=64)
    embedder = EmbeddingService(model_name="test-tiny", model_path="",
                                max_seq_len=32)
    search = SearchService(store=store, embedder=embedder)
    try:
        docs = [
            ("a.md", "the quick brown fox jumps over the lazy dog"),
            ("b.md", "quantum entanglement drives the superconducting qubit"),
            ("c.md", "grilled cheese sandwiches pair with tomato soup"),
        ]
        texts = [t for _, t in docs]
        vecs = embedder.embed_texts_array(texts)
        metas = [ChunkMetadata(
            file_path=p, folder_path="", index_folder="", file_name=p,
            chunk_index=0, total_chunks=1, start_char=0, end_char=10,
            indexed_at=datetime.now(timezone.utc).isoformat())
            for p, _ in docs]
        store.store_chunks(
            texts, vecs, metas,
            get_sparse_embedding_service().embed(texts))

        r_sel = search.search("superconducting qubit entanglement", limit=3)
        assert r_sel, "select path returned nothing"
        assert r_sel[0].metadata.file_path == "b.md"

        # Force the full path and compare ranking.
        monkeypatch.setenv("VOITTA_FLAT_SELECT_GROUP", "0")
        get_settings.cache_clear()
        r_full = search.search("superconducting qubit entanglement", limit=3)
        assert ([c.metadata.file_path for c in r_sel]
                == [c.metadata.file_path for c in r_full])
    finally:
        store.close()
        get_settings.cache_clear()


def test_group_compatible_guard():
    from voitta_rag_tpu.ops.scan_select import group_compatible

    # Pallas needs lane-aligned output blocks on multi-tile segments.
    assert group_compatible(1 << 17, 16, use_pallas=True)
    assert not group_compatible(1 << 17, 32, use_pallas=True)   # block 64
    assert not group_compatible(1 << 17, 128, use_pallas=True)  # block 16
    assert group_compatible(1 << 17, 128, use_pallas=False)
    # Single-tile segments: any divisor of the tile works.
    assert group_compatible(1024, 128, use_pallas=True)
    assert not group_compatible(1024, 3000, use_pallas=True)
    assert not group_compatible(1024, 0, use_pallas=False)
