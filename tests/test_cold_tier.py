"""Beyond-HBM cold tier: segments past VOITTA_DEVICE_ROWS_BUDGET offload
to host RAM and are served by streaming scans with exact parity vs the
fully-resident path (the Qdrant-mmap analogue — reference layer 0)."""

from datetime import datetime, timezone

import numpy as np
import pytest

from voitta_rag_tpu.core_types import ChunkMetadata, SparseVector
from voitta_rag_tpu.index.store import TpuVectorStore
from voitta_rag_tpu.search.sparse_text import SparseEmbeddingService

DIM = 32
CAP = 256
N = 1100  # > 4 segments of 256


def meta(file_path="docs/a.md", folder="docs"):
    return ChunkMetadata(
        file_path=file_path, folder_path=folder, index_folder=folder,
        file_name=file_path.rsplit("/", 1)[-1], chunk_index=0,
        total_chunks=1, start_char=0, end_char=10,
        indexed_at=datetime.now(timezone.utc).isoformat())


def rand_vecs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, DIM)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def make_corpus():
    vecs = rand_vecs(N, seed=3)
    texts = [f"chunk {i} about topic {i % 37} and subject {i % 11}"
             for i in range(N)]
    metas = [meta(file_path=f"docs/f{i % 50}.md") for i in range(N)]
    sparse = SparseEmbeddingService(avg_len=8.0).embed(texts)
    return vecs, texts, metas, sparse


def build_store(temp_root, monkeypatch, budget, subdir):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", str(CAP))
    monkeypatch.setenv("EMBEDDING_DIMENSION", str(DIM))
    monkeypatch.setenv("VOITTA_DEVICE_ROWS_BUDGET", str(budget))
    monkeypatch.setenv("VOITTA_STREAM_BLOCK_ROWS", "128")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    return TpuVectorStore(index_dir=temp_root / subdir)


def results_key(rows):
    return [(r.text, round(r.score, 5)) for r in rows]


def test_offload_happens_and_search_is_exact(temp_root, monkeypatch):
    vecs, texts, metas, sparse = make_corpus()
    hot = build_store(temp_root, monkeypatch, 0, "hot")
    cold = build_store(temp_root, monkeypatch, 2 * CAP, "cold")
    try:
        hot.store_chunks(texts, vecs, metas, sparse)
        cold.store_chunks(texts, vecs, metas, sparse)
        info = cold.get_collection_info()
        assert info["cold_segments"] >= 2, info
        assert cold.cold_tier_active and not hot.cold_tier_active
        assert cold.count() == hot.count() == N

        q = vecs[123]
        sq = SparseEmbeddingService().embed_query(
            "chunk 123 topic subject")
        for kwargs in (
            dict(limit=10),
            dict(limit=10, sparse_query=sq, sparse_weight=0.3),
            dict(limit=10, sparse_query=sq, fusion="rrf"),
            dict(limit=25, include_folders=["docs"]),
        ):
            a = hot.search(q, **kwargs)
            b = cold.search(q, **kwargs)
            assert results_key(a) == results_key(b), kwargs
        assert cold.search(q, limit=3)[0].text.startswith("chunk 123 ")
    finally:
        hot.close()
        cold.close()


def test_deletes_apply_to_cold_segments(temp_root, monkeypatch):
    vecs, texts, metas, sparse = make_corpus()
    st = build_store(temp_root, monkeypatch, 2 * CAP, "del")
    try:
        st.store_chunks(texts, vecs, metas, sparse)
        assert st.cold_tier_active
        # f0 chunks live in the earliest (now cold) segment among others.
        n = st.delete_by_file("docs/f0.md")
        assert n == len([m for m in metas if m.file_path == "docs/f0.md"])
        res = st.search(vecs[0], limit=50)
        assert all(r.metadata.file_path != "docs/f0.md" for r in res)
        assert st.count() == N - n
    finally:
        st.close()


def test_snapshots_rejected_but_compact_works(temp_root, monkeypatch):
    vecs, texts, metas, sparse = make_corpus()
    st = build_store(temp_root, monkeypatch, 2 * CAP, "snap")
    try:
        st.store_chunks(texts, vecs, metas, sparse)
        with pytest.raises(ValueError, match="streaming"):
            st.build_ivf(n_cells=4)
        with pytest.raises(ValueError, match="streaming"):
            st.build_postings()
        st.delete_by_file("docs/f1.md")
        st.delete_by_file("docs/f2.md")
        out = st.compact(min_waste_fraction=0.01)
        assert out["compacted"], out
        # Budget still enforced after the rebuild.
        assert st.get_collection_info()["cold_segments"] >= 1
        res = st.search(vecs[123], limit=5)
        assert res[0].text.startswith("chunk 123 ")
    finally:
        st.close()


def test_cold_tier_save_restore_roundtrip(temp_root, monkeypatch):
    vecs, texts, metas, sparse = make_corpus()
    st = build_store(temp_root, monkeypatch, 2 * CAP, "rt")
    try:
        st.store_chunks(texts, vecs, metas, sparse)
        assert st.cold_tier_active
        st.save()
    finally:
        st.close()
    st2 = build_store(temp_root, monkeypatch, 2 * CAP, "rt")
    try:
        assert st2.count() == N
        # Budget re-applied on load.
        assert st2.get_collection_info()["cold_segments"] >= 2
        assert st2.search(vecs[7], limit=1)[0].text.startswith("chunk 7 ")
    finally:
        st2.close()
