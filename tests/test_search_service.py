"""End-to-end SearchService: text in → ranked StoredChunks out (tiny encoder)."""

import numpy as np
import pytest

from voitta_rag_tpu.core_types import ChunkMetadata
from voitta_rag_tpu.index.store import TpuVectorStore
from voitta_rag_tpu.search.service import SearchService
from voitta_rag_tpu.search.sparse_text import get_sparse_embedding_service
from voitta_rag_tpu.services.embedding import EmbeddingService

from datetime import datetime, timezone


@pytest.fixture
def service(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_MODEL", "test-tiny")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    store = TpuVectorStore(dimension=64)
    embedder = EmbeddingService(model_name="test-tiny", model_path="",
                                max_seq_len=32)
    svc = SearchService(store=store, embedder=embedder)
    yield svc
    store.close()


DOCS = [
    ("pets/dogs.md", "dogs are loyal pets that love walks and bones"),
    ("pets/cats.md", "cats are independent pets that love naps and fish"),
    ("space/mars.md", "mars is the red planet with thin atmosphere"),
    ("space/moon.md", "the moon orbits earth and causes the tides"),
    ("cooking/pasta.md", "boil pasta in salted water until al dente"),
]


def index_docs(svc):
    sparse = get_sparse_embedding_service()
    texts = [t for _, t in DOCS]
    vecs = svc.embedder.embed_texts_array(texts)
    metas = []
    for path, _ in DOCS:
        folder = path.rsplit("/", 1)[0]
        metas.append(ChunkMetadata(
            file_path=path, folder_path=folder, index_folder=folder,
            file_name=path.rsplit("/", 1)[-1], chunk_index=0, total_chunks=1,
            start_char=0, end_char=10,
            indexed_at=datetime.now(timezone.utc).isoformat()))
    svc.store.store_chunks(texts, vecs, metas, sparse.embed(texts))


def test_exact_text_query_ranks_its_doc_first(service):
    index_docs(service)
    res = service.search("dogs are loyal pets that love walks and bones",
                         limit=3)
    assert res
    assert res[0].metadata.file_path == "pets/dogs.md"


def test_keyword_pull_with_high_sparse_weight(service):
    index_docs(service)
    res = service.search("al dente pasta salted", limit=3, sparse_weight=0.95)
    assert res[0].metadata.file_path == "cooking/pasta.md"


def test_folder_include_restricts_results(service):
    index_docs(service)
    res = service.search("pets", limit=5, include_folders=["space"])
    assert res
    assert all(r.metadata.folder_path == "space" for r in res)


def test_empty_store_returns_empty(service):
    assert service.search("anything") == []


def test_rrf_fusion_mode(service):
    index_docs(service)
    res = service.search("moon tides", limit=3, fusion="rrf")
    assert res
    assert res[0].score > 0


def test_dense_only_mode(service):
    index_docs(service)
    res = service.search("mars planet atmosphere", limit=2, hybrid=False)
    assert len(res) == 2


def test_search_with_ivf_snapshot_active(service):
    """The fused snapshot path with IVF active must work end-to-end (a
    signature drift here shipped broken in review: tests only covered the
    flat and postings paths)."""
    svc = service
    sparse = get_sparse_embedding_service()
    rng = np.random.default_rng(5)
    texts = [f"synthetic filler document number {i} about topic {i % 7}"
             for i in range(300)]
    vecs = rng.standard_normal((300, 64)).astype(np.float32)
    metas = [ChunkMetadata(
        file_path=f"bulk/f{i}.md", folder_path="bulk", index_folder="bulk",
        file_name=f"f{i}.md", chunk_index=0, total_chunks=1,
        start_char=0, end_char=10,
        indexed_at=datetime.now(timezone.utc).isoformat()) for i in range(300)]
    sv = sparse.embed(texts)
    svc.store.store_chunks(texts, vecs, metas, sv)
    svc.store.build_ivf(n_cells=4, nprobe=2)
    svc.store.build_postings()
    assert svc.store.ivf_active and svc.store.postings_active

    # Dense-only (IVF path) and hybrid (IVF + postings) both serve.
    hits = svc.search("synthetic filler document", limit=5, hybrid=False)
    assert hits
    hits = svc.search("synthetic filler document number 42", limit=5)
    assert hits


@pytest.fixture
def cold_service(temp_root, monkeypatch):
    """Service over a store whose first segments are cold (BQ-shadowed)."""
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "128")
    monkeypatch.setenv("VOITTA_DEVICE_ROWS_BUDGET", "256")
    monkeypatch.setenv("VOITTA_COLD_BQ", "1")
    monkeypatch.setenv("EMBEDDING_MODEL", "test-tiny")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    store = TpuVectorStore(dimension=64)
    embedder = EmbeddingService(model_name="test-tiny", model_path="",
                                max_seq_len=32)
    svc = SearchService(store=store, embedder=embedder)
    yield svc
    store.close()


def test_cold_store_routes_to_store_path(cold_service, monkeypatch):
    """With cold segments, the service must NOT capture host arrays in its
    fused jit paths (a silent full re-upload per query); it routes to the
    store path, which streams or BQ-serves cold segments."""
    svc = cold_service
    sparse = get_sparse_embedding_service()
    texts = [f"chunk number {i} about topic {i % 7} and theme {i % 3}"
             for i in range(520)]
    vecs = np.asarray(svc.embedder.embed_texts_array(texts))
    metas = [ChunkMetadata(
        file_path=f"kb/f{i % 40}.md", folder_path="kb", index_folder="kb",
        file_name=f"f{i % 40}.md", chunk_index=i // 40, total_chunks=13,
        start_char=0, end_char=10,
        indexed_at=datetime.now(timezone.utc).isoformat())
        for i in range(520)]
    svc.store.store_chunks(texts, vecs, metas, sparse.embed(texts))
    assert svc.store.cold_tier_active
    assert any(s.bq_packed is not None for s in svc.store.segments)

    calls = {"n": 0}
    orig = type(svc.store)._search_locked

    def counted(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(type(svc.store), "_search_locked", counted)
    res = svc.search("chunk number 3 about topic 3 and theme 0", limit=5)
    assert calls["n"] == 1, "cold store must route through _search_locked"
    assert res and res[0].text.startswith("chunk number")
    # hybrid + filters still work through the cold route
    res2 = svc.search("topic theme chunk", limit=5, include_folders=["kb"])
    assert res2


def test_ivf_select_approx_through_fused_path(temp_root, monkeypatch):
    """VOITTA_IVF_SELECT=approx plumbs through the fused snapshot program
    (service -> _ivf_search_candidates) and returns valid results."""
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_MODEL", "test-tiny")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    monkeypatch.setenv("VOITTA_IVF_SELECT", "approx")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    store = TpuVectorStore(dimension=64)
    embedder = EmbeddingService(model_name="test-tiny", model_path="",
                                max_seq_len=32)
    svc = SearchService(store=store, embedder=embedder)
    try:
        index_docs(svc)
        # IVF needs >=256 rows: pad with filler chunks
        sparse = get_sparse_embedding_service()
        texts = [f"filler chunk {i} about subject {i % 9}"
                 for i in range(300)]
        vecs = svc.embedder.embed_texts_array(texts)
        metas = [ChunkMetadata(
            file_path=f"fill/f{i}.md", folder_path="fill",
            index_folder="fill", file_name=f"f{i}.md", chunk_index=0,
            total_chunks=1, start_char=0, end_char=5,
            indexed_at=datetime.now(timezone.utc).isoformat())
            for i in range(300)]
        store.store_chunks(texts, vecs, metas, sparse.embed(texts))
        store.build_ivf(n_cells=2)
        store.build_postings()
        assert store.ivf_active and store._ivf_select == "approx"
        res = svc.search("dogs are loyal pets that love walks and bones",
                         limit=3)
        assert res and res[0].metadata.file_path == "pets/dogs.md"
    finally:
        store.close()


def test_select_policy_env_validation(monkeypatch):
    """Typo'd select values fall back to 'exact' (with a warning), never
    silently change semantics."""
    from voitta_rag_tpu.config import get_settings
    for raw, want in (("Approx", "approx"), ("aprox", "exact"),
                      ("EXACT", "exact"), ("", "exact")):
        monkeypatch.setenv("VOITTA_IVF_SELECT", raw)
        monkeypatch.setenv("VOITTA_BQ_SELECT", raw)
        get_settings.cache_clear()
        s = get_settings()
        assert s.ivf_select == want, (raw, s.ivf_select)
        assert s.bq_select == want
    get_settings.cache_clear()


def test_layout_env_validation(monkeypatch):
    """VOITTA_IVF_LAYOUT is an enumerated knob (_choice): unknown values
    warn and fall back to 'flat' rather than silently changing the
    serving path; case-insensitive."""
    from voitta_rag_tpu.config import get_settings
    for raw, want in (("flat", "flat"), ("PADDED", "padded"),
                      ("faltt", "flat"), ("", "flat")):
        monkeypatch.setenv("VOITTA_IVF_LAYOUT", raw)
        get_settings.cache_clear()
        assert get_settings().ivf_layout == want, (raw,)
    get_settings.cache_clear()


def test_fused_path_serves_both_ivf_layouts(service, monkeypatch):
    """The fused snapshot program dispatches per layout (flat -> windowed
    gather over variable-length lists, padded -> fixed cell blocks); both
    must serve dense and hybrid queries end-to-end with identical top hits
    at full probe."""
    from voitta_rag_tpu.config import get_settings

    svc = service
    sparse = get_sparse_embedding_service()
    rng = np.random.default_rng(11)
    texts = [f"corpus entry {i} theme {i % 5}" for i in range(300)]
    vecs = rng.standard_normal((300, 64)).astype(np.float32)
    metas = [ChunkMetadata(
        file_path=f"b2/f{i}.md", folder_path="b2", index_folder="b2",
        file_name=f"f{i}.md", chunk_index=0, total_chunks=1,
        start_char=0, end_char=10,
        indexed_at=datetime.now(timezone.utc).isoformat())
        for i in range(300)]
    svc.store.store_chunks(texts, vecs, metas, sparse.embed(texts))
    got = {}
    for layout in ("flat", "padded"):
        monkeypatch.setenv("VOITTA_IVF_LAYOUT", layout)
        get_settings.cache_clear()
        svc.store.build_ivf(n_cells=4, nprobe=4)
        svc.store.build_postings()
        dense = svc.search("corpus entry theme", limit=5, hybrid=False)
        hybrid = svc.search("corpus entry 42 theme", limit=5)
        assert dense and hybrid
        got[layout] = [r.id for r in dense]
    get_settings.cache_clear()
    # nprobe = n_cells: both layouts probe everything -> exact -> equal.
    assert got["flat"] == got["padded"]
