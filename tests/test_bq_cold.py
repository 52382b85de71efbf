"""Cold-tier BQ shadows (VOITTA_COLD_BQ): coarse 1-bit scan + exact rescore.

Contract: cold segments keep a device bit sketch + host postings; searches
return *exact* scores for every result (rescored against host rows), and
recall vs the fully-resident store stays high (oversampling-bounded BQ
recall). See index/bq_serve.py."""

from datetime import datetime, timezone

import numpy as np

from voitta_rag_tpu.core_types import ChunkMetadata
from voitta_rag_tpu.index.store import TpuVectorStore
from voitta_rag_tpu.search.sparse_text import SparseEmbeddingService

DIM = 64
CAP = 256
N = 1100  # 5 segments of 256; budget 2*CAP forces >=2 cold


def meta(file_path="docs/a.md", folder="docs"):
    return ChunkMetadata(
        file_path=file_path, folder_path=folder, index_folder=folder,
        file_name=file_path.rsplit("/", 1)[-1], chunk_index=0,
        total_chunks=1, start_char=0, end_char=10,
        indexed_at=datetime.now(timezone.utc).isoformat())


def clustered_vecs(n, seed=0, n_clusters=16):
    """Clustered unit vectors: BQ recall is meaningless on pure noise."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32)
    cid = rng.integers(0, n_clusters, n)
    v = centers[cid] + 0.5 * rng.standard_normal((n, DIM)).astype(np.float32)
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def make_corpus():
    vecs = clustered_vecs(N, seed=3)
    texts = [f"chunk {i} about topic {i % 37} and subject {i % 11}"
             for i in range(N)]
    metas = [meta(file_path=f"docs/f{i % 50}.md",
                  folder="docs" if i % 2 == 0 else "notes")
             for i in range(N)]
    sparse = SparseEmbeddingService(avg_len=8.0).embed(texts)
    return vecs, texts, metas, sparse


def build_store(temp_root, monkeypatch, budget, subdir, bq=True):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", str(CAP))
    monkeypatch.setenv("EMBEDDING_DIMENSION", str(DIM))
    monkeypatch.setenv("VOITTA_DEVICE_ROWS_BUDGET", str(budget))
    monkeypatch.setenv("VOITTA_COLD_BQ", "1" if bq else "0")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    return TpuVectorStore(index_dir=temp_root / subdir)


def _recall(got_rows, want_rows, k):
    got = {r.text for r in got_rows[:k]}
    want = {r.text for r in want_rows[:k]}
    return len(got & want) / max(len(want), 1)


def test_bq_shadow_built_and_serves_with_exact_scores(temp_root, monkeypatch):
    vecs, texts, metas, sparse = make_corpus()
    hot = build_store(temp_root, monkeypatch, 0, "hot", bq=False)
    cold = build_store(temp_root, monkeypatch, 2 * CAP, "cold", bq=True)
    try:
        hot.store_chunks(texts, vecs, metas, sparse)
        cold.store_chunks(texts, vecs, metas, sparse)
        assert cold.cold_tier_active
        shadows = [s for s in cold.segments if s.bq_packed is not None]
        assert shadows, "no BQ shadow was built on offload"
        for s in shadows:
            assert not s.resident
            w = DIM // 8  # plane_width(64) = 8, times bq_bits planes
            assert s.bq_packed.shape == (CAP, s.bq_bits * w)
            assert s.host_postings is not None

        recalls = []
        for qi in (3, 123, 500, 777, 1000):
            a = hot.search(vecs[qi], limit=10)
            b = cold.search(vecs[qi], limit=10)
            recalls.append(_recall(b, a, 10))
            # every returned score is the EXACT cosine, not a coarse value
            exact = {t: float(vecs[qi] @ vecs[j]) for j, t in
                     enumerate(texts)}
            for r in b:
                np.testing.assert_allclose(r.score, exact[r.text],
                                           rtol=2e-2, atol=2e-2)
        assert np.mean(recalls) >= 0.9, recalls
    finally:
        hot.close()
        cold.close()


def test_bq_hybrid_and_filters(temp_root, monkeypatch):
    vecs, texts, metas, sparse = make_corpus()
    hot = build_store(temp_root, monkeypatch, 0, "hot2", bq=False)
    cold = build_store(temp_root, monkeypatch, 2 * CAP, "cold2", bq=True)
    try:
        hot.store_chunks(texts, vecs, metas, sparse)
        cold.store_chunks(texts, vecs, metas, sparse)
        sq = SparseEmbeddingService().embed_query("chunk 123 topic subject")

        a = hot.search(vecs[123], limit=10, sparse_query=sq,
                       sparse_weight=0.3)
        b = cold.search(vecs[123], limit=10, sparse_query=sq,
                        sparse_weight=0.3)
        assert _recall(b, a, 10) >= 0.8
        assert b[0].text == a[0].text  # top hit agrees (it's its own query)

        # folder include filter respected on cold-BQ segments
        only = cold.search(vecs[200], limit=20, include_folders=["notes"])
        assert only and all(r.metadata.folder_path == "notes" for r in only)
        got_docs = cold.search(vecs[200], limit=20, include_folders=["docs"])
        assert got_docs and all(r.metadata.folder_path == "docs" for r in got_docs)
    finally:
        hot.close()
        cold.close()


def test_bq_cold_deletes_respected(temp_root, monkeypatch):
    vecs, texts, metas, sparse = make_corpus()
    cold = build_store(temp_root, monkeypatch, 2 * CAP, "cold3", bq=True)
    try:
        cold.store_chunks(texts, vecs, metas, sparse)
        assert cold.cold_tier_active
        # delete a file whose chunks live in the first (cold) segment
        victim = cold.search(vecs[5], limit=1)[0]
        n = cold.delete_by_file(victim.metadata.file_path)
        assert n > 0
        after = cold.search(vecs[5], limit=20)
        assert all(r.metadata.file_path != victim.metadata.file_path for r in after)
    finally:
        cold.close()


def test_eval_mask_host_matches_device():
    import jax.numpy as jnp

    from voitta_rag_tpu.ops.filters import (NUM_COLS, COL_CREATED,
                                            COL_FOLDER, COL_INDEX_FOLDER,
                                            COL_MODIFIED, COL_VALID,
                                            MISSING_TS, eval_mask_host,
                                            eval_mask_spec, make_filter_spec)

    rng = np.random.default_rng(7)
    n = 512
    cols = np.zeros((NUM_COLS, n), np.int32)
    cols[COL_VALID] = rng.integers(0, 2, n)
    cols[COL_FOLDER] = rng.integers(0, 6, n)
    cols[COL_INDEX_FOLDER] = rng.integers(0, 4, n)
    cols[COL_CREATED] = rng.integers(100, 1000, n)
    cols[COL_MODIFIED] = rng.integers(100, 1000, n)
    cols[COL_MODIFIED, ::17] = MISSING_TS

    specs = [
        make_filter_spec(),
        make_filter_spec(include_folder_ids=[1, 3]),
        make_filter_spec(exclude_folder_ids=[2], exclude_index_folder_ids=[0]),
        make_filter_spec(date_start=300, date_end=700),
        make_filter_spec(include_folder_ids=[0, 5], date_start=200,
                         date_end=900, date_field="created"),
    ]
    for spec in specs:
        dev = np.asarray(eval_mask_spec(spec, jnp.asarray(cols)))
        host = eval_mask_host(spec, cols)
        np.testing.assert_array_equal(dev, host)


def test_host_postings_match_sparse_scan():
    import jax.numpy as jnp

    from voitta_rag_tpu.index.host_postings import HostPostings
    from voitta_rag_tpu.ops.filters import NUM_COLS, COL_VALID, make_filter_spec
    from voitta_rag_tpu.ops.sparse_scan import TERM_PAD, sparse_scan_scores

    rng = np.random.default_rng(9)
    s_slots, cap, vocab = 8, 256, 50
    terms = rng.integers(0, vocab, (s_slots, cap)).astype(np.int32)
    terms[rng.random((s_slots, cap)) < 0.3] = TERM_PAD
    weights = rng.random((s_slots, cap)).astype(np.float32)
    weights[terms == TERM_PAD] = 0.0

    qt = np.array([[3, 17, 42, TERM_PAD]], np.int32)
    qw = np.array([[0.5, 1.0, 0.25, 0.0]], np.float32)

    cols = np.zeros((NUM_COLS, cap), np.int32)
    cols[COL_VALID] = 1
    spec = make_filter_spec()
    want = np.asarray(sparse_scan_scores(
        jnp.asarray(qt), jnp.asarray(qw), jnp.asarray(terms),
        jnp.asarray(weights), jnp.asarray(cols), spec))[0]

    hp = HostPostings(terms, weights)
    got = hp.scores(qt, qw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bq_compaction_rebuilds_shadows(temp_root, monkeypatch):
    """Compaction over a cold-BQ store: ensure_resident drops the shadows,
    the rebuilt segments re-offload past the budget, and searches stay
    correct across the generation bump."""
    vecs, texts, metas, sparse = make_corpus()
    cold = build_store(temp_root, monkeypatch, 2 * CAP, "cold4", bq=True)
    try:
        cold.store_chunks(texts, vecs, metas, sparse)
        assert any(s.bq_packed is not None for s in cold.segments)
        # delete 10 of the 50 distinct files (paths cycle mod 50):
        # enough waste for a real compaction, while leaving >3*CAP live
        # rows so the REBUILD itself crosses the device budget and takes
        # compaction's mid-rebuild offload branch (which must also build
        # BQ shadows — regression for a found bug where it offloaded
        # without them and silently degraded to streaming).
        victims = {f"docs/f{i}.md" for i in range(10)}
        for fp in sorted(victims):
            cold.delete_by_file(fp)
        stats = cold.compact(min_waste_fraction=0.1)
        assert stats.get("segments_dropped", 0) >= 1 or stats.get(
            "rows_moved", 0) > 0, stats
        # after compaction + re-offload, cold segments must carry shadows
        for s in cold.segments:
            if not s.resident:
                assert s.bq_packed is not None
                assert s.host_postings is not None
        # survivors are searchable; victims are gone (chunk 30 lives in
        # docs/f30.md, a survivor)
        hits = cold.search(vecs[30], limit=10)
        assert hits and all(
            r.metadata.file_path not in victims for r in hits)
    finally:
        cold.close()


def test_bq_shadows_rebuilt_after_reload(temp_root, monkeypatch):
    """save() -> close() -> reopen: budget enforcement on load re-offloads
    filled segments WITH shadows (bq_packed/host_postings), and searches
    keep working against the reloaded cold tier."""
    vecs, texts, metas, sparse = make_corpus()
    cold = build_store(temp_root, monkeypatch, 2 * CAP, "cold5", bq=True)
    try:
        cold.store_chunks(texts, vecs, metas, sparse)
        before = cold.search(vecs[123], limit=5)
        cold.save()
    finally:
        cold.close()

    reopened = build_store(temp_root, monkeypatch, 2 * CAP, "cold5", bq=True)
    try:
        assert reopened.count() == N
        info = reopened.get_collection_info()
        assert info["cold_segments"] >= 1
        assert info["bq_shadowed_segments"] >= 1, info
        after = reopened.search(vecs[123], limit=5)
        assert [r.text for r in after] == [r.text for r in before]
    finally:
        reopened.close()
