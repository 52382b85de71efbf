"""TpuVectorStore end-to-end: upsert, search, filters, deletes, persistence.

Oracle: exact NumPy cosine + the reference fusion semantics.
"""

from datetime import datetime, timezone

import numpy as np
import pytest

from voitta_rag_tpu.core_types import ChunkMetadata, SparseVector
from voitta_rag_tpu.index.store import TpuVectorStore
from voitta_rag_tpu.search.sparse_text import SparseEmbeddingService

DIM = 32


def meta(file_path="docs/a.md", folder="docs", index_folder="docs",
         chunk_index=0, total=1, created=None, modified=None, url=None):
    return ChunkMetadata(
        file_path=file_path, folder_path=folder, index_folder=index_folder,
        file_name=file_path.rsplit("/", 1)[-1], chunk_index=chunk_index,
        total_chunks=total, start_char=0, end_char=10,
        indexed_at=datetime.now(timezone.utc).isoformat(),
        source_created_at=created, source_modified_at=modified,
        source_url=url,
    )


@pytest.fixture
def store(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", str(DIM))
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    s = TpuVectorStore()
    yield s
    s.close()


def rand_vecs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, DIM)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_store_and_dense_search(store):
    vecs = rand_vecs(20)
    metas = [meta(file_path=f"docs/f{i}.md", chunk_index=0) for i in range(20)]
    ids = store.store_chunks([f"text {i}" for i in range(20)], vecs, metas)
    assert len(ids) == 20
    assert store.count() == 20

    res = store.search(vecs[7], limit=3)
    assert res[0].text == "text 7"
    assert res[0].score > 0.99
    assert res[0].metadata.file_path == "docs/f7.md"
    # Results ordered by score desc and match the NumPy oracle.
    oracle = np.argsort(-(vecs @ vecs[7]))[:3]
    assert [r.text for r in res] == [f"text {i}" for i in oracle]


def test_folder_filters(store):
    vecs = rand_vecs(30, seed=1)
    metas = [meta(file_path=f"{fold}/f{i}.md", folder=fold, index_folder=fold)
             for i, fold in enumerate(["a", "b", "c"] * 10)]
    store.store_chunks([f"t{i}" for i in range(30)], vecs, metas)

    res = store.search(vecs[0], limit=30, include_folders=["a"])
    assert len(res) == 10
    assert all(r.metadata.folder_path == "a" for r in res)

    res = store.search(vecs[0], limit=30, exclude_folders=["a", "b"])
    assert len(res) == 10
    assert all(r.metadata.folder_path == "c" for r in res)

    res = store.search(vecs[0], limit=30, exclude_index_folders=["c"])
    assert len(res) == 20

    # Unknown include folder → no possible match → [] (reference: filter
    # matches nothing).
    assert store.search(vecs[0], limit=5, include_folders=["nope"]) == []


def test_time_range_filters(store):
    vecs = rand_vecs(10, seed=2)
    metas = [meta(file_path=f"d/f{i}.md", folder="d", index_folder="d",
                  modified=1000 + i * 100, created=500 + i * 10)
             for i in range(10)]
    store.store_chunks([f"t{i}" for i in range(10)], vecs, metas)

    res = store.search(vecs[0], limit=10, date_start=1200, date_end=1500)
    got = {r.metadata.source_modified_at for r in res}
    assert got == {1200, 1300, 1400, 1500}

    res = store.search(vecs[0], limit=10, date_start=530, date_end=560,
                       date_field="created")
    assert {r.metadata.source_created_at for r in res} == {530, 540, 550, 560}


def test_hybrid_search_prefers_keyword_match(store):
    sparse_svc = SparseEmbeddingService()
    texts = ["the kangaroo hops across the outback"] + [
        f"generic filler document number {i}" for i in range(19)]
    vecs = rand_vecs(20, seed=3)
    metas = [meta(file_path=f"d/f{i}.md", folder="d", index_folder="d")
             for i in range(20)]
    store.store_chunks(texts, vecs, metas, sparse_svc.embed(texts))

    # Query dense-similar to doc 5 but keyword "kangaroo": with high sparse
    # weight the kangaroo doc must win.
    res = store.search(vecs[5], limit=5,
                       sparse_query=sparse_svc.embed_query("kangaroo outback"),
                       sparse_weight=0.9)
    assert res[0].text.startswith("the kangaroo")
    # With sparse_weight 0 (pure dense), doc 5 wins.
    res = store.search(vecs[5], limit=5,
                       sparse_query=sparse_svc.embed_query("kangaroo outback"),
                       sparse_weight=0.0)
    assert res[0].text == texts[5]


def test_delete_by_file_and_reuse(store):
    vecs = rand_vecs(10, seed=4)
    metas = [meta(file_path=f"d/f{i % 2}.md", folder="d", index_folder="d",
                  chunk_index=i // 2) for i in range(10)]
    store.store_chunks([f"t{i}" for i in range(10)], vecs, metas)
    assert store.count_chunks_for_file("d/f0.md") == 5

    n = store.delete_by_file("d/f0.md")
    assert n == 5
    assert store.count() == 5
    assert store.count_chunks_for_file("d/f0.md") == 0
    res = store.search(vecs[0], limit=10)
    assert len(res) == 5
    assert all(r.metadata.file_path == "d/f1.md" for r in res)

    # Freed rows are reused by the next upsert.
    seg = store.segments[0]
    before_next = seg._next
    store.store_chunks(["new"], rand_vecs(1, seed=9),
                       [meta(file_path="d/f2.md", folder="d", index_folder="d")])
    assert seg._next == before_next  # came from the free list


def test_delete_by_folder_subtree(store):
    vecs = rand_vecs(6, seed=5)
    folders = ["x", "x/sub", "y", "x", "x/sub/deep", "y"]
    metas = [meta(file_path=f"{f}/f{i}.md", folder=f, index_folder="x")
             for i, f in enumerate(folders)]
    store.store_chunks([f"t{i}" for i in range(6)], vecs, metas)
    n = store.delete_by_folder("x")
    assert n == 4  # x, x/sub, x/sub/deep — but not y
    assert store.count() == 2


def test_chunk_range_and_source_url(store):
    vecs = rand_vecs(5, seed=6)
    metas = [meta(file_path="d/doc.md", folder="d", index_folder="d",
                  chunk_index=i, total=5, url="https://docs.google.com/document/d/abc")
             for i in range(5)]
    store.store_chunks([f"chunk {i}" for i in range(5)], vecs, metas)
    rng = store.get_chunk_range("d/doc.md", 1, 3)
    assert [c.metadata.chunk_index for c in rng] == [1, 2, 3]
    hits = store.find_by_source_url("https://docs.google.com/document/d/abc")
    assert len(hits) == 5


def test_segment_overflow(store):
    # capacity 1024 → 1500 chunks must span 2 segments.
    vecs = rand_vecs(1500, seed=7)
    metas = [meta(file_path=f"d/f{i}.md", folder="d", index_folder="d")
             for i in range(1500)]
    store.store_chunks([f"t{i}" for i in range(1500)], vecs, metas)
    assert len(store.segments) == 2
    res = store.search(vecs[1400], limit=1)
    assert res[0].text == "t1400"


def test_persistence_roundtrip(store, temp_root):
    vecs = rand_vecs(8, seed=8)
    metas = [meta(file_path=f"d/f{i}.md", folder="d", index_folder="d")
             for i in range(8)]
    store.store_chunks([f"t{i}" for i in range(8)], vecs, metas)
    store.save()
    store.close()

    s2 = TpuVectorStore()
    assert s2.count() == 8
    res = s2.search(vecs[3], limit=1)
    assert res[0].text == "t3"
    s2.close()


def test_collection_info(store):
    info = store.get_collection_info()
    assert info["points_count"] == 0
    assert info["status"] == "green"


def make_corpus_chunks(store, n, tag, rng):
    import numpy as np
    from datetime import datetime, timezone

    from voitta_rag_tpu.core_types import ChunkMetadata

    vecs = rng.standard_normal((n, store.dimension)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    metas = [ChunkMetadata(
        file_path=f"{tag}/{i}.md", folder_path=tag, index_folder=tag,
        file_name=f"{i}.md", chunk_index=0, total_chunks=1, start_char=0,
        end_char=1, indexed_at=datetime.now(timezone.utc).isoformat())
        for i in range(n)]
    store.store_chunks([f"{tag} {i}" for i in range(n)], vecs, metas)
    return vecs


def test_compaction_merges_segments_and_remaps_gids(temp_root, monkeypatch):
    """Delete-heavy histories leave tombstone-sparse segments; compact()
    left-packs live rows, remaps payload gids, drops empty tails, and
    search still resolves the right payloads (SURVEY §7 hard part)."""
    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    rng = np.random.default_rng(0)
    try:
        make_corpus_chunks(store, 1024, "a", rng)
        make_corpus_chunks(store, 1024, "b", rng)
        keep_vecs = make_corpus_chunks(store, 100, "c", rng)
        assert len(store.segments) == 3
        # Delete 2048 of 2148 rows.
        store.delete_by_folder("a")
        store.delete_by_folder("b")
        assert store.count() == 100

        info = store.compact()
        assert info["compacted"] and info["segments"] == 1
        assert info["segments_dropped"] == 2
        assert len(store.segments) == 1
        assert store.count() == 100

        # Payload remap: every survivor still resolves to ITS text.
        for i in (0, 37, 99):
            hits = store.search(keep_vecs[i], limit=1)
            assert hits and hits[0].metadata.file_path == f"c/{i}.md", i

        # Stale high-index spills removed; restart loads the compacted set.
        index_dir = store.index_dir
        files = sorted(f.name for f in index_dir.glob("segment_*.npz"))
        assert files == ["segment_0000.npz"]
        store.close()
        store = TpuVectorStore(dimension=64)
        assert len(store.segments) == 1 and store.count() == 100
        hits = store.search(keep_vecs[42], limit=1)
        assert hits[0].metadata.file_path == "c/42.md"

        # Below-threshold call is a no-op.
        info = store.compact()
        assert not info["compacted"]
    finally:
        store.close()
        get_settings.cache_clear()


def test_compaction_with_int8_segments(temp_root, monkeypatch):
    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_SEGMENT_DTYPE", "int8")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    rng = np.random.default_rng(1)
    try:
        make_corpus_chunks(store, 1024, "x", rng)
        keep = make_corpus_chunks(store, 50, "y", rng)
        store.delete_by_folder("x")
        info = store.compact()
        assert info["compacted"] and len(store.segments) == 1
        hits = store.search(keep[7], limit=1)
        assert hits[0].metadata.file_path == "y/7.md"
    finally:
        store.close()
        get_settings.cache_clear()


def test_compaction_crash_recovery_roll_forward(temp_root, monkeypatch):
    """Crash AFTER the payload remap committed (stamp == journal gen):
    recovery promotes the temp spills to match the new numbering."""
    import json
    import shutil

    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    rng = np.random.default_rng(2)
    keep = make_corpus_chunks(store, 100, "k", rng)
    store.save()
    index_dir = store.index_dir
    # Simulate the mid-compaction state: temp spill written, journal
    # written, remap committed (here: identity remap, stamp bumped), crash
    # before the rename. The OLD final is replaced by garbage to prove the
    # temp (not the old final) is what recovery must promote.
    shutil.copy(index_dir / "segment_0000.npz",
                index_dir / "compact_0000.tmp.npz")
    (index_dir / "compaction.journal").write_text(
        json.dumps({"generation": 7, "segments": 1}))
    store.payloads.remap_gids({}, generation=7)
    (index_dir / "segment_0000.npz").write_bytes(b"pre-compaction garbage")
    (index_dir / "segment_0001.npz").write_bytes(b"stale extra")
    store.close()

    store = TpuVectorStore(dimension=64)
    try:
        assert store.generation == 7
        assert len(store.segments) == 1
        assert not (index_dir / "compaction.journal").exists()
        assert not (index_dir / "segment_0001.npz").exists()
        hits = store.search(keep[5], limit=1)
        assert hits and hits[0].metadata.file_path == "k/5.md"
    finally:
        store.close()
        get_settings.cache_clear()


def test_compaction_crash_recovery_roll_back(temp_root, monkeypatch):
    """Crash BEFORE the remap committed (stamp != journal gen): recovery
    discards the temps and keeps the old spills."""
    import json

    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    rng = np.random.default_rng(3)
    keep = make_corpus_chunks(store, 50, "m", rng)
    store.save()
    index_dir = store.index_dir
    (index_dir / "compact_0000.tmp.npz").write_bytes(b"half-written temp")
    (index_dir / "compaction.journal").write_text(
        json.dumps({"generation": 9, "segments": 1}))
    store.close()

    store = TpuVectorStore(dimension=64)
    try:
        assert store.generation == 0  # remap never committed
        assert not list(index_dir.glob("compact_*.tmp.npz"))
        assert not (index_dir / "compaction.journal").exists()
        hits = store.search(keep[11], limit=1)
        assert hits and hits[0].metadata.file_path == "m/11.md"
    finally:
        store.close()
        get_settings.cache_clear()


def test_materialize_generation_guard(temp_root, monkeypatch):
    """A search whose gids predate a compaction returns [] instead of the
    wrong payloads (gid REUSE is the dangerous case; plain deletes skip
    defensively)."""
    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    rng = np.random.default_rng(4)
    try:
        make_corpus_chunks(store, 10, "g", rng)
        out = store._materialize(np.asarray([1.0]), np.asarray([0]),
                                 expected_generation=store.generation - 1)
        assert out == []
        out = store._materialize(np.asarray([1.0]), np.asarray([0]),
                                 expected_generation=store.generation)
        assert len(out) == 1
    finally:
        store.close()
        get_settings.cache_clear()


def test_compaction_above_write_bucket_limit(temp_root, monkeypatch):
    """Compaction batches its writes: stores with more live rows than the
    largest scatter bucket (4096) must compact without error."""
    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "16384")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "16")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=16)
    rng = np.random.default_rng(5)
    try:
        make_corpus_chunks(store, 9000, "big", rng)
        keep = make_corpus_chunks(store, 200, "keep", rng)
        # Push allocation into a second segment, then free most of it.
        make_corpus_chunks(store, 9000, "big2", rng)
        store.delete_by_folder("big2")
        info = store.compact()
        assert info["compacted"], info
        assert store.count() == 9200
        hits = store.search(keep[123], limit=1)
        assert hits and hits[0].metadata.file_path == "keep/123.md"
    finally:
        store.close()
        get_settings.cache_clear()


def test_capacity_change_on_reload_adopts_spill_capacity(temp_root, monkeypatch):
    """Spills written at one VOITTA_SEGMENT_CAPACITY must keep their gid
    numbering when the env changes: the store adopts the spilled capacity
    (silently renumbering would orphan every payload and empty searches)."""
    from voitta_rag_tpu.config import get_settings

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "256")
    monkeypatch.setenv("EMBEDDING_DIMENSION", str(DIM))
    get_settings.cache_clear()
    vecs = rand_vecs(300, seed=9)
    metas = [meta(file_path=f"docs/f{i}.md") for i in range(300)]
    st = TpuVectorStore(index_dir=temp_root / "capchange")
    st.store_chunks([f"text {i}" for i in range(300)], vecs, metas)
    st.save()
    st.close()

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "2048")
    get_settings.cache_clear()
    st2 = TpuVectorStore(index_dir=temp_root / "capchange")
    try:
        assert st2.count() == 300
        res = st2.search(vecs[42], limit=3)
        assert res and res[0].text == "text 42"
        assert st2.segment_capacity == 256  # adopted from the spill
        # New writes keep the consistent numbering.
        st2.store_chunks(["text 300"], rand_vecs(1, seed=10),
                         [meta(file_path="docs/f300.md")])
        assert st2.search(vecs[42], limit=3)[0].text == "text 42"
    finally:
        st2.close()


def test_compaction_window_mutations(temp_root, monkeypatch):
    """Seal-based compaction: the rebuild runs OUTSIDE the store lock, so
    upserts and deletes land mid-compaction. Deletes journal into
    _compact_deleted and re-apply to the rebuilt rows at commit; upserts
    land in fresh (unsealed) segments that slide down after the rebuilt
    ones with their gids remapped."""
    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    rng = np.random.default_rng(7)
    w_vecs = {}
    try:
        make_corpus_chunks(store, 1024, "a", rng)
        make_corpus_chunks(store, 1024, "b", rng)
        keep_vecs = make_corpus_chunks(store, 50, "c", rng)
        d_vecs = make_corpus_chunks(store, 50, "d", rng)
        store.delete_by_folder("a")
        store.delete_by_folder("b")
        assert store.count() == 100

        real_savez = np.savez_compressed
        fired = []

        def savez_with_window_mutations(*args, **kwargs):
            # First temp spill == we are inside the unlocked phase 2 of
            # compact(): mutate the store like a concurrent writer would.
            if not fired:
                fired.append(True)
                assert store.delete_by_folder("d") == 50
                w_vecs["w"] = make_corpus_chunks(store, 30, "w", rng)
            return real_savez(*args, **kwargs)

        monkeypatch.setattr(np, "savez_compressed",
                            savez_with_window_mutations)
        info = store.compact()
        monkeypatch.setattr(np, "savez_compressed", real_savez)

        assert info["compacted"]
        assert info["window_deletes"] == 50
        assert info["window_segments"] == 1
        assert store.count() == 80  # 100 - 50 deleted + 30 inserted
        assert len(store.segments) == 2  # rebuilt + appended

        # Survivors resolve their own payloads through the remap.
        for i in (0, 23, 49):
            hits = store.search(keep_vecs[i], limit=1)
            assert hits and hits[0].metadata.file_path == f"c/{i}.md", i
        # Window-deleted rows are gone even though the rebuild had
        # snapshotted them as live.
        for i in (0, 25, 49):
            hits = store.search(d_vecs[i], limit=1)
            assert not hits or not hits[0].metadata.file_path.startswith("d/")
        # Window-inserted rows searchable with correct payloads after the
        # appended segment's gid shift.
        for i in (0, 15, 29):
            hits = store.search(w_vecs["w"][i], limit=1)
            assert hits and hits[0].metadata.file_path == f"w/{i}.md", i

        # Window mutations flush on save; a reload serves the same state.
        assert store._unsaved_mutations > 0
        store.save()
        store.close()
        store = TpuVectorStore(dimension=64)
        assert store.count() == 80
        assert store.search(keep_vecs[23], limit=1)[0].metadata.file_path \
            == "c/23.md"
        assert store.search(w_vecs["w"][15], limit=1)[0].metadata.file_path \
            == "w/15.md"
        hits = store.search(d_vecs[25], limit=1)
        assert not hits or not hits[0].metadata.file_path.startswith("d/")
    finally:
        store.close()
        get_settings.cache_clear()


def test_compaction_failure_unseals(temp_root, monkeypatch):
    """A phase-2 failure (temp spill I/O error) must unseal the snapshotted
    segments and disarm the delete journal so the store keeps serving and
    a retry works."""
    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    rng = np.random.default_rng(8)
    try:
        make_corpus_chunks(store, 1024, "a", rng)
        keep_vecs = make_corpus_chunks(store, 40, "c", rng)
        store.delete_by_folder("a")

        real_savez = np.savez_compressed

        def boom(*args, **kwargs):
            raise OSError("disk full")

        monkeypatch.setattr(np, "savez_compressed", boom)
        with pytest.raises(OSError):
            store.compact()
        monkeypatch.setattr(np, "savez_compressed", real_savez)

        assert store._compact_deleted is None
        assert not list(store.index_dir.glob("compact_*.tmp.npz"))
        # Unsealed: new rows go into the existing segments, not a new one.
        n_before = len(store.segments)
        make_corpus_chunks(store, 10, "e", rng)
        assert len(store.segments) == n_before
        # Retry compacts cleanly.
        info = store.compact()
        assert info["compacted"]
        assert store.search(keep_vecs[11], limit=1)[0].metadata.file_path \
            == "c/11.md"
    finally:
        store.close()
        get_settings.cache_clear()


def test_compaction_device_repack_preserves_int8_codes(temp_root, monkeypatch):
    """The device gather repack copies int8 codes verbatim — no
    dequantize→requantize round-trip. Survivor rows must carry bit-equal
    codes and scales across compaction."""
    import numpy as np

    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_SEGMENT_DTYPE", "int8")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.index.store import TpuVectorStore

    store = TpuVectorStore(dimension=64)
    rng = np.random.default_rng(3)
    try:
        make_corpus_chunks(store, 1024, "x", rng)
        keep = make_corpus_chunks(store, 60, "y", rng)
        seg1 = store.segments[1]
        rows1 = np.nonzero(seg1.valid_np)[0]
        codes_before = seg1.vecs_np[rows1].copy()
        scales_before = seg1.scales_np[0][rows1].copy()

        store.delete_by_folder("x")
        info = store.compact()
        assert info["compacted"] and len(store.segments) == 1
        seg = store.segments[0]
        rows_new = np.nonzero(seg.valid_np)[0]
        assert len(rows_new) == 60
        # Match rows via payload texts: y-chunk i -> its code row.
        hits = store.search(keep[13], limit=1)
        assert hits[0].metadata.file_path == "y/13.md"
        # Codes are a permutation-preserved verbatim copy (compare sets of
        # row bytes; order may differ only by the left-pack, which is
        # positional here: single source segment, ascending rows).
        np.testing.assert_array_equal(seg.vecs_np[rows_new], codes_before)
        np.testing.assert_array_equal(seg.scales_np[0][rows_new],
                                      scales_before)
        # Device copy agrees with the mirror.
        np.testing.assert_array_equal(
            np.asarray(seg.vecs)[rows_new], codes_before)
    finally:
        store.close()
        get_settings.cache_clear()
