"""Concurrency regression tests (round-2 concurrency review pass):
search racing donated-buffer mutations, compaction crash recovery mid-
rename, per-folder indexing serialization, suppression refcounts."""

import os
import threading
from datetime import datetime, timezone

import numpy as np
import pytest

from voitta_rag_tpu.core_types import ChunkMetadata
from voitta_rag_tpu.index.store import TpuVectorStore

DIM = 32


def meta(file_path="docs/a.md", chunk_index=0, folder="docs",
         index_folder="docs", total=1):
    return ChunkMetadata(
        file_path=file_path, folder_path=folder, index_folder=index_folder,
        file_name=file_path.rsplit("/", 1)[-1], chunk_index=chunk_index,
        total_chunks=total, start_char=0, end_char=10,
        indexed_at=datetime.now(timezone.utc).isoformat(),
    )


@pytest.fixture
def store(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "512")
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


def test_search_races_mutations_without_crashing(store):
    """Mutations donate device buffers; a lock-free search capturing
    seg.vecs mid-donation crashed with 'Array has been deleted'. Searches
    now serialize with mutations under the store lock."""
    vecs = rand_vecs(64)
    metas = [meta(file_path=f"docs/f{i}.md") for i in range(64)]
    store.store_chunks([f"t{i}" for i in range(64)], vecs, metas)

    errors: list[BaseException] = []
    stop = threading.Event()

    def searcher():
        try:
            while not stop.is_set():
                res = store.search(vecs[3], limit=5)
                assert isinstance(res, list)
        except BaseException as e:  # noqa: BLE001 - re-raised via errors
            errors.append(e)

    def mutator():
        try:
            for round_ in range(30):
                n = 16
                v = rand_vecs(n, seed=round_ + 1)
                ms = [meta(file_path=f"hot/r{round_}_{i}.md", folder="hot",
                           index_folder="hot") for i in range(n)]
                store.store_chunks([f"r{round_} {i}" for i in range(n)],
                                   v, ms)
                store.delete_by_folder("hot")
                if round_ % 10 == 9:
                    # gid renumbering under live searches: the generation
                    # guard + store lock must keep results correct
                    store.compact(min_waste_fraction=0.01)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=searcher) for _ in range(2)]
    mt = threading.Thread(target=mutator)
    for t in threads:
        t.start()
    mt.start()
    mt.join(timeout=120)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors
    # the stable corpus still searches correctly after the storm
    res = store.search(vecs[3], limit=1)
    assert res[0].text == "t3"


def test_compaction_recovery_rolls_forward_partial_rename(temp_root,
                                                          monkeypatch):
    """Crash mid-rename (some temps promoted, some not) with the remap
    committed: recovery must promote the REMAINING temps to their own
    indices — discarding them leaves old-numbering spills against
    remapped payloads (silent corruption)."""
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "128")
    monkeypatch.setenv("EMBEDDING_DIMENSION", str(DIM))
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()

    s = TpuVectorStore()
    n = 300  # 3 segments of 128
    vecs = rand_vecs(n)
    metas = [meta(file_path=f"docs/f{i}.md") for i in range(n)]
    s.store_chunks([f"text {i}" for i in range(n)], vecs, metas)
    # kill most of the first two segments so compaction has work
    for i in range(0, 200, 2):
        s.delete_by_file(f"docs/f{i}.md")
    s.save()

    import voitta_rag_tpu.index.store as storemod

    real_replace = os.replace
    renames = {"n": 0}

    def crashing_replace(src, dst):
        src_s, dst_s = str(src), str(dst)
        if "compact_" in src_s and "segment_" in dst_s:
            renames["n"] += 1
            if renames["n"] == 2:
                raise OSError("simulated crash mid-rename")
        return real_replace(src, dst)

    monkeypatch.setattr(storemod.os, "replace", crashing_replace)
    with pytest.raises(OSError, match="simulated crash"):
        s.compact(min_waste_fraction=0.01)
    monkeypatch.setattr(storemod.os, "replace", real_replace)

    # survivor texts BEFORE the "crash" (from the payload DB via a live gid)
    survivors = {f"text {i}" for i in range(1, 200, 2)} | {
        f"text {i}" for i in range(200, 300)}

    s.close()  # simulate process death + restart
    s2 = TpuVectorStore()
    try:
        assert s2.count() == len(survivors)
        # every live row materializes its own (correct) payload
        for i in (1, 99, 199, 250):
            res = s2.search(vecs[i], limit=1)
            assert res and res[0].text == f"text {i}", (i, res)
        # journal cleaned up, no stray temp spills
        idx_dir = s2.index_dir
        assert not list(idx_dir.glob("compact_*.tmp.npz"))
        assert not (idx_dir / "compaction.journal").exists()
    finally:
        s2.close()


def test_folder_lock_serializes_worker_and_sync(temp_root, monkeypatch):
    """index_folder and sync_folder on the SAME folder from two threads
    must not interleave delete-before-reindex sequences (duplicate
    chunks)."""
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_MODEL", "test-tiny")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.db import database as dbmod
    dbmod.reset_db()
    dbmod.init_db()
    import voitta_rag_tpu.index.store as storemod
    import voitta_rag_tpu.services.embedding as embmod
    import voitta_rag_tpu.services.filesystem as fsmod
    import voitta_rag_tpu.services.indexing as idxmod
    for mod, reset in ((fsmod, "reset_filesystem_service"),
                       (embmod, "reset_embedding_service"),
                       (storemod, "reset_vector_store"),
                       (idxmod, "reset_indexing_service")):
        getattr(mod, reset)()

    docs = temp_root / "docs"
    docs.mkdir()
    for i in range(6):
        (docs / f"f{i}.md").write_text(f"document number {i} " * 5)

    svc = idxmod.get_indexing_service()
    errors: list[BaseException] = []

    def run(fn):
        try:
            fn("docs")
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run, args=(svc.index_folder,)),
               threading.Thread(target=run, args=(svc.sync_folder,))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors

    store = storemod.get_vector_store()
    # exactly one set of chunks per file — no duplicates from interleaving
    for i in range(6):
        gids = store.payloads.gids_where("file_path", f"docs/f{i}.md")
        db_count = dbmod.get_db().get_indexed_file(f"docs/f{i}.md").chunk_count
        assert len(gids) == db_count, (i, len(gids), db_count)
    storemod.reset_vector_store()
    dbmod.reset_db()


def test_suppression_refcount():
    """Overlapping suppressors must not cancel each other early."""
    from voitta_rag_tpu.services.watcher import FileWatcher

    w = FileWatcher()
    w.suppress_path("docs")
    w.suppress_path("docs")      # second suppressor (e.g. sync + timer)
    w.unsuppress_path("docs")
    assert w._is_suppressed("docs/x.md")   # still held by the first
    w.unsuppress_path("docs")
    assert not w._is_suppressed("docs/x.md")
    w.unsuppress_path("docs")    # over-release is harmless
    assert not w._is_suppressed("docs")


def test_failed_save_restores_dirty_counter(store, monkeypatch):
    """A failed spill write (ENOSPC etc.) must leave the store dirty so the
    next autosave retries — zeroing at capture time lost those mutations."""
    vecs = rand_vecs(4)
    store.store_chunks(["a", "b", "c", "d"], vecs,
                       [meta(file_path=f"d/{i}.md") for i in range(4)])
    assert store._unsaved_mutations > 0

    import voitta_rag_tpu.index.store as storemod

    def boom(*a, **kw):
        raise OSError("no space left on device")

    monkeypatch.setattr(storemod.np, "savez_compressed", boom)
    with pytest.raises(OSError):
        store.save()
    assert store._unsaved_mutations > 0  # still dirty -> autosave retries
    monkeypatch.undo()
    assert store.save_if_dirty() is True
    assert store._unsaved_mutations == 0


def test_concurrent_likes_none_lost(temp_root, monkeypatch):
    """adjust_feedback is read-modify-write; with MCP tools in executor
    threads, concurrent likes must all land (the lock serializes them)."""
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.services import anamnesis

    mem = anamnesis.write_memory("alice", "remember this")
    mid = mem["memory_id"]

    n = 16
    threads = [threading.Thread(
        target=anamnesis.adjust_feedback, args=("alice", mid),
        kwargs={"likes_delta": 1}) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert anamnesis.read_memory("alice", mid)["likes"] == n


def test_singleton_first_touch_race_returns_one_instance(temp_root):
    """N threads racing get_vector_store() first-touch must converge on ONE
    instance — two stores hold independent locks (donation crash) and two
    device copies of the index."""
    import voitta_rag_tpu.index.store as storemod

    storemod.reset_vector_store()
    seen = []
    barrier = threading.Barrier(8)

    def grab():
        barrier.wait()
        seen.append(storemod.get_vector_store())

    threads = [threading.Thread(target=grab) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert len(seen) == 8
    assert len({id(s) for s in seen}) == 1
    storemod.reset_vector_store()


def test_stale_gid_payload_delete_skipped_after_compaction_commit(store):
    """A delete whose phase-2 SQL lands AFTER a compaction committed its
    gid remap must NOT issue the gid-numbered DELETE: the old gid values
    were reassigned to surviving (renumbered) chunks, so the statement
    would remove innocent rows (ADVICE r4, store.py _delete_gids)."""
    n = 64
    vecs = rand_vecs(n)
    metas = [meta(file_path=f"docs/f{i}.md") for i in range(n)]
    store.store_chunks([f"text {i}" for i in range(n)], vecs, metas)

    # Simulated in-flight delete: phase 1 captured this generation and
    # these gids (file f0), then stalled before phase 2.
    gen0 = store.generation
    stale_gids = store._payloads.gids_where("file_path", "docs/f0.md")
    assert stale_gids

    # A compaction commits meanwhile (make waste so it actually runs).
    for i in range(0, n, 2):
        store.delete_by_file(f"docs/f{i}.md")
    info = store.compact(min_waste_fraction=0.01)
    assert info.get("compacted"), info
    assert store.generation != gen0

    before = store.count()
    # Phase 2 resumes with the stale numbering: must be a guarded no-op.
    assert store._guarded_payload_delete(stale_gids, gen0) is False
    assert store.count() == before
    # Survivors still materialize their own payloads.
    res = store.search(vecs[1], limit=1)
    assert res and res[0].text == "text 1"

    # Control: a matching generation runs the DELETE.
    live = store._payloads.gids_where("file_path", "docs/f1.md")
    assert store._guarded_payload_delete(live, store.generation) is True
    assert store.count() == before - len(live)


def test_window_deleted_appended_rows_are_orphan_swept(store):
    """Rows upserted AND deleted inside compaction's seal window, whose
    payload DELETE lost the race to the commit (generation check skips
    it), must be orphan-swept by the commit — NOT identity-remapped into
    the new numbering as ghost payloads (ADVICE r4, compact phase 3)."""
    n = 64
    vecs = rand_vecs(n)
    metas = [meta(file_path=f"docs/f{i}.md") for i in range(n)]
    store.store_chunks([f"text {i}" for i in range(n)], vecs, metas)
    for i in range(0, n, 2):
        store.delete_by_file(f"docs/f{i}.md")

    bvecs = rand_vecs(4, seed=7)

    def window():
        # Lands in a fresh APPENDED segment (sealed ones refuse writes).
        store.store_chunks(
            [f"win {i}" for i in range(4)], bvecs,
            [meta(file_path="hot/b.md", chunk_index=i, folder="hot",
                  index_folder="hot", total=4) for i in range(4)])
        # Delete it during the window, with phase 2 simulated as having
        # lost the race to the commit (the generation-guard skip path).
        real = store._guarded_payload_delete
        store._guarded_payload_delete = lambda gids, gen: False
        try:
            store.delete_by_file("hot/b.md")
        finally:
            store._guarded_payload_delete = real
        # Payload rows still present: nothing has removed them yet.
        assert store._payloads.gids_where("file_path", "hot/b.md")

    store._compact_window_hook = window
    try:
        info = store.compact(min_waste_fraction=0.01)
    finally:
        store._compact_window_hook = None
    assert info.get("compacted"), info

    # The commit's orphan sweep removed the window-deleted payload rows.
    assert store._payloads.gids_where("file_path", "hot/b.md") == []
    assert store.count() == n // 2
    # No ghost results; survivors intact.
    assert all(r.text != "win 0" for r in store.search(bvecs[0], limit=5))
    res = store.search(vecs[1], limit=1)
    assert res and res[0].text == "text 1"
