"""TpuVectorStore: the device-resident replacement for Qdrant.

Implements the behavior contract of the reference's ``VectorStoreService``
(services/vector_store.py:54-1028): collection bootstrap, batched upsert,
delete by file/folder/index-folder, folder/time filters, dense and hybrid
dense+sparse search with min-max weighted fusion, and the scroll-style
payload lookups (chunk ranges, per-folder file sets, source-url resolution,
collection stats).

Architecture: chunk vectors + sparse terms + filter columns live in device
HBM segments (:mod:`voitta_rag_tpu.index.segment`), scanned by Pallas
kernels; texts and payload metadata live in host SQLite
(:mod:`voitta_rag_tpu.index.payloads`). Searches run fully on device —
encode-to-candidates is one jittable function (see
:mod:`voitta_rag_tpu.search.service` for the fused path).
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
import uuid
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.core_types import ChunkMetadata, SparseVector, StoredChunk
from voitta_rag_tpu.index.payloads import PayloadStore
from voitta_rag_tpu.index.segment import Segment, UPDATE_BUCKETS, stage_rows
from voitta_rag_tpu.ops.dense_scan import dense_scan_scores
from voitta_rag_tpu.ops.sparse_scan import sparse_scan_scores, TERM_PAD
from voitta_rag_tpu.ops.filters import (
    COL_ACL, COL_CHUNK_INDEX, COL_CREATED, COL_DOC, COL_FOLDER,
    COL_INDEX_FOLDER, COL_MODIFIED, COL_VALID, MISSING_TS, NUM_COLS,
    make_filter_spec,
)
from voitta_rag_tpu.ops.fusion import hybrid_fuse, rrf_fuse
from voitta_rag_tpu.ops.topk import VALID_THRESHOLD, masked_topk
from voitta_rag_tpu.search.sparse_text import idf as idf_fn

logger = logging.getLogger(__name__)


class TpuVectorStore:
    """Device-resident hybrid vector index with the Qdrant-wrapper contract."""

    def __init__(self, index_dir: str | Path | None = None,
                 collection: str | None = None,
                 dimension: int | None = None):
        settings = get_settings()
        self.collection_name = collection or settings.collection
        self.dimension = dimension or settings.embedding_dimension
        self.index_dir = Path(index_dir or settings.index_dir) / self.collection_name
        self.segment_capacity = settings.segment_capacity
        self.segment_dtype = settings.segment_dtype
        self.sparse_slots = settings.sparse_slots
        self.sparse_query_terms = settings.sparse_query_terms
        self.prefetch_multiplier = settings.prefetch_multiplier
        self._device_rows_budget = settings.device_rows_budget
        self._stream_block_rows = settings.stream_block_rows
        # Cold-tier BQ shadows (VOITTA_COLD_BQ): offloaded segments keep a
        # 1-bit device sketch + host postings and are served by coarse-scan
        # + exact rescore instead of full streaming (index/bq_serve.py).
        self._cold_bq = settings.cold_bq
        self._bq_oversample = settings.bq_oversample
        self._bq_select = settings.bq_select
        self._lock = threading.RLock()
        # Serializes whole save() calls (capture + compress) without
        # holding the store lock during compression.
        self._save_lock = threading.Lock()
        # Remap barrier: compaction's commit (generation bump + payload gid
        # remap) and any UNLOCKED payload delete that uses gid numbering
        # take this lock, so a delete can atomically check "has a remap
        # committed since I tombstoned these gids?" before issuing SQL that
        # would otherwise hit reassigned gid values (wrong-row data loss).
        # Lock order: [_save_lock →] _lock → _remap_lock; nothing acquires
        # _lock while holding _remap_lock.
        self._remap_lock = threading.Lock()
        # Post-lock payload inserts: store_chunks commits its SQLite payload
        # rows AFTER releasing the store lock (the ~60-100 ms insert was the
        # largest remaining under-lock writer phase and went straight into
        # concurrent-search tails). The counter ticks up UNDER the store
        # lock and down when the insert commits; compaction's remap commit,
        # delete resolution, and close() drain it first so gid-numbered SQL
        # never crosses an uncommitted insert.
        self._pending_cv = threading.Condition()
        self._pending_inserts = 0
        self._closed = False
        self._payloads: PayloadStore | None = None
        self._segments: list[Segment] | None = None
        # Multi-chip mode: VOITTA_INDEX_SHARDS > 1 (or "auto" with multiple
        # devices) stores rows in a mesh-sharded index instead of flat
        # segments; searches run per-chip scans + all-gather top-k merge.
        self._sharded = None
        self._n_replicas = max(1, settings.index_replicas)
        self._n_shards = self._resolve_shards(settings.index_shards)
        if self._n_replicas > 1:
            # Auto shard counts cover ALL devices; replica groups divide
            # them: replicas * shards = devices.
            self._n_shards = max(1, self._n_shards // self._n_replicas)
        # IVF snapshot (read-optimized; invalidated by any mutation).
        self._ivf = None
        # Composed cold IVF: probe-limited coarse scans over the cold
        # segments' BQ sketches + exact host rescore (index/ivf_bq.py);
        # built by build_ivf when the store is beyond-HBM. Shares
        # _ivf_dirty's staleness contract.
        self._cold_ivf = None
        self._ivf_nprobe = settings.ivf_nprobe
        self._ivf_select = settings.ivf_select
        self._ivf_dirty = True
        # Sparse postings snapshot (read-optimized; invalidated likewise).
        self._postings = None
        self._postings_cols = None   # gid-indexed filter columns
        self._postings_dirty = True
        self._sparse_max_postings = settings.sparse_max_postings
        # Mutations since last save() (host spill/restore, SURVEY §5.4).
        self._unsaved_mutations = 0
        # Compaction generation: bumped whenever gids are REUSED (not just
        # deleted), so lock-free searches can detect that their scored gids
        # belong to a previous numbering (see _materialize).
        self._generation = 0
        # Non-None while a seal-based compaction is in flight: gids deleted
        # during its unlocked rebuild window, re-applied at commit.
        self._compact_deleted: set[int] | None = None
        # Test-only: callable invoked at the end of compact's UNLOCKED
        # phase 2, letting tests drive mutations into the seal window
        # deterministically (tests/test_concurrency.py).
        self._compact_window_hook = None
        # Scatter-bucket programs already compiled (outside the lock).
        self._warmed_programs: set = set()

    @staticmethod
    def _resolve_shards(setting: str) -> int:
        """VOITTA_INDEX_SHARDS: explicit N (clamped to devices), or "auto"
        = all chips on a real TPU backend (shared policy with
        VOITTA_ENCODE_DP — parallel/mesh.py:resolve_auto_devices)."""
        try:
            from voitta_rag_tpu.parallel.mesh import resolve_auto_devices

            return resolve_auto_devices(setting)
        except Exception:
            return 1

    @property
    def sharded_active(self) -> bool:
        self._ensure_open()
        return self._sharded is not None

    # -- lazy bootstrap (reference vector_store.py:66-115) -------------------
    @property
    def payloads(self) -> PayloadStore:
        self._ensure_open()
        return self._payloads

    @property
    def segments(self) -> list[Segment]:
        self._ensure_open()
        return self._segments

    def _ensure_open(self) -> None:
        with self._lock:
            if self._segments is not None:
                return
            self._closed = False
            self.index_dir.mkdir(parents=True, exist_ok=True)
            self._payloads = PayloadStore(self.index_dir / "payloads.db")
            self._generation = int(
                self._payloads.get_meta("gid_generation", "0") or 0)
            self._recover_compaction()
            self._segments = []
            if self._n_shards > 1 or self._n_replicas > 1:
                from voitta_rag_tpu.parallel.mesh import index_mesh
                from voitta_rag_tpu.parallel.sharded import ShardedIndex

                mesh = index_mesh(self._n_shards,
                                  n_slices=get_settings().index_slices,
                                  n_replicas=self._n_replicas)
                spill = self.index_dir / "sharded.npz"
                if spill.exists():
                    try:
                        with np.load(spill, allow_pickle=False) as data:
                            self._sharded = ShardedIndex.from_host(
                                mesh, dict(data))
                        logger.info(
                            "Loaded sharded index (%d shards, %d live "
                            "chunks) for '%s'", self._n_shards, self.count(),
                            self.collection_name)
                    except Exception:
                        self._quarantine_spill(spill)
                        self._sharded = None
                if self._sharded is None:
                    # No spill (or a quarantined one): start a fresh empty
                    # sharded index — falling through to flat segments here
                    # would strand re-indexed data in files the sharded
                    # branch never loads on the next restart.
                    # segment_capacity is the TOTAL row budget; each shard
                    # holds its slice (lane-aligned).
                    from voitta_rag_tpu.ops.pallas_utils import round_up

                    cap = round_up(
                        max(self.segment_capacity // self._n_shards, 128),
                        128)
                    self._sharded = ShardedIndex(
                        mesh, cap, self.dimension,
                        self.sparse_slots, self.segment_dtype)
                return
            seg_files = sorted(f for f in self.index_dir.glob("segment_*.npz")
                               if ".tmp" not in f.name)
            for f in seg_files:
                # gid = segment-list-index * capacity + row, so POSITION is
                # load-bearing: a lost middle segment must become an empty
                # placeholder at its original index, never a skip (skipping
                # would shift every later segment's gid range onto the
                # wrong payloads).
                idx = self._spill_index(f)
                if idx is None:
                    idx = len(self._segments)
                while len(self._segments) < idx:
                    self._segments.append(Segment(
                        self.segment_capacity, self.dimension,
                        self.sparse_slots, self.segment_dtype))
                try:
                    with np.load(f, allow_pickle=False) as data:
                        self._segments.append(Segment.from_host(dict(data)))
                except Exception:
                    # A corrupt spill must not brick the store: quarantine
                    # the file and hold its slot with an empty segment. The
                    # indexing repair cycle (chunk-count cross-checks,
                    # SURVEY §5.3) re-indexes whatever the lost segment
                    # held on its next pass.
                    self._quarantine_spill(f)
                    self._segments.append(Segment(
                        self.segment_capacity, self.dimension,
                        self.sparse_slots, self.segment_dtype))
            if self._segments:
                # gid = segment_index * capacity + row: the capacity the
                # spills were WRITTEN with is authoritative. Loading them
                # under a changed VOITTA_SEGMENT_CAPACITY would silently
                # renumber every gid out from under the payload store and
                # all searches would return nothing.
                loaded_cap = self._segments[0].capacity
                if loaded_cap != self.segment_capacity:
                    logger.warning(
                        "Segment spills were written with capacity %d but "
                        "VOITTA_SEGMENT_CAPACITY is now %d; adopting %d "
                        "(gid numbering is tied to it). Re-index from "
                        "scratch to change capacity.",
                        loaded_cap, self.segment_capacity, loaded_cap)
                    self.segment_capacity = loaded_cap
                logger.info("Loaded %d segments (%d live chunks) for '%s'",
                            len(self._segments), self.count(), self.collection_name)
            self._enforce_device_budget()

    @staticmethod
    def _spill_index(path) -> int | None:
        """Segment list index encoded in a spill filename, or None."""
        try:
            return int(path.stem.split("_")[-1])
        except ValueError:
            return None

    def _prune_spills(self, keep: int) -> None:
        """Unlink segment spills with index >= keep (a shrunk store must
        not resurrect pre-compaction segments on restart)."""
        for f in self.index_dir.glob("segment_*.npz"):
            if ".tmp" in f.name:
                continue
            idx = self._spill_index(f)
            try:
                if idx is not None and idx >= keep:
                    f.unlink()
            except OSError:
                pass

    def _quarantine_spill(self, path) -> None:
        import time as _time

        dest = path.with_suffix(f".corrupt-{int(_time.time())}")
        logger.exception(
            "Corrupt index spill %s — quarantined to %s; the segment's "
            "chunks will be re-indexed by the repair cycle", path, dest)
        try:
            path.rename(dest)
        except OSError:
            logger.exception("quarantine rename failed for %s", path)

    def _segment_with_space(self, n: int) -> Segment:
        for seg in self._segments:
            if seg.rows_available() >= n:
                return seg
        seg = Segment(self.segment_capacity, self.dimension,
                      self.sparse_slots, self.segment_dtype)
        self._segments.append(seg)
        logger.info("Allocated segment %d (capacity %d, dtype %s)",
                    len(self._segments) - 1, seg.capacity, seg.dtype)
        self._enforce_device_budget()
        return seg

    def _enforce_device_budget(self) -> None:
        """Offload filled segments past VOITTA_DEVICE_ROWS_BUDGET to host
        RAM (the beyond-HBM cold tier; Qdrant-mmap analogue, reference
        layer 0). The newest segment always stays resident for writes;
        searches stream cold segments (index/stream_scan.py)."""
        budget = self._device_rows_budget
        if not budget or not self._segments:
            return
        resident = [s for s in self._segments if s.resident]
        while sum(s.capacity for s in resident) > budget and len(resident) > 1:
            cand = next((s for s in resident[:-1]
                         if s._next >= s.capacity), resident[0])
            if cand is resident[-1]:
                break
            cand.offload(bq=self._cold_bq)
            resident.remove(cand)
            logger.info(
                "Offloaded segment %d to host (cold tier): %d resident "
                "rows > budget %d", self._segments.index(cand),
                sum(s.capacity for s in resident) + cand.capacity, budget)

    @property
    def cold_tier_active(self) -> bool:
        return (self._segments is not None
                and any(not s.resident for s in self._segments))

    def _gid(self, seg: Segment, row: int) -> int:
        return self._segments.index(seg) * self.segment_capacity + int(row)

    def _warm_mutation_programs(self, bucket: int) -> None:
        """Compile the donated scatter/tombstone programs for ``bucket``
        OUTSIDE the store lock. XLA compiles on first call; a multi-second
        first-use compile inside the serving lock was the single worst
        search stall under mutation (measured 3.9 s). One-time per
        (bucket, segment shape); the dummy buffers free on return.
        Best-effort: a failure (e.g. HBM pressure) just defers the compile
        to the real call."""
        key = (bucket, self.segment_capacity, self.dimension,
               self.sparse_slots, self.segment_dtype)
        if key in self._warmed_programs:
            return
        try:
            from voitta_rag_tpu.index.segment import (
                _tombstone_rows, _updaters,
            )

            cap, dim, s = (self.segment_capacity, self.dimension,
                           self.sparse_slots)
            store_dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                        "int8": jnp.int8}[self.segment_dtype]
            rows = jnp.full((bucket,), cap, jnp.int32)  # all dropped
            set_rows, set_cols, set_scales = _updaters(bucket)
            set_rows(jnp.zeros((cap, dim), store_dt), rows,
                     jnp.zeros((bucket, dim), store_dt))
            cols = set_cols(jnp.zeros((NUM_COLS, cap), jnp.int32), rows,
                            jnp.zeros((bucket, NUM_COLS), jnp.int32))
            set_cols(jnp.zeros((s, cap), jnp.int32), rows,
                     jnp.zeros((bucket, s), jnp.int32))
            set_cols(jnp.zeros((s, cap), jnp.float32), rows,
                     jnp.zeros((bucket, s), jnp.float32))
            if self.segment_dtype == "int8":
                set_scales(jnp.zeros((1, cap), jnp.float32), rows,
                           jnp.zeros((bucket,), jnp.float32))
            cols = _tombstone_rows(cols, rows)
            jax.block_until_ready(cols)
            self._warmed_programs.add(key)
        except Exception:  # pragma: no cover - warmup must never fail ops
            logger.debug("mutation-program warmup failed", exc_info=True)

    # -- upsert (reference vector_store.py:233-317) --------------------------
    def _drain_pending_inserts(self, timeout: float = 30.0) -> None:
        """Wait for in-flight post-lock payload inserts to commit.

        Callers that issue gid-numbered SQL (compaction's remap commit,
        delete resolution) or tear the store down (close) must not cross an
        uncommitted store_chunks payload insert. When called while holding
        ``self._lock`` the wait cannot grow: increments happen under that
        lock, and the inserts being waited on need no store lock to finish.
        """
        with self._pending_cv:
            deadline = time.monotonic() + timeout
            while self._pending_inserts > 0:
                left = deadline - time.monotonic()
                if left <= 0:
                    logger.warning(
                        "pending payload inserts did not drain in %.0fs",
                        timeout)
                    return
                self._pending_cv.wait(left)

    def store_chunks(
        self,
        texts: list[str],
        embeddings: list[list[float]] | np.ndarray,
        metadata_list: list[ChunkMetadata],
        sparse_vectors: list[SparseVector] | None = None,
    ) -> list[str]:
        """Store chunk batch; returns point ids (uuid strings)."""
        self._ensure_open()
        if not texts:
            return []
        assert len(texts) == len(metadata_list)
        dense = np.asarray(embeddings, np.float32)
        assert dense.shape == (len(texts), self.dimension), dense.shape
        # Normalize (COSINE space, reference collection config Distance.COSINE).
        norms = np.linalg.norm(dense, axis=1, keepdims=True)
        dense = dense / np.where(norms == 0, 1.0, norms)

        S = self.sparse_slots
        n = len(texts)
        terms = np.full((n, S), TERM_PAD, np.int32)
        weights = np.zeros((n, S), np.float32)
        df_bump: dict[int, int] = {}
        if sparse_vectors is not None:
            for i, sv in enumerate(sparse_vectors):
                idx = np.asarray(sv.indices, np.int64)
                val = np.asarray(sv.values, np.float32)
                if len(idx) > S:  # keep top-S by weight
                    keep = np.argsort(-val)[:S]
                    idx, val = idx[keep], val[keep]
                terms[i, : len(idx)] = idx
                weights[i, : len(idx)] = val
                for t in set(int(x) for x in idx):
                    df_bump[t] = df_bump.get(t, 0) + 1

        # Interning and upload staging run OUTSIDE the store lock: the
        # payload store is internally locked, and the staged host→device
        # transfers (~13 MB per padded 4096-row 768-d bucket through the
        # tunnel) are the dominant cost of an upsert — holding the store
        # lock across them is what put concurrent-search p95 at ~400 ms.
        col_rows = np.zeros((n, NUM_COLS), np.int32)
        point_ids = [str(uuid.uuid4()) for _ in range(n)]
        for i, m in enumerate(metadata_list):
            col_rows[i, COL_VALID] = 1
            col_rows[i, COL_FOLDER] = self._payloads.folders.intern(m.folder_path)
            col_rows[i, COL_INDEX_FOLDER] = self._payloads.folders.intern(m.index_folder)
            col_rows[i, COL_CREATED] = (
                m.source_created_at if m.source_created_at is not None else MISSING_TS)
            col_rows[i, COL_MODIFIED] = (
                m.source_modified_at if m.source_modified_at is not None else MISSING_TS)
            col_rows[i, COL_DOC] = self._payloads.docs.intern(m.file_path)
            col_rows[i, COL_ACL] = 0
            col_rows[i, COL_CHUNK_INDEX] = m.chunk_index

        staged = []
        if self._sharded is None:
            max_b = UPDATE_BUCKETS[-1]
            for s in range(0, n, max_b):
                e = min(s + max_b, n)
                staged.append((s, stage_rows(
                    dense[s:e], col_rows[s:e], terms[s:e], weights[s:e],
                    dim=self.dimension, sparse_slots=self.sparse_slots,
                    dtype=self.segment_dtype)))
            for _, st in staged:  # transfers settle BEFORE the lock
                self._warm_mutation_programs(st.bucket)
                st.block_until_ready()

        with self._lock:
            self._ensure_open()
            if self._sharded is not None:
                gids = self._sharded.write_rows(dense, col_rows, terms,
                                                weights)
                payload_rows = [
                    (int(g), point_ids[k], texts[k], metadata_list[k])
                    for k, g in enumerate(gids)]
            else:
                # Scatter staged buckets (may span segments on overflow);
                # under-lock work is dispatch + host-mirror memcpy only.
                payload_rows = []
                for base, st in staged:
                    done = 0
                    while done < st.n:
                        seg = self._segment_with_space(1)
                        take = min(st.n - done, seg.rows_available())
                        rows = seg.allocate(take)
                        seg.write_staged(rows, st, offset=done)
                        for j, r in enumerate(rows):
                            k = base + done + j
                            payload_rows.append(
                                (self._gid(seg, r), point_ids[k], texts[k],
                                 metadata_list[k]))
                        done += take
            self._ivf_dirty = True
            self._postings_dirty = True
            self._unsaved_mutations += n
            with self._pending_cv:
                self._pending_inserts += 1
        # The SQLite payload insert (~60-100 ms for a 512-row batch on this
        # host, the largest remaining under-lock writer phase) commits
        # OUTSIDE the store lock. Readers that race it: _materialize skips
        # missing gids and retries once after the drain; gid-numbered SQL
        # (compact remap, delete resolution) drains the counter first.
        try:
            self._payloads.insert_chunks(payload_rows)
            if df_bump:
                self._payloads.bump_term_dfs(df_bump)
        finally:
            with self._pending_cv:
                self._pending_inserts -= 1
                self._pending_cv.notify_all()
        return point_ids

    # -- deletes (reference vector_store.py:319-434) -------------------------
    @staticmethod
    def _df_drop_for(term_rows: np.ndarray) -> dict[int, int]:
        """Per-term document-frequency decrements for dying rows [n, S].

        Vectorized (sort each short row, mask pads and within-row
        duplicates, one global unique): the per-row Python set() loop this
        replaces held the store lock for ~100 ms per 4096-row file delete."""
        if term_rows.size == 0:
            return {}
        ts = np.sort(term_rows, axis=1)
        keep = ts != TERM_PAD
        keep[:, 1:] &= ts[:, 1:] != ts[:, :-1]
        vals, counts = np.unique(ts[keep], return_counts=True)
        return {int(t): -int(c) for t, c in zip(vals, counts)}

    def _delete_gids(self, gids: list[int],
                     resolver=None) -> int:
        """Delete rows by gid — takes the store lock ITSELF (3-phase).

        Phase 1 (locked): filter to currently-valid rows (concurrent
        duplicate deletes of the same file must not double-account df),
        tombstone them WITHOUT freeing, and copy their term mirrors.
        When ``resolver`` is given (the delete_by_* predicate paths), the
        gid set is re-resolved HERE, under the lock — a pre-resolved set
        can go stale between lookup and tombstone (a concurrent delete of
        the same file frees the rows, a re-index reuses them for NEW
        chunks, and phase 1 would then tombstone freshly indexed data).
        Phase 2 (unlocked): the SQLite work — payload row deletes across 5
        secondary indexes plus the df upsert sweep, measured up to ~700 ms
        for a 4096-row file — runs against the internally-locked payload
        store without stalling searches or writers. The gid-numbered
        DELETE itself runs under ``_remap_lock`` with a generation check:
        if a compaction committed its remap after phase 1, these payload
        rows were already journal-popped from the remap and orphan-swept
        by compact's commit, and issuing the DELETE against the stale gid
        values would remove innocent (renumbered) rows.
        Phase 3 (locked): release the rows to the free list. Deferred so
        an upsert cannot reuse a row before its payload delete commits
        (the delete would then eat the NEW payload); skipped if a
        compaction renumbered gids meanwhile (the rows no longer exist).
        """
        if resolver is not None:
            # Estimate only — the authoritative resolution reruns under
            # the lock in phase 1. This pass sizes the program warm-up.
            gids = resolver()
        if not gids:
            return 0
        if self._sharded is None:
            # Tombstone scatters split per segment into ladder buckets;
            # compile every bucket this delete could touch BEFORE the lock.
            from voitta_rag_tpu.index.segment import _bucket

            cover = _bucket(min(len(gids), UPDATE_BUCKETS[-1]))
            for b in UPDATE_BUCKETS:
                if b <= cover:
                    self._warm_mutation_programs(b)
        with self._lock:
            self._ensure_open()
            # A store_chunks whose post-lock payload insert hasn't
            # committed yet is invisible to the SQLite resolvers (its
            # device rows would survive a delete of their file) and its
            # gid-numbered rows could collide with phase 2's DELETE. Under
            # the store lock no new insert can start, so this wait is
            # bounded by the in-flight commits (tens of ms).
            self._drain_pending_inserts()
            if resolver is not None:
                gids = resolver()
                if not gids:
                    return 0
            if self._sharded is not None:
                # Sharded mode keeps no host term mirror and no free-list
                # reuse race (rows are reused in place): single-phase,
                # with the terms read back from the device (tiny gather)
                # so document frequencies stay EXACT.
                gids_arr = np.asarray(gids, np.int64)
                df_drop = self._df_drop_for(
                    np.asarray(self._sharded.gather_terms(gids_arr)))
                self._sharded.tombstone_gids(gids_arr)
                self._payloads.delete_gids(gids)
                if df_drop:
                    self._payloads.bump_term_dfs(df_drop)
                self._ivf_dirty = True
                self._postings_dirty = True
                self._unsaved_mutations += len(gids)
                return len(gids)

            gen = self._generation
            by_seg: dict[int, list[int]] = {}
            for g in gids:
                by_seg.setdefault(g // self.segment_capacity, []).append(
                    g % self.segment_capacity)
            term_parts: list[np.ndarray] = []
            tombstoned: list[tuple[Segment, np.ndarray]] = []
            live_gids: list[int] = []
            for si, rows in by_seg.items():
                if si >= len(self._segments):
                    # Payload/device divergence (e.g. an unclean shutdown
                    # spilled the SQLite payloads but not the device
                    # segments): the rows exist only in the payload DB.
                    # Deleting the payload rows below is the whole recovery
                    # — there is no device data to tombstone or df-account.
                    logger.warning(
                        "delete: %d gids reference missing segment %d "
                        "(payload-only rows; purging payloads)",
                        len(rows), si)
                    continue
                seg = self._segments[si]
                rows_arr = np.asarray(rows, np.int32)
                rows_arr = rows_arr[seg.valid_np[rows_arr]]
                if not len(rows_arr):
                    continue
                term_parts.append(seg.terms_np[rows_arr])  # mirror copy
                seg.tombstone_rows(rows_arr, free=False)
                tombstoned.append((seg, rows_arr))
                live_gids.extend(
                    int(si * self.segment_capacity + r) for r in rows_arr)
            if self._compact_deleted is not None:
                # An in-flight compaction rebuilt (or is rebuilding) these
                # rows from its capture-time snapshot; record them so its
                # commit phase re-applies the tombstones.
                self._compact_deleted.update(live_gids)
            self._ivf_dirty = True
            self._postings_dirty = True
            self._unsaved_mutations += len(gids)

        # Phase 2: SQL outside the store lock. The payload delete covers
        # ALL requested gids (including payload-only divergence rows);
        # df accounting covers only the rows this call tombstoned.
        self._guarded_payload_delete(gids, gen)
        if term_parts:
            df_drop = self._df_drop_for(np.concatenate(term_parts))
            if df_drop:
                self._payloads.bump_term_dfs(df_drop)

        # Phase 3: free-list release, now that no reuse can collide.
        with self._lock:
            if self._generation == gen and self._segments is not None:
                for seg, rows_arr in tombstoned:
                    seg.release_rows(rows_arr)
        return len(gids)

    def _guarded_payload_delete(self, gids: list[int], gen: int) -> bool:
        """Gid-numbered payload DELETE, atomic with a generation check.

        ``_remap_lock`` means a compaction cannot commit its gid remap
        mid-statement. If one committed after the caller's phase 1
        (``self._generation != gen``), the journaled pop + orphan sweep in
        that commit already removed these payload rows — issuing the
        DELETE here would target whatever rows now hold the reassigned
        gid values (wrong-row data loss). Returns whether the DELETE ran.
        """
        with self._remap_lock:
            if self._generation != gen:
                logger.warning(
                    "delete crossed a compaction commit; payload rows were "
                    "orphan-swept by the compaction (%d gids)", len(gids))
                return False
            self._payloads.delete_gids(gids)
            return True

    # delete_by_* resolve their predicate INSIDE _delete_gids' phase-1
    # lock (resolver callable): a pre-resolved gid list can be freed by a
    # concurrent duplicate delete and reused by a re-index of the same
    # path before phase 1 runs, which would tombstone the fresh chunks.

    def delete_by_file(self, file_path: str) -> int:
        """Delete all chunks of one file; returns count removed."""
        self._ensure_open()
        return self._delete_gids(
            None, resolver=lambda: self._payloads.gids_where(
                "file_path", file_path))

    def delete_by_folder(self, folder_path: str) -> int:
        """Delete chunks under a folder subtree (reference delete_by_folder)."""
        self._ensure_open()
        return self._delete_gids(
            None, resolver=lambda: self._payloads.gids_where_prefix(
                "folder_path", folder_path))

    def delete_by_index_folder(self, index_folder: str) -> int:
        self._ensure_open()
        return self._delete_gids(
            None, resolver=lambda: self._payloads.gids_where(
                "index_folder", index_folder))

    def delete_by_point_ids(self, point_ids: list[str]) -> int:
        self._ensure_open()

        def resolve() -> list[int]:
            gids: list[int] = []
            for pid in point_ids:
                gids.extend(self._payloads.gids_where("point_id", pid))
            return gids

        return self._delete_gids(None, resolver=resolve)

    # -- search (reference vector_store.py:560-697) --------------------------
    def _resolve_filter_ids(
        self,
        folder_filter: str | None,
        include_folders: list[str] | None,
        exclude_folders: list[str] | None,
        exclude_index_folders: list[str] | None,
    ):
        folders = self._payloads.folders
        include_ids = None
        impossible = False
        inc = list(include_folders or [])
        if folder_filter:
            inc = [folder_filter] + inc if include_folders else [folder_filter]
        if folder_filter or include_folders:
            include_ids = folders.lookup_many(inc)
            if not include_ids:
                impossible = True  # no known folder can match
        exclude_ids = folders.lookup_many(exclude_folders or [])
        exclude_if_ids = folders.lookup_many(exclude_index_folders or [])
        return include_ids, exclude_ids, exclude_if_ids, impossible

    def _sparse_query_arrays(self, sparse_query):
        """(indices, values) | SparseVector → padded device arrays with IDF."""
        if isinstance(sparse_query, SparseVector):
            indices, values = sparse_query.indices, sparse_query.values
        else:
            indices, values = sparse_query
        qt = np.full((1, self.sparse_query_terms), TERM_PAD, np.int32)
        qw = np.zeros((1, self.sparse_query_terms), np.float32)
        n_docs = max(self.payloads.count(), 1)
        dfs = self.payloads.term_dfs([int(t) for t in indices])
        k = min(len(indices), self.sparse_query_terms)
        for j in range(k):
            t = int(indices[j])
            qt[0, j] = t
            qw[0, j] = float(values[j]) * idf_fn(dfs.get(t, 0), n_docs)
        return qt, qw

    # -- IVF acceleration (BASELINE config 4; docs/ARCHITECTURE.md §6) ------
    def build_ivf(self, n_cells: int | None = None,
                  nprobe: int | None = None, kmeans_iters: int = 25) -> dict:
        """Build/rebuild the IVF snapshot from live rows. Mutations after the
        build invalidate it (searches fall back to the exact flat scan until
        the next build)."""
        from voitta_rag_tpu.index.ivf import IVFIndex

        settings = get_settings()
        n_cells = n_cells or settings.ivf_cells
        with self._lock:
            self._ensure_open()
            if self._sharded is not None:
                # Per-chip IVF: shared centroids, per-shard cell-major
                # blocks, probes merged over ICI (parallel/sharded.py).
                info = self._sharded.build_ivf(
                    n_cells, kmeans_iters=kmeans_iters,
                    assign_k=settings.ivf_assign_k,
                    assign_margin=settings.ivf_assign_margin)
                if nprobe:
                    self._ivf_nprobe = nprobe
                self._ivf_dirty = False
                return info
            if self.cold_tier_active:
                # Composed path: IVF probing over the cold segments' BQ
                # sketches (index/ivf_bq.py) — the three scale mechanisms
                # (IVF x cold tier x quantized serving) in ONE query path,
                # matching the reference engine's composed mmap + ANN +
                # quantized-rescore store (vector_store.py:88-115). The
                # resident tail (the open write segment) stays flat-scanned
                # exactly; searches fuse both in candidate space
                # (_search_cold_ivf).
                from voitta_rag_tpu.index.ivf_bq import ColdIvf

                self._cold_ivf = ColdIvf.build(
                    self._segments, n_cells, kmeans_iters=kmeans_iters,
                    assign_k=settings.ivf_assign_k,
                    assign_margin=settings.ivf_assign_margin)
                if nprobe:
                    self._ivf_nprobe = nprobe
                self._ivf = None
                self._ivf_dirty = False
                shadows = self._cold_ivf.shadows
                return {"cells": n_cells, "cold_segments": len(shadows),
                        "rows": sum(int((sh.row3 >= 0).sum())
                                    for sh in shadows.values()),
                        "cell_cap": max(sh.cell_cap
                                        for sh in shadows.values()),
                        "residual": sum(int((sh.rest_row >= 0).sum())
                                        for sh in shadows.values()),
                        "sketch_bytes": sum(sh.nbytes_device()
                                            for sh in shadows.values())}
            # Gather live rows ON DEVICE (only the row-index vectors cross
            # the host boundary — segments can be GBs, indices are MBs).
            import jax.numpy as jnp

            live_vecs, live_cols, live_gids = [], [], []
            for si, seg in enumerate(self._segments):
                rows = np.nonzero(seg.valid_np)[0].astype(np.int32)
                if len(rows) == 0:
                    continue
                rows_j = jnp.asarray(rows)
                v = jnp.take(seg.vecs, rows_j, axis=0)
                if seg.dtype == "int8":
                    v = (v.astype(jnp.float32)
                         * jnp.take(seg.scales[0], rows_j)[:, None])
                live_vecs.append(v.astype(jnp.float32))
                live_cols.append(jnp.take(seg.cols, rows_j, axis=1).T)
                live_gids.append(jnp.asarray(
                    rows + si * self.segment_capacity))
            if not live_vecs:
                raise ValueError("no live rows to build IVF from")
            dense = jnp.concatenate(live_vecs)
            cols = jnp.concatenate(live_cols)
            gids = jnp.concatenate(live_gids)
            if n_cells <= 1 or len(dense) < max(n_cells, 256):
                raise ValueError(
                    f"need >= max(n_cells, 256) rows for IVF "
                    f"(have {len(dense)}, n_cells={n_cells})")
            self._cold_ivf = None
            if settings.ivf_layout == "flat":
                # Variable-length inverted lists (index/ivf_flat.py): the
                # corpus stays flat cell-major, cells are unconstrained, a
                # probe gathers a fixed window of each probed cell's core.
                from voitta_rag_tpu.index.ivf_flat import IVFFlatIndex

                self._ivf = IVFFlatIndex.build(
                    dense.astype(jnp.bfloat16)
                    if self.segment_dtype == "int8" else dense,
                    cols.T, np.asarray(gids),
                    n_cells=n_cells, probe_cap=settings.ivf_probe_cap,
                    kmeans_iters=kmeans_iters,
                    margin=settings.ivf_assign_margin)
                if nprobe:
                    self._ivf_nprobe = nprobe
                self._ivf_dirty = False
                n_rows = int(len(dense))
                return {"layout": "flat", "cells": n_cells,
                        "virtual_cells": self._ivf.n_cells,
                        "rows": n_rows,
                        "probe_cap": self._ivf.probe_cap,
                        "replicas": int((np.asarray(self._ivf.gids) >= 0)
                                        .sum()) - n_rows}
            self._ivf = IVFIndex.build(dense, cols, gids, n_cells,
                                       kmeans_iters=kmeans_iters,
                                       assign_k=settings.ivf_assign_k,
                                       assign_margin=settings.ivf_assign_margin,
                                       dtype=self.segment_dtype
                                       if self.segment_dtype != "int8"
                                       else "bfloat16")
            if nprobe:
                self._ivf_nprobe = nprobe
            self._ivf_dirty = False
            return {"layout": "padded", "cells": n_cells, "rows": len(dense),
                    "cell_cap": self._ivf.cell_cap,
                    "residual": int(np.asarray(self._ivf.rest_gid >= 0).sum())}

    @property
    def ivf_active(self) -> bool:
        if self._sharded is not None:
            return self._sharded.ivf is not None and not self._ivf_dirty
        return ((self._ivf is not None or self._cold_ivf is not None)
                and not self._ivf_dirty)

    # -- sparse postings snapshot (index/postings.py) ------------------------
    def build_postings(self) -> dict:
        """Build/rebuild the inverted-postings sparse snapshot from live
        rows. Like the IVF snapshot it is read-optimized: any mutation
        invalidates it and sparse queries fall back to the exact slot scan
        until the next build."""
        from voitta_rag_tpu.index.postings import SparsePostings

        with self._lock:
            self._ensure_open()
            if self._sharded is not None:
                if self.count() == 0:
                    raise ValueError("no live rows to build postings from")
                # Per-chip postings under shard_map (parallel/sharded.py).
                info = self._sharded.build_postings()
                self._postings_dirty = False
                return info
            if not self._segments:
                raise ValueError("no live rows to build postings from")
            if self.cold_tier_active:
                raise ValueError(
                    "postings snapshot requires a fully device-resident "
                    "store; this store serves beyond-HBM segments via "
                    "streaming scans (VOITTA_DEVICE_ROWS_BUDGET)")
            terms = jnp.concatenate([s.terms for s in self._segments], axis=1)
            weights = jnp.concatenate(
                [s.weights for s in self._segments], axis=1)
            # gid = segment_index * segment_capacity + row, so concatenating
            # per-segment arrays in order yields gid-indexed layouts.
            gids = jnp.arange(terms.shape[1], dtype=jnp.int32)
            self._postings = SparsePostings.build(terms, weights, gids)
            self._postings_cols = jnp.concatenate(
                [s.cols for s in self._segments], axis=1)
            self._postings_dirty = False
            return {"postings": self._postings.n_live,
                    "rows": int(terms.shape[1])}

    @property
    def postings_active(self) -> bool:
        if self._sharded is not None:
            return (self._sharded.postings is not None
                    and not self._postings_dirty)
        return self._postings is not None and not self._postings_dirty

    def _score_all_segments(self, q_dense, spec, qt=None, qw=None,
                            bq_k: int | None = None):
        """Concatenated masked scores over all segments.

        Returns (dense_scores [B, total], sparse_scores [B, total] | None).
        ``bq_k``: candidate over-fetch for cold-BQ segments (coarse top-K'
        exactly rescored; index/bq_serve.py). Cold segments without a BQ
        shadow (or when bq_k is None) stream exactly instead.
        """
        d_parts, s_parts = [], []
        qt_j = jnp.asarray(qt) if qt is not None else None
        qw_j = jnp.asarray(qw) if qw is not None else None
        # Phase 1 for every cold-BQ segment FIRST: enqueue all coarse scans
        # before the first host sync, so their device work overlaps and the
        # host pays one pull round, not one per segment.
        bq_cands: dict[int, object] = {}
        if bq_k:
            from voitta_rag_tpu.index.bq_serve import bq_coarse_candidates

            for i, seg in enumerate(self._segments):
                if not seg.resident and seg.bq_packed is not None:
                    bq_cands[i] = bq_coarse_candidates(
                        q_dense, seg, spec, k_prime=bq_k,
                        select=self._bq_select)
        for i, seg in enumerate(self._segments):
            if not seg.resident:
                if i in bq_cands:
                    from voitta_rag_tpu.index.bq_serve import \
                        bq_finish_segment

                    d, s = bq_finish_segment(
                        q_dense, seg, spec, np.asarray(bq_cands[i]), qt, qw,
                        k_prime=bq_k)
                    d_parts.append(d)
                    if s is not None:
                        s_parts.append(s)
                    continue
                # Cold tier: stream through device staging blocks; same
                # kernels, same [B, cap] score layout.
                from voitta_rag_tpu.index.stream_scan import \
                    stream_segment_scores

                d, s = stream_segment_scores(
                    q_dense, seg, spec, qt_j, qw_j,
                    block_rows=self._stream_block_rows)
                d_parts.append(d)
                if s is not None:
                    s_parts.append(s)
                continue
            d_parts.append(dense_scan_scores(
                q_dense, seg.vecs, seg.cols, spec, seg.scales))
            if qt is not None:
                s_parts.append(sparse_scan_scores(
                    qt_j, qw_j, seg.terms, seg.weights,
                    seg.cols, spec))
        dense_scores = jnp.concatenate(d_parts, axis=1)
        sparse_scores = jnp.concatenate(s_parts, axis=1) if s_parts else None
        return dense_scores, sparse_scores

    def search(
        self,
        query_embedding: list[float] | np.ndarray,
        limit: int = 10,
        folder_filter: str | None = None,
        include_folders: list[str] | None = None,
        exclude_folders: list[str] | None = None,
        exclude_index_folders: list[str] | None = None,
        sparse_query: tuple[list[int], list[float]] | SparseVector | None = None,
        sparse_weight: float = 0.1,
        date_start: int | None = None,
        date_end: int | None = None,
        date_field: str | None = None,
        fusion: str = "weighted",
    ) -> list[StoredChunk]:
        """Dense or hybrid search (reference search signature + semantics).

        Ref-capture + DISPATCH run under the store lock: segment mutations
        are donated scatter programs (segment.py) that invalidate the
        buffers they update, so a search capturing ``seg.vecs`` while a
        concurrent upsert/delete donates it would crash with "Array has
        been deleted". Once dispatched, the execution holds its own buffer
        references, so the device SYNC (the dominant per-query wall time —
        several ms of scan plus tunnel RTT) and the SQLite payload
        materialization run OUTSIDE the lock: queries don't hold the store
        against writers for their device time, and writers don't add their
        under-lock time to query tails. The generation check in
        :meth:`_materialize` guards the dispatch→materialize window
        against compaction's gid reuse.
        """
        with self._lock:
            res = self._search_locked(
                query_embedding, limit, folder_filter, include_folders,
                exclude_folders, exclude_index_folders, sparse_query,
                sparse_weight, date_start, date_end, date_field, fusion)
        if isinstance(res, list):  # resolved under the lock (empty/edge)
            return res
        scores, gids, gen = res  # device arrays: sync outside the lock
        return self._materialize(np.asarray(scores)[0], np.asarray(gids)[0],
                                 expected_generation=gen)

    def _search_locked(
        self, query_embedding, limit, folder_filter, include_folders,
        exclude_folders, exclude_index_folders, sparse_query, sparse_weight,
        date_start, date_end, date_field, fusion,
    ) -> list[StoredChunk]:
        self._ensure_open()
        gen = self._generation  # detect gid reuse racing this search
        if (self._sharded is None and not self._segments) or self.count() == 0:
            return []
        include_ids, exclude_ids, exclude_if_ids, impossible = (
            self._resolve_filter_ids(folder_filter, include_folders,
                                     exclude_folders, exclude_index_folders))
        if impossible:
            return []
        spec = make_filter_spec(
            include_folder_ids=include_ids,
            exclude_folder_ids=exclude_ids,
            exclude_index_folder_ids=exclude_if_ids,
            date_start=date_start, date_end=date_end, date_field=date_field)

        q = np.asarray(query_embedding, np.float32).reshape(1, -1)
        nrm = np.linalg.norm(q)
        if nrm > 0:
            q = q / nrm

        has_sparse = sparse_query is not None and len(
            sparse_query.indices if isinstance(sparse_query, SparseVector)
            else sparse_query[0]) > 0
        qt = qw = None
        if has_sparse:
            qt, qw = self._sparse_query_arrays(sparse_query)

        if self._sharded is not None:
            return self._search_sharded(q, spec, qt, qw, limit,
                                        sparse_weight, has_sparse)

        if (self._cold_ivf is not None and not self._ivf_dirty
                and self.cold_tier_active):
            return self._search_cold_ivf(q, spec, qt, qw, limit,
                                         sparse_weight, has_sparse, fusion)

        if self.ivf_active or (has_sparse and self.postings_active):
            return self._search_snapshot(q, spec, qt, qw, limit,
                                         sparse_weight, has_sparse, fusion)

        dense_scores, sparse_scores = self._score_all_segments(
            jnp.asarray(q), spec, qt, qw,
            bq_k=limit * self.prefetch_multiplier * self._bq_oversample)

        if has_sparse:
            if fusion == "rrf":
                scores, gids = rrf_fuse(dense_scores, sparse_scores,
                                        limit=limit,
                                        prefetch_multiplier=self.prefetch_multiplier)
            else:
                scores, gids = hybrid_fuse(dense_scores, sparse_scores,
                                           sparse_weight, limit=limit,
                                           prefetch_multiplier=self.prefetch_multiplier)
        else:
            scores, gids = masked_topk(dense_scores, limit)

        return scores, gids, gen

    def _search_sharded(self, q, spec, qt, qw, limit, sparse_weight,
                        has_sparse):
        """Multi-chip path: per-shard Pallas scans (probe-limited when a
        per-chip IVF snapshot is live), local top-p, all-gather candidate
        merge over ICI, replicated fusion (parallel/sharded.py)."""
        scores, gids = self._sharded.search(
            jnp.asarray(q), spec,
            qt=qt if has_sparse else None, qw=qw if has_sparse else None,
            sparse_weight=sparse_weight, limit=limit,
            prefetch_multiplier=self.prefetch_multiplier,
            nprobe=self._ivf_nprobe if self.ivf_active else None,
            use_postings=self.postings_active,
            max_postings=self._sparse_max_postings)
        # Sharded mode never compacts (gids are stable), so no generation
        # race is possible here (expected_generation stays None).
        return scores, gids, None

    def _search_cold_ivf(self, q, spec, qt, qw, limit, sparse_weight,
                         has_sparse, fusion):
        """Composed beyond-HBM serving — IVF x cold tier x BQ in ONE path.

        Per cold segment: IVF-probed coarse scan over the cell-major BQ
        sketch (index/ivf_bq.py; phase 1, ALL segments enqueued before the
        first host sync so their device work overlaps), then exact host
        rescore of the over-fetched candidates (phase 2). The resident
        tail (the open write segment) is exact-flat-scanned on device.
        Everything fuses in CANDIDATE space — O(candidates), not O(rows),
        so a 100M-row store never materializes a [B, N] score array.
        Matches the reference engine's composed mmap + ANN + quantized
        rescore serving (vector_store.py:88-115)."""
        from voitta_rag_tpu.index.bq_serve import bq_candidate_lists
        from voitta_rag_tpu.ops.fusion import (
            hybrid_fuse_candidates, rrf_fuse_candidates,
        )

        gen = self._generation
        civf = self._cold_ivf
        qj = jnp.asarray(q)
        b = qj.shape[0]
        p = limit * self.prefetch_multiplier
        bq_k = p * self._bq_oversample
        base = self.segment_capacity
        qt_j = jnp.asarray(qt) if qt is not None else None
        qw_j = jnp.asarray(qw) if qw is not None else None

        # Phase 1 (device, async): every cold segment's probe + select.
        phase1: dict[int, object] = {}
        # Resident tail scans, also enqueued before any sync.
        res_parts: list[tuple[int, tuple, tuple | None]] = []
        for i, seg in enumerate(self._segments):
            if not seg.resident:
                phase1[i] = civf.coarse_candidates(
                    qj, i, spec, k_prime=bq_k, nprobe=self._ivf_nprobe,
                    select=self._bq_select)
                continue
            d = dense_scan_scores(qj, seg.vecs, seg.cols, spec, seg.scales)
            d_pair = masked_topk(d, min(p, d.shape[-1]))
            s_pair = None
            if has_sparse:
                s = sparse_scan_scores(qt_j, qw_j, seg.terms, seg.weights,
                                       seg.cols, spec)
                s = jnp.broadcast_to(s, (b, s.shape[-1]))
                s_pair = masked_topk(s, min(p, s.shape[-1]))
            res_parts.append((i, d_pair, s_pair))

        # Phase 2 (host): exact rescore; gids = seg_index * cap + row.
        d_vals, d_gids, s_vals, s_gids = [], [], [], []
        for i, seg in enumerate(self._segments):
            if seg.resident:
                continue
            (dv, dr), sp2 = bq_candidate_lists(
                qj, seg, spec, np.asarray(phase1[i]), qt, qw, k_prime=bq_k)
            d_vals.append(dv)
            d_gids.append(np.where(dr >= 0, dr + i * base, -1))
            if sp2 is not None:
                sv, sr = sp2
                s_vals.append(sv)
                s_gids.append(np.where(sr >= 0, sr + i * base, -1))
        for i, d_pair, s_pair in res_parts:
            dv, dp_ = np.asarray(d_pair[0]), np.asarray(d_pair[1])
            d_vals.append(dv)
            d_gids.append(np.where(dp_ >= 0, dp_ + i * base, -1))
            if s_pair is not None:
                sv, sp_ = np.asarray(s_pair[0]), np.asarray(s_pair[1])
                s_vals.append(sv)
                s_gids.append(np.where(sp_ >= 0, sp_ + i * base, -1))

        dva = jnp.asarray(np.concatenate(d_vals, axis=1))
        dga = jnp.asarray(np.concatenate(d_gids, axis=1))
        if has_sparse and s_vals:
            sva = jnp.asarray(np.concatenate(s_vals, axis=1))
            sga = jnp.asarray(np.concatenate(s_gids, axis=1))
            if fusion == "rrf":
                scores, gids = rrf_fuse_candidates(
                    dva, dga, sva, sga, limit=limit,
                    prefetch_multiplier=self.prefetch_multiplier)
            else:
                scores, gids = hybrid_fuse_candidates(
                    dva, dga, sva, sga, sparse_weight, limit=limit,
                    prefetch_multiplier=self.prefetch_multiplier)
        else:
            from voitta_rag_tpu.ops.pallas_utils import NEG_INF

            masked = jnp.where(dga >= 0, dva, NEG_INF)
            scores, pos = masked_topk(masked, min(limit, masked.shape[-1]))
            gids = jnp.where(pos >= 0,
                             jnp.take_along_axis(
                                 dga, jnp.maximum(pos, 0), axis=1), -1)
        return scores, gids, gen

    def _search_snapshot(self, q, spec, qt, qw, limit, sparse_weight,
                         has_sparse, fusion):
        """Read-optimized path: dense candidates from the IVF probe (or flat
        scan) + sparse candidates from the inverted postings (or full slot
        scan), fused on the candidate lists — the serving analogue of the
        reference's Qdrant HNSW + sparse-index hybrid query
        (services/vector_store.py:621-697)."""
        gen = self._generation  # detect gid reuse racing this search
        from voitta_rag_tpu.ops.fusion import (
            hybrid_fuse_candidates, rrf_fuse_candidates,
        )

        qj = jnp.asarray(q)
        p = limit * self.prefetch_multiplier
        if self.ivf_active and self._ivf is not None:
            from voitta_rag_tpu.index.ivf_flat import IVFFlatIndex

            if isinstance(self._ivf, IVFFlatIndex):
                # limit=p is already the prefetch-expanded candidate count;
                # prefetch_multiplier=1 keeps the in-probe top-k at p+8.
                d_vals, d_gids = self._ivf.search_candidates(
                    qj, spec, nprobe=self._ivf_nprobe, limit=p,
                    prefetch_multiplier=1)
            else:
                d_vals, d_gids = self._ivf.search_candidates(
                    qj, spec, nprobe=self._ivf_nprobe, limit=p,
                    select=self._ivf_select)
        else:
            dense_scores, _ = self._score_all_segments(
                qj, spec, bq_k=p * self._bq_oversample)
            d_vals, d_gids = masked_topk(
                dense_scores, min(p, dense_scores.shape[-1]),
                approx=dense_scores.shape[-1] > (1 << 16))

        if not has_sparse:
            return d_vals[:, :limit], d_gids[:, :limit], gen

        if self.postings_active:
            s_vals, s_gids = self._postings.candidates(
                jnp.asarray(qt), jnp.asarray(qw), self._postings_cols, spec,
                limit=p, max_postings=self._sparse_max_postings)
        else:
            s_parts = [sparse_scan_scores(
                jnp.asarray(qt), jnp.asarray(qw), seg.terms, seg.weights,
                seg.cols, spec) for seg in self._segments]
            s_scores = jnp.concatenate(s_parts, axis=1)
            s_vals, s_gids = masked_topk(
                s_scores, min(p, s_scores.shape[-1]),
                approx=s_scores.shape[-1] > (1 << 16))

        fuse = rrf_fuse_candidates if fusion == "rrf" else None
        if fuse is not None:
            scores, gids = fuse(
                d_vals, d_gids, s_vals, s_gids, limit=limit,
                prefetch_multiplier=self.prefetch_multiplier)
        else:
            scores, gids = hybrid_fuse_candidates(
                d_vals, d_gids, s_vals, s_gids, sparse_weight,
                limit=limit, prefetch_multiplier=self.prefetch_multiplier)
        return scores, gids, gen

    @property
    def generation(self) -> int:
        """Gid-numbering generation (bumped by compaction's gid reuse)."""
        self._ensure_open()
        return self._generation

    def _materialize(self, scores: np.ndarray, gids: np.ndarray,
                     expected_generation: int | None = None) -> list[StoredChunk]:
        payloads = self._payloads
        if self._closed or payloads is None:
            # close() raced this search's (lock-free) materialize phase.
            return []
        if (expected_generation is not None
                and expected_generation != self._generation):
            # A compaction REUSED gids while this search was in flight: its
            # scored gids belong to the old numbering and would resolve to
            # the wrong payloads. Deletes alone are safe (missing gids skip
            # defensively below); reuse is not — return empty for this rare
            # race rather than wrong results.
            logger.warning("search crossed a compaction; dropping results")
            return []
        keep = [(int(g), float(s)) for s, g in zip(scores, gids)
                if g >= 0 and s > VALID_THRESHOLD]
        payload = payloads.get_chunks([g for g, _ in keep])
        if any(g not in payload for g, _ in keep):
            # A top-k gid may belong to a store_chunks whose device write
            # is visible but whose post-lock payload insert hasn't
            # committed yet (the insert may even commit and drop the
            # pending counter between our fetch and this check). Wait for
            # in-flight inserts — free when none are pending — and
            # re-fetch just the missing rows; only the rare racing query
            # pays, instead of every query paying the insert's lock-hold
            # as before. Rows still missing after this are genuine
            # deletions and stay skipped.
            self._drain_pending_inserts(timeout=2.0)
            payload.update(payloads.get_chunks(
                [g for g, _ in keep if g not in payload]))
        if (expected_generation is not None
                and expected_generation != self._generation):
            # Re-check AFTER the fetch: a compaction can bump the
            # generation and commit its remap between the check above and
            # the SELECT, in which case old-numbering gids just resolved
            # against the remapped table (other chunks' text/metadata).
            # compact bumps the in-memory generation BEFORE the SQL remap
            # commits, so any fetch that could have seen remapped rows is
            # caught here.
            logger.warning("search crossed a compaction; dropping results")
            return []
        out = []
        for g, s in keep:
            chunk = payload.get(g)
            if chunk is None:  # payload/device divergence: skip defensively
                continue
            chunk.score = s
            out.append(chunk)
        return out

    # -- scroll-style lookups (reference vector_store.py:163-214, 698-1016) --
    def count(self) -> int:
        return self.payloads.count()

    def count_chunks_for_file(self, file_path: str) -> int:
        return self.payloads.count_for_file(file_path)

    def get_chunk_range(self, file_path: str, start: int, end: int) -> list[StoredChunk]:
        return self.payloads.chunks_for_file(file_path, start, end)

    def get_chunks_for_file(self, file_path: str) -> list[StoredChunk]:
        return self.payloads.chunks_for_file(file_path)

    def get_file_paths_for_folder(self, folder_path: str) -> set[str]:
        return self.payloads.file_paths_for("folder_path", folder_path)

    def get_file_paths_for_index_folder(self, index_folder: str) -> set[str]:
        return self.payloads.file_paths_for("index_folder", index_folder)

    def find_by_source_url(self, source_url: str) -> list[StoredChunk]:
        return self.payloads.find_by_source_url(source_url)

    def update_file_acl(self, file_path: str, allowed_users: list[str] | None) -> None:
        self.payloads.update_acl(file_path, allowed_users)

    def get_collection_info(self) -> dict:
        self._ensure_open()
        return {
            "name": self.collection_name,
            "points_count": self.count(),
            "segments": len(self._segments) if self._sharded is None
            else self._sharded.n_shards,
            "sharded": self._sharded is not None,
            "segment_capacity": self.segment_capacity,
            "cold_segments": (0 if self._sharded is not None else
                              sum(1 for s in self._segments
                                  if not s.resident)),
            "bq_shadowed_segments": (0 if self._sharded is not None else
                                     sum(1 for s in self._segments
                                         if s.bq_packed is not None)),
            "dimension": self.dimension,
            "dtype": self.segment_dtype,
            "status": "green",
        }

    # -- persistence ---------------------------------------------------------
    def save(self) -> None:
        """Spill device segments to disk.

        Only the device→host pulls run under the store lock; zlib
        compression (the dominant cost — seconds for GB-scale segments)
        runs outside it so autosave never blocks the watcher's synchronous
        deletes, the indexing worker, or searches for the compression
        time. The host snapshot is consistent-at-capture; mutations that
        land mid-compression are picked up by the next autosave (the
        dirty counter resets under the lock at capture time).
        """
        with self._save_lock:
            self._save_impl()

    def _save_impl(self) -> None:
        with self._lock:
            if self._closed:
                return  # autosave racing close() must not reopen the store
            self._ensure_open()
            if self._sharded is not None:
                host_states = [("sharded", self._sharded.to_host())]
                n_segments = None
            else:
                host_states = [(f"segment_{i:04d}", seg.to_host())
                               for i, seg in enumerate(self._segments)]
                n_segments = len(self._segments)
            captured = self._unsaved_mutations
            self._unsaved_mutations = 0
        try:
            for name, state in host_states:
                final = self.index_dir / f"{name}.npz"
                # Write-then-rename: a crash (or a concurrent reader) mid-
                # write must never leave a corrupt spill at the final path.
                # (savez appends ".npz" to paths without it, so the temp
                # name must already end in .npz.)
                tmp = final.with_name(f"{name}.tmp.npz")
                np.savez_compressed(tmp, **state)
                os.replace(tmp, final)
        except BaseException:
            # A failed write (ENOSPC, I/O error) must leave the store
            # dirty so the next autosave retries these mutations.
            with self._lock:
                self._unsaved_mutations += captured
            raise
        if n_segments is not None:
            self._prune_spills(n_segments)

    def compact(self, min_waste_fraction: float = 0.25) -> dict:
        """Merge live rows into the fewest segments (SURVEY §7 hard part:
        deletes are tombstones, so a delete-heavy history leaves sparse
        segments whose dead rows are still scanned every query).

        Left-packs all live rows into fresh segments, remaps payload gids
        (gid = slot * capacity + row makes positions load-bearing), drops
        the now-empty tail segments, invalidates snapshots, and spills. A
        no-op unless at least ``min_waste_fraction`` of allocated rows are
        dead or a whole segment can be dropped. int8 segments re-quantize
        from their dequantized values (second-order error only).

        SEAL-BASED: the store lock is held only for two brief phases.
        Phase 1 snapshots live rows from the host mirrors (memcpy), SEALS
        the snapshotted segments against new writes, and arms a delete
        journal (``_compact_deleted``). Phase 2 — uploads of the packed
        corpus and the zlib temp spills, the minutes-scale work that
        previously held the lock for the whole rebuild — runs UNLOCKED
        while searches, upserts (landing in fresh unsealed segments), and
        deletes (tombstoning the sealed segments AND the journal) proceed.
        Phase 3 re-applies journaled deletes to the rebuilt segments,
        shifts segments appended during the window to follow the rebuilt
        ones (their rows carry over; only their gids remap), and commits.

        Crash safety (journaled): new segments are spilled to temp files
        FIRST; the payload remap commits atomically with a bumped
        ``gid_generation`` stamp that a journal file also records; only
        then are temps renamed over the old spills. Recovery on open
        (:meth:`_recover_compaction`) uses the stamp to tell which side of
        the remap a crash landed on and rolls forward or discards temps.
        Window mutations not yet respilled at a crash degrade exactly like
        a crash before a routine autosave: tombstone-less rows with no
        payload are dropped defensively (:meth:`_materialize`), appended
        rows surface as payload/device divergence for the repair cycle.

        Lock order: ``_save_lock`` → ``_lock`` (same as save/close) — an
        autosave's UNLOCKED compression/write phase racing compact() would
        otherwise os.replace stale pre-compaction spills over the freshly
        renamed compacted ones (old numbering against remapped payloads).
        ``_save_lock`` is held for the whole rebuild, so autosave/close
        block until commit (background threads; acceptable by design).
        """
        with self._save_lock:
            # ---- Phase 1 (locked): snapshot mirrors + seal --------------
            with self._lock:
                self._ensure_open()
                if self._sharded is not None:
                    raise ValueError(
                        "compaction applies to flat segments (sharded mode "
                        "reuses tombstoned rows in place)")
                if not self._segments:
                    return {"compacted": False, "reason": "empty store"}
                cap = self.segment_capacity
                live_total = sum(s.live_count for s in self._segments)
                n_needed = max((live_total + cap - 1) // cap, 1)
                allocated = sum(min(s._next, s.capacity)
                                for s in self._segments)
                dead = allocated - live_total
                if allocated == 0 or (n_needed == len(self._segments)
                                      and dead < allocated * min_waste_fraction):
                    return {"compacted": False,
                            "reason": "below waste threshold",
                            "live": live_total, "dead": dead}

                dense_l, cols_l, terms_l, weights_l, old_gids = \
                    [], [], [], [], []
                for si, seg in enumerate(self._segments):
                    rows = np.nonzero(seg.valid_np)[0]
                    if not len(rows):
                        continue
                    # Host mirrors, fancy-indexed → consistent copies. Raw
                    # storage dtype here (1-2 B/row-element); the f32
                    # widen + int8 dequant happen in phase 2, outside the
                    # lock — halving+ the under-lock memcpy.
                    scales = (seg.scales_np[0][rows].copy()
                              if seg.dtype == "int8" else None)
                    dense_l.append((seg.vecs_np[rows], scales))
                    cols_l.append(seg.cols_np[:, rows].T)
                    terms_l.append(seg.terms_np[rows])
                    weights_l.append(seg.weights_np[:, rows].T)
                    old_gids.append(rows + si * cap)
                n_sealed = len(self._segments)
                # Device-repack capture: a sealed segment's vecs/scales/
                # terms/weights device buffers are stable for the whole
                # window — writes are sealed out, tombstones donate only
                # cols, and without a device budget nothing offloads. The
                # rebuild can then gather rows HBM→HBM instead of shipping
                # the corpus back through the host tunnel (whose occupancy
                # was the residual search-p95 tail under compaction).
                device_src = None
                if (not self._device_rows_budget
                        and all(s.resident for s in self._segments)):
                    device_src = [(s.vecs, s.scales, s.terms, s.weights)
                                  for s in self._segments]
                for seg in self._segments:
                    seg.seal()
                self._compact_deleted = set()

            # ---- Phase 2 (UNLOCKED): rebuild + temp spills --------------
            tmp_paths: list = []
            try:
                cols_rows = np.concatenate(cols_l) if cols_l else None
                terms_rows = np.concatenate(terms_l) if terms_l else None
                weights_rows = (np.concatenate(weights_l) if weights_l
                                else None)
                old = np.concatenate(old_gids) if old_gids else np.zeros(
                    0, np.int64)
                if device_src is not None:
                    dense_raw = (np.concatenate([p[0] for p in dense_l])
                                 if dense_l else None)
                    scales_raw = (np.concatenate([p[1] for p in dense_l])
                                  if dense_l and dense_l[0][1] is not None
                                  else None)
                    dense = None
                else:
                    def widen(pair):
                        raw, scales = pair
                        v = raw.astype(np.float32)
                        if scales is not None:
                            v *= scales[:, None]
                        return v

                    dense = (np.concatenate([widen(p) for p in dense_l])
                             if dense_l else np.zeros(
                                 (0, self.dimension), np.float32))

                new_segments = []
                mapping: dict[int, int] = {}
                pos = 0
                from voitta_rag_tpu.index.segment import gather_rows_into

                for si in range(n_needed):
                    seg = Segment(cap, self.dimension, self.sparse_slots,
                                  self.segment_dtype)
                    n = min(cap, len(old) - pos)
                    if n > 0 and device_src is not None:
                        # Device repack: mirrors fill from the phase-1
                        # host snapshot (memcpy); vecs/scales/terms/
                        # weights gather HBM→HBM from the sealed sources
                        # (zero tunnel bytes, int8 codes verbatim); only
                        # the tiny filter-cols block uploads (tombstones
                        # donate source cols, so they weren't captured).
                        sl = slice(pos, pos + n)
                        seg.vecs_np[:n] = dense_raw[sl]
                        if scales_raw is not None:
                            seg.scales_np[0, :n] = scales_raw[sl]
                        seg.weights_np[:, :n] = weights_rows[sl].T
                        seg.cols_np[:, :n] = cols_rows[sl].T
                        seg.terms_np[:n] = terms_rows[sl]
                        seg.valid_np[:n] = cols_rows[sl, COL_VALID] > 0
                        seg._next = n
                        seg.cols = jnp.asarray(seg.cols_np)
                        src_g = old[sl]
                        src_si_arr = src_g // cap
                        dst_all = np.arange(n, dtype=np.int32)
                        for s_si in np.unique(src_si_arr):
                            sel = np.nonzero(src_si_arr == s_si)[0]
                            gather_rows_into(
                                seg, dst_all[sel],
                                *device_src[int(s_si)],
                                src_rows=(src_g[sel] % cap).astype(
                                    np.int32))
                        jax.block_until_ready(seg.cols)
                        for j in range(n):
                            mapping[int(old[pos + j])] = si * cap + j
                        pos += n
                    elif n > 0:
                        rows = seg.allocate(n)
                        # Throttled upload: one scatter bucket at a time,
                        # blocking between buckets, so concurrent searches
                        # interleave with the rebuild's transfers instead
                        # of queueing behind the whole corpus re-upload
                        # (~100 MB+ enqueued back-to-back was the p99 tail
                        # under mutation even with the lock free).
                        max_b = UPDATE_BUCKETS[-1]
                        for lo in range(0, n, max_b):
                            hi = min(lo + max_b, n)
                            seg.write_rows(rows[lo:hi],
                                           dense[pos + lo:pos + hi],
                                           cols_rows[pos + lo:pos + hi],
                                           terms_rows[pos + lo:pos + hi],
                                           weights_rows[pos + lo:pos + hi])
                            jax.block_until_ready(seg.cols)
                        for j, r in enumerate(rows):
                            mapping[int(old[pos + j])] = si * cap + int(r)
                        pos += n
                    new_segments.append(seg)
                    # Beyond-HBM stores: never hold more than the device
                    # budget resident while rebuilding — filled segments
                    # offload as they complete (the last stays resident).
                    if (self._device_rows_budget and si < n_needed - 1
                            and (si + 1) * cap > self._device_rows_budget):
                        seg.offload(bq=self._cold_bq)

                # New spills under temp names (old finals stay valid).
                for i, seg in enumerate(new_segments):
                    tmp = self.index_dir / f"compact_{i:04d}.tmp.npz"
                    np.savez_compressed(tmp, **seg.to_host())
                    tmp_paths.append(tmp)
                if self._compact_window_hook is not None:
                    self._compact_window_hook()
            except BaseException:
                with self._lock:
                    for seg in (self._segments or [])[:n_sealed]:
                        seg.unseal()
                    self._compact_deleted = None
                for tmp in tmp_paths:
                    tmp.unlink(missing_ok=True)
                raise

            # ---- Phase 3 (locked): delta replay + journaled commit ------
            with self._lock:
                # Post-lock payload inserts carry OLD-numbering gids; the
                # remap below must cover their rows, so they must be in
                # SQLite before it runs. Under the store lock no new
                # insert can start (increments happen under it), and the
                # pending ones need no lock to finish.
                self._drain_pending_inserts()
                # Deletes that landed during the rebuild window: their
                # tombstones hit the sealed segments (now discarded), so
                # re-apply them to the rebuilt rows. pop: a dead row needs
                # no payload remap (its payload row is already gone).
                deleted = self._compact_deleted or set()
                self._compact_deleted = None
                del_by_seg: dict[int, list[int]] = {}
                for g in deleted:
                    ng = mapping.pop(int(g), None)
                    if ng is not None:
                        del_by_seg.setdefault(ng // cap, []).append(ng % cap)
                for si, rows in del_by_seg.items():
                    new_segments[si].tombstone_rows(
                        np.asarray(sorted(rows), np.int32))
                # Segments appended during the window keep their rows and
                # slide down to follow the rebuilt ones; identity entries
                # keep their payload rows out of the orphan sweep.
                # Journal-deleted appended rows are EXCLUDED: their device
                # tombstones landed directly (appended segments are never
                # sealed), and mapping them would remap their payload rows
                # instead of letting the orphan sweep remove them — after
                # which the deleting thread's stale-gid DELETE (now
                # skipped via the generation check) was the only remover.
                appended = self._segments[n_sealed:]
                for j, seg in enumerate(appended):
                    ob = (n_sealed + j) * cap
                    nb = (n_needed + j) * cap
                    for r in range(seg._next):
                        if ob + r in deleted:
                            continue
                        mapping[ob + r] = nb + r
                n_total = n_needed + len(appended)

                # Journal records the generation the remap will stamp.
                new_gen = self._generation + 1
                journal = self.index_dir / "compaction.journal"
                # Atomic journal write (write-then-rename): a torn journal
                # at recovery time with a committed remap would discard the
                # temps the roll-forward needs.
                jtmp = journal.with_suffix(".journal.tmp")
                jtmp.write_text(json.dumps(
                    {"generation": new_gen, "segments": n_needed}))
                os.replace(jtmp, journal)
                # Drop orphan payload rows (lost/quarantined segments:
                # their device rows are gone and the repair cycle
                # re-indexes the files) so remap targets cannot collide,
                # then remap + stamp in ONE transaction. _remap_lock makes
                # the whole commit atomic w.r.t. in-flight delete phase-2
                # SQL: a delete that tombstoned rows under the OLD
                # numbering either finishes its payload DELETE before this
                # commit (then its gids are simply absent from all_gids)
                # or observes the bumped generation and skips it (the
                # journal pop + this orphan sweep removed its rows).
                with self._remap_lock:
                    orphans = set(self._payloads.all_gids()) - set(mapping)
                    if orphans:
                        self._payloads.delete_gids(sorted(orphans))
                        logger.info(
                            "compact: dropped %d orphan payload rows "
                            "(pending repair)", len(orphans))
                    # In-memory generation bumps BEFORE the SQL remap
                    # commits: a reader that somehow observes the remapped
                    # payloads must also observe the bumped generation
                    # (its gen check then fails and it returns empty
                    # instead of wrong rows).
                    self._generation = new_gen
                    self._payloads.remap_gids(
                        {o: nw for o, nw in mapping.items() if o != nw},
                        generation=new_gen)
                # Swap in memory + on disk, then clear the journal.
                dropped = n_sealed - n_needed
                self._segments = new_segments + list(appended)
                self._enforce_device_budget()
                self._ivf_dirty = True
                self._postings_dirty = True
                for i, tmp in enumerate(tmp_paths):
                    os.replace(tmp, self.index_dir / f"segment_{i:04d}.npz")
                # Appended segments have no spill yet; stale pre-compaction
                # spills must not be reloadable at their slots.
                for idx in range(n_needed, n_total):
                    (self.index_dir
                     / f"segment_{idx:04d}.npz").unlink(missing_ok=True)
                self._prune_spills(n_total)
                journal.unlink(missing_ok=True)
                # Window mutations (appended rows; journaled deletes, which
                # postdate the temp spills) flush at the next autosave.
                self._unsaved_mutations = (len(deleted) + sum(
                    s.live_count for s in appended))
                logger.info(
                    "Compacted %d live rows into %d segments (%d dead rows "
                    "reclaimed, %d segments dropped, %d window deletes, "
                    "%d window segments)", live_total, n_needed, dead,
                    dropped, len(deleted), len(appended))
                return {"compacted": True, "live": live_total,
                        "reclaimed": dead, "segments": n_needed,
                        "segments_dropped": dropped,
                        "window_deletes": len(deleted),
                        "window_segments": len(appended)}

    def _recover_compaction(self) -> None:
        """Roll an interrupted compaction forward or back (called with the
        lock held, payloads open, before segment spills are read).

        The ``gid_generation`` stamp commits in the SAME transaction as the
        payload remap, so: stamp == journal generation → the remap
        committed; promote the temp spills (they match the new numbering).
        Otherwise the remap never happened; discard temps and keep the old
        spills."""
        journal = self.index_dir / "compaction.journal"
        tmps = sorted(self.index_dir.glob("compact_*.tmp.npz"))
        if not journal.exists():
            for t in tmps:
                t.unlink(missing_ok=True)
            return
        try:
            meta = json.loads(journal.read_text())
            gen = int(meta["generation"])
            n_segments = int(meta["segments"])
        except (ValueError, KeyError):
            gen, n_segments = -1, -1
        stamped = int(self._payloads.get_meta("gid_generation", "0") or 0)
        if gen > 0 and stamped == gen:
            # The remap committed: roll FORWARD unconditionally. A crash
            # mid-rename leaves only SOME temps (the rest already sit at
            # their final paths); discarding the remainder would mix
            # old-numbering spills with remapped payloads — silent
            # corruption. Each temp carries its own index in its name, so
            # partial sets promote to the right slots.
            logger.warning(
                "Recovering interrupted compaction (generation %d): "
                "promoting %d remaining temp spills", gen, len(tmps))
            for t in tmps:
                idx = int(t.name.split("_")[1].split(".")[0])
                os.replace(t, self.index_dir / f"segment_{idx:04d}.npz")
            if n_segments > 0:
                self._prune_spills(n_segments)
        else:
            logger.warning(
                "Discarding incomplete compaction attempt (journal gen %d, "
                "payload stamp %d)", gen, stamped)
            for t in tmps:
                t.unlink(missing_ok=True)
        journal.unlink(missing_ok=True)

    def save_if_dirty(self, min_mutations: int = 1) -> bool:
        """Autosave hook: spill device segments to disk when mutated."""
        with self._lock:
            if self._payloads is None or self._segments is None:
                return False
            if self._unsaved_mutations < min_mutations:
                return False
        # save() re-checks under its own locking; the store lock must NOT
        # be held here or compression would run inside it.
        self.save()
        return True

    def close(self) -> None:
        # _save_lock first: joins an in-flight save's write phase so no
        # stale spill writes land after close() returns (same lock order
        # as save/compact).
        with self._save_lock, self._lock:
            self._closed = True
            # Post-lock payload inserts write to the SQLite handle being
            # closed below; new ones can't start once we hold the lock.
            self._drain_pending_inserts()
            if self._payloads is not None:
                self._payloads.close()
            self._payloads = None
            self._segments = None
            self._sharded = None


_vector_store: TpuVectorStore | None = None
_create_lock = threading.Lock()


def get_vector_store() -> TpuVectorStore:
    global _vector_store
    # Double-checked creation lock: executor threads can race
    # first-touch; two instances would hold independent locks
    # (and, for the store, two device copies of the index).
    if _vector_store is None:
        with _create_lock:
            if _vector_store is None:
                _vector_store = TpuVectorStore()
    return _vector_store


def reset_vector_store() -> None:
    global _vector_store
    if _vector_store is not None:
        _vector_store.close()
    _vector_store = None
