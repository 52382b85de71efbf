"""Application + engine configuration.

Behavior contract: reference config.py (/root/reference/src/voitta/config.py:12-113)
— env-var driven ``Settings`` singleton with ``lru_cache`` and
``get_settings.cache_clear()`` used by tests. The TPU engine adds its own knobs
(segment capacity, IVF cells, nprobe, sparse slots, mesh axes) that have no
reference counterpart.
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path


def _env_bool(name: str, default: str = "false") -> bool:
    return os.getenv(name, default).lower() in ("true", "1", "yes")


def _clamped_int(name: str, default: int, lo: int, hi: int) -> int:
    """Integer env knob clamped to [lo, hi] WITH a warning on out-of-range
    (a silently-clamped value would serve different semantics than asked)."""
    try:
        raw = int(os.getenv(name, str(default)))
    except ValueError:
        raw = default
    if not lo <= raw <= hi:
        import logging

        clamped = max(lo, min(hi, raw))
        logging.getLogger(__name__).warning(
            "%s=%s out of range [%d, %d]; using %d", name, raw, lo, hi,
            clamped)
        return clamped
    return raw


def _choice(name: str, default: str, choices: tuple[str, ...]) -> str:
    """Enumerated env knob; unknown values warn and fall back to default
    (same policy as _select_policy: a typo must not silently change the
    serving path)."""
    raw = os.getenv(name, default).strip().lower()
    if raw in choices:
        return raw
    import logging

    logging.getLogger(__name__).warning(
        "%s=%r is not one of %s; using %r", name, raw, choices, default)
    return default


def _select_policy(name: str) -> str:
    """Candidate-selection env knob: "exact" | "approx" (case-insensitive).

    Any other value falls back to "exact" WITH a warning — a typo'd
    "approx" silently serving exact selection would lose the requested
    throughput with no signal."""
    raw = os.getenv(name, "exact").strip().lower()
    if raw in ("exact", "approx"):
        return raw
    import logging

    logging.getLogger(__name__).warning(
        "%s=%r is not 'exact' or 'approx'; using 'exact'", name, raw)
    return "exact"


# Hidden sizes of the encoder presets (models/encoder.py PRESETS) that owned
# checkpoints can name. Kept as a local table so Settings resolution stays
# import-light (models/encoder pulls in jax).
_PRESET_DIMS = {
    "intfloat/e5-base-v2": 768,
    "BAAI/bge-base-en-v1.5": 768,
    "sentence-transformers/all-MiniLM-L6-v2": 384,
    "sentence-transformers/all-distilroberta-v1": 768,
    "sentence-transformers/all-mpnet-base-v2": 768,
    "intfloat/multilingual-e5-base": 768,
    "intfloat/multilingual-e5-large": 1024,
    "sentence-transformers/multi-qa-distilbert-cos-v1": 768,
    "sentence-transformers/msmarco-distilbert-cos-v5": 768,
    "test-tiny": 64,
}


def _default_ckpt_path() -> str:
    """The repo-committed offline-trained retrieval checkpoint, if present.

    scripts/train_retrieval_ckpt.py writes it; the bench's trained-retrieval
    section evaluates the same file, so what the app serves by default is
    exactly what the benchmark measured.
    """
    p = (Path(__file__).resolve().parents[1] / "bench_cache"
         / "trained_minilm.v1.npz")
    return str(p) if p.exists() else ""


def _owned_ckpt_meta(path: str) -> dict | None:
    """Metadata of an owned .npz retrieval checkpoint, None for anything
    else (directories, missing files, foreign npz)."""
    if not path.endswith(".npz"):
        return None
    try:
        import json

        import numpy as np

        z = np.load(path, allow_pickle=False)
        return json.loads(str(z["__meta__"]))
    except Exception:
        return None


class Settings:
    """Settings loaded from environment variables (reference config.py:12-107)."""

    def __init__(self) -> None:
        # Core paths / serving
        self.root_path: Path = Path(
            os.getenv("VOITTA_ROOT_PATH", "./voitta-data")
        ).resolve()
        self.db_path: Path = Path(os.getenv("VOITTA_DB_PATH", "./voitta.db")).resolve()
        self.host: str = os.getenv("VOITTA_HOST", "0.0.0.0")
        self.port: int = int(os.getenv("VOITTA_PORT", "8000"))
        self.debug: bool = _env_bool("VOITTA_DEBUG")
        self.base_url: str = os.getenv("VOITTA_BASE_URL", f"http://localhost:{self.port}")
        self.docker_mode: bool = _env_bool("VOITTA_DOCKER")

        # Collection (replaces reference's Qdrant collection, config.py:28-30)
        self.collection: str = os.getenv("VOITTA_COLLECTION", "voitta_documents")
        self.index_dir: Path = Path(
            os.getenv("VOITTA_INDEX_DIR", str(self.root_path / ".voitta_index"))
        ).resolve()

        # Embedding settings (reference config.py:32-36). EMBEDDING_MODEL_PATH
        # contract: UNSET = auto-serve the repo's offline-trained retrieval
        # checkpoint when one is committed (random init is the last resort,
        # not the default); "" / "none" / "random" = explicit random-init
        # opt-out; any other value = that checkpoint (an owned .npz or a
        # sentence-transformers/HF directory).
        _mp = os.getenv("EMBEDDING_MODEL_PATH")
        if _mp is None:
            _mp = _default_ckpt_path()
        elif _mp.strip().lower() in ("none", "random"):
            _mp = ""
        self.embedding_model_path: str = _mp
        _ckpt_meta = _owned_ckpt_meta(_mp) if _mp else None
        if _ckpt_meta is not None:
            # Serving an owned checkpoint: model name, vector dimension, and
            # hybrid fusion weight follow the checkpoint unless explicitly
            # overridden — a 384-d MiniLM checkpoint must not be indexed
            # into a 768-d store, and a from-scratch encoder needs a higher
            # sparse weight than frozen e5 (bench trained_hybrid_w).
            _preset = _ckpt_meta.get(
                "preset", "sentence-transformers/all-MiniLM-L6-v2")
            self.embedding_model: str = os.getenv("EMBEDDING_MODEL", _preset)
            self.embedding_dimension: int = int(
                os.getenv("EMBEDDING_DIMENSION",
                          str(_PRESET_DIMS.get(_preset, 384))))
            _default_sw = str(_ckpt_meta.get("hybrid_w", 0.8))
        else:
            self.embedding_model = os.getenv(
                "EMBEDDING_MODEL", "intfloat/e5-base-v2")
            self.embedding_dimension = int(
                os.getenv("EMBEDDING_DIMENSION", "768"))
            _default_sw = "0.1"
        self._sparse_weight_default = _default_sw
        # jax platform for the engine: "auto" | "tpu" | "cpu"
        self.engine_platform: str = os.getenv("VOITTA_ENGINE_PLATFORM", "auto")
        self.max_seq_len: int = int(os.getenv("VOITTA_MAX_SEQ_LEN", "192"))
        self.encode_batch_size: int = int(os.getenv("VOITTA_ENCODE_BATCH", "128"))
        # Index-build encode data parallelism: "auto" = all chips on TPU.
        self.encode_dp: str = os.getenv("VOITTA_ENCODE_DP", "auto")

        # Chunking settings (reference config.py:38-41)
        self.chunk_size: int = int(os.getenv("CHUNK_SIZE", "512"))
        self.chunk_overlap: int = int(os.getenv("CHUNK_OVERLAP", "50"))
        self.chunking_strategy: str = os.getenv("CHUNKING_STRATEGY", "recursive")

        # Hybrid fusion (reference config.py:43-44). Default is 0.1 like the
        # reference when serving pretrained-style weights, but follows the
        # owned checkpoint's bench-tuned weight when that is what's served
        # (see the embedding_model_path resolution above).
        self.sparse_weight: float = float(
            os.getenv("SPARSE_WEIGHT", self._sparse_weight_default))

        # Encoder serving dtype: "auto" = bfloat16 on TPU (halves MXU
        # time; layernorm stats stay f32), float32 elsewhere (CPU bf16 is
        # slower AND noisier). Explicit bfloat16/float32 override.
        self.encoder_dtype: str = os.getenv("VOITTA_ENCODER_DTYPE", "auto")

        # PDF bucketing (reference config.py:46-47)
        self.pdf_pages_per_bucket: int = int(os.getenv("PDF_PAGES_PER_BUCKET", "20"))
        # Optional external PDF worker (the reference's MinerU subprocess
        # pattern, pdf_parser.py:110-164): a command invoked as
        #   <cmd> <pdf_path> <start_page> <end_page>
        # printing {"content": md, "metadata": {...}} JSON on stdout.
        # Empty = use the in-process extractor.
        self.pdf_worker_cmd: str = os.getenv("VOITTA_PDF_WORKER_CMD", "")
        self.pdf_worker_timeout: int = int(
            os.getenv("VOITTA_PDF_WORKER_TIMEOUT", "3600"))
        # Layout-aware extraction for text PDFs (multi-column reading
        # order + table rows, services/parsers/pdf_layout.py — the layout
        # half of the reference's MinerU worker). Pages where no structure
        # is detected keep the cheaper stream-order extraction.
        self.pdf_layout: bool = _env_bool("VOITTA_PDF_LAYOUT", "true")

        # Indexing worker (reference config.py:49-50)
        self.indexing_poll_interval: int = int(os.getenv("INDEXING_POLL_INTERVAL", "10"))

        # Auth (reference config.py:52-59); validated lazily by api/auth.
        self.ms_auth_tenant_id: str = os.getenv("MS_AUTH_TENANT_ID", "")
        self.ms_auth_client_id: str = os.getenv("MS_AUTH_CLIENT_ID", "")
        self.ms_auth_client_secret: str = os.getenv("MS_AUTH_CLIENT_SECRET", "")
        self.google_auth_client_id: str = os.getenv("GOOGLE_AUTH_CLIENT_ID", "")
        self.google_auth_client_secret: str = os.getenv("GOOGLE_AUTH_CLIENT_SECRET", "")

        # MCP server (reference config.py:68-72)
        self.mcp_transport: str = os.getenv("MCP_TRANSPORT", "streamable-http")
        self.mcp_search_limit: int = int(os.getenv("MCP_SEARCH_LIMIT", "20"))

        # ---- TPU engine knobs (no reference counterpart) ----
        # Capacity of one device segment (rows are padded to this; must be a
        # multiple of the scan tile).
        self.segment_capacity: int = int(os.getenv("VOITTA_SEGMENT_CAPACITY", "131072"))
        # Beyond-HBM cold tier: max device-resident rows (0 = unlimited).
        # Full segments past the budget offload to host RAM and are served
        # by streaming scans (index/stream_scan.py).
        self.device_rows_budget: int = int(
            os.getenv("VOITTA_DEVICE_ROWS_BUDGET", "0"))
        # Staging-block rows for cold-tier streaming scans (lane-aligned).
        self.stream_block_rows: int = int(
            os.getenv("VOITTA_STREAM_BLOCK_ROWS", "262144"))
        # Cold-tier binary-quantization shadow: offloaded segments keep a
        # device-resident 1-bit sketch (D/8 bytes/row + filter cols) that is
        # coarse-scanned in HBM; top candidates are exactly rescored against
        # the host rows (ops/bitq.py, ops/rerank.py). Replaces the full
        # streaming scan with ~1/6 the HBM footprint of int8 and no PCIe
        # sweep per query — the Qdrant binary-quantization + rescore
        # analogue. 0 = off (exact streaming scan, bit-identical results).
        self.cold_bq: bool = _env_bool("VOITTA_COLD_BQ")
        # Oversampling factor for the BQ coarse pass: the coarse scan
        # over-fetches limit*prefetch*oversample candidates before exact
        # rescoring (Qdrant quantization "oversampling" semantics).
        self.bq_oversample: int = _clamped_int("VOITTA_BQ_OVERSAMPLE", 4, 1,
                                               256)
        # Bits per dimension of the cold-tier sketch (1-4). 2 is the
        # measured sweet spot: on the hardest real distribution 1-bit
        # sketches hold 0.78 recall@10 at 16x oversampling, 2-bit 0.97,
        # 4-bit 1.00 (ops/bitq.py docstring); 2 bits still shadows ~2.6x
        # more rows per chip than int8 holds (~4.7x at 1 bit).
        self.bq_bits: int = _clamped_int("VOITTA_BQ_BITS", 2, 1, 4)
        # Candidate selection in the BQ coarse pass: "exact" (default —
        # the store serves B=1 where exact top-K' is nearly free, and on
        # the hardest real corpus it holds 0.973 recall vs approx's 0.891)
        # or "approx" (approx_max_k; ~7x the batch-32 selection speed).
        self.bq_select: str = _select_policy("VOITTA_BQ_SELECT")
        # Dense storage dtype on device: "bfloat16" | "float32" | "int8"
        self.segment_dtype: str = os.getenv("VOITTA_SEGMENT_DTYPE", "bfloat16")
        # Sparse BM25 slots kept per chunk (top-|S| weighted terms).
        self.sparse_slots: int = int(os.getenv("VOITTA_SPARSE_SLOTS", "64"))
        # Max terms of a sparse *query* scored in-kernel.
        self.sparse_query_terms: int = int(os.getenv("VOITTA_SPARSE_QUERY_TERMS", "32"))
        # IVF: number of cells (0 = flat scan) and probed cells per query.
        self.ivf_cells: int = int(os.getenv("VOITTA_IVF_CELLS", "0"))
        self.ivf_nprobe: int = int(os.getenv("VOITTA_IVF_NPROBE", "32"))
        # Candidate selection in the fused probe: "exact" (lax.top_k —
        # recall@10 1.000, the default) or "approx" (approx_max_k — ~2x the
        # selection throughput for ~1% real recall; measured trade in
        # index/ivf.py::_ivf_search_candidates).
        self.ivf_select: str = _select_policy("VOITTA_IVF_SELECT")
        # IVF device layout: "flat" (variable-length inverted lists over a
        # cell-major flat corpus — memory exactly M rows, hot cells split
        # positionally into virtual probe windows; index/ivf_flat.py) or
        # "padded" (fixed cell blocks [C, cap, D] + residual tier;
        # index/ivf.py). Flat is the default: on Zipf-skewed real corpora
        # a padded cap either overflows rows into the residual or pads a
        # multiple of the corpus (measured on the harvested 10M real-text
        # corpus: 40% row overflow at any HBM-affordable cap).
        self.ivf_layout: str = _choice(
            "VOITTA_IVF_LAYOUT", "flat", ("flat", "padded"))
        # Flat-layout probe window rows per probed cell. 0 = auto: cover
        # the longest cell on small corpora (full probes stay exact), cap
        # at max(1024, 4x mean cell) on skewed ones (hot cells split).
        self.ivf_probe_cap: int = _clamped_int(
            "VOITTA_IVF_PROBE_CAP", 0, 0, 1 << 20)
        # Multi-assignment: replicate rows into their top-k cells. With a
        # margin (cosine points), only boundary rows — whose 2nd centroid is
        # within the margin of the 1st — get replicas. Default ON: the
        # replicas are exactly the rows probe-limited search loses
        # (nprobe-invariant recall floor), and after 128-slot cap rounding
        # they are usually memory-free (measured 1M: 0.98 → 1.00 recall@10).
        self.ivf_assign_k: int = int(os.getenv("VOITTA_IVF_ASSIGN_K", "2"))
        self.ivf_assign_margin: float | None = (
            float(os.environ["VOITTA_IVF_ASSIGN_MARGIN"])
            if os.getenv("VOITTA_IVF_ASSIGN_MARGIN") else 0.05)
        # Hybrid over-fetch multiplier (reference limit*3, vector_store.py:636).
        self.prefetch_multiplier: int = int(os.getenv("VOITTA_PREFETCH_MULT", "3"))
        # Flat-scan fused candidate selection: rows per winner group
        # (ops/scan_select.py). Default 0 = disabled: measured slower than
        # the XLA full-score path on v5e at b32 (see the module docstring);
        # enable for shapes where the trade flips. Only engages above
        # flat_select_min_rows total rows.
        self.flat_select_group: int = int(
            os.getenv("VOITTA_FLAT_SELECT_GROUP", "0"))
        self.flat_select_min_rows: int = int(
            os.getenv("VOITTA_FLAT_SELECT_MIN_ROWS", str(1 << 17)))
        # Auto-rebuild of stale read-optimized snapshots after an indexing
        # burst settles (postings always; IVF when ivf_cells opts in).
        # Below the row threshold flat scans are already fast and snapshot
        # builds would just churn.
        self.auto_optimize: bool = _env_bool("VOITTA_AUTO_OPTIMIZE", "true")
        self.auto_optimize_min_rows: int = int(
            os.getenv("VOITTA_AUTO_OPTIMIZE_MIN_ROWS", "10000"))
        # Sparse postings snapshot: per-term impact-ordered posting cap
        # (index/postings.py; only the lowest-weight postings of very common
        # terms are dropped beyond it).
        self.sparse_max_postings: int = int(
            os.getenv("VOITTA_SPARSE_MAX_POSTINGS", "4096"))
        # Mesh: number of index shards ("auto" = all local devices).
        self.index_shards: str = os.getenv("VOITTA_INDEX_SHARDS", "auto")
        # Pod topology: shards arranged as n_slices x (shards/n_slices);
        # the candidate merge gathers over ICI within a slice, re-cuts, and
        # crosses DCN once (1 = single-slice, pure-ICI merge).
        self.index_slices: int = int(os.getenv("VOITTA_INDEX_SLICES", "1"))
        # Replica groups: the index is fully replicated across groups and
        # the query batch is sharded over them, so serving QPS scales with
        # chips (total devices = replicas * shards; 1 = no replication).
        self.index_replicas: int = int(os.getenv("VOITTA_INDEX_REPLICAS", "1"))
        # BM25 parameters (fastembed/Qdrant defaults).
        self.bm25_k: float = float(os.getenv("VOITTA_BM25_K", "1.2"))
        self.bm25_b: float = float(os.getenv("VOITTA_BM25_B", "0.75"))
        self.bm25_avg_len: float = float(os.getenv("VOITTA_BM25_AVG_LEN", "256.0"))

        self.root_path.mkdir(parents=True, exist_ok=True)

    # -- derived properties (reference config.py:77-107) --
    @property
    def ms_auth_enabled(self) -> bool:
        return bool(
            self.ms_auth_tenant_id and self.ms_auth_client_id and self.ms_auth_client_secret
        )

    @property
    def google_auth_enabled(self) -> bool:
        return bool(self.google_auth_client_id and self.google_auth_client_secret)

    @property
    def any_auth_enabled(self) -> bool:
        return self.ms_auth_enabled or self.google_auth_enabled

    @property
    def database_url(self) -> str:
        return f"sqlite:///{self.db_path}"


@lru_cache
def get_settings() -> Settings:
    """Cached settings instance (reference config.py:110-113)."""
    return Settings()
