"""Embedding service: the TPU-native replacement for sentence-transformers.

Behavior contract (reference services/embedding.py):
- lazy model load at first use (24-42),
- e5 prefix convention: ``passage:`` for documents (44-54), ``query:`` for
  queries (76-86) — applied only for e5-family model names, like the
  reference which always prefixes (its default model is e5),
- batch encode with ``batch_size=32`` host batching (56-74).

TPU-native behavior: texts are tokenized host-side, padded into
static-shape buckets (so XLA compiles a handful of programs, not one per
batch shape), and encoded under jit with the Pallas fused-attention encoder.
Embeddings come back unit-normalized (COSINE space).
"""

from __future__ import annotations

import dataclasses
import logging
import threading
from pathlib import Path

import numpy as np
import jax

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.models.encoder import (
    EncoderConfig, config_for, encode_tokens, init_params,
)
from voitta_rag_tpu.models.tokenizer import load_tokenizer
from voitta_rag_tpu.models import weights as weights_mod

logger = logging.getLogger(__name__)

# Static batch buckets: pad to the smallest bucket that fits.
BATCH_BUCKETS = (1, 8, 32, 128)


def _bucket(n: int) -> int:
    for b in BATCH_BUCKETS:
        if n <= b:
            return b
    return BATCH_BUCKETS[-1]


class _CrcTokenizer:
    """Tokenizer adapter for owned .npz retrieval checkpoints.

    Those checkpoints are trained on the CRC word-hash vocabulary
    (models/retrieval_proof.py crc_tokenize — no trained tokenizer needed in
    an offline image); serving them through WordPiece would score garbage.
    Exposes the same ``encode_batch(texts, max_len) -> (ids, mask)`` contract
    as models/tokenizer.py.
    """

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def encode_batch(self, texts: list[str], max_len: int):
        from voitta_rag_tpu.models.retrieval_proof import crc_tokenize

        ids = crc_tokenize(texts, self.vocab_size, max_len)
        mask = (ids != 0).astype(np.int32)
        return ids, mask


class EmbeddingService:
    """Generates dense embeddings on TPU (reference embedding.py:14-97)."""

    def __init__(self, model_name: str | None = None,
                 model_path: str | None = None,
                 max_seq_len: int | None = None):
        settings = get_settings()
        self.model_name = model_name or settings.embedding_model
        self.model_path = model_path if model_path is not None else settings.embedding_model_path
        self.max_seq_len = max_seq_len or settings.max_seq_len
        self.batch_size = settings.encode_batch_size
        self._cfg: EncoderConfig | None = None
        self._params = None
        self._tokenizer = None
        self._init_lock = threading.Lock()

    # -- lazy load (reference embedding.py:23-42) --
    def _ensure_model(self) -> None:
        if self._params is not None:
            return
        with self._init_lock:
            if self._params is None:
                self._load_model()

    def _load_model(self) -> None:
        cfg = config_for(self.model_name)
        params = None
        crc_meta = None
        if self.model_path and Path(self.model_path).exists():
            try:
                mp = Path(self.model_path)
                if mp.is_file() and mp.suffix == ".npz":
                    # Owned offline-trained retrieval checkpoint
                    # (scripts/train_retrieval_ckpt.py): served with the CRC
                    # word-hash tokenizer it was trained with, clamped to
                    # its trained sequence length (positions past it kept
                    # their random init and would inject noise).
                    from voitta_rag_tpu.models import retrieval_proof

                    cfg, params, crc_meta = (
                        retrieval_proof.load_checkpoint_auto(mp))
                    self.model_name = crc_meta.get("preset", self.model_name)
                    trained_len = int(crc_meta.get("max_len", 96))
                    if self.max_seq_len > trained_len:
                        self.max_seq_len = trained_len
                elif (mp / "encoder_config.json").exists():
                    # native (fine-tuned) checkpoint
                    cfg, params = weights_mod.load_checkpoint(self.model_path)
                else:  # HF / sentence-transformers checkpoint
                    cfg, params = weights_mod.load_encoder(self.model_path)
                logger.info("Loaded encoder checkpoint from %s", self.model_path)
            except Exception as e:  # fall back to deterministic init
                logger.warning("Checkpoint load failed (%s); using random init", e)
        if params is None:
            params = init_params(jax.random.PRNGKey(0), cfg)
            logger.info("Initialized encoder %s with deterministic random "
                        "weights (no local checkpoint)", self.model_name)
        # Serving dtype: bf16 params/activations halve encode time on the
        # MXU (layernorm statistics stay f32 inside encoder_forward); the
        # reference serves fp16 the same way. f32 opt-out via
        # VOITTA_ENCODER_DTYPE for bit-exact comparisons.
        dt = get_settings().encoder_dtype
        if dt == "auto":
            dt = ("bfloat16" if jax.default_backend() == "tpu"
                  else "float32")
        if dt == "bfloat16":
            import jax.numpy as jnp

            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
            cfg = dataclasses.replace(cfg, dtype="bfloat16")
        self._cfg = cfg
        # Clamp to the checkpoint's usable position rows (sentence-
        # transformers max_seq_length behaves the same way) — a model with
        # a short position table must truncate, not crash the encode.
        usable = cfg.max_position - cfg.pos_offset
        if self.max_seq_len > usable:
            logger.info("max_seq_len %d clamped to model's %d usable "
                        "positions", self.max_seq_len, usable)
            self.max_seq_len = usable
        # Index-build data parallelism (SURVEY §7.3): with several chips,
        # replicate the params over a dp mesh and shard the batch axis —
        # XLA splits each encode across chips with zero collective cost
        # (embeddings are independent per row). VOITTA_ENCODE_DP: "auto" =
        # all devices on a real TPU backend, explicit int otherwise.
        dp = self._resolve_dp()
        if dp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from voitta_rag_tpu.parallel.mesh import DP_AXIS, train_mesh

            mesh = train_mesh(dp=dp, tp=1)
            self._batch_sharding = NamedSharding(mesh, P(DP_AXIS))
            device_params = jax.device_put(params, NamedSharding(mesh, P()))
            self._encode_dp = dp
            logger.info("encoder batch encode sharded over %d devices", dp)
        else:
            self._batch_sharding = None
            self._encode_dp = 1
            device_params = jax.device_put(params)
        if crc_meta is not None:
            self._tokenizer = _CrcTokenizer(cfg.vocab_size)
        else:
            self._tokenizer = load_tokenizer(self.model_path or None,
                                             cfg.vocab_size)
        # set LAST: the lock-free fast path in _ensure_model keys on it
        self._params = device_params

    @staticmethod
    def _resolve_dp() -> int:
        from voitta_rag_tpu.parallel.mesh import resolve_auto_devices

        return resolve_auto_devices(get_settings().encode_dp)

    @property
    def dimension(self) -> int:
        self._ensure_model()
        return self._cfg.hidden_size

    @property
    def uses_e5_prefixes(self) -> bool:
        return "e5" in self.model_name.lower()

    # -- encode paths --
    def _encode_batch(self, texts: list[str]) -> np.ndarray:
        self._ensure_model()
        ids, mask = self._tokenizer.encode_batch(texts, self.max_seq_len)
        # Shard only genuinely bulk batches: padding a single query to dp
        # rows and fanning it across chips would tax the p50 hot path.
        use_dp = (self._batch_sharding is not None
                  and len(texts) >= self._encode_dp)
        b = _bucket(len(texts))
        if use_dp:
            # Divisible across devices, counting the REAL batch (which can
            # exceed the largest bucket).
            b = max(b, len(texts))
            b += (-b) % self._encode_dp
        if b > len(texts):
            pad = b - len(texts)
            ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
            mask = np.concatenate([mask, np.zeros((pad, mask.shape[1]), mask.dtype)])
            # keep one real token in padding rows to avoid 0-count pooling
            mask[len(texts):, 0] = 1
        if use_dp:
            ids = jax.device_put(ids, self._batch_sharding)
            mask = jax.device_put(mask, self._batch_sharding)
            # XLA attention for the sharded encode: the Pallas attention
            # kernel is a Mosaic custom call the SPMD partitioner can't
            # split over the batch sharding.
            out = encode_tokens(self._params, self._cfg, ids, mask,
                                use_pallas_attn=False)
        else:
            out = encode_tokens(self._params, self._cfg, ids, mask)
        return np.asarray(out[: len(texts)], dtype=np.float32)

    def embed_texts(self, texts: list[str]) -> list[list[float]]:
        """Embed document texts (``passage:`` prefix, embedding.py:44-74)."""
        if not texts:
            return []
        if self.uses_e5_prefixes:
            texts = [f"passage: {t}" for t in texts]
        out = []
        for i in range(0, len(texts), self.batch_size):
            out.append(self._encode_batch(texts[i:i + self.batch_size]))
        return np.concatenate(out).tolist()

    def embed_texts_array(self, texts: list[str]) -> np.ndarray:
        if not texts:
            self._ensure_model()
            return np.zeros((0, self._cfg.hidden_size), np.float32)
        if self.uses_e5_prefixes:
            texts = [f"passage: {t}" for t in texts]
        out = []
        for i in range(0, len(texts), self.batch_size):
            out.append(self._encode_batch(texts[i:i + self.batch_size]))
        return np.concatenate(out)

    def embed_query(self, query: str) -> list[float]:
        """Embed a search query (``query:`` prefix, embedding.py:76-86)."""
        text = f"query: {query}" if self.uses_e5_prefixes else query
        return self._encode_batch([text])[0].tolist()

    def embed_query_array(self, query: str) -> np.ndarray:
        text = f"query: {query}" if self.uses_e5_prefixes else query
        return self._encode_batch([text])[0]

    # Token-level access for the fused query path (search/service.py): the
    # engine wants to run tokenize on host but encode+scan in ONE program.
    def tokenize_query(self, query: str) -> tuple[np.ndarray, np.ndarray]:
        # Queries pad to the full max_seq_len on purpose: b=1 encode is
        # LATENCY-bound, not FLOP-bound — measured 0.93-0.97 ms/query on v5e
        # at L=32/64/128/192 alike (12 sequential layers of small matmuls).
        # Length-bucketing the query would only add jit variants (a ~30 s
        # first-query compile each) for zero p50 gain.
        self._ensure_model()
        text = f"query: {query}" if self.uses_e5_prefixes else query
        return self._tokenizer.encode_batch([text], self.max_seq_len)

    @property
    def encoder(self):
        self._ensure_model()
        return self._cfg, self._params


_embedding_service: EmbeddingService | None = None
_create_lock = threading.Lock()


def get_embedding_service() -> EmbeddingService:
    global _embedding_service
    # Double-checked creation lock: executor threads can race
    # first-touch; two instances would hold independent locks
    # (and, for the store, two device copies of the index).
    if _embedding_service is None:
        with _create_lock:
            if _embedding_service is None:
                _embedding_service = EmbeddingService()
    return _embedding_service


def reset_embedding_service() -> None:
    global _embedding_service
    _embedding_service = None
