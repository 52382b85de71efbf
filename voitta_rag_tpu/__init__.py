"""voitta_rag_tpu — a TPU-native RAG index-and-query framework.

A from-scratch re-design of the capabilities of voitta-ai/voitta-rag
(reference: /root/reference) built TPU-first on JAX / Pallas / pjit:

- The embedding path (sentence-transformers in the reference,
  services/embedding.py) is a JAX transformer encoder with a Pallas
  fused-attention kernel (:mod:`voitta_rag_tpu.models`).
- The vector engine (external Qdrant HNSW in the reference,
  services/vector_store.py) is an on-device partitioned index with
  tiled-matmul dense scans, Pallas sparse BM25 scoring, and filters
  compiled to in-kernel score masks (:mod:`voitta_rag_tpu.index`,
  :mod:`voitta_rag_tpu.ops`).
- Scale-out is per-chip segment scans with all-gather top-k merges over
  ICI via ``jax.sharding.Mesh`` + ``shard_map``
  (:mod:`voitta_rag_tpu.parallel`).
- The host shell (API routes, MCP server, parsers, sync connectors,
  SQLite metadata store, Anamnesis memories) mirrors the reference's
  behavior contract (:mod:`voitta_rag_tpu.api`, :mod:`voitta_rag_tpu.mcp`,
  :mod:`voitta_rag_tpu.services`, :mod:`voitta_rag_tpu.db`).
"""

__version__ = "0.1.0"

from voitta_rag_tpu.config import Settings, get_settings  # noqa: F401
