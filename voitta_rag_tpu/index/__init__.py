"""On-device vector index: segments, payloads, interning, IVF, store API.

This package replaces the external Qdrant server of the reference
(services/vector_store.py + docker-compose.yml): chunk vectors, sparse terms,
and filter columns live in device HBM as struct-of-arrays segments scanned by
the Pallas kernels in :mod:`voitta_rag_tpu.ops`; texts and payload metadata
live host-side in SQLite (:mod:`voitta_rag_tpu.index.payloads`), mirroring
Qdrant's payload/scroll features with SQL.
"""

from voitta_rag_tpu.index.store import TpuVectorStore, get_vector_store, reset_vector_store  # noqa: F401
