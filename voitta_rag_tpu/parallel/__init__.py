"""Scale-out layer: device mesh, sharded index scans, collective top-k merge.

The reference has no distributed runtime at all (SURVEY.md §2.6, §5.8 —
distribution lives inside the external Qdrant server). Here scale-out is a
first-class component: index segments are sharded across chips over a
``jax.sharding.Mesh`` axis, each chip scans its local rows with the Pallas
kernels, and per-chip top-k candidate sets are merged with an all-gather over
ICI followed by a replicated final top-k (BASELINE config 4).
"""

from voitta_rag_tpu.parallel.mesh import index_mesh, SHARD_AXIS  # noqa: F401
from voitta_rag_tpu.parallel.sharded import ShardedIndex  # noqa: F401
