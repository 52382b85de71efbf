"""Device mesh construction.

Axis conventions:
- ``shard``: index-segment sharding (data sharding of the corpus). Queries are
  replicated; each chip scans its local rows; candidates merge over ICI.
- ``replica``: full-index replication for serving throughput. Each replica
  group holds a complete copy of the (sharded) index; the QUERY BATCH is
  sharded over this axis, so pod QPS scales with replica count instead of
  shrinking with shard count. This is the index analogue of data
  parallelism (the one axis round-2 review flagged as missing).
- ``dp`` / ``tp``: data / tensor parallelism for encoder training and batch
  encoding (:mod:`voitta_rag_tpu.models.training`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shard"
SLICE_AXIS = "slice"
REPLICA_AXIS = "replica"
DP_AXIS = "dp"
TP_AXIS = "tp"


def index_mesh(n_shards: int | None = None, n_slices: int = 1,
               n_replicas: int = 1) -> Mesh:
    """Mesh over the index-shard axis (all local devices by default).

    With ``n_slices > 1`` the mesh gains a ``slice`` axis — the pod
    topology where the ``shard`` axis rides ICI within a slice and the
    ``slice`` axis crosses DCN. The sharded search then merges candidates
    hierarchically: ICI all-gather + re-cut first, one small DCN hop second
    (BASELINE config 5 / SURVEY §7 "hierarchical merge").

    With ``n_replicas > 1`` the mesh gains an outermost ``replica`` axis:
    ``n_shards`` is the shard count WITHIN one replica group and the mesh
    uses ``n_replicas * n_shards`` devices total. Index arrays stay
    replicated along ``replica`` (their PartitionSpec simply omits the
    axis); the search fans the query batch out across replica groups, so
    the candidate merges (shard/slice collectives) stay within a group.
    """
    devices = jax.devices()
    n_replicas = max(1, n_replicas)
    if n_shards is None:
        n_shards = len(devices) // n_replicas
    total = n_shards * n_replicas
    assert total <= len(devices), (n_shards, n_replicas, len(devices))
    if n_slices <= 1 and n_replicas <= 1:
        return Mesh(np.asarray(devices[:n_shards]), (SHARD_AXIS,))
    if n_shards % max(n_slices, 1) != 0:
        raise ValueError(
            f"VOITTA_INDEX_SHARDS={n_shards} is not divisible by "
            f"VOITTA_INDEX_SLICES={n_slices}")
    # Group devices by their REAL slice so the 'shard' axis actually rides
    # ICI (naive enumeration order can interleave slices, which would put
    # the big intra-"slice" gather on DCN and invert the hierarchy's
    # premise). Devices without slice metadata (CPU meshes) keep their
    # enumeration order. Replica groups are outermost: whole slices (or
    # contiguous ICI blocks) per replica, so a replica group never straddles
    # more DCN hops than it must.
    devices = sorted(devices[:total],
                     key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
    if n_slices <= 1:
        mesh_dev = np.asarray(devices).reshape(n_replicas, n_shards)
        if n_replicas > 1:
            return Mesh(mesh_dev, (REPLICA_AXIS, SHARD_AXIS))
        return Mesh(mesh_dev[0], (SHARD_AXIS,))
    per_slice = n_shards // n_slices
    mesh_dev = np.asarray(devices).reshape(n_replicas, n_slices, per_slice)
    if n_replicas > 1:
        return Mesh(mesh_dev, (REPLICA_AXIS, SLICE_AXIS, SHARD_AXIS))
    return Mesh(mesh_dev[0], (SLICE_AXIS, SHARD_AXIS))


def resolve_auto_devices(setting: str) -> int:
    """Shared policy for '<int>' | 'auto' device-count env knobs.

    'auto' (or empty/'0') means all devices on a REAL TPU backend and 1
    elsewhere — virtual CPU device counts (tests force 8) must not flip a
    single-host deployment into multi-device mode. Explicit ints clamp to
    the available device count.
    """
    n_dev = len(jax.devices())
    if str(setting).lower() in ("", "auto", "0"):
        return n_dev if jax.default_backend() == "tpu" else 1
    try:
        return min(max(1, int(setting)), n_dev)
    except ValueError:
        return 1


def train_mesh(dp: int | None = None, tp: int = 1) -> Mesh:
    """2-D (dp, tp) mesh for encoder training / bulk encoding."""
    devices = jax.devices()
    if dp is None:
        dp = len(devices) // tp
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp),
                (DP_AXIS, TP_AXIS))
