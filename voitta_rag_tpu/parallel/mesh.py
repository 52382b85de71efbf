"""Device mesh construction.

Axis conventions:
- ``shard``: index-segment sharding (data sharding of the corpus). Queries are
  replicated; each chip scans its local rows; candidates merge over ICI.
- ``dp`` / ``tp``: data / tensor parallelism for encoder training and batch
  encoding (:mod:`voitta_rag_tpu.models.training`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shard"
SLICE_AXIS = "slice"
DP_AXIS = "dp"
TP_AXIS = "tp"


def index_mesh(n_shards: int | None = None, n_slices: int = 1) -> Mesh:
    """Mesh over the index-shard axis (all local devices by default).

    With ``n_slices > 1`` the mesh is 2-D ``(slice, shard)`` — the pod
    topology where the ``shard`` axis rides ICI within a slice and the
    ``slice`` axis crosses DCN. The sharded search then merges candidates
    hierarchically: ICI all-gather + re-cut first, one small DCN hop second
    (BASELINE config 5 / SURVEY §7 "hierarchical merge").
    """
    devices = jax.devices()
    if n_shards is None:
        n_shards = len(devices)
    assert n_shards <= len(devices), (n_shards, len(devices))
    if n_slices <= 1:
        return Mesh(np.asarray(devices[:n_shards]), (SHARD_AXIS,))
    if n_shards % n_slices != 0:
        raise ValueError(
            f"VOITTA_INDEX_SHARDS={n_shards} is not divisible by "
            f"VOITTA_INDEX_SLICES={n_slices}")
    per_slice = n_shards // n_slices
    # Group devices by their REAL slice so the 'shard' axis actually rides
    # ICI (naive enumeration order can interleave slices, which would put
    # the big intra-"slice" gather on DCN and invert the hierarchy's
    # premise). Devices without slice metadata (CPU meshes) keep their
    # enumeration order.
    devices = sorted(devices[:n_shards],
                     key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
    return Mesh(np.asarray(devices).reshape(n_slices, per_slice),
                (SLICE_AXIS, SHARD_AXIS))


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
