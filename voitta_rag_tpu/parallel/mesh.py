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
DP_AXIS = "dp"
TP_AXIS = "tp"


def index_mesh(n_shards: int | None = None) -> Mesh:
    """1-D mesh over the index-shard axis (all local devices by default)."""
    devices = jax.devices()
    if n_shards is None:
        n_shards = len(devices)
    assert n_shards <= len(devices), (n_shards, len(devices))
    return Mesh(np.asarray(devices[:n_shards]), (SHARD_AXIS,))


def train_mesh(dp: int | None = None, tp: int = 1) -> Mesh:
    """2-D (dp, tp) mesh for encoder training / bulk encoding."""
    devices = jax.devices()
    if dp is None:
        dp = len(devices) // tp
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp),
                (DP_AXIS, TP_AXIS))
