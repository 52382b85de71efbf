"""Synthetic embedding corpora with realistic cluster structure.

Real text-embedding corpora are NOT isotropic: encoder outputs concentrate on
a low-dimensional manifold and form topic clusters (this is what makes ANN —
Qdrant's HNSW in the reference, services/vector_store.py:88-100, and our IVF —
work at all). Round-1's bench drew i.i.d. Gaussian vectors, which is the
information-theoretic worst case for *every* ANN method (nearest neighbors
are uniformly spread over partitions), so IVF recall numbers measured on it
say nothing about behavior on real embeddings.

This module generates a von-Mises–Fisher-style mixture on the unit sphere:
``n_clusters`` random unit centers; each point = normalize(alpha * center +
noise with E|noise|^2 = d). The tightness knob is ``intra_cos`` — the
expected cosine between a point and its cluster center — from which
``alpha = sqrt(d * intra_cos^2 / (1 - intra_cos^2))``. Dimension-relative
scaling matters: a fixed alpha that clusters 32-d data is invisible at
768-d (noise norm grows as sqrt(d)).

Calibration: public sentence-embedding corpora show nearest-neighbor
cosines ~0.6-0.9 against near-zero random-pair cosines. ``intra_cos=0.65``
(default) gives within-cluster pair cosine ~0.42 vs cross-cluster ~0 —
top-10 neighbors live overwhelmingly in the home cluster, yet clusters
overlap enough that partition recall is not trivially 1.0.

Queries are drawn from the same mixture (search queries embed into the same
topic space as documents). Everything is generated ON DEVICE (host RNG for
10M x 768 floats takes minutes on a 1-vCPU host), in row blocks so the f32
intermediates never exceed a block.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _alpha_for(d: int, intra_cos: float) -> float:
    intra_cos = min(max(intra_cos, 0.01), 0.99)
    return math.sqrt(d * intra_cos * intra_cos / (1.0 - intra_cos * intra_cos))


def clustered_unit_vectors(
    key: jax.Array,
    n: int,
    d: int,
    *,
    n_clusters: int = 1024,
    intra_cos: float = 0.65,
    block_rows: int = 1 << 20,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Mixture-on-the-sphere corpus.

    Returns (vecs [n, d] unit-norm, cluster_id [n] int32). Centers are a
    deterministic function of ``key`` — pass the same key to
    :func:`mixture_queries` (as ``center_key``) to draw queries from the
    same mixture.
    """
    alpha = _alpha_for(d, intra_cos)
    kc, kp = jax.random.split(key)
    centers = _unit(jax.random.normal(kc, (n_clusters, d), jnp.float32))

    n_blocks = max(1, -(-n // block_rows))
    rows = -(-n // n_blocks)

    @jax.jit
    def gen_block(k):
        ka, kb = jax.random.split(k)
        cid = jax.random.randint(ka, (rows,), 0, n_clusters, jnp.int32)
        noise = jax.random.normal(kb, (rows, d), jnp.float32)
        v = _unit(alpha * jnp.take(centers, cid, axis=0) + noise)
        return v.astype(dtype), cid

    keys = jax.random.split(kp, n_blocks)
    vs, cids = zip(*(gen_block(k) for k in keys))
    vecs = jnp.concatenate(vs)[:n] if n_blocks > 1 else vs[0][:n]
    cid = jnp.concatenate(cids)[:n] if n_blocks > 1 else cids[0][:n]
    return vecs, cid


def mixture_queries(
    key: jax.Array,
    n_queries: int,
    d: int,
    *,
    n_clusters: int = 1024,
    intra_cos: float = 0.65,
    center_key: jax.Array | None = None,
) -> jax.Array:
    """Queries from the same mixture as :func:`clustered_unit_vectors`.

    ``center_key`` must be the same key that generated the corpus (its first
    split stream defines the centers).
    """
    alpha = _alpha_for(d, intra_cos)
    if center_key is not None:
        kc, _ = jax.random.split(center_key)
    else:
        kc, key = jax.random.split(key)
    centers = _unit(jax.random.normal(kc, (n_clusters, d), jnp.float32))
    ka, kb = jax.random.split(jax.random.fold_in(key, 1))
    cid = jax.random.randint(ka, (n_queries,), 0, n_clusters, jnp.int32)
    noise = jax.random.normal(kb, (n_queries, d), jnp.float32)
    return _unit(alpha * jnp.take(centers, cid, axis=0) + noise)


def _unit(x: jax.Array) -> jax.Array:
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
