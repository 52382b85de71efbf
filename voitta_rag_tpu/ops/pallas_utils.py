"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite -inf stand-in (plain float: safe to close over in kernels)


@functools.cache
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (CPU tests)."""
    return not on_tpu()


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_tile(n: int, preferred: int, minimum: int = 128) -> int:
    """Largest multiple of ``minimum`` <= preferred that divides n.

    Any multiple of 128 is a legal sublane tile, not just powers of two —
    and the difference is real HBM bandwidth: the IVF probe at cell_cap
    1920 gets tile 384 here where a power-of-two search collapses to 128,
    and measured marginal probe bandwidth at tile=128 is ~1.7x worse than
    at tile>=384 (the DMA blocks are 98 KB vs 295+ KB at 768-d int8).
    """
    assert n % minimum == 0, f"rows {n} not a multiple of {minimum}"
    for tile in range((preferred // minimum) * minimum, minimum,
                      -minimum):
        if n % tile == 0:
            return tile
    return minimum


def pad_axis(x: jax.Array, axis: int, target: int, fill) -> jax.Array:
    """Pad ``x`` along ``axis`` up to length ``target`` with ``fill``."""
    cur = x.shape[axis]
    if cur == target:
        return x
    assert cur < target, (cur, target)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - cur)
    return jnp.pad(x, widths, constant_values=fill)
