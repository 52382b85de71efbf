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
    """Largest power-of-two tile <= preferred that divides n (>= minimum)."""
    tile = preferred
    while tile > minimum and n % tile != 0:
        tile //= 2
    assert n % tile == 0, f"rows {n} not a multiple of {tile}"
    return tile


def pad_axis(x: jax.Array, axis: int, target: int, fill) -> jax.Array:
    """Pad ``x`` along ``axis`` up to length ``target`` with ``fill``."""
    cur = x.shape[axis]
    if cur == target:
        return x
    assert cur < target, (cur, target)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - cur)
    return jnp.pad(x, widths, constant_values=fill)
