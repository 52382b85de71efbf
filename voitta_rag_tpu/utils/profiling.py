"""First-class profiling hooks (SURVEY.md §5.1: the reference has none —
only ad-hoc timing logs; the TPU build adds jax.profiler/xprof tracing
around the encode and scan paths).

Enable with ``VOITTA_PROFILE_DIR=/tmp/voitta-xprof``: every block wrapped in
:func:`trace` emits an xprof trace viewable in TensorBoard / xprof. Always
cheap when disabled (no-op context manager).

Also provides a lightweight wall-clock stat registry surfaced at
``/api/stats`` (p50/p95 per stage).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict

_PROFILE_DIR = os.environ.get("VOITTA_PROFILE_DIR", "")

_lock = threading.Lock()
_samples: dict[str, list[float]] = defaultdict(list)
_MAX_SAMPLES = 512


@contextlib.contextmanager
def trace(name: str):
    """Wall-clock stats always; xprof TraceAnnotation when profiling is on."""
    ctx = contextlib.nullcontext()
    if _PROFILE_DIR:
        import jax

        ctx = jax.profiler.TraceAnnotation(name)
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    with _lock:
        buf = _samples[name]
        buf.append(dt)
        if len(buf) > _MAX_SAMPLES:
            del buf[: len(buf) - _MAX_SAMPLES]


@contextlib.contextmanager
def device_trace():
    """Whole-program xprof capture (jax.profiler.trace) when enabled."""
    if _PROFILE_DIR:
        import jax

        os.makedirs(_PROFILE_DIR, exist_ok=True)
        with jax.profiler.trace(_PROFILE_DIR):
            yield
    else:
        yield


def stats() -> dict[str, dict[str, float]]:
    out = {}
    with _lock:
        for name, buf in _samples.items():
            if not buf:
                continue
            s = sorted(buf)
            out[name] = {
                "count": len(s),
                "p50_ms": round(s[len(s) // 2] * 1e3, 3),
                "p95_ms": round(s[min(int(len(s) * 0.95), len(s) - 1)] * 1e3, 3),
                "last_ms": round(buf[-1] * 1e3, 3),
            }
    return out


def reset_stats() -> None:
    with _lock:
        _samples.clear()
