"""ctypes bridge to the C++ HNSW baseline (native/hnsw_baseline.cpp).

Benchmark-only: gives bench.py a real CPU ANN stack (the role Qdrant's Rust
HNSW plays for the reference, docker-compose.yml:2-9) to measure recall@10
and QPS against — not part of any serving path.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_LIB_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _LIB_DIR / "libhnsw_baseline.so"

_lib = None
_load_attempted = False


def _load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_LIB_DIR), "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            logger.debug("hnsw baseline build failed: %s", e)
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.hnsw_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_uint]
        lib.hnsw_create.restype = ctypes.c_void_p
        lib.hnsw_free.argtypes = [ctypes.c_void_p]
        lib.hnsw_add_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.hnsw_search.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float)]
        lib.hnsw_search.restype = ctypes.c_int
        lib.hnsw_size.argtypes = [ctypes.c_void_p]
        lib.hnsw_size.restype = ctypes.c_int
        lib.hnsw_save_graph.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.hnsw_save_graph.restype = ctypes.c_int
        lib.hnsw_load_graph.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.hnsw_load_graph.restype = ctypes.c_void_p
        _lib = lib
    except OSError as e:
        logger.debug("hnsw baseline load failed: %s", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


class HnswBaseline:
    """Cosine (inner-product over unit vectors) HNSW index."""

    def __init__(self, dim: int, max_elements: int, m: int = 16,
                 ef_construction: int = 200, seed: int = 42):
        lib = _load()
        if lib is None:
            raise RuntimeError("libhnsw_baseline.so unavailable")
        self._lib = lib
        self.dim = dim
        self._h = lib.hnsw_create(dim, max_elements, m, ef_construction,
                                  seed)

    def add(self, vecs: np.ndarray) -> None:
        v = np.ascontiguousarray(vecs, np.float32)
        assert v.ndim == 2 and v.shape[1] == self.dim
        self._lib.hnsw_add_batch(
            self._h, v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            v.shape[0])

    def search(self, q: np.ndarray, k: int = 10,
               ef: int = 64) -> tuple[np.ndarray, np.ndarray]:
        """Returns (ids [B, k], sims [B, k]); -1 id pads short results."""
        q = np.ascontiguousarray(q, np.float32).reshape(-1, self.dim)
        B = q.shape[0]
        ids = np.full((B, k), -1, np.int32)
        sims = np.zeros((B, k), np.float32)
        buf_i = (ctypes.c_int * k)()
        buf_s = (ctypes.c_float * k)()
        for b in range(B):
            n = self._lib.hnsw_search(
                self._h, q[b].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                k, ef, buf_i, buf_s)
            ids[b, :n] = buf_i[:n]
            sims[b, :n] = buf_s[:n]
        return ids, sims

    def save_graph(self, path) -> bool:
        """Serialize LINKS + levels (not vectors) to ``path``.

        Bench corpora are regenerated deterministically, so only the graph
        is cached; :meth:`load_graph` re-fills the vectors and verifies a
        checksum. ~25 MB for a 100k x 384 efc=200 graph vs ~30 min of
        single-thread build."""
        return self._lib.hnsw_save_graph(self._h, str(path).encode()) == 0

    @classmethod
    def load_graph(cls, path, vecs: np.ndarray,
                   max_elements: int | None = None) -> "HnswBaseline | None":
        """Load a graph cache against ``vecs`` (the same corpus it was built
        on — checksum-verified). Returns None if the cache is missing,
        corrupt, or built on different data."""
        lib = _load()
        if lib is None:
            return None
        v = np.ascontiguousarray(vecs, np.float32)
        n, dim = v.shape
        h = lib.hnsw_load_graph(
            str(path).encode(),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, dim, max_elements or n)
        if not h:
            return None
        obj = cls.__new__(cls)
        obj._lib = lib
        obj.dim = dim
        obj._h = h
        return obj

    def __len__(self) -> int:
        return self._lib.hnsw_size(self._h)

    def __del__(self):
        try:
            self._lib.hnsw_free(self._h)
        except Exception:
            pass
