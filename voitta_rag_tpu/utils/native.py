"""ctypes bridge to the C++ native library (native/voitta_native.cpp).

The hot host-side paths — BM25 tokenize/stem/hash over millions of chunks at
index time — run in C++ when the shared library is available; the pure-Python
implementations in :mod:`voitta_rag_tpu.search.sparse_text` are the reference
fallback and must stay byte-for-byte equivalent (tested in
tests/test_native.py). Build on demand with ``make -C native`` (g++ -O3);
loading is lazy and failure-tolerant.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

logger = logging.getLogger(__name__)

_LIB_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _LIB_DIR / "libvoitta_native.so"

_lib = None
_load_attempted = False


def _try_build() -> bool:
    mk = _LIB_DIR / "Makefile"
    if not mk.exists():
        return False
    try:
        subprocess.run(["make", "-C", str(_LIB_DIR), "-s"], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as e:
        logger.debug("native build failed: %s", e)
        return False


def _load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.voitta_term_ids.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ]
        lib.voitta_term_ids.restype = ctypes.c_int
        lib.voitta_murmur3_32.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                          ctypes.c_uint32]
        lib.voitta_murmur3_32.restype = ctypes.c_uint32
        lib.voitta_wp_load.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.voitta_wp_load.restype = ctypes.c_int
        lib.voitta_wp_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.voitta_wp_encode.restype = ctypes.c_int
        _lib = lib
        logger.info("Loaded native library %s", _LIB_PATH)
    except OSError as e:
        logger.debug("native load failed: %s", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def term_ids(text: str) -> list[int]:
    if not text.isascii():
        # Python's \w tokenization is Unicode-aware; the C++ fast path only
        # replicates it for ASCII. Non-ASCII texts (uncommon in the hot
        # code/doc-indexing loop) take the reference implementation.
        from voitta_rag_tpu.search import sparse_text

        return sparse_text._py_term_ids(text)
    lib = _load()
    data = text.encode("utf-8", errors="ignore")
    cap = max(len(data), 16)
    buf = (ctypes.c_uint32 * cap)()
    n = lib.voitta_term_ids(data, len(data), buf, cap)
    return [int(buf[i]) for i in range(n)]


def murmur3_32(data: bytes, seed: int = 0) -> int:
    lib = _load()
    return int(lib.voitta_murmur3_32(data, len(data), seed))


_wp_loaded_key: int | None = None


def wp_load(vocab: dict[str, int], key: int) -> bool:
    """Install a WordPiece vocab into the native lib (id = line number, so
    the dict must be contiguously numbered — true for BERT vocab.txt)."""
    global _wp_loaded_key
    lib = _load()
    if lib is None:
        return False
    if _wp_loaded_key == key:
        return True
    by_id = sorted(vocab.items(), key=lambda kv: kv[1])
    if [i for _, i in by_id] != list(range(len(by_id))):
        return False  # non-contiguous ids: native path unsupported
    blob = "\n".join(t for t, _ in by_id).encode("utf-8")
    if lib.voitta_wp_load(blob, len(blob)) != len(by_id):
        return False
    _wp_loaded_key = key
    return True


def wp_encode(text: str, unk_id: int, max_word_chars: int) -> list[int] | None:
    """Native WordPiece encode; None → caller must use the Python path
    (lib missing or non-ASCII input)."""
    lib = _load()
    if lib is None or not text.isascii():
        return None
    data = text.encode("ascii")
    cap = len(data) + 8
    buf = (ctypes.c_int32 * cap)()
    n = lib.voitta_wp_encode(data, len(data), unk_id, max_word_chars, buf,
                             cap)
    if n < 0:
        return None
    return [int(buf[i]) for i in range(n)]
