"""BM25 sparse-vector text pipeline (host side).

Replaces fastembed's ``Qdrant/bm25`` ONNX model + Qdrant's IDF modifier
(reference services/sparse_embedding.py, vector_store.py:95-99) with a
self-contained implementation:

- tokenize: lowercase basic tokenization, drop punctuation-only tokens,
  English stopword removal, Porter stemming,
- term id: MurmurHash3 (x86_32) of the stemmed token, masked to int31 so ids
  fit the kernels' int32 term columns,
- document weight: BM25 term-frequency saturation with length normalization
      w(t, d) = tf * (k + 1) / (tf + k * (1 - b + b * |d| / avgdl))
  baked in at index time (k=1.2, b=0.75 — fastembed defaults),
- query weight: IDF applied query-side (Qdrant ``Modifier.IDF`` semantics):
      idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)
  with df/N maintained in the payload store as documents are added/removed.

A C++ fast path for tokenize+hash lives in native/voitta_native.cpp (loaded
via ctypes); this module is the reference implementation and fallback.
"""

from __future__ import annotations

import re
import threading

from voitta_rag_tpu.core_types import SparseVector

SPARSE_VECTOR_NAME = "bm25"  # reference sparse_embedding.py:9

# NLTK English stopword list (public domain word list).
STOPWORDS = frozenset("""
a about above after again against all am an and any are aren't as at be
because been before being below between both but by can't cannot could
couldn't did didn't do does doesn't doing don't down during each few for from
further had hadn't has hasn't have haven't having he he'd he'll he's her here
here's hers herself him himself his how how's i i'd i'll i'm i've if in into
is isn't it it's its itself let's me more most mustn't my myself no nor not of
off on once only or other ought our ours ourselves out over own same shan't
she she'd she'll she's should shouldn't so some such than that that's the
their theirs them themselves then there there's these they they'd they'll
they're they've this those through to too under until up very was wasn't we
we'd we'll we're we've were weren't what what's when when's where where's
which while who who's whom why why's with won't would wouldn't you you'd
you'll you're you've your yours yourself yourselves
""".split())

_TOKEN_RE = re.compile(r"[a-z0-9]+")

_VOWELS = frozenset("aeiou")


def _cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences."""
    m, i, n = 0, 0, len(stem)
    while i < n and _cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (_cons(w, len(w) - 3) and not _cons(w, len(w) - 2)
            and _cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


def porter_stem(w: str) -> str:
    """Porter stemming algorithm (Porter 1980), steps 1-5."""
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in (("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
                     ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
                     ("alli", "al"), ("entli", "ent"), ("eli", "e"),
                     ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
                     ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                     ("ness", "")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
                "ive", "ize"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and _measure(w[:-3]) > 1 and w[-4] in "st":
            w = w[:-3]

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86_32 (Austin Appleby's public-domain algorithm)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length - (length % 4)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _py_term_ids(text: str) -> list[int]:
    toks = _TOKEN_RE.findall(text.lower())
    out = []
    for t in toks:
        if t in STOPWORDS:
            continue
        stemmed = porter_stem(t)
        # int31 so ids stay positive in the kernels' int32 columns.
        out.append(murmur3_32(stemmed.encode()) & 0x7FFFFFFF)
    return out


def term_ids(text: str) -> list[int]:
    """Stemmed-term hash ids for a text (C++ fast path when available)."""
    native = _get_native()
    if native is not None:
        return native.term_ids(text)
    return _py_term_ids(text)


_native = None
_native_checked = False


def _get_native():
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from voitta_rag_tpu.utils import native as native_mod

            _native = native_mod if native_mod.available() else None
        except Exception:
            _native = None
    return _native


class SparseEmbeddingService:
    """BM25 sparse embeddings (reference sparse_embedding.py:12-62 contract:
    ``embed(texts)`` for documents, ``embed_query(text)`` for queries)."""

    def __init__(self, k: float = 1.2, b: float = 0.75,
                 avg_len: float = 256.0):
        self.k = k
        self.b = b
        self.avg_len = avg_len

    def embed(self, texts: list[str]) -> list[SparseVector]:
        """Document-side BM25: tf saturation + length normalization."""
        out = []
        for text in texts:
            ids = term_ids(text)
            tf: dict[int, int] = {}
            for i in ids:
                tf[i] = tf.get(i, 0) + 1
            doc_len = len(ids)
            norm = self.k * (1 - self.b + self.b * doc_len / self.avg_len)
            indices, values = [], []
            for term, f in tf.items():
                indices.append(term)
                values.append(f * (self.k + 1) / (f + norm))
            out.append(SparseVector(indices=indices, values=values))
        return out

    def embed_query(self, text: str) -> SparseVector:
        """Query-side: unique terms, weight 1 (IDF applied by the engine)."""
        seen = []
        for i in term_ids(text):
            if i not in seen:
                seen.append(i)
        return SparseVector(indices=seen, values=[1.0] * len(seen))


def idf(df: int, n_docs: int) -> float:
    """Qdrant IDF modifier: ln((N - df + 0.5) / (df + 0.5) + 1)."""
    import math

    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


_sparse_service: SparseEmbeddingService | None = None
_create_lock = threading.Lock()


def get_sparse_embedding_service() -> SparseEmbeddingService:
    global _sparse_service
    if _sparse_service is None:
        with _create_lock:
            if _sparse_service is None:
                from voitta_rag_tpu.config import get_settings

                s = get_settings()
                _sparse_service = SparseEmbeddingService(
                    k=s.bm25_k, b=s.bm25_b, avg_len=s.bm25_avg_len)
    return _sparse_service
