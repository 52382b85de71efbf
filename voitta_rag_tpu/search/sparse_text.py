"""BM25 sparse-vector text pipeline (host side), fastembed-compatible.

Replaces fastembed's ``Qdrant/bm25`` model + Qdrant's IDF modifier
(reference services/sparse_embedding.py, vector_store.py:95-99) with a
self-contained implementation matching fastembed's pipeline rule for rule
(fastembed/sparse/bm25.py — see docs/BM25_PARITY.md for the line-by-line
mapping):

- tokenize: lowercase, replace every non-``\\w`` char with a space, split
  on whitespace (fastembed ``SimpleTokenizer``) — underscores stay inside
  tokens, Unicode letters are kept,
- filter: drop single punctuation chars, NLTK English stopwords (modern
  179-entry list, matching the ``stopwords.txt`` the Qdrant/bm25 model
  ships), and tokens longer than 40 chars (``token_max_length``),
- stem: Snowball "english" (Porter2) — fastembed uses
  ``py_rust_stemmers.SnowballStemmer("english")``; the implementation here
  is written from the published Snowball spec and cross-validated against
  NLTK's SnowballStemmer over a large real vocabulary
  (tests/test_snowball.py),
- term id: ``abs(signed mmh3)`` — MurmurHash3 x86_32 of the UTF-8 stemmed
  token interpreted as signed int32, absolute value (fastembed
  ``compute_token_id``). The single value ``-2**31`` (abs = 2**31, which
  overflows int32) is clamped to ``2**31 - 1`` so ids fit the kernels'
  int32 term columns,
- document weight: BM25 term-frequency saturation with length normalization
      w(t, d) = tf * (k + 1) / (tf + k * (1 - b + b * |d| / avgdl))
  baked in at index time (k=1.2, b=0.75, avgdl=256 — fastembed defaults),
- query weight: IDF applied query-side (Qdrant ``Modifier.IDF`` semantics):
      idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)
  with df/N maintained in the payload store as documents are added/removed.

A C++ fast path for tokenize+stem+hash lives in native/voitta_native.cpp
(loaded via ctypes); it handles pure-ASCII texts and defers any text with
non-ASCII bytes to this reference implementation.
"""

from __future__ import annotations

import re
import threading

from voitta_rag_tpu.core_types import SparseVector

SPARSE_VECTOR_NAME = "bm25"  # reference sparse_embedding.py:9

# NLTK English stopword list, modern 179-entry revision — the list the
# Qdrant/bm25 model ships as stopwords.txt (fastembed Bm25._load_stopwords).
# Note the bare contraction stems (don, t, s, ll, ve, …): after \w-based
# tokenization "don't" arrives as ["don", "t"], so those entries are what
# actually filter contractions; the apostrophe forms can never match a
# token and are retained only for list fidelity.
STOPWORDS = frozenset("""
i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself it
it's its itself they them their theirs themselves what which who whom this
that that'll these those am is are was were be been being have has had
having do does did doing a an the and but if or because as until while of
at by for with about against between into through during before after
above below to from up down in out on off over under again further then
once here there when where why how all any both each few more most other
some such no nor not only own same so than too very s t can will just don
don't should should've now d ll m o re ve y ain aren aren't couldn
couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't
isn isn't ma mightn mightn't mustn mustn't needn needn't shan shan't
shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
""".split())

TOKEN_MAX_LENGTH = 40  # fastembed Bm25(token_max_length=40) default

# fastembed SimpleTokenizer: re.sub(r"[^\w]", " ", text.lower()).split() —
# implemented as a findall of \w runs (identical token stream).
_TOKEN_RE = re.compile(r"\w+")

# string.punctuation — filters tokens that are a single punctuation char
# (with \w tokenization only "_" can actually occur).
_PUNCTUATION = frozenset(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")


# ---------------------------------------------------------------------------
# Snowball "english" stemmer (Porter2), implemented from the published
# algorithm (snowballstem.org/algorithms/english/stemmer.html). This is the
# algorithm fastembed's Bm25 runs (py_rust_stemmers SnowballStemmer
# "english"); exactness is asserted against NLTK's independent
# implementation over a large real vocabulary in tests/test_snowball.py.
# ---------------------------------------------------------------------------

_SB_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_SB_STOP_AFTER_1A = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed"))
_SB_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_SB_LI_OK = frozenset("cdeghkmnrt")
_SB_VOWELS = frozenset("aeiouy")  # consonant-y is marked 'Y' first


def _sb_mark_y(w: str) -> str:
    """Upper-case each y that functions as a consonant (word-initial, or
    directly after a vowel)."""
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _SB_VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def _sb_r1(w: str) -> int:
    """Start of R1: after the first non-vowel following a vowel — with the
    gener-/commun-/arsen- prefix exception."""
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            return len(pre)
    for i in range(1, len(w)):
        if w[i] not in _SB_VOWELS and w[i - 1] in _SB_VOWELS:
            return i + 1
    return len(w)


def _sb_region(w: str, start: int) -> int:
    for i in range(start + 1, len(w)):
        if w[i] not in _SB_VOWELS and w[i - 1] in _SB_VOWELS:
            return i + 1
    return len(w)


def _sb_ends_short_syllable(w: str) -> bool:
    if len(w) == 2:
        return w[0] in _SB_VOWELS and w[1] not in _SB_VOWELS
    if len(w) >= 3:
        return (w[-3] not in _SB_VOWELS and w[-2] in _SB_VOWELS
                and w[-1] not in _SB_VOWELS and w[-1] not in "wxY")
    return False


def snowball_stem(word: str) -> str:
    """Snowball english (Porter2) stem of a lowercase word."""
    w = word.lower()
    if len(w) <= 2:
        return w
    if w in _SB_EXCEPTIONS:
        return _SB_EXCEPTIONS[w]
    if w[0] == "'":
        w = w[1:]
    w = _sb_mark_y(w)
    r1 = _sb_r1(w)
    r2 = _sb_region(w, r1)

    # Step 0: longest of 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in _SB_VOWELS for c in w[:-2]):
            w = w[:-1]

    if w in _SB_STOP_AFTER_1A:
        return w.replace("Y", "y")

    # Step 1b
    if w.endswith(("eedly", "eed")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(c in _SB_VOWELS for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_SB_DOUBLES):
                        w = w[:-1]
                    elif r1 >= len(w) and _sb_ends_short_syllable(w):
                        w += "e"
                break

    # Step 1c: y/Y -> i after a non-vowel that isn't the first letter
    if (len(w) > 2 and w[-1] in "yY" and w[-2] not in _SB_VOWELS):
        w = w[:-1] + "i"

    # Step 2 (longest match, then the R1 condition)
    _step2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    )
    for suf, rep in _step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-3] + rep
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _SB_LI_OK:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 3 (longest match, then R1; ative needs R2)
    _step3 = (("ational", "ate"), ("tional", "tion"), ("alize", "al"),
              ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
              ("ical", "ic"), ("ness", ""), ("ful", ""))
    for suf, rep in _step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 4 (longest match, then R2; ion needs s/t before it)
    _step4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant",
              "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
              "al", "er", "ic")
    for suf in _step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # Step 5
    if w.endswith("e"):
        stem = w[:-1]
        if len(stem) >= r2 or (len(stem) >= r1
                               and not _sb_ends_short_syllable(stem)):
            w = stem
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 \
            and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")


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


def term_id_of(stemmed: str) -> int:
    """fastembed ``compute_token_id``: abs of the signed-int32 reading of
    mmh3(token). The lone value -2**31 (abs overflows int32) clamps to
    2**31 - 1 so ids stay valid int32 term columns."""
    h = murmur3_32(stemmed.encode("utf-8"))
    if h == 0x80000000:
        return 0x7FFFFFFF
    return (0x100000000 - h) if h >= 0x80000000 else h


def _py_term_ids(text: str) -> list[int]:
    out = []
    for t in _TOKEN_RE.findall(text.lower()):
        # fastembed Bm25._stemmer filter order: punctuation, stopword,
        # token_max_length — then stem.
        if t in _PUNCTUATION or t in STOPWORDS or len(t) > TOKEN_MAX_LENGTH:
            continue
        out.append(term_id_of(snowball_stem(t)))
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
