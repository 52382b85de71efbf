"""C++ native library must be byte-for-byte equivalent to the Python
reference implementation of the BM25 text pipeline."""

import pytest

from voitta_rag_tpu.search import sparse_text as st
from voitta_rag_tpu.utils import native

CASES = [
    "The quick brown foxes are running quickly through the forests!",
    "Internationalization and localization: configured databases, caches",
    "relational conditional rational traditional operational",
    "sses ponies ties caress cats feed agreed plastered bled motoring sing",
    "happy sky fly dying lying tying",
    "Café résumé naïve — emoji 🎉 mixed UTF-8",
    "numbers 123 mixed123abc 0xdeadbeef",
    "",
    "    \t\n  ",
    "a an the of",  # all stopwords
]


def test_snowball_stem_known_values():
    # Snowball "english" (Porter2) sample behaviors, including the
    # exceptional forms and region rules (fastembed's stemmer).
    assert st.snowball_stem("caresses") == "caress"
    assert st.snowball_stem("ponies") == "poni"
    assert st.snowball_stem("ties") == "tie"          # Porter2: ie, not i
    assert st.snowball_stem("cries") == "cri"
    assert st.snowball_stem("cats") == "cat"
    assert st.snowball_stem("feed") == "feed"
    assert st.snowball_stem("agreed") == "agre"
    assert st.snowball_stem("plastered") == "plaster"
    assert st.snowball_stem("motoring") == "motor"
    assert st.snowball_stem("conflated") == "conflat"
    assert st.snowball_stem("troubling") == "troubl"
    assert st.snowball_stem("sized") == "size"
    assert st.snowball_stem("hopping") == "hop"
    assert st.snowball_stem("happy") == "happi"
    assert st.snowball_stem("relational") == "relat"
    assert st.snowball_stem("conditional") == "condit"
    assert st.snowball_stem("fluently") == "fluentli"
    assert st.snowball_stem("dying") == "die"         # exceptional form
    assert st.snowball_stem("skies") == "sky"
    assert st.snowball_stem("inning") == "inning"     # post-1a invariant
    assert st.snowball_stem("generously") == "generous"  # gener- R1 prefix
    assert st.snowball_stem("communication") == "communic"
    assert st.snowball_stem("quantization") == "quantiz"  # fixed-R2 semantics


def test_murmur3_known_vectors():
    # Public MurmurHash3 x86_32 test vectors.
    assert st.murmur3_32(b"") == 0
    assert st.murmur3_32(b"", seed=1) == 0x514E28B7
    assert st.murmur3_32(b"hello") == 0x248BFA47
    assert st.murmur3_32(b"hello, world", seed=0) == 0x149BBB7F
    assert st.murmur3_32(b"The quick brown fox jumps over the lazy dog",
                         seed=0x9747B28C) == 0x2FA826CD


def test_term_ids_drop_stopwords_and_are_positive():
    ids = st._py_term_ids("The cats and the dogs")
    assert len(ids) == 2  # cats, dogs
    assert all(0 < i < 2**31 for i in ids)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
@pytest.mark.parametrize("text", CASES)
def test_native_parity_term_ids(text):
    assert native.term_ids(text) == st._py_term_ids(text)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_parity_murmur():
    for s in [b"", b"a", b"ab", b"abc", b"abcd", b"hello world", b"x" * 117]:
        assert native.murmur3_32(s) == st.murmur3_32(s)


def test_bm25_doc_weights():
    svc = st.SparseEmbeddingService(k=1.2, b=0.75, avg_len=10.0)
    [sv] = svc.embed(["cat cat dog"])
    assert len(sv) == 2
    w = dict(zip(sv.indices, sv.values))
    id_cat = st._py_term_ids("cat")[0]
    id_dog = st._py_term_ids("dog")[0]
    # tf=2 weight > tf=1 weight; both positive, saturating below k+1.
    assert w[id_cat] > w[id_dog] > 0
    assert w[id_cat] < 2.2


def test_query_embed_unique_unit_weights():
    svc = st.SparseEmbeddingService()
    sv = svc.embed_query("cats cats dogs")
    assert len(sv) == 2
    assert sv.values == [1.0, 1.0]


def test_idf_monotonic():
    assert st.idf(1, 1000) > st.idf(100, 1000) > st.idf(999, 1000)


def test_wordpiece_native_matches_python():
    """The C++ WordPiece path must be id-for-id identical to the Python
    tokenizer on ASCII inputs (non-ASCII falls back to Python)."""
    import random

    from voitta_rag_tpu.models.tokenizer import (
        WordPieceTokenizer, basic_tokenize)
    from voitta_rag_tpu.utils import native

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    for w in ("the", "quick", "brown", "fox", "token", "##ization", "##s",
              "un", "##believ", "##able", "!", ",", ".", "-", "123", "##45"):
        vocab.setdefault(w, len(vocab))
    for c in "abcdefghijklmnopqrstuvwxyz0123456789":
        vocab.setdefault(c, len(vocab))
        vocab.setdefault("##" + c, len(vocab))
    tok = WordPieceTokenizer(vocab)
    assert tok._native_ready()

    rng = random.Random(0)
    words = ["the", "quick", "unbelievable", "tokenizations", "fox!!",
             "a-b-c", "12345", "zzz", "MiXeD", "trailing.", "(paren)",
             "x" * 120]
    for trial in range(50):
        text = " ".join(rng.choices(words, k=rng.randint(1, 30)))
        fast = tok.tokenize_ids(text)
        slow = []
        for t in basic_tokenize(text, True):
            slow.extend(tok.wordpiece(t))
        assert fast == slow, (text, fast, slow)

    # Non-ASCII routes through Python (same answer either way).
    text = "café naïve 東京 test"
    ids = tok.tokenize_ids(text)
    slow = []
    for t in basic_tokenize(text, True):
        slow.extend(tok.wordpiece(t))
    assert ids == slow
