"""Snowball-english stemmer cross-validated against NLTK's independent
implementation over a large real vocabulary.

fastembed's Bm25 stems with py_rust_stemmers SnowballStemmer("english")
(compiled from the official Snowball source); NLTK ships an independent
re-implementation of the same algorithm. Agreement here is the parity
evidence SURVEY §7 asks for: a tokenization/stemming divergence from the
reference stack would show up as disagreements.

Known systematic difference (documented in docs/BM25_PARITY.md §stemmer):
official Snowball keeps R1/R2 as integer positions fixed at the start, so
a step-2 replacement that shortens the word past the R2 boundary leaves
the boundary where it was ("quantization" → step 2 → "quantize", e is at
R2 → "quantiz"). NLTK tracks the regions as string suffixes and nulls
them in that case ("quantize"). We implement the official semantics (what
fastembed runs), so a sub-0.05% disagreement rate with NLTK is expected
and tolerated here.
"""

import itertools
import pathlib
import re

import pytest

nltk = pytest.importorskip("nltk")

from voitta_rag_tpu.search.sparse_text import snowball_stem  # noqa: E402


def _real_vocabulary(target: int = 15000) -> list[str]:
    """Lower-case [a-z]+ words harvested from installed package sources."""
    words: set[str] = set()
    import numpy

    roots = [pathlib.Path(numpy.__file__).parent,
             pathlib.Path(nltk.__file__).parent]
    for root in roots:
        for p in itertools.islice(root.rglob("*.py"), 600):
            try:
                txt = p.read_text(errors="ignore").lower()
            except OSError:
                continue
            words.update(re.findall(r"[a-z]{2,}", txt))
            if len(words) >= target:
                break
        if len(words) >= target:
            break
    wf = pathlib.Path("/usr/share/dict/words")
    if wf.exists():
        words.update(w.strip().lower() for w in wf.read_text().split()
                     if w.strip().isalpha())
    return sorted(words)


def test_snowball_matches_nltk_on_real_vocabulary():
    from nltk.stem.snowball import SnowballStemmer

    oracle = SnowballStemmer("english")
    vocab = _real_vocabulary()
    assert len(vocab) >= 10000, "vocabulary harvest too small to be evidence"
    diffs = [(w, snowball_stem(w), oracle.stem(w))
             for w in vocab if snowball_stem(w) != oracle.stem(w)]
    # Tolerate only the documented fixed-R2-vs-string-R2 divergence class:
    # every diff must be a one-letter-longer NLTK result (trailing e kept /
    # l kept) on the same stem prefix.
    for w, ours, theirs in diffs:
        assert theirs.startswith(ours) and len(theirs) - len(ours) <= 1, (
            f"unexplained stemmer divergence: {w}: {ours} vs {theirs}")
    rate = len(diffs) / len(vocab)
    assert rate < 0.0005, (len(diffs), len(vocab), diffs[:20])


def test_snowball_matches_nltk_on_derivational_families():
    """Dense coverage of suffix-rule interactions: generate derived forms
    from base words so every step-2/3/4 rule fires."""
    from nltk.stem.snowball import SnowballStemmer

    oracle = SnowballStemmer("english")
    bases = ["nation", "rational", "organ", "connect", "create", "active",
             "forma", "decis", "hope", "care", "use", "rely", "deny",
             "grate", "sense", "move", "state", "note", "excite"]
    suffixes = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ism", "ate", "iti", "ous", "ive",
                "ize", "ion", "ational", "tional", "izer", "ization",
                "ation", "ator", "alism", "aliti", "alli", "fulness",
                "ousli", "ousness", "iveness", "iviti", "biliti", "bli",
                "ogi", "fulli", "lessli", "li", "icate", "ative", "alize",
                "iciti", "ical", "ful", "ness", "ing", "ed", "ingly",
                "edly", "eed", "eedly", "s", "es", "ies"]
    diffs = []
    for b in bases:
        for suf in suffixes:
            w = b + suf
            if snowball_stem(w) != oracle.stem(w):
                diffs.append((w, snowball_stem(w), oracle.stem(w)))
    for w, ours, theirs in diffs:
        assert theirs.startswith(ours) and len(theirs) - len(ours) <= 1, (
            f"unexplained stemmer divergence: {w}: {ours} vs {theirs}")
    assert len(diffs) <= 5, diffs
