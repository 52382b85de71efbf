"""Chunking behavior tests (contract: reference services/chunking.py)."""

import pytest

from voitta_rag_tpu.services.chunking import ChunkingService, SEPARATORS


def svc(size=64, overlap=10, strategy="recursive"):
    return ChunkingService(chunk_size=size, chunk_overlap=overlap, strategy=strategy)


def test_empty_and_whitespace():
    s = svc()
    assert s.chunk_text("") == []
    assert s.chunk_text("   \n\n  ") == []


def test_short_text_single_chunk():
    s = svc(size=100)
    chunks = s.chunk_text("hello world")
    assert len(chunks) == 1
    assert chunks[0].text == "hello world"
    assert chunks[0].index == 0
    assert chunks[0].start_char == 0


def test_chunks_respect_size_budget():
    s = svc(size=50, overlap=5)
    text = " ".join(f"word{i}" for i in range(200))
    chunks = s.chunk_text(text)
    assert len(chunks) > 1
    for c in chunks:
        assert len(c.text) <= 50


def test_offsets_point_into_original_text():
    s = svc(size=48, overlap=8)
    text = "Paragraph one is here.\n\nParagraph two follows. It has sentences. " \
           "And clauses, with commas.\n\nFinal bit."
    for c in s.chunk_text(text):
        assert text[c.start_char:c.end_char] == c.text


def test_paragraphs_preferred_over_midword_splits():
    s = svc(size=30, overlap=0)
    text = "aaa bbb ccc.\n\nddd eee fff.\n\nggg hhh iii."
    chunks = s.chunk_text(text)
    # Small paragraphs pack together (reference packs parts up to the budget),
    # but every split lands on a paragraph boundary — never mid-word.
    assert len(chunks) == 2
    for c in chunks:
        assert c.text.endswith(".")


def test_overlap_carries_text_between_chunks():
    s = svc(size=40, overlap=12)
    text = " ".join(f"w{i:03d}" for i in range(40))
    chunks = s.chunk_text(text)
    assert len(chunks) >= 2
    # Consecutive chunks overlap in character coverage.
    for a, b in zip(chunks, chunks[1:]):
        assert b.start_char < a.end_char


def test_no_separator_falls_back_to_fixed():
    s = svc(size=10, overlap=2)
    text = "x" * 57
    chunks = s.chunk_text(text)
    assert all(len(c.text) <= 10 for c in chunks)
    # Full coverage: last chunk reaches end of text.
    assert chunks[-1].end_char == 57


def test_indices_are_sequential():
    s = svc(size=20, overlap=0)
    chunks = s.chunk_text("one two three four five six seven eight nine ten " * 5)
    assert [c.index for c in chunks] == list(range(len(chunks)))


def test_sentence_strategy():
    s = svc(size=60, overlap=0, strategy="sentence")
    text = "First sentence here. Second one is longer than the first. Third! Fourth? Fifth ends."
    chunks = s.chunk_text(text)
    assert len(chunks) >= 2
    for c in chunks:
        assert text[c.start_char:c.end_char] == c.text


def test_fixed_strategy():
    s = svc(size=16, overlap=4, strategy="fixed")
    text = "abcdefghijklmnopqrstuvwxyz" * 3
    chunks = s.chunk_text(text)
    assert all(len(c.text) <= 16 for c in chunks)
    assert chunks[-1].end_char == len(text)


def test_unknown_strategy_defaults_to_recursive():
    # Reference chunking.py:43-44: unknown strategies fall through to recursive.
    s = svc(size=32, overlap=0, strategy="bogus")
    assert len(s.chunk_text("hello world. " * 20)) > 1


def test_separator_hierarchy_matches_reference():
    # Reference chunking.py:54-64.
    assert SEPARATORS == ["\n\n", "\n", ". ", "? ", "! ", "; ", ", ", " ", ""]


def test_coverage_no_content_lost():
    """Every non-space character of the input appears in some chunk span."""
    s = svc(size=50, overlap=10)
    text = "The quick brown fox. " * 30
    chunks = s.chunk_text(text)
    covered = set()
    for c in chunks:
        covered.update(range(c.start_char, c.end_char))
    for i, ch in enumerate(text.strip()):
        if not ch.isspace():
            assert i in covered, f"char {i} ({ch!r}) not covered"
