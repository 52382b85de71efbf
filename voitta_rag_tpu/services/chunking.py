"""Text chunking — the decomposition layer that keeps encoder inputs tiny.

Behavior contract: reference services/chunking.py:19-246 — three strategies
(``recursive`` | ``sentence`` | ``fixed``), char-budget ``chunk_size`` with
``chunk_overlap`` carry-over, emitted ``Chunk(text, index, start_char,
end_char)`` with stripped text. The recursive strategy splits on a separator
hierarchy (paragraph → line → sentence → clause → word → char,
chunking.py:54-64) and greedily packs parts.

This is a clean re-implementation, not a port: offsets are tracked exactly
(the reference's offset bookkeeping drifts under overlap), and packing is a
single iterative pass per recursion level. Chunking is deliberately host-side:
on TPU, "long context" is handled by decomposition into many chunks scanned as
a large batch dimension, not by sequence parallelism (SURVEY.md §5.7).
"""

from __future__ import annotations

import re

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.core_types import Chunk

# Most- to least-meaningful separators (reference chunking.py:54-64).
SEPARATORS = ["\n\n", "\n", ". ", "? ", "! ", "; ", ", ", " ", ""]

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")


class ChunkingService:
    """Splits text into chunks for embedding (reference chunking.py:19-44)."""

    def __init__(
        self,
        chunk_size: int | None = None,
        chunk_overlap: int | None = None,
        strategy: str | None = None,
    ) -> None:
        settings = get_settings()
        self.chunk_size = chunk_size or settings.chunk_size
        self.chunk_overlap = (
            chunk_overlap if chunk_overlap is not None else settings.chunk_overlap
        )
        # Overlap must leave forward progress.
        self.chunk_overlap = min(self.chunk_overlap, max(self.chunk_size - 1, 0))
        self.strategy = strategy or settings.chunking_strategy

    # -- public API ---------------------------------------------------------
    def chunk_text(self, text: str) -> list[Chunk]:
        if not text or not text.strip():
            return []
        if self.strategy == "sentence":
            spans = self._sentence_spans(text)
        elif self.strategy == "fixed":
            spans = self._fixed_spans(text, 0)
        else:  # "recursive" and any unknown strategy (reference chunking.py:43-44)
            spans = self._recursive_spans(text, 0, 0)
        return self._emit(text, spans)

    # -- span machinery -----------------------------------------------------
    # All strategies produce (start, end) spans over the ORIGINAL text; _emit
    # strips whitespace while keeping offsets consistent with the raw text.

    def _emit(self, text: str, spans: list[tuple[int, int]]) -> list[Chunk]:
        chunks: list[Chunk] = []
        for start, end in spans:
            piece = text[start:end]
            stripped = piece.strip()
            if not stripped:
                continue
            lead = len(piece) - len(piece.lstrip())
            chunks.append(
                Chunk(
                    text=stripped,
                    index=len(chunks),
                    start_char=start + lead,
                    end_char=start + lead + len(stripped),
                )
            )
        return chunks

    def _recursive_spans(
        self, text: str, offset: int, sep_level: int
    ) -> list[tuple[int, int]]:
        """Split ``text`` (at absolute ``offset``) into ≤chunk_size spans."""
        if not text:
            return []
        if len(text) <= self.chunk_size:
            return [(offset, offset + len(text))]

        # Find the highest-priority separator present at this level or below.
        sep = None
        level = sep_level
        for i in range(sep_level, len(SEPARATORS)):
            if SEPARATORS[i] == "":
                sep = ""
                level = i
                break
            if SEPARATORS[i] in text:
                sep = SEPARATORS[i]
                level = i
                break
        if sep == "" or sep is None:
            return self._fixed_spans(text, offset)

        # Part spans INCLUDE the trailing separator so offsets stay exact.
        parts: list[tuple[int, int]] = []
        pos = 0
        while True:
            hit = text.find(sep, pos)
            if hit < 0:
                parts.append((pos, len(text)))
                break
            parts.append((pos, hit + len(sep)))
            pos = hit + len(sep)
            if pos >= len(text):
                break

        spans: list[tuple[int, int]] = []
        cur_start = parts[0][0]
        cur_end = parts[0][0]  # empty current chunk

        def flush() -> None:
            nonlocal cur_start, cur_end
            if cur_end > cur_start:
                spans.append((offset + cur_start, offset + cur_end))

        for p_start, p_end in parts:
            p_len = p_end - p_start
            if p_len > self.chunk_size:
                # Oversize part: flush what we have, recurse at the next level.
                flush()
                spans.extend(
                    self._recursive_spans(
                        text[p_start:p_end], offset + p_start, level + 1
                    )
                )
                cur_start = cur_end = p_end
                continue
            if (cur_end - cur_start) + p_len <= self.chunk_size:
                cur_end = p_end
            else:
                flush()
                # Overlap: back up into the previous chunk (reference
                # chunking.py:124-131) without exceeding the budget.
                back = min(self.chunk_overlap, cur_end - cur_start)
                back = min(back, self.chunk_size - p_len)
                cur_start = cur_end - max(back, 0)
                cur_end = p_end
        flush()
        return spans

    def _fixed_spans(self, text: str, offset: int) -> list[tuple[int, int]]:
        """Fixed-size spans with overlap (reference chunking.py:161-183)."""
        spans: list[tuple[int, int]] = []
        step = max(self.chunk_size - self.chunk_overlap, 1)
        pos = 0
        while pos < len(text):
            end = min(pos + self.chunk_size, len(text))
            spans.append((offset + pos, offset + end))
            if end >= len(text):
                break
            pos += step
        return spans

    def _sentence_spans(self, text: str) -> list[tuple[int, int]]:
        """Sentence packing (reference chunking.py:188-235): split on
        sentence-final punctuation, pack until the budget is reached."""
        sentences: list[tuple[int, int]] = []
        pos = 0
        for m in _SENTENCE_RE.finditer(text):
            sentences.append((pos, m.start()))
            pos = m.end()
        if pos < len(text):
            sentences.append((pos, len(text)))

        spans: list[tuple[int, int]] = []
        cur: tuple[int, int] | None = None
        for s_start, s_end in sentences:
            s_len = s_end - s_start
            if cur is None:
                cur = (s_start, s_end)
            elif (s_end - cur[0]) <= self.chunk_size:
                cur = (cur[0], s_end)
            else:
                spans.append(cur)
                cur = (s_start, s_end)
            # A single oversize sentence falls back to fixed splitting.
            if cur and (cur[1] - cur[0]) > self.chunk_size and s_len > self.chunk_size:
                spans.extend(self._fixed_spans(text[cur[0]:cur[1]], cur[0]))
                cur = None
        if cur is not None:
            spans.append(cur)
        return spans


def get_chunking_service() -> ChunkingService:
    return ChunkingService()
