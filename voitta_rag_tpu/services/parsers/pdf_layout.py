"""Layout-aware PDF text extraction: positioned spans -> reading order.

The LAYOUT half of the value the reference buys from its MinerU worker
(/root/reference/src/voitta/services/parsers/pdf_parser.py:110-164,
scripts/mineru_parse.py:24-31): multi-column reading order and table-row
reconstruction for TEXT PDFs, computed from the content stream's
text-positioning operators (Tm/Td/TD/T*/TL). The OTHER half — OCR of
scanned pages — needs an OCR engine this image does not ship; image-only
pages keep surfacing the actionable parse error + the external-worker hook
(VOITTA_PDF_WORKER_CMD), the one documented environmental divergence
(docs/ARCHITECTURE.md §9).

Pipeline:
  1. ``extract_spans``: walk the content stream tracking the text-line
     position (the e/f translation of Tm, accumulated Td/TD moves, and
     T*/TL leading), decode every show-text operator with the page's fonts,
     and emit (x, y, size, text) spans.
  2. ``lines_of``: cluster spans into visual lines by y (tolerance scaled
     by font size), sort spans within a line by x.
  3. ``detect_columns``: a wide horizontal whitespace gap crossed by no
     line, with at least a quarter of the lines on each side and vertical
     overlap between the sides, splits the page into columns.
  4. ``layout_text``: columns emit left-to-right, each top-to-bottom;
     inside a column, runs of >= 2 consecutive multi-span lines whose span
     x-starts align across rows are rendered as table rows with `` | ``
     cell separators.

The stream-order extractor (:func:`pdf_parser._extract_page_text`) stays
the default output for pages where no multi-column/table structure is
detected — single-column pages render identically through either path, and
stream order is the cheaper one.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

Y_TOL_FACTOR = 0.6       # line clustering tolerance, in units of font size
COL_GAP_FRAC = 0.12      # min column gap, as a fraction of the text width
COL_MIN_LINES_FRAC = 0.2  # each side of a split must hold this many lines
CELL_X_TOL = 4.0         # table column alignment tolerance (pt)


@dataclass
class Span:
    x: float
    y: float
    size: float
    text: str


_NUM = rb"[-+]?\d*\.?\d+"
_STR = rb"\((?:[^()\\]|\\.|\([^)]*\))*\)|<[0-9A-Fa-f\s]*>"
_OP_RE = re.compile(
    rb"(?P<tm>(?:" + _NUM + rb"\s+){6})Tm"
    rb"|(?P<td>" + _NUM + rb"\s+" + _NUM + rb")\s+(?P<tdop>Td|TD)"
    rb"|(?P<tl>" + _NUM + rb")\s+TL"
    rb"|/(?P<tf>\S+)\s+(?P<tfsize>" + _NUM + rb")\s+Tf"
    rb"|(?P<str>" + _STR + rb")\s*(?P<showop>Tj|'|\")"
    rb"|\[(?P<arr>.*?)\]\s*TJ"
    rb"|(?P<simple>T\*|BT|ET)", re.S)
_ARRAY_ITEM_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|-?\d+(?:\.\d+)?")


def extract_spans(content: bytes, fonts: dict | None = None) -> list[Span]:
    """Positioned text spans of one page content stream, in stream order."""
    from voitta_rag_tpu.services.parsers.pdf_parser import (
        DEFAULT_FONT, _hex_bytes, _literal_bytes,
    )

    fonts = fonts or {}
    font = DEFAULT_FONT
    size = 12.0
    x = y = 0.0
    lx = ly = 0.0          # line-start (the Td/TD/T* base)
    leading = 12.0
    spans: list[Span] = []

    def decode(tok: bytes) -> str:
        if tok.startswith(b"("):
            return font.decode(_literal_bytes(tok[1:-1]))
        return font.decode(_hex_bytes(tok[1:-1]))

    def emit(text: str) -> None:
        nonlocal x
        if text:
            spans.append(Span(x, y, size, text))
            # Advance by an em-box estimate — enough for within-line
            # ordering and gap detection without per-glyph width tables.
            x += 0.5 * size * len(text)

    for m in _OP_RE.finditer(content):
        if m.group("tm") is not None:
            vals = [float(v) for v in m.group("tm").split()]
            lx, ly = vals[4], vals[5]
            x, y = lx, ly
        elif m.group("td") is not None:
            tx, ty = (float(v) for v in m.group("td").split())
            if m.group("tdop") == b"TD":
                leading = -ty if ty else leading
            lx, ly = lx + tx, ly + ty
            x, y = lx, ly
        elif m.group("tl") is not None:
            leading = float(m.group("tl"))
        elif m.group("tf") is not None:
            font = fonts.get(m.group("tf"), DEFAULT_FONT)
            try:
                size = abs(float(m.group("tfsize"))) or size
            except ValueError:
                pass
        elif m.group("str") is not None:
            if m.group("showop") in (b"'", b'"'):
                ly -= leading
                x, y = lx, ly
            emit(decode(m.group("str")))
        elif m.group("arr") is not None:
            for item in _ARRAY_ITEM_RE.finditer(m.group("arr")):
                tok = item.group(0)
                if tok.startswith((b"(", b"<")):
                    emit(decode(tok))
                else:
                    try:
                        kern = float(tok)
                    except ValueError:
                        continue
                    # Kerns displace by -kern/1000 em (inter-word spaces
                    # arrive as large negative kerns).
                    x -= kern / 1000.0 * size
                    if kern < -150:
                        spans.append(Span(x, y, size, " "))
        else:
            op = m.group("simple")
            if op == b"T*":
                ly -= leading
                x, y = lx, ly
            elif op == b"BT":
                x = y = lx = ly = 0.0
    return [s for s in spans if s.text.strip() or s.text == " "]


def lines_of(spans: list[Span]) -> list[list[Span]]:
    """Cluster spans into visual lines (desc y), spans x-sorted within."""
    if not spans:
        return []
    order = sorted(spans, key=lambda s: (-s.y, s.x))
    lines: list[list[Span]] = [[order[0]]]
    for s in order[1:]:
        ref = lines[-1][0]
        if abs(s.y - ref.y) <= Y_TOL_FACTOR * max(s.size, ref.size):
            lines[-1].append(s)
        else:
            lines.append([s])
    for ln in lines:
        ln.sort(key=lambda s: s.x)
    return lines


def _line_text(line: list[Span]) -> str:
    out = []
    prev_end = None
    for s in line:
        if prev_end is not None and s.x - prev_end > 0.2 * s.size:
            out.append(" ")
        out.append(s.text)
        prev_end = s.x + 0.5 * s.size * len(s.text)
    return re.sub(r"[ \t]+", " ", "".join(out)).strip()


def _span_end(s: Span) -> float:
    return s.x + 0.5 * s.size * len(s.text)


def detect_columns(lines: list[list[Span]]) -> list[float]:
    """Column split x-positions (empty = single column).

    Two side-by-side text columns land in the SAME visual lines (equal y),
    so the split is a vertical GUTTER: an x-interval shared by the largest
    intra-line gap of most multi-span lines, crossed by (almost) no span.
    A table looks identical geometrically — the discriminator is prose
    length: column sides hold wrapped multi-word prose, table cells are
    short (those pages are handled by the table-run renderer instead).
    """
    if len(lines) < 8:
        return []
    spans = [s for ln in lines for s in ln]
    x_lo = min(s.x for s in spans)
    x_hi = max(_span_end(s) for s in spans)
    width = x_hi - x_lo
    if width <= 0:
        return []
    multi = [ln for ln in lines if len(ln) >= 2]
    if len(multi) < max(COL_MIN_LINES_FRAC, 0.5) * len(lines):
        return []
    gaps = []
    for ln in multi:
        best = None
        for a, b in zip(ln, ln[1:]):
            ga, gb = _span_end(a), b.x
            if gb - ga > (best[1] - best[0] if best else 0):
                best = (ga, gb)
        if best and best[1] - best[0] >= 0.05 * width:
            gaps.append(best)
    if len(gaps) < 0.6 * len(multi):
        return []
    lo = max(g[0] for g in gaps)
    hi = min(g[1] for g in gaps)
    if hi - lo <= 0:   # the per-line gaps do not share an x-interval
        return []
    split = (lo + hi) / 2
    if not (x_lo + 0.15 * width < split < x_hi - 0.15 * width):
        return []
    # Crossing spans mean full-width content; tolerate a few (title,
    # abstract, footer) — they re-emit as a header block in layout_text.
    crossing = sum(1 for s in spans
                   if s.x < split - 2 and _span_end(s) > split + 2)
    if crossing > max(1, round(0.15 * len(lines))):
        return []
    # Prose test: median words per span >= 3 on BOTH sides, else this is
    # cell-shaped content and the table renderer owns it.
    for side in ((s for s in spans if _span_end(s) <= split + 2),
                 (s for s in spans if s.x >= split - 2)):
        wc = sorted(len(s.text.split()) for s in side)
        if not wc or wc[len(wc) // 2] < 3:
            return []
    return [split]


def _table_runs(lines: list[list[Span]]) -> list[tuple[int, int, list[float]]]:
    """(start, end, column_xs) for runs of >= 2 aligned multi-span lines."""
    runs = []
    i = 0
    while i < len(lines):
        if len(lines[i]) < 2:
            i += 1
            continue
        cols = [s.x for s in lines[i]]
        j = i + 1
        while j < len(lines) and len(lines[j]) == len(cols) and all(
                abs(s.x - cx) <= CELL_X_TOL
                for s, cx in zip(lines[j], cols)):
            j += 1
        if j - i >= 2:
            runs.append((i, j, cols))
            i = j
        else:
            i += 1
    return runs


def _emit_block(lines: list[list[Span]]) -> str:
    runs = {start: (end, cols) for start, end, cols in _table_runs(lines)}
    out: list[str] = []
    i = 0
    while i < len(lines):
        if i in runs:
            end, _cols = runs[i]
            for ln in lines[i:end]:
                out.append(" | ".join(
                    re.sub(r"[ \t]+", " ", s.text).strip() for s in ln))
            i = end
        else:
            out.append(_line_text(lines[i]))
            i += 1
    return "\n".join(t for t in out if t)


def layout_text(spans: list[Span]) -> tuple[str, bool]:
    """(reading-order text, structured) for one page's spans.

    ``structured`` is True when a column split or a table run was found —
    the caller keeps the cheaper stream-order extraction otherwise.
    """
    lines = lines_of(spans)
    if not lines:
        return "", False
    splits = detect_columns(lines)
    if not splits:
        has_table = bool(_table_runs(lines))
        return _emit_block(lines), has_table
    # A visual line holds spans from BOTH columns (equal y): partition the
    # SPANS at the gutter and re-cluster lines per side. Spans crossing it
    # are full-width headers/footers; they emit first.
    split = splits[0]
    header = lines_of([s for s in spans
                       if s.x < split - 2 and _span_end(s) > split + 2])
    left = lines_of([s for s in spans if _span_end(s) <= split + 2])
    right = lines_of([s for s in spans if s.x >= split - 2])
    parts = [_emit_block(b) for b in (header, left, right) if b]
    return "\n".join(p for p in parts if p), True
