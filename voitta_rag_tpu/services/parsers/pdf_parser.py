"""PDF parser: standalone text extraction + page-bucket streaming.

The reference shells out to MinerU in a dedicated venv with PyMuPDF page
counting and 20-page buckets (pdf_parser.py:39-164, 209-327). Neither MinerU
nor PyMuPDF is assumed here; this module implements a from-scratch extractor
for the common case with the stdlib:

- cross-reference parsing (classic tables and xref streams are both handled
  by brute-force object scanning, which also survives mildly corrupt files),
- page tree walk to order pages,
- FlateDecode content streams, ``Tj`` / ``TJ`` / ``'`` / ``"`` text
  operators, with ``BT/ET`` blocks and ``Td/TD/T*`` line-break heuristics,
- WinAnsi/PDFDoc default encodings; hex and literal strings with escapes.

Custom font encodings/CIDs degrade to best-effort text (garbled glyph maps
are a known limitation vs MinerU). The bucketing generator API
(``parse_in_buckets`` yielding per-bucket results with page metadata,
reference pdf_parser.py:209-327) is preserved so the indexing service's
progressive checkpointing works identically.
"""

from __future__ import annotations

import re
import zlib
from pathlib import Path
from typing import Iterator

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """Brute-force scan of `N G obj ... endobj` bodies (robust to bad xref)."""
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)}


def _dict_of(body: bytes) -> bytes:
    start = body.find(b"<<")
    if start < 0:
        return b""
    depth = 0
    i = start
    while i < len(body) - 1:
        if body[i:i + 2] == b"<<":
            depth += 1
            i += 2
        elif body[i:i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _refs(d: bytes, key: bytes) -> list[int]:
    m = re.search(re.escape(key) + rb"\s*\[(.*?)\]", d, re.S)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    m = re.search(re.escape(key) + rb"\s*(\d+)\s+\d+\s+R", d)
    return [int(m.group(1))] if m else []


def _decode_stream(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    raw = m.group(1)
    d = _dict_of(body)
    if b"FlateDecode" in d:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            try:  # some writers pad the stream
                return zlib.decompressobj().decompress(raw)
            except zlib.error:
                return None
    if b"Filter" not in d:
        return raw
    return None  # unsupported filter (DCT images etc.)


_ESCAPES = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
            b"(": "(", b")": ")", b"\\": "\\"}


def _literal_string(tok: bytes) -> str:
    out = []
    i = 0
    while i < len(tok):
        c = tok[i:i + 1]
        if c == b"\\" and i + 1 < len(tok):
            nxt = tok[i + 1:i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal
                oct_digits = tok[i + 1:i + 4]
                m = re.match(rb"[0-7]{1,3}", oct_digits)
                if m:
                    out.append(chr(int(m.group(0), 8)))
                    i += 1 + len(m.group(0))
                    continue
            i += 2
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


def _hex_string(tok: bytes) -> str:
    h = re.sub(rb"\s", b"", tok)
    if len(h) % 2:
        h += b"0"
    try:
        raw = bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return ""
    if raw[:2] in (b"\xfe\xff",):  # UTF-16BE
        return raw[2:].decode("utf-16-be", errors="ignore")
    if len(raw) >= 2 and raw[0] == 0:  # heuristically UTF-16BE without BOM
        return raw.decode("utf-16-be", errors="ignore")
    return raw.decode("latin-1", errors="ignore")


_TEXT_OP_RE = re.compile(
    rb"(\((?:[^()\\]|\\.|\([^)]*\))*\))\s*(Tj|')"   # literal string + Tj/'
    rb"|<([0-9A-Fa-f\s]*)>\s*(Tj|')"                # hex string + Tj/'
    rb"|\[(.*?)\]\s*TJ"                             # array + TJ
    rb"|(T\*|TD|Td|ET)", re.S)
_ARRAY_ITEM_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|-?\d+(?:\.\d+)?")


def _extract_page_text(content: bytes) -> str:
    out: list[str] = []
    for m in _TEXT_OP_RE.finditer(content):
        if m.group(1):
            out.append(_literal_string(m.group(1)[1:-1]))
        elif m.group(3) is not None:
            out.append(_hex_string(m.group(3)))
        elif m.group(5) is not None:
            for item in _ARRAY_ITEM_RE.finditer(m.group(5)):
                tok = item.group(0)
                if tok.startswith(b"("):
                    out.append(_literal_string(tok[1:-1]))
                elif tok.startswith(b"<"):
                    out.append(_hex_string(tok[1:-1]))
                else:
                    # Large negative kern ≈ inter-word space.
                    try:
                        if float(tok) < -150:
                            out.append(" ")
                    except ValueError:
                        pass
        else:  # line-break operators
            if out and not out[-1].endswith("\n"):
                out.append("\n")
    text = "".join(out)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


class PdfDocument:
    """Parsed page list of a PDF file."""

    def __init__(self, path: Path):
        data = path.read_bytes()
        self.objects = _parse_objects(data)
        self.pages = self._page_order()

    def _page_order(self) -> list[int]:
        page_objs = []
        kids_map: dict[int, list[int]] = {}
        roots = []
        for num, body in self.objects.items():
            d = _dict_of(body)
            if re.search(rb"/Type\s*/Pages\b", d):
                kids_map[num] = _refs(d, b"/Kids")
                roots.append(num)
            elif re.search(rb"/Type\s*/Page\b", d):
                page_objs.append(num)
        # Walk the page tree for document order; fall back to object order.
        ordered: list[int] = []
        seen = set()

        def walk(n):
            if n in seen:
                return
            seen.add(n)
            if n in kids_map:
                for k in kids_map[n]:
                    walk(k)
            elif n in page_objs:
                ordered.append(n)

        top = [r for r in roots if not any(r in k for k in kids_map.values())]
        for r in top or roots:
            walk(r)
        for p in page_objs:
            if p not in seen:
                ordered.append(p)
        return ordered

    @property
    def page_count(self) -> int:
        return len(self.pages)

    def page_text(self, index: int) -> str:
        body = self.objects.get(self.pages[index], b"")
        d = _dict_of(body)
        parts = []
        for ref in _refs(d, b"/Contents"):
            obj = self.objects.get(ref)
            if obj is None:
                continue
            stream = _decode_stream(obj)
            if stream:
                parts.append(_extract_page_text(stream))
        return "\n".join(p for p in parts if p)


class PdfParser(BaseParser):
    extensions = [".pdf"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            doc = PdfDocument(file_path)
            pages = [doc.page_text(i) for i in range(doc.page_count)]
            content = "\n\n".join(p for p in pages if p)
            if not content.strip():
                return ParserResult.failure(
                    "No extractable text (scanned/image PDF or unsupported "
                    "encoding)")
            return ParserResult(content=content,
                                metadata={"page_count": doc.page_count})
        except Exception as e:
            return ParserResult.failure(f"Failed to parse PDF: {e}")

    def get_page_count(self, file_path: Path) -> int:
        return PdfDocument(file_path).page_count

    def parse_in_buckets(
        self, file_path: Path, pages_per_bucket: int | None = None
    ) -> Iterator[tuple[ParserResult, int, int]]:
        """Yield (result, start_page, end_page) per bucket (1-based pages;
        reference pdf_parser.py:209-327 streaming contract)."""
        if pages_per_bucket is None:
            pages_per_bucket = get_settings().pdf_pages_per_bucket
        doc = PdfDocument(file_path)
        n = doc.page_count
        for start in range(0, n, pages_per_bucket):
            end = min(start + pages_per_bucket, n)
            texts = [doc.page_text(i) for i in range(start, end)]
            content = "\n\n".join(t for t in texts if t)
            yield (ParserResult(content=content,
                                metadata={"page_count": n}),
                   start + 1, end)
