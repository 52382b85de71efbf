"""PDF parser: standalone text extraction + page-bucket streaming.

The reference shells out to MinerU in a dedicated venv with PyMuPDF page
counting and 20-page buckets (pdf_parser.py:39-164, 209-327). Neither MinerU
nor PyMuPDF is assumed here; this module implements a from-scratch extractor
for the common case with the stdlib:

- cross-reference parsing (classic tables and xref streams are both handled
  by brute-force object scanning, which also survives mildly corrupt files),
- **object streams** (``/Type /ObjStm``, PDF 1.5+): compressed container
  streams are decoded and their member objects spliced into the object
  table, so modern PDFs whose page/font dictionaries never appear as
  top-level ``N 0 obj`` bodies still parse,
- page tree walk to order pages,
- stream filter chains: ``FlateDecode``, ``LZWDecode``, ``ASCII85Decode``,
  ``ASCIIHexDecode``, ``RunLengthDecode`` (and their abbreviations), with
  ``/DecodeParms`` PNG predictors (types 10-15) and TIFF predictor 2,
- ``Tj`` / ``TJ`` / ``'`` / ``"`` text
  operators, with ``BT/ET`` blocks and ``Td/TD/T*`` line-break heuristics,
- per-page font resolution with the current font tracked through ``Tf``:
  **ToUnicode CMaps** (bfchar/bfrange, 1- and 2-byte codespaces) map CID/
  custom-encoded strings to real text, and ``/Encoding /Differences``
  arrays map byte codes through glyph names (AGL-style: ``uniXXXX``/``uXXXX``
  forms plus the common Latin name table),
- WinAnsi/PDFDoc default encodings; hex and literal strings with escapes.

Fonts with neither ToUnicode nor Differences degrade to best-effort text
(true scanned/image PDFs still require OCR, which the reference outsources
to MinerU). The bucketing generator API (``parse_in_buckets`` yielding
per-bucket results with page metadata, reference pdf_parser.py:209-327) is
preserved so the indexing service's progressive checkpointing works
identically.

For corpora that need OCR/layout-ML quality, ``VOITTA_PDF_WORKER_CMD``
restores the reference's external-worker pattern (pdf_parser.py:110-164,
scripts/mineru_parse.py): the command is invoked per bucket as
``<cmd> <pdf_path> <start_page> <end_page>`` (1-based, inclusive;
``end_page=0`` means the whole document) and must
print ``{"content": "<markdown>", "metadata": {...}}`` JSON on stdout. A
worker failure falls back to the in-process extractor, so a broken venv
never blocks indexing.
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


#: Cap on the decoded size of any single stream stage.  /Filter chains are
#: attacker controlled and decompression ratios are unbounded (a stacked
#: FlateDecode chain multiplies expansion per stage), so without this a
#: small crafted PDF could exhaust host memory.  Streams a text extractor
#: cares about (content streams, ObjStm, CMaps) are far below this bound.
_MAX_STREAM_BYTES = 1 << 27  # 128 MiB


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode: 9→12-bit codes, Clear=256, EOD=257, EarlyChange."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, bits = 258, 9
    prev: bytes | None = None
    acc = nacc = 0
    for byte in data:
        acc = (acc << 8) | byte
        nacc += 8
        while nacc >= bits:
            nacc -= bits
            code = (acc >> nacc) & ((1 << bits) - 1)
            if code == 256:  # clear table
                table = {i: bytes([i]) for i in range(256)}
                next_code, bits, prev = 258, 9, None
                continue
            if code == 257:  # end of data
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:  # KwKwK case
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError(f"bad LZW code {code}")
            out += entry
            if len(out) > _MAX_STREAM_BYTES:
                raise ValueError("LZW stream exceeds decode size cap")
            prev = entry
            # xpdf/poppler convention: the decoder adds entries one code
            # later than the encoder did, so it widens when the *next* add
            # would reach the limit (next_code + early == 1 << bits).
            if next_code + early >= (1 << bits) and bits < 12:
                bits += 1
    return bytes(out)


def _a85_decode(data: bytes) -> bytes:
    import base64

    data = re.sub(rb"\s", b"", data)
    if data.startswith(b"<~"):
        data = data[2:]
    if data.endswith(b"~>"):
        data = data[:-2]
    return base64.a85decode(data)


def _rl_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:  # EOD
            break
        if n < 128:
            out += data[i + 1:i + 2 + n]
            i += 2 + n
        else:
            out += data[i + 1:i + 2] * (257 - n)
            i += 2
        if len(out) > _MAX_STREAM_BYTES:
            raise ValueError("RLE stream exceeds decode size cap")
    return bytes(out)


def _flate_decode(raw: bytes) -> bytes:
    # decompressobj (unlike zlib.decompress) salvages what inflates from
    # streams some writers pad or truncate, and lets us cap the output.
    d = zlib.decompressobj()
    out = d.decompress(raw, _MAX_STREAM_BYTES)
    if d.unconsumed_tail:
        raise ValueError("Flate stream exceeds decode size cap")
    return out


#: Sanity bound on predictor row width: declared /Columns is attacker
#: controlled; a forged multi-GB rowlen would otherwise allocate unbounded
#: memory and run a per-byte Python loop for hours.
_MAX_PREDICTOR_ROWLEN = 1 << 20


def _png_unpredict(data: bytes, columns: int, colors: int,
                   bpc: int) -> bytes:
    """Undo PNG row filters (predictor types 10-15): each row is a filter
    byte followed by ``rowlen`` filtered bytes."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if not 0 < rowlen <= _MAX_PREDICTOR_ROWLEN:
        raise ValueError(f"implausible predictor row length {rowlen}")
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i + 1 <= len(data) - 1:
        ft = data[i]
        row = bytearray(data[i + 1:i + 1 + rowlen])
        if len(row) < rowlen:
            row += bytes(rowlen - len(row))
        i += 1 + rowlen
        if ft == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _tiff_unpredict(data: bytes, columns: int, colors: int,
                    bpc: int) -> bytes:
    """TIFF predictor 2 (horizontal differencing), 8-bit components only."""
    if bpc != 8:
        return data
    rowlen = columns * colors
    if not 0 < rowlen <= _MAX_PREDICTOR_ROWLEN:
        raise ValueError(f"implausible predictor row length {rowlen}")
    out = bytearray(data)
    for r in range(0, len(out) - rowlen + 1, rowlen):
        for j in range(colors, rowlen):
            out[r + j] = (out[r + j] + out[r + j - colors]) & 0xFF
    return bytes(out)


def _parm_int(parms: bytes, key: bytes, default: int) -> int:
    m = re.search(re.escape(key) + rb"\s+(\d+)", parms)
    return int(m.group(1)) if m else default


def _apply_predictor(data: bytes, parms: bytes) -> bytes:
    pred = _parm_int(parms, b"/Predictor", 1)
    if pred == 1:
        return data
    columns = _parm_int(parms, b"/Columns", 1)
    colors = _parm_int(parms, b"/Colors", 1)
    bpc = _parm_int(parms, b"/BitsPerComponent", 8)
    if pred == 2:
        return _tiff_unpredict(data, columns, colors, bpc)
    if pred >= 10:
        return _png_unpredict(data, columns, colors, bpc)
    return data


# Filter name (full and abbreviated) → decoder taking (raw, parms).
_FILTERS = {
    b"FlateDecode": lambda raw, p: _apply_predictor(_flate_decode(raw), p),
    b"Fl": lambda raw, p: _apply_predictor(_flate_decode(raw), p),
    b"LZWDecode": lambda raw, p: _apply_predictor(
        _lzw_decode(raw, _parm_int(p, b"/EarlyChange", 1)), p),
    b"LZW": lambda raw, p: _apply_predictor(
        _lzw_decode(raw, _parm_int(p, b"/EarlyChange", 1)), p),
    b"ASCII85Decode": lambda raw, p: _a85_decode(raw),
    b"A85": lambda raw, p: _a85_decode(raw),
    b"ASCIIHexDecode": lambda raw, p: _hex_stream_decode(raw),
    b"AHx": lambda raw, p: _hex_stream_decode(raw),
    b"RunLengthDecode": lambda raw, p: _rl_decode(raw),
    b"RL": lambda raw, p: _rl_decode(raw),
}


def _hex_stream_decode(raw: bytes) -> bytes:
    h = re.sub(rb"[\s>]", b"", raw)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def _filter_chain(d: bytes) -> tuple[list[bytes], list[bytes]] | None:
    """(filter names, per-filter DecodeParms bodies) from a stream dict;
    None when there is no /Filter entry."""
    fm = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)", d)
    if not fm:
        return None
    names = re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
    parms: list[bytes] = [b""] * len(names)
    pm = re.search(rb"/(?:DecodeParms|DP)\s*(<<|\[)", d)
    if pm:
        if pm.group(1) == b"<<":
            parms[0] = _dict_of(d[pm.end() - 2:])
        else:  # array of dicts / nulls, one per filter
            i, idx = pm.end(), 0
            while idx < len(names) and i < len(d):
                if d[i:i + 1] == b"]":
                    break
                if d[i:i + 2] == b"<<":
                    body = _dict_of(d[i:])
                    parms[idx] = body
                    i += len(body)
                    idx += 1
                elif d[i:i + 4] == b"null":
                    i += 4
                    idx += 1
                else:
                    i += 1
    return names, parms


def _decode_stream(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    raw = m.group(1)
    d = _dict_of(body)
    chain = _filter_chain(d)
    if chain is None:
        return raw
    names, parms = chain
    data = raw
    for name, parm in zip(names, parms):
        fn = _FILTERS.get(name)
        if fn is None:
            return None  # unsupported filter (DCTDecode images etc.)
        try:
            data = fn(data, parm)
        except (ValueError, zlib.error, KeyError, IndexError,
                MemoryError, OverflowError):
            return None
        if len(data) > _MAX_STREAM_BYTES:
            return None
    return data


_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _literal_bytes(tok: bytes) -> bytes:
    """Resolve escapes of a (...) literal → raw encoded bytes."""
    out = bytearray()
    i = 0
    while i < len(tok):
        c = tok[i:i + 1]
        if c == b"\\" and i + 1 < len(tok):
            nxt = tok[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal
                m = re.match(rb"[0-7]{1,3}", tok[i + 1:i + 4])
                if m:
                    out.append(int(m.group(0), 8) & 0xFF)
                    i += 1 + len(m.group(0))
                    continue
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _hex_bytes(tok: bytes) -> bytes:
    h = re.sub(rb"\s", b"", tok)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _default_decode(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":  # UTF-16BE BOM
        return raw[2:].decode("utf-16-be", errors="ignore")
    if len(raw) >= 2 and raw[0] == 0:  # heuristically UTF-16BE without BOM
        return raw.decode("utf-16-be", errors="ignore")
    return raw.decode("latin-1", errors="ignore")


# -- glyph names (AGL-lite: the common Latin subset + uniXXXX/uXXXX forms) --
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "fi": "ﬁ", "fl": "ﬂ",
    "eacute": "é", "egrave": "è", "ecircumflex": "ê",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "ccedilla": "ç", "ntilde": "ñ", "uuml": "ü",
    "ouml": "ö", "auml": "ä", "szlig": "ß",
    "oslash": "ø", "aring": "å", "ae": "æ",
    "degree": "°", "copyright": "©", "registered": "®",
    "trademark": "™", "Euro": "€", "sterling": "£",
    "yen": "¥", "cent": "¢", "section": "§",
    "paragraph": "¶", "daggerdbl": "‡", "dagger": "†",
    "exclamdown": "¡", "questiondown": "¿",
}


def _glyph_to_unicode(name: str) -> str:
    if len(name) == 1:  # /A /a /0 style direct names
        return name
    if name in _GLYPH_NAMES:
        return _GLYPH_NAMES[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return ""
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return ""
    return ""


def _parse_tounicode_cmap(data: bytes) -> tuple[dict[int, str], int]:
    """Parse a ToUnicode CMap stream → (code → text, code bytes).

    Handles ``bfchar`` (src → UTF-16BE dst) and ``bfrange`` (lo/hi → base or
    explicit array) sections; the code width comes from the codespace range
    (or the src token width as fallback).
    """
    cmap: dict[int, str] = {}
    width = 0
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", data, re.S)
    if m:
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1))
        if toks:
            width = max(1, len(toks[0]) // 2)

    def dst_text(h: bytes) -> str:
        raw = bytes.fromhex(h.decode("ascii"))
        if len(raw) % 2:
            raw = b"\0" + raw
        return raw.decode("utf-16-be", errors="ignore")

    for sec in re.findall(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sec):
            width = width or max(1, len(src) // 2)
            cmap[int(src, 16)] = dst_text(dst)
    for sec in re.findall(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for m2 in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
                rb"(?:<([0-9A-Fa-f]+)>|\[(.*?)\])", sec, re.S):
            lo, hi = int(m2.group(1), 16), int(m2.group(2), 16)
            width = width or max(1, len(m2.group(1)) // 2)
            if m2.group(3) is not None:
                base_hex = m2.group(3)
                raw = bytes.fromhex(base_hex.decode("ascii"))
                if len(raw) % 2:
                    raw = b"\0" + raw
                # Increment applies to the LAST UTF-16 code unit.
                prefix = raw[:-2]
                base = int.from_bytes(raw[-2:], "big")
                for code in range(lo, min(hi, lo + 65535) + 1):
                    unit = base + (code - lo)
                    cmap[code] = (prefix + unit.to_bytes(2, "big")).decode(
                        "utf-16-be", errors="ignore")
            else:
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", m2.group(4))
                for off, d in enumerate(dsts):
                    cmap[lo + off] = dst_text(d)
    return cmap, width or 1


class _Font:
    """Per-font decoder: ToUnicode CMap > Differences map > default."""

    def __init__(self, cmap: dict[int, str] | None = None,
                 code_bytes: int = 1,
                 differences: dict[int, str] | None = None):
        self.cmap = cmap
        self.code_bytes = code_bytes
        self.differences = differences

    def decode(self, raw: bytes) -> str:
        if self.cmap is not None:
            w = self.code_bytes
            out = []
            for i in range(0, len(raw) - w + 1, w):
                code = int.from_bytes(raw[i:i + w], "big")
                got = self.cmap.get(code)
                if got is None and w == 1:
                    got = chr(code)
                out.append(got or "")
            return "".join(out)
        if self.differences is not None:
            return "".join(
                self.differences.get(b) or chr(b) for b in raw)
        return _default_decode(raw)


DEFAULT_FONT = _Font()


_TEXT_OP_RE = re.compile(
    rb"(\((?:[^()\\]|\\.|\([^)]*\))*\))\s*(Tj|')"   # literal string + Tj/'
    rb"|<([0-9A-Fa-f\s]*)>\s*(Tj|')"                # hex string + Tj/'
    rb"|\[(.*?)\]\s*TJ"                             # array + TJ
    rb"|/(\S+)\s+[\d.+-]+\s+Tf"                     # font selection
    rb"|(T\*|TD|Td|ET)", re.S)
_ARRAY_ITEM_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|-?\d+(?:\.\d+)?")


def _extract_page_text(content: bytes,
                       fonts: dict[bytes, _Font] | None = None) -> str:
    fonts = fonts or {}
    font = DEFAULT_FONT
    out: list[str] = []
    for m in _TEXT_OP_RE.finditer(content):
        if m.group(1):
            out.append(font.decode(_literal_bytes(m.group(1)[1:-1])))
        elif m.group(3) is not None:
            out.append(font.decode(_hex_bytes(m.group(3))))
        elif m.group(5) is not None:
            for item in _ARRAY_ITEM_RE.finditer(m.group(5)):
                tok = item.group(0)
                if tok.startswith(b"("):
                    out.append(font.decode(_literal_bytes(tok[1:-1])))
                elif tok.startswith(b"<"):
                    out.append(font.decode(_hex_bytes(tok[1:-1])))
                else:
                    # Large negative kern ≈ inter-word space.
                    try:
                        if float(tok) < -150:
                            out.append(" ")
                    except ValueError:
                        pass
        elif m.group(6) is not None:  # Tf: switch the active font
            font = fonts.get(m.group(6), DEFAULT_FONT)
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
        self._expand_object_streams()
        self.pages = self._page_order()
        self._font_cache: dict[int, dict[bytes, _Font]] = {}

    def _expand_object_streams(self) -> None:
        """Splice ``/Type /ObjStm`` member objects into the object table.

        PDF 1.5+ writers pack most non-stream objects (catalog, page tree,
        fonts, CMap dicts) into compressed object streams; the brute-force
        ``N 0 obj`` scan never sees those. Each ObjStm starts with N
        (objnum, offset) integer pairs; member bodies begin at /First +
        offset. Members only fill gaps — a direct top-level object with the
        same number (e.g. from an incremental update) wins.
        """
        extra: dict[int, bytes] = {}
        for body in list(self.objects.values()):
            d = _dict_of(body)
            if not re.search(rb"/Type\s*/ObjStm\b", d):
                continue
            data = _decode_stream(body)
            if not data:
                continue
            n = _parm_int(d, b"/N", 0)
            first = _parm_int(d, b"/First", 0)
            try:
                header = [int(t) for t in data[:first].split()]
            except ValueError:
                continue
            pairs = list(zip(header[0::2], header[1::2]))[:n]
            for i, (onum, off) in enumerate(pairs):
                end = (first + pairs[i + 1][1] if i + 1 < len(pairs)
                       else len(data))
                if onum not in self.objects:
                    extra[onum] = data[first + off:end]
        self.objects.update(extra)

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

    def _sub_dict(self, d: bytes, key: bytes) -> bytes:
        """Value of ``key`` as a dict body: inline ``<<...>>`` or a ref."""
        m = re.search(re.escape(key) + rb"\s*<<", d)
        if m:
            return _dict_of(d[m.end() - 2:])
        refs = _refs(d, key)
        if refs and refs[0] in self.objects:
            return _dict_of(self.objects[refs[0]])
        return b""

    def _page_fonts(self, page_num: int) -> dict[bytes, _Font]:
        """Resolve the page's /Resources /Font entries into decoders."""
        if page_num in self._font_cache:
            return self._font_cache[page_num]
        fonts: dict[bytes, _Font] = {}
        d = _dict_of(self.objects.get(page_num, b""))
        res = self._sub_dict(d, b"/Resources")
        font_dict = self._sub_dict(res, b"/Font")
        for m in re.finditer(rb"/(\S+)\s+(\d+)\s+\d+\s+R", font_dict):
            name, ref = m.group(1), int(m.group(2))
            body = self.objects.get(ref)
            if body is None:
                continue
            fd = _dict_of(body)
            cmap = None
            width = 1
            tu = _refs(fd, b"/ToUnicode")
            if tu and tu[0] in self.objects:
                stream = _decode_stream(self.objects[tu[0]])
                if stream:
                    cmap, width = _parse_tounicode_cmap(stream)
            if cmap is None and re.search(rb"/Subtype\s*/Type0\b", fd):
                # Identity-mapped CID font without ToUnicode: 2-byte codes,
                # undecodable to text — emit nothing rather than garbage.
                fonts[name] = _Font(cmap={}, code_bytes=2)
                continue
            differences = None
            if cmap is None:
                enc = self._sub_dict(fd, b"/Encoding")
                dm = re.search(rb"/Differences\s*\[(.*?)\]", enc, re.S)
                if dm:
                    differences = {}
                    code = 0
                    for tok in re.finditer(rb"(\d+)|/([^\s/\[\]<>(]+)",
                                           dm.group(1)):
                        if tok.group(1):
                            code = int(tok.group(1))
                        else:
                            differences[code] = _glyph_to_unicode(
                                tok.group(2).decode("latin-1"))
                            code += 1
            if cmap is not None or differences:
                fonts[name] = _Font(cmap=cmap, code_bytes=width,
                                    differences=differences)
        self._font_cache[page_num] = fonts
        return fonts

    def page_text(self, index: int, layout: bool | None = None) -> str:
        """Extracted text of one page.

        With ``layout`` (default VOITTA_PDF_LAYOUT): positioned spans are
        analyzed for multi-column / table structure (pdf_layout.py) and,
        when found, the page renders in READING order instead of content-
        stream order — the layout half of the reference's MinerU worker
        (pdf_parser.py:110-164). Unstructured pages keep the stream-order
        extractor (identical output, cheaper).
        """
        if layout is None:
            layout = get_settings().pdf_layout
        page_num = self.pages[index]
        body = self.objects.get(page_num, b"")
        d = _dict_of(body)
        fonts = self._page_fonts(page_num)
        streams = []
        for ref in _refs(d, b"/Contents"):
            obj = self.objects.get(ref)
            if obj is None:
                continue
            stream = _decode_stream(obj)
            if stream:
                streams.append(stream)
        if layout and streams:
            from voitta_rag_tpu.services.parsers.pdf_layout import (
                extract_spans, layout_text,
            )

            try:
                spans = []
                for stream in streams:
                    spans.extend(extract_spans(stream, fonts))
                text, structured = layout_text(spans)
                if structured and text:
                    return text
            except Exception:  # malformed positioning: stream order below
                pass
        return "\n".join(
            p for p in (_extract_page_text(s, fonts) for s in streams) if p)

    def page_has_images(self, index: int) -> bool:
        """True if the page draws raster images (XObject or inline).

        Used to distinguish a scanned/image-only page (OCR-able by an
        external worker, reference pdf_parser.py:110-164) from a genuinely
        empty one when text extraction yields nothing.
        """
        page_num = self.pages[index]
        d = _dict_of(self.objects.get(page_num, b""))
        res = self._sub_dict(d, b"/Resources")
        xobj = self._sub_dict(res, b"/XObject")
        for m in re.finditer(rb"(\d+)\s+\d+\s+R", xobj):
            body = self.objects.get(int(m.group(1)))
            if body is not None and re.search(rb"/Subtype\s*/Image\b",
                                              _dict_of(body)):
                return True
        for ref in _refs(d, b"/Contents"):
            obj = self.objects.get(ref)
            stream = _decode_stream(obj) if obj is not None else None
            if stream and re.search(rb"\bBI\b.{0,4096}?\bID\b.*?\bEI\b",
                                    stream, re.S):
                return True
        return False


def image_only_error(img_pages: int, total_pages: int) -> str:
    """Actionable parse-error text for scanned/image-only PDFs."""
    return (f"Scanned/image-only PDF: {img_pages} of {total_pages} pages "
            "contain raster images but no extractable text. OCR is required "
            "— set VOITTA_PDF_WORKER_CMD to an OCR-capable worker (see "
            "scripts/pdf_worker_example.py).")


def _run_pdf_worker(cmd: str, file_path: Path, start: int,
                    end: int) -> ParserResult | None:
    """Invoke the external worker for pages [start, end] (1-based).

    Returns None on any failure (caller falls back to the in-process
    extractor) — mirroring the reference's per-bucket subprocess error
    handling (pdf_parser.py:110-164).
    """
    import json
    import shlex
    import subprocess

    settings = get_settings()
    argv = shlex.split(cmd) + [str(file_path), str(start), str(end)]
    try:
        proc = subprocess.run(
            argv, capture_output=True, text=True,
            timeout=settings.pdf_worker_timeout)
    except (OSError, subprocess.TimeoutExpired) as e:
        import logging

        logging.getLogger(__name__).warning(
            "PDF worker failed (%s); in-process fallback", e)
        return None
    if proc.returncode != 0:
        return None
    try:
        payload = json.loads(proc.stdout)
        content = payload["content"]
    except (ValueError, KeyError, TypeError):
        return None
    meta = payload.get("metadata") or {}
    if not isinstance(meta, dict):
        meta = {}
    return ParserResult(content=content, metadata=meta)


class PdfParser(BaseParser):
    extensions = [".pdf"]

    def parse(self, file_path: Path) -> ParserResult:
        # The worker runs FIRST, before the in-process PdfDocument parse:
        # encrypted/corrupt PDFs that crash the from-scratch extractor are
        # exactly the files the external (MinerU-class) worker exists for.
        # end=0 means "whole document" (the page count may be unknowable
        # here).
        cmd = get_settings().pdf_worker_cmd
        if cmd:
            res = _run_pdf_worker(cmd, file_path, 1, 0)
            if res is not None:
                return res
        try:
            doc = PdfDocument(file_path)
            n = doc.page_count
            pages = [doc.page_text(i) for i in range(n)]
            content = "\n\n".join(p for p in pages if p)
            if not content.strip():
                img_pages = sum(1 for i in range(n)
                                if doc.page_has_images(i))
                if img_pages:
                    return ParserResult.failure(image_only_error(img_pages, n))
                return ParserResult.failure(
                    "No extractable text (empty or unsupported encoding)")
            return ParserResult(content=content,
                                metadata={"page_count": n})
        except Exception as e:
            return ParserResult.failure(f"Failed to parse PDF: {e}")

    def get_page_count(self, file_path: Path) -> int:
        return PdfDocument(file_path).page_count

    def parse_in_buckets(
        self, file_path: Path, pages_per_bucket: int | None = None
    ) -> Iterator[tuple[ParserResult, int, int]]:
        """Yield (result, start_page, end_page) per bucket (1-based pages;
        reference pdf_parser.py:209-327 streaming contract)."""
        settings = get_settings()
        if pages_per_bucket is None:
            pages_per_bucket = settings.pdf_pages_per_bucket
        cmd = settings.pdf_worker_cmd
        try:
            doc = PdfDocument(file_path)
            n = doc.page_count
        except Exception:
            n = 0
            doc = None
        if n == 0:
            # The in-process parser can't read the structure (or finds no
            # pages); with a worker configured, hand it the whole document
            # as one bucket.
            if cmd:
                res = _run_pdf_worker(cmd, file_path, 1, 0)
                if res is not None:
                    yield res, 1, int(res.metadata.get("page_count", 1))
                    return
            if doc is None:
                raise ValueError(f"unparseable PDF: {file_path}")
            return
        for start in range(0, n, pages_per_bucket):
            end = min(start + pages_per_bucket, n)
            if cmd:
                res = _run_pdf_worker(cmd, file_path, start + 1, end)
                if res is not None:
                    res.metadata.setdefault("page_count", n)
                    yield res, start + 1, end
                    continue
            texts = [doc.page_text(i) for i in range(start, end)]
            content = "\n\n".join(t for t in texts if t)
            meta: dict = {"page_count": n}
            if not content.strip():
                # Flag image-bearing textless buckets so the indexer can
                # report "OCR needed" instead of silently storing 0 chunks.
                meta["image_only_pages"] = sum(
                    1 for i in range(start, end) if doc.page_has_images(i))
            yield (ParserResult(content=content, metadata=meta),
                   start + 1, end)
