"""AZW3/MOBI Kindle parser (reference azw3_parser.py uses the ``mobi``
package → HTML → html2text). Implements a standalone extractor for all three
published MOBI text encodings:

- uncompressed (type 1),
- PalmDoc LZ77 (type 2),
- HUFF/CDIC Huffman-with-phrase-dictionary (type 0x4448): HUFF record's
  cache/base tables drive a canonical Huffman decode whose symbols index
  phrase slices in the CDIC records, expanded recursively.

Trailing-entry bytes (multibyte overlap + extra-data records, controlled by
the MOBI header's extra-data flags) are trimmed per the format's
backward-encoded varints — required for HUFF records, where stray trailing
bytes corrupt the bitstream.
"""

from __future__ import annotations

import struct
from pathlib import Path

from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult
from voitta_rag_tpu.services.parsers.html_utils import html_to_markdown


def _palmdoc_decompress(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c == 0:
            out.append(0)
        elif c <= 8:  # literal run
            out.extend(data[i:i + c])
            i += c
        elif c <= 0x7F:
            out.append(c)
        elif c <= 0xBF:  # LZ77 pair
            if i >= n:
                break
            pair = (c << 8) | data[i]
            i += 1
            dist = (pair >> 3) & 0x7FF
            length = (pair & 7) + 3
            for _ in range(length):
                if dist <= len(out):
                    out.append(out[-dist])
        else:  # byte pair: space + char
            out.append(0x20)
            out.append(c ^ 0x80)
    return bytes(out)


class _HuffCdic:
    """HUFF/CDIC decoder built from the HUFF + CDIC PalmDB records."""

    def __init__(self, huff: bytes, cdics: list[bytes]):
        if huff[:4] != b"HUFF":
            raise ValueError("bad HUFF record")
        cache_off, base_off = struct.unpack(">II", huff[8:16])
        cache = struct.unpack(f">256I", huff[cache_off:cache_off + 1024])
        base = struct.unpack(f">64I", huff[base_off:base_off + 256])
        # dict1[byte]: (codelen, terminal, maxcode-at-codelen)
        self.dict1 = []
        for v in cache:
            codelen = v & 0x1F
            term = v & 0x80
            maxcode = ((v >> 8) + 1 << (32 - codelen)) - 1 if codelen else 0
            self.dict1.append((codelen, term, maxcode))
        self.mincode = [0] * 33
        self.maxcode = [0] * 33
        for i in range(1, 33):
            self.mincode[i] = base[2 * (i - 1)] << (32 - i)
            self.maxcode[i] = ((base[2 * (i - 1) + 1] + 1) << (32 - i)) - 1

        # Phrase dictionary from the CDIC chain.
        self.dictionary: list[tuple[bytes, int] | None] = []
        for rec in cdics:
            if rec[:4] != b"CDIC":
                raise ValueError("bad CDIC record")
            hdr_len, n_entries, code_len = struct.unpack(">III", rec[4:16])
            n_here = min(1 << code_len, n_entries - len(self.dictionary))
            for k in range(n_here):
                off = struct.unpack_from(">H", rec, hdr_len + 2 * k)[0]
                blen = struct.unpack_from(">H", rec, hdr_len + off)[0]
                phrase = rec[hdr_len + off + 2:hdr_len + off + 2
                             + (blen & 0x7FFF)]
                self.dictionary.append((phrase, blen & 0x8000))

    def unpack(self, data: bytes, depth: int = 0) -> bytes:
        if depth > 32:
            raise ValueError("HUFF recursion too deep")
        bitsleft = len(data) * 8
        data = data + b"\0" * 8
        pos = 0
        x = int.from_bytes(data[0:8], "big")
        n = 32
        out = bytearray()
        while True:
            if n <= 0:
                pos += 4
                x = int.from_bytes(data[pos:pos + 8], "big")
                n += 32
            code = (x >> n) & 0xFFFFFFFF
            codelen, term, maxcode = self.dict1[code >> 24]
            if not term:
                while codelen < 32 and code < self.mincode[codelen]:
                    codelen += 1
                maxcode = self.maxcode[codelen]
            n -= codelen
            bitsleft -= codelen
            if bitsleft < 0 or codelen == 0:
                break
            r = (maxcode - code) >> (32 - codelen)
            if r >= len(self.dictionary) or self.dictionary[r] is None:
                raise ValueError("HUFF symbol out of range / cyclic")
            phrase, done = self.dictionary[r]
            if not done:
                self.dictionary[r] = None  # cycle guard during expansion
                phrase = self.unpack(phrase, depth + 1)
                self.dictionary[r] = (phrase, 1)
            out += phrase
        return bytes(out)


def _trailing_size(rec: bytes, flags: int) -> int:
    """Bytes of trailing entries to trim (extra-data flags, MOBI header
    0xF0-0xF3): each set bit above bit 0 is a backward varint-sized entry;
    bit 0 is the multibyte-overlap count in the low 2 bits of the last
    byte."""
    n = len(rec)
    for bit in range(15, 0, -1):
        if flags & (1 << bit):
            # Backward-encoded varint at the current end.
            val = 0
            shift = 0
            for i in range(1, 5):
                if n - i < 0:
                    break
                b = rec[n - i]
                val |= (b & 0x7F) << shift
                shift += 7
                if b & 0x80:
                    break
            n -= max(val, 1) if val else 0
            if val == 0:
                n -= 1
    if flags & 1 and n > 0:
        n -= (rec[n - 1] & 3) + 1
    return len(rec) - max(n, 0)


class Azw3Parser(BaseParser):
    extensions = [".azw3", ".mobi", ".azw"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            data = file_path.read_bytes()
            if len(data) < 80 or data[60:68] not in (b"BOOKMOBI", b"TEXtREAd"):
                return ParserResult.failure("Not a MOBI/AZW PalmDB file")
            (n_records,) = struct.unpack(">H", data[76:78])
            offsets = [
                struct.unpack(">I", data[78 + i * 8: 82 + i * 8])[0]
                for i in range(n_records)
            ]
            offsets.append(len(data))
            rec0 = data[offsets[0]:offsets[1]]
            compression, _, text_len, n_text_recs = struct.unpack(
                ">HHIH", rec0[:10])

            extra_flags = 0
            encoding = "utf-8"
            huff_start = huff_count = 0
            if rec0[16:20] == b"MOBI":
                mobi_len = struct.unpack(">I", rec0[20:24])[0]
                enc = struct.unpack(">I", rec0[28:32])[0]
                encoding = "cp1252" if enc == 1252 else "utf-8"
                if len(rec0) >= 0x78 and compression == 0x4448:
                    huff_start, huff_count = struct.unpack(">II",
                                                           rec0[0x70:0x78])
                if mobi_len >= 0xE4 and len(rec0) >= 0xF4:
                    extra_flags = struct.unpack(">H", rec0[0xF2:0xF4])[0]

            decoder = None
            if compression == 0x4448:
                if not huff_count or huff_start + huff_count > n_records:
                    return ParserResult.failure("HUFF records missing")
                huff = data[offsets[huff_start]:offsets[huff_start + 1]]
                cdics = [data[offsets[i]:offsets[i + 1]]
                         for i in range(huff_start + 1,
                                        huff_start + huff_count)]
                decoder = _HuffCdic(huff, cdics)
            elif compression not in (1, 2):
                return ParserResult.failure(
                    f"Unsupported MOBI compression {compression}")

            chunks = []
            for i in range(1, min(n_text_recs + 1, n_records)):
                rec = data[offsets[i]:offsets[i + 1]]
                trim = _trailing_size(rec, extra_flags)
                rec = rec[:len(rec) - trim] if trim else rec
                if decoder is not None:
                    chunks.append(decoder.unpack(rec))
                elif compression == 2:
                    chunks.append(_palmdoc_decompress(rec))
                else:
                    chunks.append(rec)
            html = b"".join(chunks)[:text_len].decode(encoding,
                                                      errors="replace")
            content = html_to_markdown(html)
            if not content.strip():
                return ParserResult.failure("No extractable text in MOBI")
            return ParserResult(content=content)
        except Exception as e:
            return ParserResult.failure(f"Failed to parse AZW3/MOBI: {e}")
