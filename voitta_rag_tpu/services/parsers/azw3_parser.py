"""AZW3/MOBI Kindle parser (reference azw3_parser.py uses the ``mobi``
package → HTML → html2text). Implements a minimal standalone MOBI text
extractor: PalmDB record table + uncompressed/PalmDoc(LZ77) text records,
then HTML→markdown. KF8-specific compression (HUFF/CDIC) is not supported
and fails gracefully."""

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
            if compression not in (1, 2):
                return ParserResult.failure(
                    f"Unsupported MOBI compression {compression} (HUFF/CDIC)")
            chunks = []
            for i in range(1, min(n_text_recs + 1, n_records)):
                rec = data[offsets[i]:offsets[i + 1]]
                # Trim trailing-entry bytes (extra data flags) crudely: the
                # text length cap below bounds damage from overshoot.
                chunks.append(_palmdoc_decompress(rec)
                              if compression == 2 else rec)
            html = b"".join(chunks)[:text_len].decode("utf-8",
                                                      errors="replace")
            content = html_to_markdown(html)
            if not content.strip():
                return ParserResult.failure("No extractable text in MOBI")
            return ParserResult(content=content)
        except Exception as e:
            return ParserResult.failure(f"Failed to parse AZW3/MOBI: {e}")
