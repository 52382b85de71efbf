"""HUFF/CDIC MOBI decompression against a handcrafted canonical table.

Two 1-bit codes: bit 1 → dictionary entry 0 ("<p>He"), bit 0 → entry 1
("llo ") — byte 0xAA decodes to 4x "(He)(llo )".
"""

import struct
from pathlib import Path

import pytest

from voitta_rag_tpu.services.parsers.azw3_parser import (
    Azw3Parser, _HuffCdic, _trailing_size,
)


def make_huff_record():
    # cache entry for every byte: codelen=1, terminal, maxcode prefix 1.
    cache = struct.pack(">256I", *([0x0181] * 256))
    base = [0] * 64
    base[0], base[1] = 0, 1  # mincode/maxcode for codelen 1
    base_blob = struct.pack(">64I", *base)
    header = b"HUFF" + struct.pack(">I", 24) + struct.pack(">II", 24,
                                                           24 + len(cache))
    header += b"\0" * (24 - len(header))
    return header + cache + base_blob


def make_cdic_record(phrases):
    hdr = b"CDIC" + struct.pack(">III", 16, len(phrases), 1)
    offs = []
    blob = b""
    base = 2 * len(phrases)
    for p in phrases:
        offs.append(base + len(blob))
        blob += struct.pack(">H", 0x8000 | len(p)) + p
    return hdr + struct.pack(f">{len(phrases)}H", *offs) + blob


def test_huffcdic_unpack_bits():
    dec = _HuffCdic(make_huff_record(),
                    [make_cdic_record([b"<p>He", b"llo</p> "])])
    out = dec.unpack(bytes([0b10101010]))
    assert out == (b"<p>He" + b"llo</p> ") * 4


def make_mobi_huff_file(tmp_path: Path) -> Path:
    text_rec = bytes([0b10101010])
    decoded_len = len((b"<p>He" + b"llo</p> ") * 4)

    rec0 = bytearray(0x100)
    struct.pack_into(">HHIH", rec0, 0, 0x4448, 0, decoded_len, 1)
    rec0[16:20] = b"MOBI"
    struct.pack_into(">I", rec0, 20, 0xE8)      # mobi header length
    struct.pack_into(">I", rec0, 28, 65001)     # utf-8
    struct.pack_into(">II", rec0, 0x70, 2, 2)   # huff start rec, count
    struct.pack_into(">H", rec0, 0xF2, 0)       # extra data flags

    records = [bytes(rec0), text_rec, make_huff_record(),
               make_cdic_record([b"<p>He", b"llo</p> "])]
    header = bytearray(78 + 8 * len(records))
    header[60:68] = b"BOOKMOBI"
    struct.pack_into(">H", header, 76, len(records))
    pos = len(header)
    for i, rec in enumerate(records):
        struct.pack_into(">IBBH", header, 78 + i * 8, pos, 0, 0, 0)
        pos += len(rec)
    p = tmp_path / "book.azw3"
    p.write_bytes(bytes(header) + b"".join(records))
    return p


def test_parse_huff_mobi_file(tmp_path):
    p = make_mobi_huff_file(tmp_path)
    result = Azw3Parser().parse(p)
    assert result.success, result.error
    assert result.content.count("Hello") == 4


def test_trailing_size_multibyte_overlap():
    # flags bit 0: trim (last_byte & 3) + 1 bytes.
    rec = b"abcdef" + bytes([2])
    assert _trailing_size(rec, 1) == 3


def test_trailing_size_varint_entry():
    # flags bit 1: one trailing entry, size = backward varint (0x83 -> 3).
    rec = b"abcdef" + b"xx" + bytes([0x83])
    assert _trailing_size(rec, 2) == 3
    # combined with multibyte overlap bit
    rec2 = b"abcd" + bytes([1]) + b"yy" + bytes([0x83])
    assert _trailing_size(rec2, 3) == 3 + 2
