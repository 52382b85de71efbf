"""PDF stream-filter chains, predictors, and object-stream (ObjStm) support.

The reference outsources all of this to MinerU/PyMuPDF (reference
services/parsers/pdf_parser.py:110-164); the from-scratch extractor must
handle the PDF 1.5+ container formats itself.
"""

import base64
import zlib

import pytest

from voitta_rag_tpu.services.parsers.pdf_parser import (
    PdfDocument, PdfParser, _a85_decode, _lzw_decode, _png_unpredict,
    _rl_decode, _tiff_unpredict,
)


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Minimal PDF-flavored LZW encoder (test oracle for the decoder)."""
    table = {bytes([i]): i for i in range(256)}
    next_code, bits = 258, 9
    out_bits: list[tuple[int, int]] = [(256, 9)]  # leading Clear
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        out_bits.append((table[w], bits))
        table[w + c] = next_code
        next_code += 1
        # One step later than the decoder's switch (the decoder's table
        # add lags the encoder's by one code).
        if next_code + early > (1 << bits) and bits < 12:
            bits += 1
        w = c
    if w:
        out_bits.append((table[w], bits))
    out_bits.append((257, bits))  # EOD
    acc = nacc = 0
    out = bytearray()
    for code, width in out_bits:
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def rl_encode(data: bytes) -> bytes:
    """Naive RunLengthDecode encoder: literal runs of ≤128 bytes."""
    out = bytearray()
    for i in range(0, len(data), 128):
        block = data[i:i + 128]
        out.append(len(block) - 1)
        out += block
    out.append(128)
    return bytes(out)


def one_page_pdf(content_obj: bytes) -> bytes:
    """PDF with a standard catalog/pages/page skeleton + given content obj 5."""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj",
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj",
        content_obj,
    ]
    return (b"%PDF-1.5\n" + b"\n".join(objs) +
            b"\ntrailer << /Root 1 0 R >>\n%%EOF")


CONTENT = b"BT /F1 12 Tf 72 720 Td (Filter chain works.) Tj ET"


def parse_text(tmp_path, pdf_bytes: bytes) -> str:
    p = tmp_path / "doc.pdf"
    p.write_bytes(pdf_bytes)
    r = PdfParser().parse(p)
    assert r.success, r.error
    return r.content


def test_lzw_roundtrip_unit():
    for payload in [b"", b"a", b"abracadabra" * 50, bytes(range(256)) * 3,
                    b"aaaaaaaaaaaaaaaaaaaaaaaa"]:
        assert _lzw_decode(lzw_encode(payload)) == payload


def test_lzw_early_change_zero():
    payload = bytes(range(256)) * 4
    assert _lzw_decode(lzw_encode(payload, early=0), early=0) == payload


def test_lzw_content_stream(tmp_path):
    enc = lzw_encode(CONTENT)
    obj = (b"5 0 obj << /Length %d /Filter /LZWDecode >> stream\n" % len(enc)
           + enc + b"\nendstream endobj")
    assert "Filter chain works." in parse_text(tmp_path, one_page_pdf(obj))


def test_asciihex_runlength_chain(tmp_path):
    # Encode order RL then AHx; decode order is the filter array order:
    # ASCIIHexDecode first, then RunLengthDecode.
    enc = rl_encode(CONTENT).hex().encode() + b">"
    obj = (b"5 0 obj << /Length %d /Filter [/ASCIIHexDecode "
           b"/RunLengthDecode] >> stream\n" % len(enc)
           + enc + b"\nendstream endobj")
    assert "Filter chain works." in parse_text(tmp_path, one_page_pdf(obj))


def test_ascii85_flate_chain(tmp_path):
    enc = base64.a85encode(zlib.compress(CONTENT)) + b"~>"
    obj = (b"5 0 obj << /Length %d /Filter [/ASCII85Decode /FlateDecode] "
           b">> stream\n" % len(enc) + enc + b"\nendstream endobj")
    assert "Filter chain works." in parse_text(tmp_path, one_page_pdf(obj))


def test_runlength_decode_runs():
    # 3 literal bytes, a 5-byte run of 'x', EOD.
    data = bytes([2]) + b"abc" + bytes([252]) + b"x" + bytes([128])
    assert _rl_decode(data) == b"abcxxxxx"


def test_a85_decode_markers():
    enc = b"<~" + base64.a85encode(b"hello world") + b"~>"
    assert _a85_decode(enc) == b"hello world"


def png_filter_up(rows: list[bytes]) -> bytes:
    """Apply PNG Up filtering (type 2) — oracle for _png_unpredict."""
    out = bytearray()
    prev = bytes(len(rows[0]))
    for row in rows:
        out.append(2)
        out += bytes((row[j] - prev[j]) & 0xFF for j in range(len(row)))
        prev = row
    return bytes(out)


def test_png_predictor_up():
    rows = [b"hello", b"world", b"again"]
    filtered = png_filter_up(rows)
    assert _png_unpredict(filtered, columns=5, colors=1, bpc=8) == b"".join(rows)


def test_png_predictor_sub_and_paeth():
    rows = [bytes([10, 20, 30, 40]), bytes([15, 25, 35, 45])]
    # Sub filter (type 1)
    filt = bytearray()
    for row in rows:
        filt.append(1)
        prev_b = 0
        for b in row:
            filt.append((b - prev_b) & 0xFF)
            prev_b = b
    assert _png_unpredict(bytes(filt), 4, 1, 8) == b"".join(rows)


def test_tiff_predictor():
    row = bytes([10, 5, 3, 250])  # deltas
    expect = bytes([10, 15, 18, 12])  # cumulative mod 256
    assert _tiff_unpredict(row, columns=4, colors=1, bpc=8) == expect


def objstm_pdf(with_predictor: bool = False) -> bytes:
    """PDF whose catalog/pages/page dicts live inside a /Type /ObjStm."""
    members = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (4, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    bodies, offsets, off = [], [], 0
    for _, body in members:
        offsets.append(off)
        bodies.append(body)
        off += len(body) + 1
    header = " ".join(f"{num} {o}" for (num, _), o in
                      zip(members, offsets)).encode() + b"\n"
    payload = header + b"\n".join(bodies) + b"\n"
    first = len(header)
    if with_predictor:
        # Row width 1 with Up predictor: each byte prefixed by filter type.
        filtered = bytearray()
        prev = 0
        for b in payload:
            filtered += bytes([2, (b - prev) & 0xFF])
            prev = b
        stream = zlib.compress(bytes(filtered))
        parms = b" /DecodeParms << /Predictor 12 /Columns 1 >>"
    else:
        stream = zlib.compress(payload)
        parms = b""
    content = zlib.compress(CONTENT)
    objs = [
        b"3 0 obj << /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode%s >> stream\n" % (
            len(members), first, len(stream), parms)
        + stream + b"\nendstream endobj",
        b"5 0 obj << /Length %d /Filter /FlateDecode >> stream\n"
        % len(content) + content + b"\nendstream endobj",
    ]
    return (b"%PDF-1.5\n" + b"\n".join(objs) +
            b"\ntrailer << /Root 1 0 R >>\n%%EOF")


def test_objstm_members_parsed(tmp_path):
    assert "Filter chain works." in parse_text(tmp_path, objstm_pdf())


def test_objstm_with_png_predictor(tmp_path):
    assert "Filter chain works." in parse_text(
        tmp_path, objstm_pdf(with_predictor=True))


def test_objstm_direct_object_wins(tmp_path):
    # A direct 4 0 obj alongside an ObjStm member 4: direct wins. The
    # direct body carries a /Rotate marker the ObjStm member lacks.
    pdf = objstm_pdf()
    direct = (b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R "
              b"/Rotate 0 >> endobj\n")
    pdf = pdf.replace(b"3 0 obj", direct + b"3 0 obj", 1)
    p = tmp_path / "doc.pdf"
    p.write_bytes(pdf)
    doc = PdfDocument(p)
    assert doc.page_count == 1
    assert b"/Rotate 0" in doc.objects[4]  # direct body retained
    assert "Filter chain works." in doc.page_text(0)


def test_unsupported_filter_returns_failure(tmp_path):
    obj = (b"5 0 obj << /Length 4 /Filter /DCTDecode >> stream\n"
           b"\xff\xd8\xff\xe0\nendstream endobj")
    p = tmp_path / "doc.pdf"
    p.write_bytes(one_page_pdf(obj))
    r = PdfParser().parse(p)
    assert not r.success  # no extractable text


def test_corrupt_lzw_is_failure_not_crash(tmp_path):
    obj = (b"5 0 obj << /Length 6 /Filter /LZWDecode >> stream\n"
           b"\xff\xff\xff\xff\xff\xff\nendstream endobj")
    p = tmp_path / "doc.pdf"
    p.write_bytes(one_page_pdf(obj))
    r = PdfParser().parse(p)
    assert not r.success


def test_forged_predictor_columns_rejected(tmp_path):
    """/DecodeParms /Columns is attacker-controlled: a forged multi-GB row
    length must fail the parse, not allocate or loop unbounded."""
    payload = zlib.compress(b"\x02" + b"x" * 8)
    obj = (b"5 0 obj << /Length %d /Filter /FlateDecode /DecodeParms "
           b"<< /Predictor 12 /Columns 2000000000 >> >> stream\n"
           % len(payload) + payload + b"\nendstream endobj")
    p = tmp_path / "doc.pdf"
    p.write_bytes(one_page_pdf(obj))
    r = PdfParser().parse(p)
    assert not r.success


def test_decompression_bomb_caps(monkeypatch):
    """Each decode stage is bounded by _MAX_STREAM_BYTES: a small crafted
    stream with an extreme expansion ratio must raise, not exhaust memory
    (advisor finding r2: stacked /Filter chains multiply expansion)."""
    from voitta_rag_tpu.services.parsers import pdf_parser

    monkeypatch.setattr(pdf_parser, "_MAX_STREAM_BYTES", 1 << 12)
    with pytest.raises(ValueError):
        pdf_parser._flate_decode(zlib.compress(b"\0" * (1 << 16)))
    with pytest.raises(ValueError):
        pdf_parser._lzw_decode(lzw_encode(b"\0" * (1 << 16)))
    # RLE: each (n>=129, byte) pair expands to 257-n copies.
    with pytest.raises(ValueError):
        pdf_parser._rl_decode(b"\x81A" * 600)


def test_stacked_flate_bomb_is_failure_not_oom(tmp_path, monkeypatch):
    """A double-FlateDecode chain whose inner stage exceeds the cap parses
    to a failure, not an OOM."""
    from voitta_rag_tpu.services.parsers import pdf_parser

    monkeypatch.setattr(pdf_parser, "_MAX_STREAM_BYTES", 1 << 14)
    bomb = zlib.compress(zlib.compress(b"\0" * (1 << 20)))
    obj = (b"5 0 obj << /Length %d /Filter [/FlateDecode /FlateDecode] >> "
           b"stream\n" % len(bomb) + bomb + b"\nendstream endobj")
    p = tmp_path / "doc.pdf"
    p.write_bytes(one_page_pdf(obj))
    r = PdfParser().parse(p)
    assert not r.success
