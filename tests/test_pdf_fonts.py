"""PDF font decoding: ToUnicode CMaps (CID/2-byte codes), /Differences
encodings, and per-Tf font switching — the round-1 gap where custom-encoded
fonts extracted as garbage."""

import zlib
from pathlib import Path

from voitta_rag_tpu.services.parsers.pdf_parser import (
    PdfParser, _Font, _glyph_to_unicode, _parse_tounicode_cmap,
)


def build_pdf(objs: list[bytes]) -> bytes:
    return (b"%PDF-1.4\n" + b"\n".join(objs)
            + b"\ntrailer << /Root 1 0 R >>\n%%EOF")


def stream_obj(num: int, content: bytes, extra: bytes = b"") -> bytes:
    z = zlib.compress(content)
    return (f"{num} 0 obj << /Length {len(z)} /Filter /FlateDecode "
            .encode() + extra + b" >> stream\n" + z + b"\nendstream endobj")


def make_cid_pdf(tmp_path: Path) -> Path:
    """Type0 font, 2-byte codes via hex strings, ToUnicode bfchar+bfrange."""
    cmap = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0003> <0048>
<0004> <0065>
endbfchar
1 beginbfrange
<0010> <0012> <006C>
endbfrange
endcmap end end"""
    # codes: 0003=H 0004=e 0010=l 0011=m 0012=n -> "Hell" + "o"? use
    # <0003 0004 0010 0010> = Hell ; bfrange maps 10->l, 11->m, 12->n.
    content = b"BT /F1 12 Tf 72 720 Td <0003000400100010> Tj ET"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Embedded "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >> endobj",
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R "
        b"/Resources << /Font << /F1 3 0 R >> >> >> endobj",
        stream_obj(5, content),
        stream_obj(6, cmap),
    ]
    p = tmp_path / "cid.pdf"
    p.write_bytes(build_pdf(objs))
    return p


def test_cid_tounicode_extraction(tmp_path):
    r = PdfParser().parse(make_cid_pdf(tmp_path))
    assert r.success, r.error
    assert "Hell" in r.content


def test_parse_tounicode_cmap_bfrange():
    cmap = (b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"1 beginbfrange <41> <43> <0061> endbfrange\n"
            b"1 beginbfchar <20> <0020> endbfchar")
    m, width = _parse_tounicode_cmap(cmap)
    assert width == 1
    assert m[0x41] == "a" and m[0x42] == "b" and m[0x43] == "c"
    assert m[0x20] == " "


def test_parse_tounicode_bfrange_array():
    cmap = b"1 beginbfrange <01> <02> [<0058> <0059>] endbfrange"
    m, _ = _parse_tounicode_cmap(cmap)
    assert m[1] == "X" and m[2] == "Y"


def test_differences_encoding(tmp_path):
    """Custom /Differences: byte 0x01 -> H, 0x02 -> i, 0x03 -> bang."""
    content = b"BT /F1 12 Tf 72 720 Td (\x01\x02\x03) Tj ET"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Font /Subtype /Type1 /Encoding << /Type "
        b"/Encoding /Differences [ 1 /H /i /exclam ] >> >> endobj",
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R "
        b"/Resources << /Font << /F1 3 0 R >> >> >> endobj",
        stream_obj(5, content),
    ]
    p = tmp_path / "diff.pdf"
    p.write_bytes(build_pdf(objs))
    r = PdfParser().parse(p)
    assert r.success, r.error
    assert "Hi!" in r.content


def test_font_switching_mid_page(tmp_path):
    """Two fonts: F1 with Differences (1->A), F2 default latin-1."""
    content = (b"BT /F1 12 Tf 72 720 Td (\x01) Tj "
               b"/F2 12 Tf (plain) Tj ET")
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Font /Encoding << /Differences [ 1 /A ] >> "
        b">> endobj",
        b"6 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b">> endobj",
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R "
        b"/Resources << /Font << /F1 3 0 R /F2 6 0 R >> >> >> endobj",
        stream_obj(5, content),
    ]
    p = tmp_path / "switch.pdf"
    p.write_bytes(build_pdf(objs))
    r = PdfParser().parse(p)
    assert r.success, r.error
    assert "Aplain" in r.content.replace(" ", "")


def test_glyph_names():
    assert _glyph_to_unicode("A") == "A"
    assert _glyph_to_unicode("exclam") == "!"
    assert _glyph_to_unicode("uni0416") == "Ж"
    assert _glyph_to_unicode("u1F600") == "😀"
    assert _glyph_to_unicode("emdash") == "—"
    assert _glyph_to_unicode("nonexistent_glyph") == ""


def test_cid_without_tounicode_emits_nothing_not_garbage(tmp_path):
    content = b"BT /F1 12 Tf 72 720 Td <00030004> Tj ET"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b">> endobj",
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R "
        b"/Resources << /Font << /F1 3 0 R >> >> >> endobj",
        stream_obj(5, content),
    ]
    p = tmp_path / "notu.pdf"
    p.write_bytes(build_pdf(objs))
    r = PdfParser().parse(p)
    # No decodable text at all -> graceful failure, not mojibake.
    assert not r.success


def test_default_font_still_works(tmp_path):
    from tests.test_parsers import make_pdf

    p = tmp_path / "plain.pdf"
    p.write_bytes(make_pdf(["Plain old text."]))
    r = PdfParser().parse(p)
    assert r.success and "Plain old text." in r.content
