"""Layout-aware PDF extraction (services/parsers/pdf_layout.py).

The layout half of the reference's MinerU worker value
(pdf_parser.py:110-164): a two-column page whose content stream interleaves
the columns row-by-row (the pathological case for stream-order extraction)
must come out in reading order, and aligned multi-span rows must come out
as table rows. Unstructured pages keep the stream-order extractor's output.
"""

import zlib
from pathlib import Path

from voitta_rag_tpu.services.parsers.pdf_layout import (
    detect_columns, extract_spans, layout_text, lines_of,
)
from voitta_rag_tpu.services.parsers.pdf_parser import PdfParser


def build_pdf(objs: list[bytes]) -> bytes:
    return (b"%PDF-1.4\n" + b"\n".join(objs)
            + b"\ntrailer << /Root 1 0 R >>\n%%EOF")


def stream_obj(num: int, content: bytes) -> bytes:
    z = zlib.compress(content)
    return (f"{num} 0 obj << /Length {len(z)} /Filter /FlateDecode "
            .encode() + b" >> stream\n" + z + b"\nendstream endobj")


def one_page_pdf(tmp_path: Path, content: bytes, name: str) -> Path:
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        stream_obj(4, content),
    ]
    p = tmp_path / name
    p.write_bytes(build_pdf(objs))
    return p


def two_column_content() -> bytes:
    """Interleaved emission: L1 R1 L2 R2 ... — stream order garbles it."""
    rows = []
    y = 700
    for i in range(1, 9):
        rows.append(f"BT /F1 10 Tf 72 {y} Td (left{i} words here) Tj ET"
                    .encode())
        rows.append(f"BT /F1 10 Tf 320 {y} Td (right{i} other text) Tj ET"
                    .encode())
        y -= 14
    return b"\n".join(rows)


def test_two_column_reading_order(tmp_path):
    p = one_page_pdf(tmp_path, two_column_content(), "cols.pdf")
    r = PdfParser().parse(p)
    assert r.success, r.error
    # Reading order: ALL left-column rows before any right-column row.
    assert r.content.find("left8") < r.content.find("right1"), r.content
    for i in range(1, 8):
        assert r.content.find(f"left{i}") < r.content.find(f"left{i+1}")


def test_two_column_detection_internals():
    spans = extract_spans(two_column_content())
    lines = lines_of(spans)
    assert len(lines) == 8 and all(len(ln) == 2 for ln in lines)
    assert detect_columns(lines), "column gap not detected"
    text, structured = layout_text(spans)
    assert structured


def test_header_above_columns_emits_first(tmp_path):
    content = (b"BT /F1 14 Tf 72 760 Td "
               b"(A Fine Title Spanning The Whole Page Width Here) Tj ET\n"
               + two_column_content())
    p = one_page_pdf(tmp_path, content, "titled.pdf")
    r = PdfParser().parse(p)
    assert r.success
    assert r.content.find("Fine Title") < r.content.find("left1")
    assert r.content.find("left8") < r.content.find("right1")


def test_table_rows_reconstructed(tmp_path):
    rows = []
    y = 700
    for name, qty, price in (("name", "qty", "price"),
                             ("apples", "12", "3.40"),
                             ("pears", "7", "2.10"),
                             ("plums", "19", "5.00")):
        rows.append(
            f"BT /F1 10 Tf 72 {y} Td ({name}) Tj ET\n"
            f"BT /F1 10 Tf 200 {y} Td ({qty}) Tj ET\n"
            f"BT /F1 10 Tf 300 {y} Td ({price}) Tj ET".encode())
        y -= 14
    p = one_page_pdf(tmp_path, b"\n".join(rows), "table.pdf")
    r = PdfParser().parse(p)
    assert r.success, r.error
    assert "apples | 12 | 3.40" in r.content, r.content
    assert "pears | 7 | 2.10" in r.content


def test_single_column_keeps_stream_order_output(tmp_path):
    content = (b"BT /F1 12 Tf 72 720 Td (First line of prose.) Tj "
               b"0 -14 Td (Second line follows.) Tj ET")
    p = one_page_pdf(tmp_path, content, "plain.pdf")
    r = PdfParser().parse(p)
    assert r.success
    assert "First line of prose." in r.content
    assert r.content.find("First line") < r.content.find("Second line")
    # No structure detected -> identical to the layout-off path.
    import voitta_rag_tpu.services.parsers.pdf_parser as pp

    doc = pp.PdfDocument(p)
    assert doc.page_text(0, layout=True) == doc.page_text(0, layout=False)


def test_tm_and_tstar_positioning():
    """Tm sets absolute position; TL + T* advance lines; single-word
    aligned cells render as table rows (row-major), not columns."""
    content = (b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (alpha) Tj "
               b"14 TL T* (beta) Tj ET\n"
               b"BT /F1 10 Tf 320 700 Td (gamma) Tj ET\n"
               b"BT /F1 10 Tf 1 0 0 1 320 686 Tm (delta) Tj ET\n"
               b"BT /F1 10 Tf 72 672 Td (eps1) Tj ET\n"
               b"BT /F1 10 Tf 320 672 Td (eps2) Tj ET\n"
               b"BT /F1 10 Tf 72 658 Td (zeta1) Tj ET\n"
               b"BT /F1 10 Tf 320 658 Td (zeta2) Tj ET")
    spans = extract_spans(content)
    by_text = {s.text: s for s in spans}
    assert by_text["alpha"].y == 700 and by_text["beta"].y == 686
    assert by_text["gamma"].x == 320
    text, structured = layout_text(spans)
    assert structured  # aligned single-word cells -> table rows
    assert "alpha | gamma" in text and "beta | delta" in text
