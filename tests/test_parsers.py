"""Parser tests with synthetic fixtures (no external document libraries)."""

import json
import zipfile
import zlib

import pytest

from voitta_rag_tpu.services.parsers import get_registry


@pytest.fixture
def registry():
    return get_registry()


def test_text_parser(tmp_path, registry):
    p = tmp_path / "code.py"
    p.write_text("def f():\n    return 42\n")
    r = registry.parse_file(p)
    assert r.success and "return 42" in r.content


def test_text_latin1_fallback(tmp_path, registry):
    p = tmp_path / "weird.txt"
    p.write_bytes("café".encode("latin-1"))
    r = registry.parse_file(p)
    assert r.success


def test_unknown_extension(tmp_path, registry):
    p = tmp_path / "blob.xyz"
    p.write_text("x")
    r = registry.parse_file(p)
    assert not r.success


def test_supported_extensions_cover_reference_set(registry):
    exts = set(registry.supported_extensions())
    for required in (".txt", ".md", ".py", ".go", ".rs", ".sql", ".proto",
                     ".tf", ".pdf", ".docx", ".pptx", ".xlsx", ".odt",
                     ".odp", ".ods", ".epub", ".azw3", ".mobi", ".azw",
                     ".gdoc", ".gsheet", ".gslides", ".vtt"):
        assert required in exts, required


DOCX_DOC = """<?xml version="1.0"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
 <w:body>
  <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Title Here</w:t></w:r></w:p>
  <w:p><w:r><w:t>Body paragraph </w:t></w:r><w:r><w:t>joined runs.</w:t></w:r></w:p>
 </w:body>
</w:document>"""


def test_docx_parser(tmp_path, registry):
    p = tmp_path / "doc.docx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("word/document.xml", DOCX_DOC)
    r = registry.parse_file(p)
    assert r.success
    assert "# Title Here" in r.content
    assert "Body paragraph joined runs." in r.content


PPTX_SLIDE = """<?xml version="1.0"?>
<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
       xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
 <p:cSld><p:spTree>
  <p:sp><p:txBody><a:p><a:r><a:t>Slide text {i}</a:t></a:r></a:p></p:txBody></p:sp>
 </p:spTree></p:cSld>
</p:sld>"""


def test_pptx_parser(tmp_path, registry):
    p = tmp_path / "deck.pptx"
    with zipfile.ZipFile(p, "w") as zf:
        for i in (1, 2):
            zf.writestr(f"ppt/slides/slide{i}.xml",
                        PPTX_SLIDE.replace("{i}", str(i)))
    r = registry.parse_file(p)
    assert r.success
    assert "## Slide 1" in r.content and "Slide text 2" in r.content


XLSX_SHEET = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
  <row r="2"><c r="A2"><v>3.14</v></c><c r="B2" t="s"><v>2</v></c></row>
 </sheetData>
</worksheet>"""
XLSX_SHARED = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <si><t>Name</t></si><si><t>Value</t></si><si><t>pi</t></si>
</sst>"""
XLSX_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheets><sheet name="Data" sheetId="1"/></sheets>
</workbook>"""


def test_xlsx_parser(tmp_path, registry):
    p = tmp_path / "book.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml", XLSX_WB)
        zf.writestr("xl/sharedStrings.xml", XLSX_SHARED)
        zf.writestr("xl/worksheets/sheet1.xml", XLSX_SHEET)
    r = registry.parse_file(p)
    assert r.success
    assert "## Data" in r.content
    assert "| Name | Value |" in r.content
    assert "3.14" in r.content and "pi" in r.content


ODT_CONTENT = """<?xml version="1.0"?>
<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
 <office:body><office:text>
  <text:h text:outline-level="2">Section</text:h>
  <text:p>Hello ODT world.</text:p>
 </office:text></office:body>
</office:document-content>"""


def test_odt_parser(tmp_path, registry):
    p = tmp_path / "doc.odt"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("content.xml", ODT_CONTENT)
    r = registry.parse_file(p)
    assert r.success
    assert "## Section" in r.content and "Hello ODT world." in r.content


EPUB_OPF = """<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>My Book</dc:title></metadata>
 <manifest><item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/></manifest>
 <spine><itemref idref="c1"/></spine>
</package>"""
EPUB_CONTAINER = """<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container" version="1.0">
 <rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles>
</container>"""


def test_epub_parser(tmp_path, registry):
    p = tmp_path / "book.epub"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("META-INF/container.xml", EPUB_CONTAINER)
        zf.writestr("OEBPS/content.opf", EPUB_OPF)
        zf.writestr("OEBPS/ch1.xhtml",
                    "<html><body><h1>Chapter One</h1><p>Once upon a time.</p>"
                    "</body></html>")
    r = registry.parse_file(p)
    assert r.success
    assert "# Chapter One" in r.content
    assert "Once upon a time." in r.content
    assert r.metadata.get("title") == "My Book"


def test_gdoc_parser(tmp_path, registry):
    p = tmp_path / "My Doc.gdoc"
    p.write_text(json.dumps({"doc_id": "abc123"}))
    r = registry.parse_file(p)
    assert r.success
    assert r.content == "My Doc"
    assert r.metadata["source_url"] == "https://docs.google.com/document/d/abc123/edit"


def test_vtt_parser(tmp_path, registry):
    p = tmp_path / "meeting.vtt"
    p.write_text(
        "WEBVTT\n\n1\n00:00:00.000 --> 00:00:04.000\n"
        "<v Alice>Hello everyone.</v>\n\n2\n00:00:04.000 --> 00:00:08.000\n"
        "<v Alice>Let's begin.</v>\n\n3\n00:00:08.000 --> 00:00:10.000\n"
        "<v Bob>Sounds good.</v>\n")
    r = registry.parse_file(p)
    assert r.success
    # Consecutive same-speaker turns merged.
    assert "**Alice:** Hello everyone. Let's begin." in r.content
    assert "**Bob:** Sounds good." in r.content


def make_pdf(pages_text: list[str]) -> bytes:
    """Hand-build a minimal multi-page PDF with FlateDecode content."""
    objs = []
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(len(pages_text)))
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    objs.append(f"2 0 obj << /Type /Pages /Kids [{kids}] "
                f"/Count {len(pages_text)} >> endobj".encode())
    objs.append(b"3 0 obj << /Type /Font /Subtype /Type1 /BaseFont "
                b"/Helvetica >> endobj")
    for i, text in enumerate(pages_text):
        content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode("latin-1")
        stream = zlib.compress(content)
        objs.append(
            f"{4 + 2 * i} 0 obj << /Type /Page /Parent 2 0 R /Contents "
            f"{5 + 2 * i} 0 R >> endobj".encode())
        objs.append(
            f"{5 + 2 * i} 0 obj << /Length {len(stream)} /Filter "
            f"/FlateDecode >> stream\n".encode() + stream + b"\nendstream endobj")
    body = b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
    return body


def test_pdf_parser(tmp_path, registry):
    p = tmp_path / "doc.pdf"
    p.write_bytes(make_pdf(["First page text here.", "Second page content."]))
    r = registry.parse_file(p)
    assert r.success, r.error
    assert "First page text here." in r.content
    assert "Second page content." in r.content
    assert r.metadata["page_count"] == 2


def test_pdf_buckets(tmp_path):
    from voitta_rag_tpu.services.parsers.pdf_parser import PdfParser

    p = tmp_path / "doc.pdf"
    p.write_bytes(make_pdf([f"Page number {i}." for i in range(1, 6)]))
    parser = PdfParser()
    assert parser.get_page_count(p) == 5
    buckets = list(parser.parse_in_buckets(p, pages_per_bucket=2))
    assert [(s, e) for _, s, e in buckets] == [(1, 2), (3, 4), (5, 5)]
    assert "Page number 3." in buckets[1][0].content


def test_pdf_external_worker(tmp_path, monkeypatch):
    """VOITTA_PDF_WORKER_CMD restores the reference's MinerU subprocess
    pattern (pdf_parser.py:110-164): JSON on stdout, bucket page args."""
    import sys

    from voitta_rag_tpu.config import get_settings
    from voitta_rag_tpu.services.parsers.pdf_parser import PdfParser

    worker = tmp_path / "worker.py"
    worker.write_text(
        "import json, sys\n"
        "path, start, end = sys.argv[1], sys.argv[2], sys.argv[3]\n"
        "print(json.dumps({'content': f'OCR pages {start}-{end}',"
        " 'metadata': {'engine': 'fake-ocr'}}))\n")
    monkeypatch.setenv("VOITTA_PDF_WORKER_CMD",
                       f"{sys.executable} {worker}")
    get_settings.cache_clear()
    try:
        p = tmp_path / "doc.pdf"
        p.write_bytes(make_pdf([f"Page number {i}." for i in range(1, 6)]))
        parser = PdfParser()
        res = parser.parse(p)
        assert res.success
        # Whole-document parse hands the worker end=0 ("all pages") without
        # touching the in-process parser first.
        assert res.content == "OCR pages 1-0"
        assert res.metadata["engine"] == "fake-ocr"

        buckets = list(parser.parse_in_buckets(p, pages_per_bucket=2))
        assert [(s, e) for _, s, e in buckets] == [(1, 2), (3, 4), (5, 5)]
        assert buckets[1][0].content == "OCR pages 3-4"
    finally:
        get_settings.cache_clear()


def test_pdf_worker_failure_falls_back(tmp_path, monkeypatch):
    import sys

    from voitta_rag_tpu.config import get_settings
    from voitta_rag_tpu.services.parsers.pdf_parser import PdfParser

    worker = tmp_path / "broken.py"
    worker.write_text("import sys; sys.exit(3)\n")
    monkeypatch.setenv("VOITTA_PDF_WORKER_CMD",
                       f"{sys.executable} {worker}")
    get_settings.cache_clear()
    try:
        p = tmp_path / "doc.pdf"
        p.write_bytes(make_pdf(["Real embedded text."]))
        res = PdfParser().parse(p)
        assert res.success
        assert "Real embedded text." in res.content  # in-process fallback
    finally:
        get_settings.cache_clear()


def test_pdf_worker_handles_unparseable(tmp_path, monkeypatch):
    """PDFs the in-process parser can't read still go to the worker."""
    import sys

    from voitta_rag_tpu.config import get_settings
    from voitta_rag_tpu.services.parsers.pdf_parser import PdfParser

    worker = tmp_path / "worker.py"
    worker.write_text(
        "import json, sys\n"
        "print(json.dumps({'content': 'worker rescued this',"
        " 'metadata': {'page_count': 2}}))\n")
    monkeypatch.setenv("VOITTA_PDF_WORKER_CMD",
                       f"{sys.executable} {worker}")
    get_settings.cache_clear()
    try:
        p = tmp_path / "broken.pdf"
        p.write_bytes(b"%PDF-1.7\nthis is not a valid pdf body")
        parser = PdfParser()
        res = parser.parse(p)
        assert res.success and res.content == "worker rescued this"
        buckets = list(parser.parse_in_buckets(p))
        assert len(buckets) == 1
        assert buckets[0][0].content == "worker rescued this"
        assert (buckets[0][1], buckets[0][2]) == (1, 2)
    finally:
        get_settings.cache_clear()


DOCX_TABLE_DOC = """<?xml version="1.0"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
 <w:body>
  <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>
   <w:r><w:t>Budget</w:t></w:r></w:p>
  <w:tbl>
   <w:tr><w:tc><w:p><w:r><w:t>Item</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>Cost</w:t></w:r></w:p></w:tc></w:tr>
   <w:tr><w:tc><w:p><w:r><w:t>Rocket</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>42</w:t></w:r></w:p>
             <w:p><w:r><w:t>(USD)</w:t></w:r></w:p></w:tc></w:tr>
  </w:tbl>
  <w:p><w:r><w:t>After the table.</w:t></w:r></w:p>
 </w:body>
</w:document>"""


def test_docx_tables_render_markdown_in_body_order(tmp_path, registry):
    p = tmp_path / "t.docx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("word/document.xml", DOCX_TABLE_DOC)
    r = registry.parse_file(p)
    assert r.success
    # table between the heading and the trailing paragraph, cells joined
    assert r.content.index("# Budget") < r.content.index("| Item | Cost |")
    assert "| Rocket | 42 (USD) |" in r.content
    assert r.content.index("| Rocket") < r.content.index("After the table.")
    # table cell text does NOT leak as duplicate plain paragraphs
    assert r.content.count("Rocket") == 1


PPTX_TABLE_SLIDE = """<?xml version="1.0"?>
<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
       xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
 <p:cSld><p:spTree>
  <p:sp><p:txBody><a:p><a:r><a:t>Quarterly recap</a:t></a:r></a:p></p:txBody></p:sp>
  <p:graphicFrame><a:graphic><a:graphicData>
   <a:tbl>
    <a:tr><a:tc><a:txBody><a:p><a:r><a:t>Region</a:t></a:r></a:p></a:txBody></a:tc>
         <a:tc><a:txBody><a:p><a:r><a:t>Sales</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
    <a:tr><a:tc><a:txBody><a:p><a:r><a:t>North</a:t></a:r></a:p></a:txBody></a:tc>
         <a:tc><a:txBody><a:p><a:r><a:t>99</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
   </a:tbl>
  </a:graphicData></a:graphic></p:graphicFrame>
 </p:spTree></p:cSld>
</p:sld>"""


def test_pptx_tables_render_markdown(tmp_path, registry):
    p = tmp_path / "t.pptx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("ppt/slides/slide1.xml", PPTX_TABLE_SLIDE)
    r = registry.parse_file(p)
    assert r.success
    assert "Quarterly recap" in r.content
    assert "| Region | Sales |" in r.content
    assert "| North | 99 |" in r.content
    assert r.content.count("North") == 1  # no duplicate plain-text leak


def test_docx_lists_and_title_metadata(tmp_path, registry):
    doc = """<?xml version="1.0"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
 <w:body>
  <w:p><w:pPr><w:pStyle w:val="ListParagraph"/></w:pPr>
   <w:r><w:t>first point</w:t></w:r></w:p>
  <w:p><w:pPr><w:pStyle w:val="ListBullet"/></w:pPr>
   <w:r><w:t>second point</w:t></w:r></w:p>
 </w:body>
</w:document>"""
    core = """<?xml version="1.0"?>
<cp:coreProperties
  xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
  xmlns:dc="http://purl.org/dc/elements/1.1/">
 <dc:title>Agenda</dc:title>
</cp:coreProperties>"""
    p = tmp_path / "l.docx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("word/document.xml", doc)
        zf.writestr("docProps/core.xml", core)
    r = registry.parse_file(p)
    assert r.success
    assert r.content.startswith("# Agenda")
    assert "- first point" in r.content and "- second point" in r.content


def test_pptx_slide_title_placeholder(tmp_path, registry):
    slide = """<?xml version="1.0"?>
<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
       xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
 <p:cSld><p:spTree>
  <p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
   <p:txBody><a:p><a:r><a:t>Roadmap 2026</a:t></a:r></a:p></p:txBody></p:sp>
  <p:sp><p:txBody><a:p><a:r><a:t>ship the thing</a:t></a:r></a:p></p:txBody></p:sp>
 </p:spTree></p:cSld>
</p:sld>"""
    p = tmp_path / "titled.pptx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("ppt/slides/slide1.xml", slide)
    r = registry.parse_file(p)
    assert r.success
    assert "## Slide 1: Roadmap 2026" in r.content
    assert "ship the thing" in r.content
    assert r.content.count("Roadmap 2026") == 1  # not duplicated as body


ODF_META = """<?xml version="1.0"?>
<office:document-meta
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:dc="http://purl.org/dc/elements/1.1/">
 <office:meta><dc:title>Field Report</dc:title></office:meta>
</office:document-meta>"""

ODT_TABLE_CONTENT = """<?xml version="1.0"?>
<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">
 <office:body><office:text>
  <text:p>Before.</text:p>
  <table:table>
   <table:table-row><table:table-cell><text:p>Animal</text:p></table:table-cell>
    <table:table-cell><text:p>Count</text:p></table:table-cell></table:table-row>
   <table:table-row><table:table-cell><text:p>Lynx</text:p></table:table-cell>
    <table:table-cell><text:p>7</text:p></table:table-cell></table:table-row>
  </table:table>
  <text:p>After.</text:p>
 </office:text></office:body>
</office:document-content>"""


def test_odt_tables_title_and_order(tmp_path, registry):
    p = tmp_path / "rep.odt"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("content.xml", ODT_TABLE_CONTENT)
        zf.writestr("meta.xml", ODF_META)
    r = registry.parse_file(p)
    assert r.success
    assert r.content.startswith("# Field Report")
    assert "| Animal | Count |" in r.content and "| Lynx | 7 |" in r.content
    assert r.content.index("Before.") < r.content.index("| Animal")
    assert r.content.index("| Lynx") < r.content.index("After.")
    assert r.content.count("Lynx") == 1  # cell text not duplicated
    assert r.metadata.get("title") == "Field Report"


def test_odp_page_names(tmp_path, registry):
    content = """<?xml version="1.0"?>
<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0">
 <office:body><office:presentation>
  <draw:page draw:name="Kickoff"><draw:frame><draw:text-box>
   <text:p>welcome everyone</text:p>
  </draw:text-box></draw:frame></draw:page>
 </office:presentation></office:body>
</office:document-content>"""
    p = tmp_path / "deck.odp"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("content.xml", content)
    r = registry.parse_file(p)
    assert r.success
    assert "## Kickoff" in r.content and "welcome everyone" in r.content
