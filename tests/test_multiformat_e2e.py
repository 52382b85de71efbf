"""Multi-format corpus through the REAL indexing pipeline: every major
parser family exercised end-to-end (parse → chunk → embed → store →
hybrid search), not just in isolation (reference behavior: one indexing
path serves all registry formats, services/indexing.py)."""

import json
import struct
import zipfile

import numpy as np
import pytest

from tests.test_indexing import env  # noqa: F401
from tests.test_parsers import (  # noqa: F401
    DOCX_DOC, EPUB_CONTAINER, EPUB_OPF, ODT_CONTENT, PPTX_SLIDE, make_pdf,
)
from tests.test_xls_biff import build_ole, build_workbook_stream, rec


def build_corpus(root):
    d = root / "corpus"
    d.mkdir()
    # text/code
    (d / "notes.md").write_text("# Mesh notes\nzebra quantization lore. " * 4)
    (d / "tool.py").write_text("def zebra_tool():\n    return 'xylophone'\n")
    # DOCX (stdlib zip+XML)
    with zipfile.ZipFile(d / "doc.docx", "w") as zf:
        zf.writestr("word/document.xml", DOCX_DOC)
    # EPUB
    with zipfile.ZipFile(d / "book.epub", "w") as zf:
        zf.writestr("META-INF/container.xml", EPUB_CONTAINER)
        zf.writestr("OEBPS/content.opf", EPUB_OPF)
        zf.writestr("OEBPS/ch1.xhtml",
                    "<html><body><h1>Chapter One</h1>"
                    "<p>Narwhals navigate nebulae.</p></body></html>")
    # PDF (from-scratch generator used by the parser tests)
    (d / "paper.pdf").write_bytes(make_pdf(["Quokka velocity analysis."]))
    # VTT transcript
    (d / "meeting.vtt").write_text(
        "WEBVTT\n\n00:00:01.000 --> 00:00:03.000\n"
        "<v Alice>Wombats approved the budget.</v>\n")
    # XLSX (stdlib zip+XML, sharedStrings path)
    with zipfile.ZipFile(d / "table.xlsx", "w") as zf:
        zf.writestr("xl/workbook.xml",
                    '<?xml version="1.0"?><workbook xmlns="http://schemas.'
                    'openxmlformats.org/spreadsheetml/2006/main"><sheets>'
                    '<sheet name="S1" sheetId="1" r:id="rId1" xmlns:r="http:'
                    '//schemas.openxmlformats.org/officeDocument/2006/'
                    'relationships"/></sheets></workbook>')
        zf.writestr("xl/_rels/workbook.xml.rels",
                    '<?xml version="1.0"?><Relationships xmlns="http://'
                    'schemas.openxmlformats.org/package/2006/relationships">'
                    '<Relationship Id="rId1" Type="http://schemas.'
                    'openxmlformats.org/officeDocument/2006/relationships/'
                    'worksheet" Target="worksheets/sheet1.xml"/>'
                    '</Relationships>')
        zf.writestr("xl/worksheets/sheet1.xml",
                    '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
                    'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
                    '<row r="1"><c t="inlineStr"><is><t>ostrich</t></is></c>'
                    '<c t="inlineStr"><is><t>42</t></is></c></row>'
                    '</sheetData></worksheet>')
    # PPTX (slides walked in numeric order)
    with zipfile.ZipFile(d / "deck.pptx", "w") as zf:
        zf.writestr("ppt/slides/slide1.xml",
                    PPTX_SLIDE.replace("Slide text {i}", "Kudu roadmap"))
    # ODT (OpenDocument text)
    with zipfile.ZipFile(d / "memo.odt", "w") as zf:
        zf.writestr("content.xml",
                    ODT_CONTENT.replace("Hello ODT world.",
                                        "Ibex invoices reconciled."))
    # legacy BIFF .xls inside an OLE compound file
    sheet = [rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0)),
             rec(0x0203, struct.pack("<HHHd", 0, 1, 0, 7.25))]
    (d / "ledger.xls").write_bytes(
        build_ole(build_workbook_stream(["tapir expenses"], {"S1": sheet})))
    # GDOC pointer file (content is the doc name; links out via source_url)
    (d / "Pelican Plan.gdoc").write_text(json.dumps({"doc_id": "pl4n"}))
    return d


# each format: (file name, marker text unique to it)
EXPECTED = [
    ("corpus/notes.md", "zebra quantization"),
    ("corpus/tool.py", "xylophone"),
    ("corpus/doc.docx", "joined runs"),
    ("corpus/book.epub", "Narwhals navigate"),
    ("corpus/paper.pdf", "Quokka velocity"),
    ("corpus/meeting.vtt", "Wombats approved"),
    ("corpus/table.xlsx", "ostrich"),
    ("corpus/deck.pptx", "Kudu roadmap"),
    ("corpus/memo.odt", "Ibex invoices"),
    ("corpus/ledger.xls", "tapir expenses"),
    ("corpus/Pelican Plan.gdoc", "Pelican Plan"),
]


def test_multiformat_corpus_indexes_and_searches(env):
    root, svc, store = env
    build_corpus(root)
    stats = svc.index_folder("corpus")
    assert stats["errors"] == 0, stats
    assert stats["indexed"] >= len(EXPECTED)

    from voitta_rag_tpu.db.database import get_db
    db = get_db()
    for fp, marker in EXPECTED:
        rec = db.get_indexed_file(fp)
        assert rec is not None and rec.chunk_count > 0, fp
        gids = store.payloads.gids_where("file_path", fp)
        assert len(gids) == rec.chunk_count, fp
        texts = " ".join(
            c.text for c in store.payloads.get_chunks(gids).values())
        assert marker in texts, (fp, texts[:200])

    # the stored dense vectors are unit-norm and searchable: query with a
    # stored chunk's own embedding and expect that file back at rank 1
    for fp, marker in EXPECTED[:3]:
        gids = store.payloads.gids_where("file_path", fp)
        first = store.payloads.get_chunks(gids[:1])[gids[0]]
        emb = svc.embedder.embed_texts_array([first.text])
        res = store.search(np.asarray(emb)[0], limit=1)
        assert res and res[0].metadata.file_path == fp
