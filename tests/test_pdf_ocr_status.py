"""Scanned/image-only PDF handling: distinct parse status instead of silent
zero-chunk indexing, plus the OCR worker-hook e2e path (reference quality
bar: MinerU OCR integration, reference pdf_parser.py:110-164)."""

import json
import sys
import zlib
from pathlib import Path

import pytest

from voitta_rag_tpu.db import database as dbmod
from voitta_rag_tpu.services.parsers.pdf_parser import PdfDocument, PdfParser


def image_only_pdf(pages: int = 2) -> bytes:
    """PDF whose pages draw one Flate-compressed grayscale raster each and
    contain no text operators — the shape of a scanned document."""
    w = h = 8
    raster = zlib.compress(bytes([200] * (w * h)))
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % (10 + i) for i in range(pages))
        + b"] /Count %d >> endobj" % pages,
        b"3 0 obj << /Type /XObject /Subtype /Image /Width 8 /Height 8 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % len(raster) + raster + b"\nendstream endobj",
        b"4 0 obj << /Length 32 >>\nstream\n"
        b"q 100 0 0 100 0 0 cm /Im1 Do Q\nendstream endobj",
    ]
    for i in range(pages):
        objs.append(
            b"%d 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /XObject << /Im1 3 0 R >> >> >> endobj" % (10 + i))
    return (b"%PDF-1.5\n" + b"\n".join(objs)
            + b"\ntrailer << /Root 1 0 R >>\n%%EOF")


def text_pdf() -> bytes:
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj",
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj",
        b"5 0 obj << /Length 44 >>\nstream\n"
        b"BT /F1 12 Tf (Plain text page.) Tj ET\nendstream endobj",
    ]
    return (b"%PDF-1.5\n" + b"\n".join(objs)
            + b"\ntrailer << /Root 1 0 R >>\n%%EOF")


def test_page_has_images_detection(tmp_path):
    p = tmp_path / "scan.pdf"
    p.write_bytes(image_only_pdf())
    doc = PdfDocument(p)
    assert doc.page_count == 2
    assert doc.page_has_images(0) and doc.page_has_images(1)

    t = tmp_path / "text.pdf"
    t.write_bytes(text_pdf())
    tdoc = PdfDocument(t)
    assert not tdoc.page_has_images(0)


def test_parse_reports_image_only(tmp_path, monkeypatch):
    monkeypatch.delenv("VOITTA_PDF_WORKER_CMD", raising=False)
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    p = tmp_path / "scan.pdf"
    p.write_bytes(image_only_pdf())
    r = PdfParser().parse(p)
    assert not r.success
    assert "Scanned/image-only PDF" in r.error
    assert "2 of 2 pages" in r.error
    assert "VOITTA_PDF_WORKER_CMD" in r.error  # actionable remedy


@pytest.fixture
def env(temp_root, monkeypatch):
    monkeypatch.setenv("VOITTA_SEGMENT_CAPACITY", "1024")
    monkeypatch.setenv("EMBEDDING_MODEL", "test-tiny")
    monkeypatch.setenv("EMBEDDING_DIMENSION", "64")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    monkeypatch.setenv("CHUNK_SIZE", "120")
    monkeypatch.delenv("VOITTA_PDF_WORKER_CMD", raising=False)
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    dbmod.reset_db()

    from voitta_rag_tpu.index.store import TpuVectorStore
    from voitta_rag_tpu.services.chunking import ChunkingService
    from voitta_rag_tpu.services.embedding import EmbeddingService
    from voitta_rag_tpu.services.filesystem import FilesystemService
    from voitta_rag_tpu.services.indexing import IndexingService

    store = TpuVectorStore(dimension=64)
    svc = IndexingService(
        vector_store=store,
        embedder=EmbeddingService(model_name="test-tiny", model_path="",
                                  max_seq_len=32),
        chunker=ChunkingService(chunk_size=120, chunk_overlap=10),
        fs=FilesystemService(temp_root),
    )
    yield temp_root, svc, store
    store.close()
    dbmod.reset_db()


def test_index_image_only_pdf_surfaces_ocr_status(env):
    root, svc, store = env
    (root / "docs").mkdir()
    (root / "docs" / "scan.pdf").write_bytes(image_only_pdf())

    res = svc.index_file("docs/scan.pdf", "docs")
    assert res["status"] == "error"
    assert "Scanned/image-only PDF" in res["error"]
    assert store.count_chunks_for_file("docs/scan.pdf") == 0

    rec = dbmod.get_db().get_indexed_file("docs/scan.pdf")
    assert rec is not None and rec.chunk_count == 0
    assert "OCR is required" in rec.parse_error

    # Unchanged bytes are not re-parsed every pass: the recorded error is
    # returned straight from the DB.
    res2 = svc.index_file("docs/scan.pdf", "docs")
    assert res2["status"] == "error" and res2.get("reason") == "parse_error"

    # force=True retries the parse (e.g. after installing an OCR worker).
    res3 = svc.index_file("docs/scan.pdf", "docs", force=True)
    assert res3["status"] == "error" and res3.get("reason") != "parse_error"


def test_worker_hook_ocr_e2e(env, tmp_path, monkeypatch):
    """An OCR-capable worker configured via VOITTA_PDF_WORKER_CMD turns the
    same scanned PDF into indexed chunks, and the parse error clears."""
    root, svc, store = env
    (root / "docs").mkdir()
    (root / "docs" / "scan.pdf").write_bytes(image_only_pdf())

    worker = tmp_path / "ocr_worker.py"
    worker.write_text(
        "import json, sys\n"
        "print(json.dumps({'content': "
        "'OCR recovered text about volcanoes. ' * 12, "
        "'metadata': {'engine': 'stub-ocr', 'page_count': 2}}))\n")
    monkeypatch.setenv("VOITTA_PDF_WORKER_CMD",
                       f"{sys.executable} {worker}")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()

    res = svc.index_file("docs/scan.pdf", "docs", force=True)
    assert res["status"] == "indexed" and res["chunks"] > 0
    assert store.count_chunks_for_file("docs/scan.pdf") > 0
    rec = dbmod.get_db().get_indexed_file("docs/scan.pdf")
    assert rec.chunk_count > 0 and rec.parse_error is None


def test_example_worker_reports_ocr_gap(tmp_path):
    """scripts/pdf_worker_example.py on an image-only PDF: without an OCR
    engine installed it reports the un-OCRable pages in metadata rather
    than failing or silently emitting empty content."""
    import subprocess

    p = tmp_path / "scan.pdf"
    p.write_bytes(image_only_pdf())
    script = Path(__file__).resolve().parent.parent / "scripts" / \
        "pdf_worker_example.py"
    proc = subprocess.run(
        [sys.executable, str(script), str(p), "1", "0"],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    payload = json.loads(proc.stdout)
    meta = payload["metadata"]
    assert meta["page_count"] == 2
    import shutil as _sh
    if _sh.which("tesseract"):
        assert payload["content"] or meta.get("ocr_pages")
    else:
        assert meta.get("ocr_unavailable_pages") == 2
