#!/usr/bin/env python3
"""Example external PDF worker (the reference's scripts/mineru_parse.py slot).

Contract (voitta_rag_tpu/services/parsers/pdf_parser.py::_run_pdf_worker):

    <cmd> <pdf_path> <start_page> <end_page>

with 1-based inclusive pages, printing one JSON object on stdout:

    {"content": "<markdown>", "metadata": {...}}

A non-zero exit, timeout, or malformed output makes the indexer fall back
to the in-process extractor for that bucket — workers can fail safely.

Behavior:

- Pages with text operators use the in-process extractor (fast path) —
  layout-aware by default: multi-column pages come out in reading order
  and aligned rows come out as `` | ``-separated table rows
  (services/parsers/pdf_layout.py, the layout half of MinerU's value).
- Image-only pages are OCRed when an OCR engine is available: the worker
  pulls each page's raster XObjects out of the PDF (JPEG/DCTDecode streams
  verbatim; Flate-compressed 8-bit gray/RGB rasters re-wrapped as PNM) and
  runs ``tesseract`` on them. Without tesseract on PATH the worker reports
  the un-OCRable pages in metadata instead of silently emitting nothing.

This mirrors how the reference runs MinerU out-of-process (reference
services/parsers/pdf_parser.py:110-164, scripts/mineru_parse.py): the
worker lives in its own venv/process and may use any CPU/CUDA OCR stack
without touching the TPU serving process.

Usage:
    VOITTA_PDF_WORKER_CMD="python scripts/pdf_worker_example.py"
"""

import json
import re
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _page_raster_images(doc, page_index):
    """Yield (suffix, bytes) for the page's raster XObject images.

    DCTDecode streams ARE JPEG files — hand them to the OCR engine
    verbatim. Flate 8-bit /DeviceGray //DeviceRGB rasters become PNM.
    """
    from voitta_rag_tpu.services.parsers import pdf_parser as P

    page_num = doc.pages[page_index]
    d = P._dict_of(doc.objects.get(page_num, b""))
    res = doc._sub_dict(d, b"/Resources")
    xobj = doc._sub_dict(res, b"/XObject")
    for m in re.finditer(rb"(\d+)\s+\d+\s+R", xobj):
        body = doc.objects.get(int(m.group(1)))
        if body is None:
            continue
        od = P._dict_of(body)
        if not re.search(rb"/Subtype\s*/Image\b", od):
            continue
        sm = re.search(rb"stream\r?\n", body)
        if not sm:
            continue
        raw = body[sm.end():body.rfind(b"endstream")]
        if re.search(rb"/Filter\s*/?\[?\s*/DCTDecode", od):
            yield ".jpg", raw
            continue
        width = P._parm_int(od, b"/Width", 0)
        height = P._parm_int(od, b"/Height", 0)
        bpc = P._parm_int(od, b"/BitsPerComponent", 8)
        data = P._decode_stream(body)
        if not data or bpc != 8 or not width or not height:
            continue
        if re.search(rb"/ColorSpace\s*/DeviceRGB", od) and \
                len(data) >= width * height * 3:
            yield ".pnm", (b"P6\n%d %d\n255\n" % (width, height)
                           + data[:width * height * 3])
        elif len(data) >= width * height:
            yield ".pnm", (b"P5\n%d %d\n255\n" % (width, height)
                           + data[:width * height])


def _ocr_bytes(suffix, data, tess):
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(data)
        tmp = f.name
    try:
        proc = subprocess.run([tess, tmp, "stdout"], capture_output=True,
                              text=True, timeout=120)
        return proc.stdout.strip() if proc.returncode == 0 else ""
    except (OSError, subprocess.TimeoutExpired):
        return ""
    finally:
        Path(tmp).unlink(missing_ok=True)


def main() -> int:
    if len(sys.argv) != 4:
        print("usage: pdf_worker_example.py <pdf> <start> <end>",
              file=sys.stderr)
        return 2
    path, start, end = Path(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from voitta_rag_tpu.services.parsers.pdf_parser import PdfDocument

    doc = PdfDocument(path)
    if end == 0:  # whole document
        end = doc.page_count
    tess = shutil.which("tesseract")
    parts = []
    ocr_pages = 0
    ocr_missing_pages = 0
    for i in range(start - 1, min(end, doc.page_count)):
        text = doc.page_text(i)
        if not text and doc.page_has_images(i):
            if tess:
                ocr = "\n".join(
                    t for t in (_ocr_bytes(sfx, data, tess)
                                for sfx, data in _page_raster_images(doc, i))
                    if t)
                if ocr:
                    ocr_pages += 1
                    text = ocr
            else:
                ocr_missing_pages += 1
        if text:
            parts.append(text)
    meta = {"engine": "tesseract" if tess else "in-process-example",
            "page_count": doc.page_count}
    if ocr_pages:
        meta["ocr_pages"] = ocr_pages
    if ocr_missing_pages:
        meta["ocr_unavailable_pages"] = ocr_missing_pages
    print(json.dumps({"content": "\n\n".join(parts), "metadata": meta}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
