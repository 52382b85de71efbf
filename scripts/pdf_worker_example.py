#!/usr/bin/env python3
"""Example external PDF worker (the reference's scripts/mineru_parse.py slot).

Contract (voitta_rag_tpu/services/parsers/pdf_parser.py::_run_pdf_worker):

    <cmd> <pdf_path> <start_page> <end_page>

with 1-based inclusive pages, printing one JSON object on stdout:

    {"content": "<markdown>", "metadata": {...}}

A non-zero exit, timeout, or malformed output makes the indexer fall back
to the in-process extractor for that bucket — workers can fail safely.

This example simply reuses the in-process extractor so the plumbing can be
exercised without an OCR engine; a real deployment points
VOITTA_PDF_WORKER_CMD at a script living in its own venv (e.g. MinerU,
which the reference runs exactly this way: reference
services/parsers/pdf_parser.py:110-164, scripts/mineru_parse.py) — the
worker process is free to use CUDA/CPU OCR without touching the TPU
serving process.

Usage:
    VOITTA_PDF_WORKER_CMD="python scripts/pdf_worker_example.py"
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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
    texts = [doc.page_text(i) for i in range(start - 1, min(end, doc.page_count))]
    content = "\n\n".join(t for t in texts if t)
    print(json.dumps({
        "content": content,
        "metadata": {"engine": "in-process-example",
                     "page_count": doc.page_count},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
