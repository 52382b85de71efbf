"""Google Workspace stub parser (.gdoc/.gsheet/.gslides).

Contract (reference gdoc_parser.py:14-59): the stubs are JSON files from
Google Drive Desktop carrying a ``doc_id``; emit the canonical source URL in
metadata (used by the MCP ``resolve_url`` tool) and the filename stem as the
searchable content.
"""

from __future__ import annotations

import json
from pathlib import Path

from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult

URL_TEMPLATES = {
    ".gdoc": "https://docs.google.com/document/d/{doc_id}/edit",
    ".gsheet": "https://docs.google.com/spreadsheets/d/{doc_id}/edit",
    ".gslides": "https://docs.google.com/presentation/d/{doc_id}/edit",
}


class GdocParser(BaseParser):
    extensions = [".gdoc", ".gsheet", ".gslides"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            data = json.loads(file_path.read_text(encoding="utf-8"))
        except Exception as e:
            return ParserResult.failure(f"Failed to read Google stub file: {e}")
        doc_id = data.get("doc_id")
        if not doc_id:
            return ParserResult.failure("No doc_id found in Google stub file")
        metadata = {"google_doc_id": doc_id}
        template = URL_TEMPLATES.get(file_path.suffix.lower())
        if template:
            metadata["source_url"] = template.format(doc_id=doc_id)
        return ParserResult(content=file_path.stem, metadata=metadata)
