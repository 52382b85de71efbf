"""ODT / ODP / ODS parsers (stdlib zipfile + ElementTree; reference
odf_parser.py uses odfpy — OpenDocument is ZIP + content.xml, parsed here
standalone)."""

from __future__ import annotations

import zipfile
import xml.etree.ElementTree as ET
from pathlib import Path

from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult

TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
DRAW = "{urn:oasis:names:tc:opendocument:xmlns:drawing:1.0}"


def _text_of(el) -> str:
    return "".join(el.itertext()).strip()


def _load_content(file_path: Path):
    with zipfile.ZipFile(file_path) as zf:
        return ET.fromstring(zf.read("content.xml"))


class OdtParser(BaseParser):
    extensions = [".odt"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            root = _load_content(file_path)
            lines = []
            for el in root.iter():
                if el.tag == f"{TEXT}h":
                    level = min(int(el.get(f"{TEXT}outline-level", "1") or 1), 6)
                    t = _text_of(el)
                    if t:
                        lines.append("#" * level + " " + t)
                elif el.tag == f"{TEXT}p":
                    t = _text_of(el)
                    if t:
                        lines.append(t)
            return ParserResult(content="\n\n".join(lines))
        except Exception as e:
            return ParserResult.failure(f"Failed to parse ODT: {e}")


class OdpParser(BaseParser):
    extensions = [".odp"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            root = _load_content(file_path)
            sections = []
            for i, page in enumerate(root.iter(f"{DRAW}page"), 1):
                paras = [
                    _text_of(p) for p in page.iter(f"{TEXT}p") if _text_of(p)
                ]
                if paras:
                    sections.append(f"## Slide {i}\n\n" + "\n\n".join(paras))
            return ParserResult(content="\n\n".join(sections))
        except Exception as e:
            return ParserResult.failure(f"Failed to parse ODP: {e}")


class OdsParser(BaseParser):
    extensions = [".ods"]

    MAX_ROWS = 100

    def parse(self, file_path: Path) -> ParserResult:
        try:
            root = _load_content(file_path)
            sections = []
            for sheet in root.iter(f"{TABLE}table"):
                name = sheet.get(f"{TABLE}name", "Sheet")
                rows = []
                for row in sheet.iter(f"{TABLE}table-row"):
                    if len(rows) >= self.MAX_ROWS:
                        break
                    cells = []
                    for cell in row.iter(f"{TABLE}table-cell"):
                        repeat = int(cell.get(
                            f"{TABLE}number-columns-repeated", "1") or 1)
                        cells.extend([_text_of(cell)] * min(repeat, 50))
                    if any(c for c in cells):
                        rows.append(cells)
                if not rows:
                    continue
                width = max(len(r) for r in rows)
                rows = [r + [""] * (width - len(r)) for r in rows]
                table = ["| " + " | ".join(rows[0]) + " |",
                         "| " + " | ".join("---" for _ in range(width)) + " |"]
                table += ["| " + " | ".join(r) + " |" for r in rows[1:]]
                sections.append(f"## {name}\n\n" + "\n".join(table))
            return ParserResult(content="\n\n".join(sections))
        except Exception as e:
            return ParserResult.failure(f"Failed to parse ODS: {e}")
