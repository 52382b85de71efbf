"""ODT / ODP / ODS parsers (stdlib zipfile + ElementTree; reference
odf_parser.py uses odfpy — OpenDocument is ZIP + content.xml, parsed here
standalone). Feature parity: meta.xml titles as H1 (reference :41-43 /
:121-123), ODT tables → markdown (reference :165-190, here rendered in
document order without duplicating cell text as paragraphs), ODP page-name
slide headings (reference :52-53)."""

from __future__ import annotations

import zipfile
import xml.etree.ElementTree as ET
from pathlib import Path

from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult

TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
DRAW = "{urn:oasis:names:tc:opendocument:xmlns:drawing:1.0}"
DC = "{http://purl.org/dc/elements/1.1/}"


def _text_of(el) -> str:
    return "".join(el.itertext()).strip()


def _load_content(file_path: Path):
    with zipfile.ZipFile(file_path) as zf:
        root = ET.fromstring(zf.read("content.xml"))
        meta: dict = {}
        try:
            mroot = ET.fromstring(zf.read("meta.xml"))
            el = next(mroot.iter(f"{DC}title"), None)
            if el is not None and el.text:
                meta["title"] = el.text.strip()
        except (KeyError, ET.ParseError):
            pass
        return root, meta


def _table_md(tbl, max_rows: int = 100) -> str:
    rows = []
    for row in tbl.iter(f"{TABLE}table-row"):
        if len(rows) >= max_rows:
            break
        cells = []
        for cell in row.iter(f"{TABLE}table-cell"):
            repeat = int(cell.get(
                f"{TABLE}number-columns-repeated", "1") or 1)
            cells.extend([_text_of(cell)] * min(repeat, 50))
        if any(c for c in cells):
            rows.append(cells)
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    table = ["| " + " | ".join(rows[0]) + " |",
             "| " + " | ".join("---" for _ in range(width)) + " |"]
    table += ["| " + " | ".join(r) + " |" for r in rows[1:]]
    return "\n".join(table)


class OdtParser(BaseParser):
    extensions = [".odt"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            root, meta = _load_content(file_path)
            lines = []
            if meta.get("title"):
                lines.append(f"# {meta['title']}")
            in_table: set[int] = set()
            for el in root.iter():
                if el.tag == f"{TABLE}table":
                    md = _table_md(el)
                    if md:
                        lines.append(md)
                    in_table.update(
                        id(x) for x in el.iter()
                        if x.tag in (f"{TEXT}h", f"{TEXT}p"))
                elif el.tag == f"{TEXT}h" and id(el) not in in_table:
                    level = min(int(el.get(f"{TEXT}outline-level", "1") or 1), 6)
                    t = _text_of(el)
                    if t:
                        lines.append("#" * level + " " + t)
                elif el.tag == f"{TEXT}p" and id(el) not in in_table:
                    t = _text_of(el)
                    if t:
                        lines.append(t)
            return ParserResult(content="\n\n".join(lines), metadata=meta)
        except Exception as e:
            return ParserResult.failure(f"Failed to parse ODT: {e}")


class OdpParser(BaseParser):
    extensions = [".odp"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            root, meta = _load_content(file_path)
            sections = []
            if meta.get("title"):
                sections.append(f"# {meta['title']}")
            for i, page in enumerate(root.iter(f"{DRAW}page"), 1):
                name = page.get(f"{DRAW}name")
                head = f"## {name}" if name else f"## Slide {i}"
                paras = [
                    _text_of(p) for p in page.iter(f"{TEXT}p") if _text_of(p)
                ]
                if paras:
                    sections.append(head + "\n\n" + "\n\n".join(paras))
            return ParserResult(content="\n\n".join(sections), metadata=meta)
        except Exception as e:
            return ParserResult.failure(f"Failed to parse ODP: {e}")


class OdsParser(BaseParser):
    extensions = [".ods"]

    MAX_ROWS = 100

    def parse(self, file_path: Path) -> ParserResult:
        try:
            root, meta = _load_content(file_path)
            sections = []
            if meta.get("title"):
                sections.append(f"# {meta['title']}")
            for sheet in root.iter(f"{TABLE}table"):
                name = sheet.get(f"{TABLE}name", "Sheet")
                md = _table_md(sheet, self.MAX_ROWS)
                if md:
                    sections.append(f"## {name}\n\n" + md)
            return ParserResult(content="\n\n".join(sections), metadata=meta)
        except Exception as e:
            return ParserResult.failure(f"Failed to parse ODS: {e}")
