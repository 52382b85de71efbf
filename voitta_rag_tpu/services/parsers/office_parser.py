"""DOCX / PPTX / XLSX parsers built on stdlib zipfile + ElementTree.

The reference uses python-docx / python-pptx / openpyxl
(docx_parser.py, pptx_parser.py, xlsx_parser.py). OOXML files are ZIP
archives of XML, so this framework parses them standalone with the stdlib —
no external document libraries:

- DOCX: ``word/document.xml`` paragraphs in body order; Heading styles →
  ``#`` markdown, ``w:tbl`` → markdown tables (reference
  docx_parser.py:76-96), core.xml properties as metadata.
- PPTX: per-slide ``a:t`` text runs → ``## Slide N`` sections; ``a:tbl``
  → markdown tables (reference pptx_parser.py:77-104).
- XLSX: sheet XML + sharedStrings → markdown tables, max 100 rows per sheet
  (reference xlsx_parser.py:8).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from pathlib import Path

from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
CP = "{http://schemas.openxmlformats.org/package/2006/metadata/core-properties}"
DC = "{http://purl.org/dc/elements/1.1/}"


def _core_properties(zf: zipfile.ZipFile) -> dict:
    meta = {}
    try:
        root = ET.fromstring(zf.read("docProps/core.xml"))
        for tag, key in ((f"{DC}title", "title"), (f"{DC}creator", "author"),
                         (f"{DC}subject", "subject")):
            el = root.find(tag)
            if el is not None and el.text:
                meta[key] = el.text
    except (KeyError, ET.ParseError):
        pass
    return meta


def _rows_to_markdown(rows: list[list[str]]) -> str:
    """Row lists → a markdown table (first row is the header)."""
    rows = [r for r in rows if any(r)]
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    md = ["| " + " | ".join(rows[0]) + " |", "|" + "---|" * width]
    md += ["| " + " | ".join(r) + " |" for r in rows[1:]]
    return "\n".join(md)


class DocxParser(BaseParser):
    extensions = [".docx"]

    @staticmethod
    def _para_line(para) -> str:
        text = "".join(t.text or "" for t in para.iter(f"{W}t")).strip()
        if not text:
            return ""
        style_el = para.find(f"{W}pPr/{W}pStyle")
        style = style_el.get(f"{W}val", "") if style_el is not None else ""
        mheading = re.match(r"[Hh]eading(\d)", style)
        if mheading:
            return "#" * min(int(mheading.group(1)), 6) + " " + text
        if style == "Title":
            return "# " + text
        if "list" in style.lower() or "bullet" in style.lower():
            return "- " + text  # reference docx_parser.py:69-70
        return text

    @staticmethod
    def _table_md(tbl) -> str:
        """w:tbl → markdown (reference docx_parser.py:86-105)."""
        rows = []
        for tr in tbl.findall(f"{W}tr"):
            rows.append([
                " ".join(filter(None, (
                    "".join(t.text or "" for t in p.iter(f"{W}t")).strip()
                    for p in tc.iter(f"{W}p"))))
                for tc in tr.findall(f"{W}tc")])
        return _rows_to_markdown(rows)

    def parse(self, file_path: Path) -> ParserResult:
        try:
            with zipfile.ZipFile(file_path) as zf:
                root = ET.fromstring(zf.read("word/document.xml"))
                meta = _core_properties(zf)
            lines = []
            if meta.get("title"):
                lines.append(f"# {meta['title']}")  # reference :43-45
            body = root.find(f"{W}body")
            for el in (list(body) if body is not None else [root]):
                if el.tag == f"{W}tbl":
                    md = self._table_md(el)
                    if md:
                        lines.append(md)
                    continue
                # w:p directly, or paragraphs nested in sdt/textboxes etc.
                for para in ([el] if el.tag == f"{W}p" else el.iter(f"{W}p")):
                    line = self._para_line(para)
                    if line:
                        lines.append(line)
            return ParserResult(content="\n\n".join(lines), metadata=meta)
        except Exception as e:
            return ParserResult.failure(f"Failed to parse DOCX: {e}")


class PptxParser(BaseParser):
    extensions = [".pptx"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            with zipfile.ZipFile(file_path) as zf:
                meta = _core_properties(zf)
                slide_names = sorted(
                    (n for n in zf.namelist()
                     if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
                    key=lambda n: int(re.search(r"(\d+)", n).group(1)))
                sections = []
                if meta.get("title"):
                    sections.append(f"# {meta['title']}")  # reference :41-43
                for i, name in enumerate(slide_names, 1):
                    root = ET.fromstring(zf.read(name))
                    # Title-placeholder shape → slide heading (reference
                    # pptx_parser.py:56-86 "## Slide N: {title}").
                    slide_title, in_title = None, set()
                    for sp in root.iter(f"{P}sp"):
                        ph = sp.find(f"{P}nvSpPr/{P}nvPr/{P}ph")
                        if ph is None or ph.get("type") not in (
                                "title", "ctrTitle"):
                            continue
                        title_paras = list(sp.iter(f"{A}p"))
                        slide_title = " ".join(filter(None, (
                            "".join(t.text or "" for t in p.iter(f"{A}t"))
                            .strip() for p in title_paras))) or None
                        if slide_title:
                            in_title.update(id(p) for p in title_paras)
                        break
                    # a:tbl → markdown (reference pptx_parser.py:104-125);
                    # their paragraphs are excluded from the plain-text walk.
                    tables, in_table = [], set(in_title)
                    for tbl in root.iter(f"{A}tbl"):
                        rows = []
                        for tr in tbl.findall(f"{A}tr"):
                            row = []
                            for tc in tr.findall(f"{A}tc"):
                                cell_paras = list(tc.iter(f"{A}p"))
                                in_table.update(id(p) for p in cell_paras)
                                row.append(" ".join(filter(None, (
                                    "".join(t.text or ""
                                            for t in p.iter(f"{A}t")).strip()
                                    for p in cell_paras))))
                            rows.append(row)
                        md = _rows_to_markdown(rows)
                        if md:
                            tables.append(md)
                    paras = []
                    for p in root.iter(f"{A}p"):
                        if id(p) in in_table:
                            continue
                        run = "".join(t.text or "" for t in p.iter(f"{A}t")).strip()
                        if run:
                            paras.append(run)
                    paras += tables
                    if paras or slide_title:
                        head = (f"## Slide {i}: {slide_title}"
                                if slide_title else f"## Slide {i}")
                        sections.append(
                            head + ("\n\n" + "\n\n".join(paras)
                                    if paras else ""))
            return ParserResult(content="\n\n".join(sections), metadata=meta)
        except Exception as e:
            return ParserResult.failure(f"Failed to parse PPTX: {e}")


MAX_ROWS_PER_SHEET = 100  # reference xlsx_parser.py:8

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    m = _CELL_REF_RE.match(ref or "")
    if not m:
        return 0
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


class XlsxParser(BaseParser):
    extensions = [".xlsx", ".xls"]

    def parse(self, file_path: Path) -> ParserResult:
        if file_path.suffix.lower() == ".xls":
            return self._parse_xls(file_path)
        try:
            with zipfile.ZipFile(file_path) as zf:
                meta = _core_properties(zf)
                shared: list[str] = []
                if "xl/sharedStrings.xml" in zf.namelist():
                    sroot = ET.fromstring(zf.read("xl/sharedStrings.xml"))
                    for si in sroot.iter(f"{S}si"):
                        shared.append("".join(t.text or ""
                                              for t in si.iter(f"{S}t")))
                # Sheet names from workbook.xml in order.
                wb = ET.fromstring(zf.read("xl/workbook.xml"))
                names = [s.get("name", f"Sheet{i+1}") for i, s in
                         enumerate(wb.iter(f"{S}sheet"))]
                sheet_files = sorted(
                    (n for n in zf.namelist()
                     if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
                    key=lambda n: int(re.search(r"(\d+)", n).group(1)))
                sections = []
                if meta.get("title"):
                    sections.append(f"# {meta['title']}")  # reference :55-57
                for i, fname in enumerate(sheet_files):
                    root = ET.fromstring(zf.read(fname))
                    rows_out = []
                    for row in root.iter(f"{S}row"):
                        if len(rows_out) >= MAX_ROWS_PER_SHEET:
                            break
                        cells: dict[int, str] = {}
                        # The r= cell reference is OPTIONAL (ECMA-376):
                        # producers may omit it, in which case cells are
                        # positional — mapping them all to column 0 would
                        # keep only the last cell of each row.
                        pos = -1
                        for c in row.iter(f"{S}c"):
                            ref = c.get("r", "")
                            pos = _col_index(ref) if ref else pos + 1
                            col = pos
                            v = c.find(f"{S}v")
                            if v is None or v.text is None:
                                txt = "".join(t.text or ""
                                              for t in c.iter(f"{S}t"))
                            elif c.get("t") == "s":
                                txt = shared[int(v.text)] if int(v.text) < len(shared) else ""
                            else:
                                txt = v.text
                            cells[col] = txt
                        if cells:
                            width = max(cells) + 1
                            rows_out.append([cells.get(j, "")
                                             for j in range(width)])
                    if not rows_out:
                        continue
                    width = max(len(r) for r in rows_out)
                    rows_out = [r + [""] * (width - len(r)) for r in rows_out]
                    name = names[i] if i < len(names) else f"Sheet{i+1}"
                    table = ["| " + " | ".join(rows_out[0]) + " |",
                             "| " + " | ".join("---" for _ in range(width)) + " |"]
                    table += ["| " + " | ".join(r) + " |" for r in rows_out[1:]]
                    sections.append(f"## {name}\n\n" + "\n".join(table))
            return ParserResult(content="\n\n".join(sections), metadata=meta)
        except Exception as e:
            return ParserResult.failure(f"Failed to parse XLSX: {e}")

    @staticmethod
    def _parse_xls(file_path: Path) -> ParserResult:
        """Legacy BIFF workbook via the from-scratch OLE2/BIFF reader
        (xls_biff.py; reference parses .xls through xlrd,
        xlsx_parser.py:226)."""
        from voitta_rag_tpu.services.parsers.xls_biff import parse_xls

        try:
            sheets = parse_xls(file_path.read_bytes())
        except Exception as e:
            return ParserResult.failure(f"Failed to parse XLS: {e}")
        sections = []
        for name, rows in sheets:
            rows = rows[:MAX_ROWS_PER_SHEET]
            if not rows:
                continue
            width = max(len(r) for r in rows)
            rows = [r + [""] * (width - len(r)) for r in rows]
            table = ["| " + " | ".join(rows[0]) + " |",
                     "| " + " | ".join("---" for _ in range(width)) + " |"]
            table += ["| " + " | ".join(r) + " |" for r in rows[1:]]
            sections.append(f"## {name}\n\n" + "\n".join(table))
        if not sections:
            return ParserResult.failure("XLS contains no extractable cells")
        return ParserResult(content="\n\n".join(sections), metadata={})
