"""EPUB parser (stdlib zipfile + html extraction; reference epub_parser.py
shells out to pandoc — EPUB is ZIP of XHTML, parsed here standalone)."""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from pathlib import Path

from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult
from voitta_rag_tpu.services.parsers.html_utils import html_to_markdown

OPF = "{http://www.idpf.org/2007/opf}"
CONT = "{urn:oasis:names:tc:opendocument:xmlns:container}"


class EpubParser(BaseParser):
    extensions = [".epub"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            with zipfile.ZipFile(file_path) as zf:
                # Spine order from the OPF package file.
                container = ET.fromstring(zf.read("META-INF/container.xml"))
                rootfile = container.find(
                    f"{CONT}rootfiles/{CONT}rootfile").get("full-path")
                opf = ET.fromstring(zf.read(rootfile))
                base = rootfile.rsplit("/", 1)[0] + "/" if "/" in rootfile else ""
                manifest = {
                    item.get("id"): item.get("href")
                    for item in opf.iter(f"{OPF}item")
                }
                spine = [manifest.get(ref.get("idref"))
                         for ref in opf.iter(f"{OPF}itemref")]
                parts = []
                for href in spine:
                    if not href:
                        continue
                    name = base + href
                    if name not in zf.namelist():
                        continue
                    html = zf.read(name).decode("utf-8", errors="replace")
                    text = html_to_markdown(html)
                    if text.strip():
                        parts.append(text.strip())
                meta = {}
                title = opf.find(".//{http://purl.org/dc/elements/1.1/}title")
                if title is not None and title.text:
                    meta["title"] = title.text
            return ParserResult(content="\n\n".join(parts), metadata=meta)
        except Exception as e:
            return ParserResult.failure(f"Failed to parse EPUB: {e}")
