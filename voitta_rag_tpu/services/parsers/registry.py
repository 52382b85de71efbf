"""Extension-dispatched parser registry (reference registry.py:18-85)."""

from __future__ import annotations

from pathlib import Path

from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult
from voitta_rag_tpu.services.parsers.azw3_parser import Azw3Parser
from voitta_rag_tpu.services.parsers.epub_parser import EpubParser
from voitta_rag_tpu.services.parsers.gdoc_parser import GdocParser
from voitta_rag_tpu.services.parsers.odf_parser import OdpParser, OdsParser, OdtParser
from voitta_rag_tpu.services.parsers.office_parser import (
    DocxParser, PptxParser, XlsxParser,
)
from voitta_rag_tpu.services.parsers.pdf_parser import PdfParser
from voitta_rag_tpu.services.parsers.text_parser import TextParser
from voitta_rag_tpu.services.parsers.vtt_parser import VttParser


class ParserRegistry:
    def __init__(self) -> None:
        self._extension_map: dict[str, BaseParser] = {}

    def register(self, parser: BaseParser) -> None:
        for ext in parser.extensions:
            self._extension_map[ext.lower()] = parser

    def get_parser(self, file_path: Path | str) -> BaseParser | None:
        return self._extension_map.get(Path(file_path).suffix.lower())

    def can_parse(self, file_path: Path | str) -> bool:
        return self.get_parser(file_path) is not None

    def parse_file(self, file_path: Path | str) -> ParserResult:
        path = Path(file_path)
        parser = self.get_parser(path)
        if parser is None:
            return ParserResult.failure(
                f"No parser for extension '{path.suffix}'")
        return parser.parse(path)

    def supported_extensions(self) -> list[str]:
        return list(self._extension_map.keys())


_default_registry: ParserRegistry | None = None


def get_registry() -> ParserRegistry:
    global _default_registry
    if _default_registry is None:
        _default_registry = ParserRegistry()
        _default_registry.register(Azw3Parser())
        _default_registry.register(DocxParser())
        _default_registry.register(EpubParser())
        _default_registry.register(GdocParser())
        _default_registry.register(PdfParser())
        _default_registry.register(PptxParser())
        _default_registry.register(TextParser())
        _default_registry.register(XlsxParser())
        _default_registry.register(OdpParser())
        _default_registry.register(OdtParser())
        _default_registry.register(OdsParser())
        _default_registry.register(VttParser())
    return _default_registry


def get_parser(file_path: Path | str) -> BaseParser | None:
    return get_registry().get_parser(file_path)
