from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult  # noqa: F401
from voitta_rag_tpu.services.parsers.registry import (  # noqa: F401
    ParserRegistry, get_parser, get_registry,
)
