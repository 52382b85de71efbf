"""Parser base types (behavior contract: reference services/parsers/base.py:8-30
— every parser returns ``ParserResult(content=<markdown>, metadata, success,
error)`` and declares its extensions)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class ParserResult:
    content: str  # Markdown content
    metadata: dict = field(default_factory=dict)
    success: bool = True
    error: str | None = None

    @classmethod
    def failure(cls, error: str) -> "ParserResult":
        return cls(content="", success=False, error=error)


class BaseParser(ABC):
    extensions: list[str] = []

    @abstractmethod
    def parse(self, file_path: Path) -> ParserResult:
        ...
