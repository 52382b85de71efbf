"""WebVTT transcript parser (Teams meetings).

Contract (reference vtt_parser.py:9-76): strip WEBVTT headers / NOTE blocks /
cue ids / timestamp lines, extract ``<v Speaker>`` turns, merge consecutive
turns of the same speaker, render as ``**Speaker:** text`` markdown.
"""

from __future__ import annotations

import re
from pathlib import Path

from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult

_TIMESTAMP_RE = re.compile(
    r"^\d{2}:\d{2}:\d{2}\.\d{3}\s*-->\s*\d{2}:\d{2}:\d{2}\.\d{3}")
_SPEAKER_RE = re.compile(r"<v\s+([^>]+)>")
_VTAG_RE = re.compile(r"</?v[^>]*>")


class VttParser(BaseParser):
    extensions = [".vtt"]

    def parse(self, file_path: Path) -> ParserResult:
        try:
            try:
                text = file_path.read_text(encoding="utf-8")
            except UnicodeDecodeError:
                text = file_path.read_text(encoding="utf-8-sig")
        except Exception as e:
            return ParserResult.failure(f"Failed to read VTT file: {e}")

        segments: list[tuple[str, str]] = []
        for line in text.splitlines():
            line = line.strip()
            if (not line or line.startswith("WEBVTT")
                    or line.startswith("NOTE") or line.isdigit()
                    or _TIMESTAMP_RE.match(line)):
                continue
            match = _SPEAKER_RE.search(line)
            speaker = match.group(1).strip() if match else ""
            spoken = _VTAG_RE.sub("", line).strip()
            if not spoken:
                continue
            if segments and segments[-1][0] == speaker:
                segments[-1] = (speaker, segments[-1][1] + " " + spoken)
            else:
                segments.append((speaker, spoken))

        parts = [f"**{sp}:** {tx}" if sp else tx for sp, tx in segments]
        return ParserResult(content="\n\n".join(parts))
