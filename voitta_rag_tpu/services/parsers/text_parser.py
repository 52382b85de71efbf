"""Plain text / source code parser (reference text_parser.py:11-133:
~100 extensions, read as-is with latin-1 fallback)."""

from __future__ import annotations

from pathlib import Path

from voitta_rag_tpu.services.parsers.base import BaseParser, ParserResult

TEXT_EXTENSIONS = [
    # Plain text and documentation
    ".txt", ".md", ".mdx", ".j2", ".jinja", ".rst", ".adoc",
    # Python
    ".py", ".pyw", ".pyi",
    # JavaScript / TypeScript
    ".js", ".jsx", ".ts", ".tsx", ".mjs", ".cjs",
    # Web
    ".html", ".htm", ".css", ".scss", ".sass", ".less", ".vue", ".svelte",
    # Data / Config
    ".json", ".yaml", ".yml", ".toml", ".xml", ".ini", ".cfg", ".conf", ".env",
    # Java / JVM
    ".java", ".kt", ".kts", ".scala", ".groovy", ".clj", ".cljs",
    # C / C++
    ".c", ".h", ".cpp", ".hpp", ".cc", ".cxx", ".hxx",
    # C# / .NET
    ".cs", ".fs", ".fsx",
    # Systems
    ".go", ".rs", ".swift", ".m", ".mm",
    # Scripting
    ".rb", ".php", ".pl", ".pm", ".lua", ".r", ".jl",
    # Shell
    ".sh", ".bash", ".zsh", ".fish", ".ps1", ".bat", ".cmd",
    # Functional
    ".hs", ".ml", ".mli", ".ex", ".exs", ".erl", ".elm", ".rkt", ".scm",
    ".lisp",
    # Other
    ".sql", ".graphql", ".gql", ".proto", ".dart", ".nim", ".zig", ".v",
    ".sol",
    # Build / DevOps
    ".cmake", ".gradle", ".dockerfile", ".tf", ".hcl",
]


class TextParser(BaseParser):
    extensions = TEXT_EXTENSIONS

    def parse(self, file_path: Path) -> ParserResult:
        try:
            try:
                content = file_path.read_text(encoding="utf-8")
            except UnicodeDecodeError:
                content = file_path.read_text(encoding="latin-1")
            return ParserResult(content=content)
        except Exception as e:
            return ParserResult.failure(f"Failed to read text file: {e}")
