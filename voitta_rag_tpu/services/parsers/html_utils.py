"""Minimal HTML → markdown-ish text conversion (bs4 when available, regex
fallback). Used by the EPUB/AZW3 parsers and the Confluence connector
(reference uses html2text, confluence.py:30-101)."""

from __future__ import annotations

import re


def html_to_markdown(html: str) -> str:
    try:
        from bs4 import BeautifulSoup
    except ImportError:
        return _regex_fallback(html)

    soup = BeautifulSoup(html, "html.parser")
    for tag in soup(["script", "style", "head"]):
        tag.decompose()
    # Inline formatting markers (html2text conventions the reference emits).
    for tag in soup.find_all(["b", "strong"]):
        tag.replace_with(f"**{tag.get_text(strip=True)}**")
    for tag in soup.find_all(["i", "em"]):
        tag.replace_with(f"*{tag.get_text(strip=True)}*")
    for tag in soup.find_all("code"):
        if tag.parent and tag.parent.name == "pre":
            continue
        tag.replace_with(f"`{tag.get_text(strip=True)}`")
    for tag in soup.find_all("a"):
        href = tag.get("href")
        text = tag.get_text(" ", strip=True)
        tag.replace_with(f"[{text}]({href})" if href else text)
    lines: list[str] = []

    def walk(el):
        name = getattr(el, "name", None)
        if name is None:
            return
        if name and re.fullmatch(r"h[1-6]", name):
            text = el.get_text(" ", strip=True)
            if text:
                lines.append("#" * int(name[1]) + " " + text)
            return
        if name in ("p", "li", "blockquote", "td", "th", "pre", "div"):
            text = el.get_text(" ", strip=True)
            if text and not el.find(["p", "li", "div", "h1", "h2", "h3",
                                     "h4", "h5", "h6"]):
                prefix = "- " if name == "li" else ""
                lines.append(prefix + text)
                return
        for child in getattr(el, "children", []):
            walk(child)

    walk(soup)
    if not lines:
        text = soup.get_text("\n", strip=True)
        return text
    return "\n\n".join(lines)


def _regex_fallback(html: str) -> str:
    html = re.sub(r"(?is)<(script|style).*?</\1>", " ", html)
    html = re.sub(r"(?i)</(p|div|h[1-6]|li|tr)>", "\n\n", html)
    html = re.sub(r"(?i)<br\s*/?>", "\n", html)
    text = re.sub(r"<[^>]+>", " ", html)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()
