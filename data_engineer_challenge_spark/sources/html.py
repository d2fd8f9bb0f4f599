"""Pure-stdlib HTML -> text extraction with boilerplate removal.

Web pages are the dominant raw format for LLM training corpora; the
pipeline shape is scan -> parse -> visible-text -> main-content
filter -> documents schema. This module supplies the bytes->text step
(same injection seam as the PDF/DOCX extractors, sources/extractors.py
— reference error contract exo_2.py:54-56: empty string on failure)
and a deterministic jusText/trafilatura-style main-content classifier.

Two tiers, deliberately separate pipeline stages:

- ``html_bytes_to_text``: ALL visible text (head/script/style/template
  dropped, entities decoded, block tags become newlines). This is
  *extraction* — lossless of visible content, the right input for
  dedup fingerprints (nav chrome dedups away across pages anyway).
- ``html_main_content``: boilerplate-stripped body text via per-block
  link-density + length classification (jusText's core heuristic,
  Pomikálek 2011, simplified to be dependency-free and deterministic).
  This is *cleaning* — the right input for quality scoring / training.

Both run inside the existing Arrow ``mapInPandas`` extraction boundary
(sources/binary_docs.extract_documents) — bytes cross the JVM->Python
boundary once per file, only the extracted string comes back.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

# elements whose subtree is never visible text
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "iframe"}
)
# elements that terminate/open a text block (visual line break)
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd", "table",
        "tr", "td", "th", "thead", "tbody", "section", "article",
        "header", "footer", "nav", "aside", "main", "blockquote",
        "pre", "figure", "figcaption", "form", "hr", "h1", "h2", "h3",
        "h4", "h5", "h6", "body", "html", "title", "option", "select",
    }
)
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "title"})
# void elements never pushed on the open-tag stack
_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link", "area"})

_WS_RE = re.compile(r"\s+")

_CHARSET_META = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I
)


def sniff_charset(data: bytes, default: str = "utf-8") -> str:
    """Charset from BOM or a ``<meta charset=...>`` in the first 2 KiB
    (the WHATWG prescan, abbreviated). Unknown names fall back to the
    default — decoding always uses errors='replace', so a wrong sniff
    degrades, never raises."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    m = _CHARSET_META.search(data[:2048])
    if m:
        name = m.group(1).decode("ascii", "replace").lower()
        try:
            b"x".decode(name)
        except (LookupError, UnicodeDecodeError):
            return default
        return name
    return default


@dataclass
class _Block:
    """One visual text block with the stats the classifier needs."""

    parts: list[str] = field(default_factory=list)
    link_chars: int = 0
    heading: bool = False

    @property
    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.parts)).strip()


class _BlockParser(HTMLParser):
    """Segment visible text into blocks at block-level tags, tracking
    per-block anchor-text chars (for link density) and heading-ness.

    Tolerant of real-world tag soup: skip-state is a depth counter per
    skip tag (unclosed <script> ends at EOF without poisoning state),
    stray end tags are ignored."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block()
        self._skip_depth: dict[str, int] = {}
        self._anchor_depth = 0
        self._heading_depth = 0

    def _flush(self) -> None:
        if self._cur.text:
            self.blocks.append(self._cur)
        self._cur = _Block()

    def handle_starttag(self, tag: str, attrs: list) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth[tag] = self._skip_depth.get(tag, 0) + 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _HEADING_TAGS:
                self._heading_depth += 1
                self._cur.heading = True
        if tag == "a":
            self._anchor_depth += 1

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip_depth.get(tag, 0) > 0:
                self._skip_depth[tag] -= 1
            return
        if tag in _BLOCK_TAGS and tag not in _VOID_TAGS:
            if tag in _HEADING_TAGS and self._heading_depth > 0:
                self._heading_depth -= 1
            self._flush()
        if tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1

    def handle_data(self, data: str) -> None:
        if any(self._skip_depth.values()):
            return
        self._cur.parts.append(data)
        if self._anchor_depth > 0:
            self._cur.link_chars += len(data.strip())
        if self._heading_depth > 0:
            self._cur.heading = True


def _parse_blocks(data: bytes) -> list[_Block]:
    text = data.decode(sniff_charset(data), errors="replace")
    p = _BlockParser()
    try:
        p.feed(text)
        p.close()
    except Exception:
        # HTMLParser is robust, but guarantee the error contract anyway
        return []
    p._flush()
    return p.blocks


def html_bytes_to_text(data: bytes) -> str:
    """All visible text, one line per block (extraction tier)."""
    try:
        blocks = _parse_blocks(data)
    except Exception:
        return ""
    lines = [b.text for b in blocks if b.text]
    return "\n".join(lines) + ("\n" if lines else "")


# classifier thresholds (jusText-lite). Chars, not words, so the rule
# is language-agnostic; values match jusText's defaults scaled to chars.
_GOOD_MIN_CHARS = 80
_GOOD_MAX_LINK_DENSITY = 0.4
_NEAR_MIN_CHARS = 20
_NEAR_MAX_LINK_DENSITY = 0.2


def classify_blocks(blocks: list[_Block]) -> list[bool]:
    """Two-pass jusText-lite: long low-link-density blocks are GOOD;
    headings and shortish low-link blocks are promoted when adjacent
    (within one block) to a GOOD one. Everything else — nav menus,
    footers, related-links lists — is boilerplate."""
    n = len(blocks)
    good = [False] * n
    near = [False] * n
    for i, b in enumerate(blocks):
        t = b.text
        if not t:
            continue
        density = b.link_chars / max(len(t), 1)
        if len(t) >= _GOOD_MIN_CHARS and density <= _GOOD_MAX_LINK_DENSITY:
            good[i] = True
        elif b.heading or (
            len(t) >= _NEAR_MIN_CHARS and density <= _NEAR_MAX_LINK_DENSITY
        ):
            near[i] = True
    keep = list(good)
    for i in range(n):
        if near[i] and (
            (i > 0 and good[i - 1]) or (i + 1 < n and good[i + 1])
        ):
            keep[i] = True
    return keep


def html_main_content(data: bytes) -> str:
    """Boilerplate-stripped main text (cleaning tier)."""
    try:
        blocks = _parse_blocks(data)
        keep = classify_blocks(blocks)
    except Exception:
        return ""
    lines = [b.text for b, k in zip(blocks, keep) if k and b.text]
    return "\n".join(lines) + ("\n" if lines else "")


class _LinkParser(HTMLParser):
    """Collect <a href> values in document order plus the first
    <base href> (which scopes relative resolution for the page)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.base: str | None = None
        self.links: list[str] = []

    def handle_starttag(self, tag: str, attrs: list) -> None:
        if tag == "base" and self.base is None:
            for k, v in attrs:
                if k == "href" and v:
                    self.base = v
                    break
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
                    break


#: schemes that never name a fetchable document
_NON_HTTP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "about:")


def html_links(data: bytes, base_url: str | None = None) -> list[str]:
    """Outgoing hyperlinks of a page, resolved absolute (stdlib
    ``urljoin`` against ``<base href>`` if present, else ``base_url``),
    in document order with exact duplicates dropped. Fragment-only
    self-links and non-fetchable schemes (javascript:, mailto:, ...)
    are skipped. This is the edge extractor for crawl link graphs —
    feed the result through functions/urls.normalize_url before
    building the graph."""
    from urllib.parse import urljoin

    try:
        text = data.decode(sniff_charset(data), errors="replace")
        p = _LinkParser()
        p.feed(text)
        p.close()
    except Exception:
        return []
    # a relative <base href> (legal per the HTML spec) resolves against
    # the document's own URL first, then scopes the links
    if p.base:
        try:
            root = urljoin(base_url or "", p.base)
        except ValueError:
            root = p.base
    else:
        root = base_url or ""
    out: list[str] = []
    seen: set[str] = set()
    for href in p.links:
        h = href.strip()
        if not h or h.startswith("#"):
            continue
        if any(h.lower().startswith(s) for s in _NON_HTTP_SCHEMES):
            continue
        try:
            absu = urljoin(root, h)
        except ValueError:
            continue
        if not absu.lower().startswith(("http://", "https://")):
            continue
        if absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out
