"""Pure-stdlib bytes→text extractors for clinical documents
(SURVEY.md §2.1 S3-S4; reference exo_2.py:38-133).

The container has no PyMuPDF / python-docx / lxml, so:

- DOCX: a .docx is a zip; ``word/document.xml`` is parsed with
  ``xml.etree``. Extraction order and dedup semantics mirror the
  reference exactly (exo_2.py:102-133): textboxes first (every
  ``w:txbxContent//w:p//w:t``, skipping exact-duplicate run texts via a
  seen-set — this collapses the mc:Choice/mc:Fallback double render),
  then body tables row-major, then body paragraphs (including empty
  ones, which the reference appends unconditionally).

- PDF: a minimal text extractor — FlateDecode via stdlib zlib, then
  Tj / TJ / ' / " show-text operators inside BT..ET blocks, one line
  per op. Handles the simple single-byte-encoded PDFs the test corpus
  generates; real-world CID/TrueType-subset PDFs need a real library,
  so the extractor is *pluggable*: pass any ``bytes -> str`` callable
  to sources.binary_docs.extract_documents.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile
import zlib

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _paragraph_text(p: ET.Element) -> str:
    """python-docx Paragraph.text equivalent: concat of run texts
    (direct w:t children of direct w:r children), tabs and breaks."""
    parts: list[str] = []
    for r in p.findall(f"{_W}r"):
        for child in r:
            if child.tag == f"{_W}t":
                parts.append(child.text or "")
            elif child.tag == f"{_W}tab":
                parts.append("\t")
            elif child.tag in (f"{_W}br", f"{_W}cr"):
                parts.append("\n")
    return "".join(parts)


def docx_bytes_to_text(data: bytes) -> str:
    """Reference-faithful DOCX extraction (see module docstring)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    segments: list[str] = []

    # 1) textboxes, global seen-set dedup of exact run texts
    tb_texts: list[str] = []
    seen: set[str] = set()
    for txbx in root.iter(f"{_W}txbxContent"):
        for p in txbx.iter(f"{_W}p"):
            for t in p.iter(f"{_W}t"):
                if t.text and t.text not in seen:
                    seen.add(t.text)
                    tb_texts.append(t.text)
    if tb_texts:
        segments.append("\n".join(tb_texts))

    body = root.find(f"{_W}body")
    if body is None:
        return "\n".join(segments)

    # 2) body-level tables, cells row-major; cell text = its paragraphs
    #    joined by newline, stripped, skipped when empty
    for tbl in body.findall(f"{_W}tbl"):
        for tr in tbl.findall(f"{_W}tr"):
            for tc in tr.findall(f"{_W}tc"):
                cell = "\n".join(_paragraph_text(p) for p in tc.findall(f"{_W}p"))
                if cell.strip():
                    segments.append(cell.strip())

    # 3) body-level paragraphs — appended even when empty (reference
    #    exo_2.py:127-128)
    for p in body.findall(f"{_W}p"):
        segments.append(_paragraph_text(p))

    return "\n".join(segments)


_PDF_STRING_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _PDF_STRING_ESCAPES:
                out += _PDF_STRING_ESCAPES[nxt]
                i += 2
                continue
            m = re.match(rb"[0-7]{1,3}", raw[i + 1 :])
            if m:
                out.append(int(m.group(), 8) & 0xFF)
                i += 1 + len(m.group())
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out += c
        i += 1
    return out.decode("latin-1")


_SHOW_TEXT = re.compile(
    rb"\((?P<lit>(?:[^()\\]|\\.)*)\)\s*(?:Tj|'|\")"  # (string) Tj
    rb"|<(?P<hex>[0-9A-Fa-f\s]+)>\s*Tj"  # <hex> Tj
    rb"|\[(?P<arr>(?:[^\]\\]|\\.)*)\]\s*TJ"  # [(a) -120 (b)] TJ
)
_ARR_ITEM = re.compile(rb"\((?P<lit>(?:[^()\\]|\\.)*)\)")


def pdf_bytes_to_text(data: bytes) -> str:
    """Minimal PDF text extraction (see module docstring): every
    content stream is inflated if needed and each show-text operator
    emits one line, in stream order."""
    lines: list[str] = []
    for m in re.finditer(rb"stream\r?\n(.*?)endstream", data, re.DOTALL):
        content = m.group(1)
        try:
            content = zlib.decompress(content)
        except zlib.error:
            pass  # already plain
        if b"BT" not in content:
            continue
        for sm in _SHOW_TEXT.finditer(content):
            if sm.group("lit") is not None:
                lines.append(_unescape_pdf_string(sm.group("lit")))
            elif sm.group("hex") is not None:
                hx = re.sub(rb"\s", b"", sm.group("hex"))
                if len(hx) % 2:
                    hx += b"0"
                lines.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
            else:
                parts = [
                    _unescape_pdf_string(im.group("lit"))
                    for im in _ARR_ITEM.finditer(sm.group("arr"))
                ]
                lines.append("".join(parts))
    return "\n".join(lines) + ("\n" if lines else "")


def extract_text(filename: str, data: bytes) -> str:
    """Dispatch on extension; empty string on failure (the reference's
    error contract, exo_2.py:54-56/131-133 — empty text rows are then
    filtered, P10)."""
    try:
        if filename.lower().endswith(".docx"):
            return docx_bytes_to_text(data)
        if filename.lower().endswith(".pdf"):
            return pdf_bytes_to_text(data)
    except Exception:
        return ""
    return ""
