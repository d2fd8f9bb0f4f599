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
    rb"|\[(?P<arr>(?:[^\]\\]|\\.|<[0-9A-Fa-f\s]*>)*)\]\s*TJ"  # [(a) -1 <0041>] TJ
    rb"|/(?P<font>[A-Za-z0-9]+)\s+[-0-9.]+\s+Tf"  # font switch
)
_ARR_ITEM = re.compile(
    rb"\((?P<lit>(?:[^()\\]|\\.)*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>"
)

# ---- /ToUnicode CMap support (CID-keyed PDFs, e.g. Chrome/Skia) -----------

_BFCHAR = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_PAIR = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEX_TRIPLE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_OBJ = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_TOUNI_REF = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_FONT_RES = re.compile(rb"/(F[A-Za-z0-9]*)\s+(\d+)\s+\d+\s+R")


def _u16s_to_str(hx: bytes) -> str:
    """UTF-16BE code units from a hex string (surrogates supported)."""
    raw = bytes.fromhex(hx.decode("ascii"))
    return raw.decode("utf-16-be", errors="ignore")


def _parse_cmap(stream: bytes) -> dict[int, str]:
    cmap: dict[int, str] = {}
    for block in _BFCHAR.findall(stream):
        for src, dst in _HEX_PAIR.findall(block):
            cmap[int(src, 16)] = _u16s_to_str(dst)
    for block in _BFRANGE.findall(stream):
        for lo, hi, dst in _HEX_TRIPLE.findall(block):
            start = int(dst, 16)
            for off in range(int(hi, 16) - int(lo, 16) + 1):
                cmap[int(lo, 16) + off] = chr(start + off)
    return cmap


def _inflate(content: bytes) -> bytes:
    try:
        return zlib.decompress(content)
    except zlib.error:
        return content


def _expand_object_streams(objects: dict[int, bytes]) -> None:
    """Inline the contents of /Type /ObjStm containers (PDF 1.5+
    cross-reference-stream files keep most dictionaries inside
    compressed object streams): header is `num offset` pairs, bodies
    start at /First."""
    for body in list(objects.values()):
        if b"/ObjStm" not in body:
            continue
        n_m = re.search(rb"/N\s+(\d+)", body)
        first_m = re.search(rb"/First\s+(\d+)", body)
        sm = re.search(rb"stream\r?\n(.*?)endstream", body, re.DOTALL)
        if not (n_m and first_m and sm):
            continue
        payload = _inflate(sm.group(1))
        first = int(first_m.group(1))
        header = payload[:first].split()
        nums = [int(x) for x in header[0::2]]
        offs = [int(x) for x in header[1::2]]
        for i, (num, off) in enumerate(zip(nums, offs)):
            end = first + offs[i + 1] if i + 1 < len(offs) else len(payload)
            objects.setdefault(num, payload[first + off : end])


def _font_cmaps(data: bytes) -> dict[bytes, dict[int, str]]:
    """Resource font name (e.g. b'F0') → glyph→unicode map, built from
    the object graph: /Font resources → font objects → /ToUnicode
    streams. Best-effort: unresolvable pieces are skipped."""
    objects: dict[int, bytes] = {int(n): body for n, body in _OBJ.findall(data)}
    _expand_object_streams(objects)
    # object holding each ToUnicode CMap
    cmap_by_obj: dict[int, dict[int, str]] = {}
    font_to_cmap_obj: dict[int, int] = {}
    for num, body in objects.items():
        m = _TOUNI_REF.search(body)
        if m:
            font_to_cmap_obj[num] = int(m.group(1))
    for cmap_obj in set(font_to_cmap_obj.values()):
        body = objects.get(cmap_obj, b"")
        sm = re.search(rb"stream\r?\n(.*?)endstream", body, re.DOTALL)
        if sm:
            cmap_by_obj[cmap_obj] = _parse_cmap(_inflate(sm.group(1)))
    # resource name → font object (resource dicts may themselves live
    # inside object streams, so scan the expanded object bodies)
    out: dict[bytes, dict[int, str]] = {}
    for body in objects.values():
        for name, font_obj in _FONT_RES.findall(body):
            cm_obj = font_to_cmap_obj.get(int(font_obj))
            if cm_obj is not None and cm_obj in cmap_by_obj:
                out[name] = cmap_by_obj[cm_obj]
    return out


def _decode_hex_string(hx: bytes, cmap: dict[int, str] | None) -> str:
    hx = re.sub(rb"\s", b"", hx)
    if len(hx) % 2:
        hx += b"0"
    raw = bytes.fromhex(hx.decode("ascii"))
    if cmap is not None:
        # 2-byte CID codes (Identity-H codespace)
        return "".join(
            cmap.get(int.from_bytes(raw[i : i + 2], "big"), "")
            for i in range(0, len(raw) - len(raw) % 2, 2)
        )
    return raw.decode("latin-1")


def pdf_bytes_to_text(data: bytes) -> str:
    """Minimal PDF text extraction (see module docstring): every
    content stream is inflated if needed and each show-text operator
    emits one line, in stream order. Hex show-strings are decoded
    through the current font's /ToUnicode CMap when one exists
    (CID-keyed PDFs from browser/Skia generators)."""
    font_cmaps = _font_cmaps(data)
    default_cmap = (
        next(iter(font_cmaps.values())) if len(font_cmaps) == 1 else None
    )
    lines: list[str] = []
    for m in re.finditer(rb"stream\r?\n(.*?)endstream", data, re.DOTALL):
        content = _inflate(m.group(1))
        if b"BT" not in content or b"beginbfchar" in content:
            continue
        cmap = default_cmap
        for sm in _SHOW_TEXT.finditer(content):
            if sm.group("font") is not None:
                cmap = font_cmaps.get(sm.group("font"), default_cmap)
            elif sm.group("lit") is not None:
                lines.append(_unescape_pdf_string(sm.group("lit")))
            elif sm.group("hex") is not None:
                lines.append(_decode_hex_string(sm.group("hex"), cmap))
            else:
                parts = []
                for im in _ARR_ITEM.finditer(sm.group("arr")):
                    if im.group("lit") is not None:
                        parts.append(_unescape_pdf_string(im.group("lit")))
                    elif im.group("hex"):
                        parts.append(_decode_hex_string(im.group("hex"), cmap))
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
        if filename.lower().endswith((".html", ".htm")):
            from .html import html_bytes_to_text

            return html_bytes_to_text(data)
    except Exception:
        return ""
    return ""
