"""Unit tests for the pure-stdlib extractors: PDF string escapes / hex
strings / compressed streams, DOCX structure ordering, xlsx
sharedStrings + sparse rows."""

from __future__ import annotations

import io
import zipfile
import zlib

from data_engineer_challenge_spark.sources.extractors import (
    docx_bytes_to_text,
    extract_text,
    pdf_bytes_to_text,
)
from data_engineer_challenge_spark.sources.xlsx import read_xlsx_rows

from .fixtures import build_docx, build_pdf


def test_pdf_escapes_and_hex():
    raw = (
        b"1 0 obj\nstream\nBT "
        b"(paren \\( close \\) back \\\\ octal \\101) Tj "
        b"<48656C6C6F> Tj "
        b"[(seg one) -120 (seg two)] TJ "
        b"ET\nendstream\n"
    )
    text = pdf_bytes_to_text(raw)
    lines = text.splitlines()
    assert lines[0] == "paren ( close ) back \\ octal A"
    assert lines[1] == "Hello"
    assert lines[2] == "seg oneseg two"


def test_pdf_flate_compressed_stream():
    content = b"BT (compressed line) Tj ET"
    comp = zlib.compress(content)
    raw = b"stream\n" + comp + b"endstream"
    assert pdf_bytes_to_text(raw) == "compressed line\n"


def test_pdf_garbage_is_empty():
    assert extract_text("x_1.pdf", b"not a pdf") == ""
    assert extract_text("x_1.docx", b"not a zip") == ""
    assert extract_text("x_1.txt", b"whatever") == ""


def test_docx_segment_order_and_dedup():
    data = build_docx(
        paragraphs=["body para", ""],
        table_cells=[["r1c1", "r1c2"], ["r2c1", "r2c2"]],
        textbox_runs=["tb first", "tb second"],
    )
    text = docx_bytes_to_text(data)
    lines = text.split("\n")
    # textboxes first (deduped once despite Choice/Fallback double),
    # then table cells row-major, then body paragraphs incl. empty
    assert lines[0] == "tb first"
    assert lines[1] == "tb second"
    assert lines[2:6] == ["r1c1", "r1c2", "r2c1", "r2c2"]
    # the textbox's wrapper body paragraph has no direct runs → empty
    # line (python-docx doc.paragraphs includes it, reference appends
    # unconditionally), then the real paragraphs incl. the empty one
    assert lines[6:] == ["", "body para", ""]
    assert text.count("tb first") == 1


def test_docx_table_only():
    data = build_docx(table_cells=[["only cell"]])
    assert docx_bytes_to_text(data) == "only cell"


def test_pdf_builder_roundtrip_matches_lines():
    pdf = build_pdf(["line a", "line (b)", "line \\c"])
    assert pdf_bytes_to_text(pdf).splitlines() == ["line a", "line (b)", "line \\c"]


def _xlsx_with_shared_strings() -> bytes:
    shared = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
        "<si><t>NOM</t></si><si><t>Durand</t></si><si><r><t>Mar</t></r><r><t>tin</t></r></si></sst>"
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
        # sparse row: B only (A missing), numeric cell
        '<row r="3"><c r="B3"><v>42</v></c></row>'
        '<row r="4"><c r="A4" t="s"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def test_xlsx_shared_strings_and_sparse_rows(tmp_path):
    p = tmp_path / "s.xlsx"
    p.write_bytes(_xlsx_with_shared_strings())
    rows = read_xlsx_rows(str(p))
    assert rows[0] == ["NOM"]
    assert rows[1] == ["Durand"]
    assert rows[2] == [None, "42"]  # sparse: A empty, B numeric-as-text
    assert rows[3] == ["Martin"]  # multi-run shared string concatenated


def _xlsx_edge_cases() -> bytes:
    """Absolute rels Target + a cell that legally omits its 'r'
    attribute (meaning 'the next column')."""
    import io
    import zipfile

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        # explicit C1, then an r-less cell = column D, not A
        '<row r="1"><c r="C1" t="inlineStr"><is><t>cee</t></is></c>'
        '<c t="inlineStr"><is><t>dee</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="/xl/worksheets/sheet1.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def test_xlsx_absolute_target_and_missing_cell_ref(tmp_path):
    """Some producers emit absolute rels Targets ('/xl/...') and omit
    the optional cell 'r' attribute; both must parse — the r-less cell
    lands in the NEXT column, not column A."""
    p = tmp_path / "edge.xlsx"
    p.write_bytes(_xlsx_edge_cases())
    rows = read_xlsx_rows(str(p))
    assert rows[0] == [None, None, "cee", "dee"]
