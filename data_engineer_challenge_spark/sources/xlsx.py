"""Pure-stdlib XLSX reader for the patient registry
(SURVEY.md §2.1 S1; reference exo_1.py:17-38).

No openpyxl in the container; an .xlsx is a zip of XML. The registry
is a small dimension file (4.8 k rows), so it is read driver-side and
parallelized via ``spark.createDataFrame`` — at cluster scale the
registry would land as parquet and take the normal scan path.

Every cell is surfaced as a string: the reference forces
``HOSPITAL_PATIENT_ID`` to str to keep leading zeros (exo_1.py:30) and
the real export stores even dates as text (SURVEY §1.2).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall(f"{_MAIN}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_MAIN}t")))
    return out


def _sheet_target(zf: zipfile.ZipFile, sheet_name: str | None) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_map = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall(f"{_PKG_REL}Relationship")
    }
    for sheet in wb.iter(f"{_MAIN}sheet"):
        if sheet_name is None or sheet.get("name") == sheet_name:
            target = rel_map[sheet.get(f"{_REL}id")]
            # three legal Target forms: absolute ('/xl/worksheets/…',
            # strip the slash), already-qualified ('xl/…'), or
            # rels-relative ('worksheets/…', resolve under xl/)
            if target.startswith("/"):
                return target.lstrip("/")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise KeyError(f"sheet {sheet_name!r} not found")


def _col_index(cell_ref: str) -> int:
    letters = re.match(r"[A-Z]+", cell_ref).group()
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def read_xlsx_rows(path: str, sheet_name: str | None = None) -> list[list[str | None]]:
    """All rows of one sheet as lists of strings (None for empty)."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        sheet_xml = ET.fromstring(zf.read(_sheet_target(zf, sheet_name)))
        rows: list[list[str | None]] = []
        for row in sheet_xml.iter(f"{_MAIN}row"):
            cells: list[str | None] = []
            for c in row.findall(f"{_MAIN}c"):
                # the 'r' attribute is optional: a cell without it
                # occupies the NEXT column, not A — defaulting to 'A1'
                # would silently shift values into the wrong schema
                # columns after any explicitly-referenced cell
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(cells)
                while len(cells) < idx:
                    cells.append(None)
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_MAIN}is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(f"{_MAIN}t"))
                        if is_el is not None
                        else None
                    )
                else:
                    v = c.find(f"{_MAIN}v")
                    val = None if v is None or v.text is None else v.text
                    if ctype == "s" and val is not None:
                        val = shared[int(val)]
                cells.append(val if val != "" else None)
            rows.append(cells)
        return rows


def read_patient_registry(
    spark: SparkSession,
    path: str,
    sheet_name: str | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Header-row-keyed read → DataFrame with declared string schema
    plus ``__row_idx`` (source file order — the keep-first dedup and
    dense-ID operators need an explicit total order, SURVEY §4.3)."""
    from ..schemas import PATIENT_EXPORT

    schema = schema or PATIENT_EXPORT
    rows = read_xlsx_rows(path, sheet_name)
    if not rows:
        raise ValueError(f"empty sheet in {path}")
    header = [h or "" for h in rows[0]]
    col_pos = {name: header.index(name) for name in schema.fieldNames() if name in header}
    missing = set(schema.fieldNames()) - set(col_pos)
    if missing:
        raise ValueError(f"missing columns in {path}: {sorted(missing)}")

    def cell(row: list, name: str) -> str | None:
        pos = col_pos[name]
        return row[pos] if pos < len(row) else None

    data = [
        tuple(cell(row, name) for name in schema.fieldNames()) + (i,)
        for i, row in enumerate(rows[1:])
    ]
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField("__row_idx", T.LongType(), False)]
    )
    return spark.createDataFrame(data, full_schema)
