"""Minimal dependency-free xlsx reader (stdlib zipfile + ElementTree).

The runtime image has no openpyxl, and xlsx ingest in this engine is a
driver-side shim for dimension-sized files only (SURVEY.md S3/S4 -- the
reference reads a 57-row unemployment sheet, DAG1:24). XLSX is a zip of
XML (ECMA-376 / ISO 29500 SpreadsheetML, public spec); this reads the
subset needed: shared strings, inline strings, numeric cells.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(letters: str) -> int:
    """'A' -> 0, 'B' -> 1, ..., 'AA' -> 26."""
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(cell: ET.Element, shared: list[str]) -> str | None:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        t = cell.find("m:is/m:t", _NS)
        return t.text if t is not None else None
    v = cell.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    return v.text


def read_xlsx_grid(path: str, sheet_index: int = 0) -> list[list[str | None]]:
    """Return the sheet as a dense row-major grid of strings/None."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")))
        sheets = sorted(
            n for n in zf.namelist()
            if re.match(r"xl/worksheets/sheet\d+\.xml$", n)
        )
        root = ET.fromstring(zf.read(sheets[sheet_index]))

    rows: dict[int, dict[int, str | None]] = {}
    max_col = -1
    for row_el in root.findall("m:sheetData/m:row", _NS):
        for cell in row_el.findall("m:c", _NS):
            m = _CELL_REF.match(cell.get("r", ""))
            if not m:
                continue
            col, rix = _col_index(m.group(1)), int(m.group(2)) - 1
            val = _cell_value(cell, shared)
            if val is not None:
                rows.setdefault(rix, {})[col] = val
                max_col = max(max_col, col)
    if not rows:
        return []
    n_rows = max(rows) + 1
    return [
        [rows.get(r, {}).get(c) for c in range(max_col + 1)]
        for r in range(n_rows)
    ]
