"""Minimal XLSX reader/writer — stdlib only (zipfile + xml.etree).

The reference's cookbook ships excel_import/excel_export
(site_docs/cookbook/file_formats/excel_{import,export}.test) through a
DuckDB extension. No spreadsheet library exists in this environment, so
this implements the PUBLISHED OOXML SpreadsheetML subset directly: an
.xlsx is a zip of XML parts — workbook.xml (sheet list), sheet1.xml
(rows of cells; `t="s"` cells index sharedStrings.xml, `t="inlineStr"`
carries text inline, bare cells are numbers), plus the two relationship
files and [Content_Types].xml that make the package valid.

Scope (honest): one sheet, header row + scalar cells (strings/numbers/
NULL), no styles/formulas/dates — the cookbook recipes' surface. The
writer emits inline strings (no sharedStrings table needed); the reader
handles both inline and shared strings so files from real producers
(Excel, openpyxl, DuckDB's exporter) round-trip for this subset.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def write_xlsx(path: str, header: list[str], rows: list) -> None:
    """One-sheet .xlsx with a header row; strings inline, numbers bare,
    None skipped (Excel's empty cell)."""
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']

    def cell(r: int, c: int, v) -> str:
        ref = f"{_col_letter(c)}{r + 1}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{_esc(str(v))}</t></is></c>")

    for r, row in enumerate([header, *rows]):
        parts.append(f'<row r="{r + 1}">'
                     + "".join(cell(r, c, v) for c, v in enumerate(row))
                     + "</row>")
    parts.append("</sheetData></worksheet>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK.format(name="Sheet1"))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", "".join(parts))


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """(header, rows) from the first sheet. Cells come back as str or
    float (int-valued floats collapse to int); missing cells are None."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_NS}t")))
        sheet = next(n for n in z.namelist()
                     if re.fullmatch(r"xl/worksheets/sheet1?\.xml", n))
        root = ET.fromstring(z.read(sheet))

    grid: list[dict[int, object]] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r", "A1")
            col = 0
            for ch in ref:
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
                else:
                    break
            col -= 1
            t = c.get("t", "n")
            if t == "inlineStr":
                val = "".join(e.text or "" for e in c.iter(f"{_NS}t"))
            else:
                v = c.find(f"{_NS}v")
                if v is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "b":
                    val = v.text == "1"
                elif t == "str":
                    val = v.text
                else:
                    f = float(v.text)
                    val = int(f) if f.is_integer() else f
            cells[col] = val
        grid.append(cells)
    if not grid:
        return [], []
    width = max(max(c.keys(), default=-1) for c in grid) + 1
    header = [str(grid[0].get(i, f"col{i}")) for i in range(width)]
    rows = [[r.get(i) for i in range(width)] for r in grid[1:]]
    return header, rows
