"""Minimal pure-stdlib xlsx support (SURVEY.md S3, ref main.py:98
``pd.read_excel(..., sheet_name='Paid order list')``).

An .xlsx file is a zip of XML parts. This module reads the subset a
POS export actually uses — shared strings, inline strings, numeric
and boolean cells, ragged rows and cell gaps — with nothing beyond
``zipfile`` + ``xml.etree``, so ingestion works in environments
without openpyxl. A matching minimal writer exists for building real
.xlsx fixtures in tests.

Deliberate limits (documented, not silent): formulas yield their
cached value; date cells styled as dates surface as Excel serial
numbers (the POS export stores payment time as text, so the kernel
path is unaffected); charts/merged-cell metadata are ignored.

Scale note: xlsx is a driver-side landing-shim format — files are
converted one-at-a-time to CSV in the landing dir, and Spark's
distributed CSV source takes over from there (the same contract as
the reference's Drive → pandas hop, minus pandas). Multi-GB exports
should land as CSV/parquet directly.
"""

from __future__ import annotations

import csv
import os
import zipfile
from xml.etree import ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB7' → 27 (letters only; row digits ignored)."""
    idx = 0
    for ch in cell_ref:
        if ch.isdigit():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _text_of(elem) -> str:
    """Concatenated text of all <t> descendants (rich-text runs)."""
    return "".join(t.text or "" for t in elem.iter(f"{{{_NS['m']}}}t"))


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find("m:is", _NS)
        return _text_of(is_el) if is_el is not None else None
    v = c.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":  # formula cached string
        return v.text
    if t == "b":
        return v.text == "1"
    # numeric: preserve integers exactly (Excel stores all numbers as
    # doubles; '2' must round-trip as '2', not '2.0', for the kernel's
    # qty parse)
    num = float(v.text)
    return int(num) if num == int(num) else num


def read_xlsx_rows(path: str, sheet_name: str | None = None) -> list[list]:
    """Read one sheet of an .xlsx as a list of rows (ragged rows are
    padded with None to the sheet's max width; cell gaps are None).

    ``sheet_name=None`` reads the first sheet. Raises KeyError if the
    named sheet does not exist.
    """
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.findall("r:Relationship", _REL_NS)
        }
        target = None
        names = []
        for sheet in wb.iter(f"{{{_NS['m']}}}sheet"):
            names.append(sheet.get("name"))
            if sheet_name is None or sheet.get("name") == sheet_name:
                target = rel_target[sheet.get(_RID)]
                break
        if target is None:
            raise KeyError(f"sheet {sheet_name!r} not found (have {names})")
        part = target.lstrip("/")
        if not part.startswith("xl/"):
            part = "xl/" + part

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_text_of(si) for si in ss.findall("m:si", _NS)]

        rows: list[list] = []
        for row_el in ET.fromstring(z.read(part)).iter(f"{{{_NS['m']}}}row"):
            row: list = []
            for c in row_el.findall("m:c", _NS):
                ref = c.get("r")
                if ref:  # honor gaps: place by column index
                    idx = _col_index(ref)
                    row.extend([None] * (idx - len(row)))
                row.append(_cell_value(c, shared))
            rows.append(row)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def xlsx_sheet_to_csv(xlsx_path: str, csv_path: str, sheet_name: str | None = None) -> str:
    """Convert one sheet to a CSV file (header = first row), the
    landing-dir format Spark's distributed reader consumes."""
    rows = read_xlsx_rows(xlsx_path, sheet_name)
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        for row in rows:
            w.writerow(["" if v is None else v for v in row])
    return csv_path


# --------------------------------------------------------------------------
# Minimal writer — for building REAL .xlsx fixtures in tests/examples.
# --------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _ref(row_i: int, col_i: int) -> str:
    letters = ""
    col = col_i + 1
    while col:
        col, rem = divmod(col - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return f"{letters}{row_i + 1}"


def write_minimal_xlsx(path: str, sheet_name: str, rows: list[list]) -> str:
    """Write a genuine single-sheet .xlsx (strings via sharedStrings,
    numbers as numeric cells, None as a cell gap)."""
    shared: dict[str, int] = {}
    cells_xml: list[str] = []
    for i, row in enumerate(rows):
        cs = []
        for j, v in enumerate(row):
            if v is None:
                continue  # real gap — reader must re-align by ref
            ref = _ref(i, j)
            if isinstance(v, bool):
                cs.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                cs.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                idx = shared.setdefault(str(v), len(shared))
                cs.append(f'<c r="{ref}" t="s"><v>{idx}</v></c>')
        cells_xml.append(f'<row r="{i + 1}">' + "".join(cs) + "</row>")
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(cells_xml) + "</sheetData></worksheet>"
    )
    ss_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t xml:space=\"preserve\">{_esc(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{_esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
        z.writestr("xl/sharedStrings.xml", ss_xml)
    return path
