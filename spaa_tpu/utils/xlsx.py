"""Dependency-free minimal .xlsx writer (and reader, for tests).

The reference's output contract includes ``stats.xlsx``, ``stats_all.xlsx``
and ``pivot_table_all.xlsx`` (ref ``projector_based_attack.py:573,611-612``
and the train/attack logs, ``utils.py:687-694``). This image ships no
pandas Excel engine (openpyxl/xlsxwriter), so pandas ``to_excel`` raises —
instead of silently dropping half the contract, this module writes the
files itself: an .xlsx is a zip archive of four small XML parts
(SpreadsheetML). One sheet, inline strings, numbers as numbers — exactly
what the stats tables need, readable by Excel/LibreOffice/pandas.

MultiIndex frames (the pivot table) are written with their index levels as
leading columns (pandas+openpyxl would emit merged cells instead — a
cosmetic difference; the cell values are identical).
"""

from __future__ import annotations

import re
import zipfile
from typing import Optional
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns='
    '"http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns='
    '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships"><sheets>'
    '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns='
    '"http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/></Relationships>'
)


def _col_letter(i: int) -> str:
    """0-based column index → A1-style letters."""
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def _cell_xml(ref: str, value) -> str:
    import math
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (math.isnan(value)
                                         or math.isinf(value)):
            # Excel has no numeric NaN/inf cells; write the string form
            return (f'<c r="{ref}" t="inlineStr"><is><t>{value}</t></is></c>')
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'


def write_xlsx(path: str, rows) -> None:
    """Write ``rows`` (iterable of iterables of str/int/float/bool/None)
    as a one-sheet .xlsx."""
    body = []
    for r, row in enumerate(rows, start=1):
        cells = "".join(_cell_xml(f"{_col_letter(c)}{r}", v)
                        for c, v in enumerate(row))
        body.append(f'<row r="{r}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _coerce(value, float_format: Optional[str]):
    import numpy as np
    if value is None:
        return None
    if isinstance(value, (np.floating, float)):
        v = float(value)
        if float_format and v == v and abs(v) != float("inf"):
            return float(float_format % v)
        return v
    if isinstance(value, (np.bool_, bool)):
        return bool(value)
    if isinstance(value, (np.integer, int)):
        return int(value)
    return str(value)


def to_excel(df, path: str, index: bool = False,
             float_format: Optional[str] = "%.4f") -> None:
    """pandas-free ``DataFrame.to_excel`` replacement (one sheet).

    index=True writes the (possibly Multi-) index levels as leading
    columns. float_format rounds like pandas' float_format (the value is
    still stored as a number)."""
    import pandas as pd
    if index:
        # index levels become leading columns (pandas names unnamed levels
        # 'index' / 'level_N' — those names are written as the headers)
        df = df.reset_index()
    header = [str(c) if not isinstance(c, tuple) else "_".join(map(str, c))
              for c in df.columns]
    rows = [header]
    for _, row in df.iterrows():
        rows.append([_coerce(v, float_format)
                     if not pd.isna(v) else None for v in row])
    write_xlsx(path, rows)


def read_xlsx(path: str):
    """Minimal reader for files written by :func:`write_xlsx` (tests /
    quick inspection): returns a list of row lists with gaps as None."""
    from xml.etree import ElementTree
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    root = ElementTree.fromstring(sheet)
    out = []
    for row in root.iter(f"{ns}row"):
        cells = {}
        for c in row.iter(f"{ns}c"):
            ref = c.attrib["r"]
            col = sum((ord(ch) - ord("A") + 1) * 26 ** i
                      for i, ch in enumerate(reversed(
                          re.match(r"[A-Z]+", ref).group(0)))) - 1
            if c.attrib.get("t") == "inlineStr":
                t = c.find(f"{ns}is/{ns}t")
                cells[col] = t.text if t is not None else ""
            elif c.attrib.get("t") == "b":
                v = c.find(f"{ns}v")
                cells[col] = bool(int(v.text))
            else:
                v = c.find(f"{ns}v")
                if v is not None:
                    num = float(v.text)
                    cells[col] = int(num) if num.is_integer() else num
        width = max(cells) + 1 if cells else 0
        out.append([cells.get(i) for i in range(width)])
    return out
