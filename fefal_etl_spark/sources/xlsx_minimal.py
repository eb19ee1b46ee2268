"""Dependency-free xlsx read/write (SURVEY.md §2.1 S2, S6 fallback).

An ``.xlsx`` file is a zip of XML parts; survey workbooks (KB–MB, simple
grids of strings/numbers — SURVEY.md §6) need none of openpyxl's styling or
formula machinery, so when pandas/openpyxl is unavailable the engine falls
back to this stdlib parser/serializer (zipfile + ElementTree). Driver-side
by design, like the pandas shim it replaces: survey ingest is metadata-sized,
never the distributed path.

Reader handles shared strings, inline strings, and plain numeric cells.
Writer emits inline strings only (no sharedStrings part needed) — the shape
the reader and pandas both consume.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_idx(cell_ref: str) -> int:
    """'BC12' → 0-based column 54."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _col_letter(idx: int) -> str:
    """0-based column → 'A', 'B', …, 'AA'."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def read_workbook(
    path: "str | bytes | bytearray | memoryview",
) -> dict[str, list[list[str | None]]]:
    """All sheets as row-major cell grids (cell values as raw strings;
    missing cells None). Sheet order follows the workbook part.

    Accepts a filesystem path OR the workbook bytes — the bytes form is what
    the distributed ``binaryFile`` ingest path feeds from executors
    (sources.readers.read_excel_dir)."""
    import io

    src = (
        io.BytesIO(bytes(path))
        if isinstance(path, (bytes, bytearray, memoryview))
        else path
    )
    with zipfile.ZipFile(src) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_MAIN}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_MAIN}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_target = {
            r.get("Id"): r.get("Target")
            for r in rels.findall(f"{_PKG_REL}Relationship")
        }
        out: dict[str, list[list[str | None]]] = {}
        sheets = wb.find(f"{_MAIN}sheets")
        for sh in sheets if sheets is not None else []:
            name = sh.get("name") or f"sheet{len(out)}"
            target = rid_target[sh.get(f"{_DOC_REL}id")] or ""
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            ws = ET.fromstring(z.read(target))
            rows: list[list[str | None]] = []
            for row in ws.iter(f"{_MAIN}row"):
                cells: dict[int, str | None] = {}
                for c in row.findall(f"{_MAIN}c"):
                    idx = _col_idx(c.get("r") or _col_letter(len(cells)) + "1")
                    kind = c.get("t", "n")
                    if kind == "s":
                        v = c.find(f"{_MAIN}v")
                        val = shared[int(v.text)] if v is not None else None
                    elif kind == "inlineStr":
                        is_el = c.find(f"{_MAIN}is")
                        val = (
                            "".join(t.text or "" for t in is_el.iter(f"{_MAIN}t"))
                            if is_el is not None
                            else None
                        )
                    else:
                        v = c.find(f"{_MAIN}v")
                        val = v.text if v is not None else None
                    cells[idx] = val
                width = max(cells) + 1 if cells else 0
                rows.append([cells.get(i) for i in range(width)])
            out[name] = rows
    return out


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{sheet_overrides}</Types>"
)
_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" '
    'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)


def write_workbook(path: str, sheets: dict[str, list[list[object]]]) -> None:
    """Serialize ``{sheet: rows}`` grids (header row included by caller).
    Every cell is written as an inline string — type coercion is the
    cleaning layer's job on read, matching the reference's all-strings
    ingest (etl_ui.py:863)."""
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(
                sheet_overrides="".join(
                    _SHEET_OVERRIDE.format(i=i + 1) for i in range(len(names))
                )
            ),
        )
        z.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        wb_rels = "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{wb_rels}</Relationships>",
        )
        for i, name in enumerate(names):
            rows_xml = []
            for r, row in enumerate(sheets[name], start=1):
                cells = "".join(
                    f'<c r="{_col_letter(ci)}{r}" t="inlineStr">'
                    f"<is><t>{escape('' if v is None else str(v))}</t></is></c>"
                    for ci, v in enumerate(row)
                )
                rows_xml.append(f'<row r="{r}">{cells}</row>')
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>",
            )
