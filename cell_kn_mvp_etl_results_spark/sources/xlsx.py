"""Minimal stdlib xlsx codec (SURVEY.md S3 read / K6 write).

The reference consumes the Cell KN schema as an Excel workbook
(``CellKnSchemaUtilities.py:28-29``: ``pd.read_excel(path, 0)`` and
sheet 2) and emits multi-sheet Excel reports
(``CellKnSchemaUtilities.py:228-239``: Subjects / Objects / Vertices /
"Triples with Names" / "Triples with CURIEs"). This environment has no
Excel engine (openpyxl/xlrd absent), but .xlsx is just a zip of
well-specified XML parts (ECMA-376 SpreadsheetML), so a few hundred
lines of ``zipfile`` + ``xml.etree`` cover the subset a schema workbook
uses: shared strings, inline strings, numbers, booleans, sparse cells,
and cached formula values. Dates/styles/merged ranges are out of scope.

Workbooks here are driver-side, KB-scale schema *dimensions* (the same
posture as the reference, which loads them with pandas on one machine);
the data plane stays in Spark. ``xlsx_to_df`` parses on the driver and
hands Spark an all-string DataFrame; ``write_report_xlsx`` collects
dimension-scale report relations only.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_MAIN_NS = _NS["m"]
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 (base-26 bijective)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _col_letters(idx: int) -> str:
    """Inverse of :func:`_col_index`."""
    out = []
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out.append(chr(ord("A") + rem))
    return "".join(reversed(out))


def _text_of(elem: ET.Element) -> str:
    """Concatenate every <t> descendant (plain or rich-text runs)."""
    return "".join(t.text or "" for t in elem.iter(f"{{{_MAIN_NS}}}t"))


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    return [_text_of(si) for si in root.findall("m:si", _NS)]


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """Workbook sheet order -> [(sheet_name, zip_part_path)]."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_attr = (
        "{http://schemas.openxmlformats.org/officeDocument/2006/"
        "relationships}id"
    )
    target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{{{_REL_NS}}}Relationship")
    }
    parts = []
    for sheet in wb.iter(f"{{{_MAIN_NS}}}sheet"):
        t = target[sheet.get(rid_attr)]
        if not t.startswith("/"):
            t = f"xl/{t}"
        parts.append((sheet.get("name"), t.lstrip("/")))
    return parts


def _cell_value(cell: ET.Element, shared: list[str]):
    """Decode one <c> element to a Python value (str/float/int/bool/None).

    Formula cells decode their cached <v>; error cells decode to None.
    """
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_elem = cell.find("m:is", _NS)
        return _text_of(is_elem) if is_elem is not None else None
    v = cell.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    if ctype == "e":
        return None
    num = float(v.text)
    return int(num) if num.is_integer() else num


def read_xlsx(
    path: str, sheet: int | str = 0
) -> list[list]:
    """Read one worksheet into dense rows (lists padded with None).

    ``sheet`` is a zero-based index or a sheet name, matching
    ``pd.read_excel``'s convention in ``CellKnSchemaUtilities.py:28-29``.
    """
    with zipfile.ZipFile(path) as zf:
        parts = _sheet_parts(zf)
        if isinstance(sheet, str):
            matches = [p for name, p in parts if name == sheet]
            if not matches:
                raise KeyError(f"no sheet named {sheet!r} in {path}")
            part = matches[0]
        else:
            part = parts[sheet][1]
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(part))
        rows: list[list] = []
        width = 0
        for row in root.iter(f"{{{_MAIN_NS}}}row"):
            row_idx = int(row.get("r", len(rows) + 1)) - 1
            while len(rows) <= row_idx:
                rows.append([])
            out = rows[row_idx]
            col = 0
            for cell in row.findall("m:c", _NS):
                ref = cell.get("r")
                if ref is not None:
                    col = _col_index(_CELL_REF.match(ref).group(1))
                while len(out) <= col:
                    out.append(None)
                out[col] = _cell_value(cell, shared)
                col += 1
            width = max(width, len(out))
        for out in rows:
            out.extend([None] * (width - len(out)))
        return rows


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return [name for name, _ in _sheet_parts(zf)]


def xlsx_to_df(
    spark: SparkSession, path: str, sheet: int | str = 0
) -> DataFrame:
    """S3: worksheet -> all-string DataFrame, first row as header
    (empty header cells become _c{i}, pandas-style). Driver-side parse;
    workbooks are KB-scale schema dims."""
    rows = read_xlsx(path, sheet)
    if not rows:
        raise ValueError(f"empty worksheet {sheet!r} in {path}")
    header = [
        str(h) if h is not None else f"_c{i}" for i, h in enumerate(rows[0])
    ]
    schema = T.StructType(
        [T.StructField(h, T.StringType(), True) for h in header]
    )
    data = [
        [None if v is None else str(v) for v in r] for r in rows[1:]
    ]
    return spark.createDataFrame(data, schema)


# --- writer ---------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="1"><xf xfId="0"/></cellXfs>
</styleSheet>"""


def _esc(s: str) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return s.replace('"', "&quot;")


def _sheet_xml(rows: list[list]) -> str:
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_col_letters(ci)}{ri}"
            if isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                txt = _esc(str(v))
                # preserve leading/trailing whitespace across parsers
                space = (
                    ' xml:space="preserve"'
                    if txt != txt.strip()
                    else ""
                )
                cells.append(
                    f'<c r="{ref}" t="inlineStr">'
                    f"<is><t{space}>{txt}</t></is></c>"
                )
        body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_MAIN_NS}">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """K6: write a multi-sheet workbook. ``sheets`` maps sheet name ->
    rows of Python values (str -> inline string, int/float -> number,
    bool -> boolean, None -> skipped cell)."""
    if not sheets:
        raise ValueError("write_xlsx needs at least one sheet")
    names = list(sheets)
    overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(1, len(names) + 1)
    )
    sheet_tags = "".join(
        f'<sheet name="{_esc(n)}" sheetId="{i}" r:id="rId{i}"/>'
        for i, n in enumerate(names, start=1)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN_NS}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    wb_rels = "".join(
        f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(names) + 1)
    ) + (
        f'<Relationship Id="rId{len(names) + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/styles" Target="styles.xml"/>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS}">{wb_rels}</Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(sheet_overrides=overrides),
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/styles.xml", _STYLES)
        for i, name in enumerate(names, start=1):
            zf.writestr(
                f"xl/worksheets/sheet{i}.xml", _sheet_xml(sheets[name])
            )


def df_to_rows(df: DataFrame, max_rows: int = 100_000) -> list[list]:
    """Collect a dimension-scale relation to header+rows for
    :func:`write_xlsx`. Guard-railed: refuses fact-scale inputs rather
    than OOM-ing the driver (the reference's Excel reports are
    review artifacts of distinct-value sets, CellKnSchemaUtilities.py:216-239)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"df_to_rows: >{max_rows} rows; Excel reports are for "
            "dimension-scale relations -- aggregate or sample first"
        )
    return [list(df.columns)] + [list(r) for r in rows]


def write_report_xlsx(
    report: dict[str, DataFrame], path: str, max_rows: int = 100_000
) -> None:
    """K6: one worksheet per report relation, mirroring the reference's
    ``pd.ExcelWriter`` block (CellKnSchemaUtilities.py:228-239)."""
    write_xlsx(path, {n: df_to_rows(df, max_rows) for n, df in report.items()})
