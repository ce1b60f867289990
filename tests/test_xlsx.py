"""stdlib xlsx codec (S3 read / K6 write) round-trips and the
schema-workbook path through a real .xlsx file."""

from __future__ import annotations

import zipfile

import pytest

from cell_kn_mvp_etl_results_spark.sources import schema_workbook as sw
from cell_kn_mvp_etl_results_spark.sources import xlsx
from cell_kn_mvp_etl_results_spark.sources.reports import (
    triple_components_report,
    write_report_xlsx,
)


def test_roundtrip_types_and_sparse_cells(tmp_path):
    rows = [
        ["name", "n", "ratio", "flag", "note"],
        ["alpha", 1, 2.5, True, None],  # None -> skipped cell
        [None, -3, 0.0, False, "x < y & z \"q\""],  # XML escapes
        ["  padded  ", 10**12, 1e-9, True, ""],  # whitespace preserved
    ]
    p = tmp_path / "t.xlsx"
    xlsx.write_xlsx(str(p), {"Main": rows})
    got = xlsx.read_xlsx(str(p))
    assert got == rows
    assert xlsx.sheet_names(str(p)) == ["Main"]


def test_multi_sheet_order_and_lookup(tmp_path):
    sheets = {
        "First": [["a"], [1]],
        "Second": [["b"], [2]],
        "Third & Co": [["c"], [3]],
    }
    p = tmp_path / "m.xlsx"
    xlsx.write_xlsx(str(p), sheets)
    assert xlsx.sheet_names(str(p)) == ["First", "Second", "Third & Co"]
    assert xlsx.read_xlsx(str(p), 1) == [["b"], [2]]
    assert xlsx.read_xlsx(str(p), "Third & Co") == [["c"], [3]]
    with pytest.raises(KeyError):
        xlsx.read_xlsx(str(p), "Nope")


def test_reads_shared_strings_and_bare_cells(tmp_path):
    """Other writers emit sharedStrings tables and omit cell refs --
    hand-build such a file and check both paths."""
    p = tmp_path / "s.xlsx"
    xlsx.write_xlsx(str(p), {"Sheet1": [["placeholder"]]})
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">'
        "<si><t>hello</t></si>"
        "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"
    )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c t="s"><v>0</v></c><c t="s"><v>1</v></c></row>'
        '<row r="3"><c r="B3"><v>7</v></c><c t="str"><v>fx</v></c></row>'
        "</sheetData></worksheet>"
    )
    # rewrite the zip with a sharedStrings part and a ref-less sheet
    with zipfile.ZipFile(p) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    parts["xl/sharedStrings.xml"] = shared.encode()
    parts["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(p, "w") as zf:
        for n, data in parts.items():
            zf.writestr(n, data)
    got = xlsx.read_xlsx(str(p))
    assert got == [
        ["hello", "rich", None],
        [None, None, None],  # gap row from r="3"
        [None, 7, "fx"],  # ref-less cell lands after B3
    ]


def test_xlsx_to_df_schema_pipeline(spark, tmp_path):
    """S3 end-to-end: one workbook, schema on sheet 0 and terms on
    sheet 2, exactly the reference's layout
    (CellKnSchemaUtilities.py:28-29)."""
    p = tmp_path / "cell-kn-schema.xlsx"
    xlsx.write_xlsx(
        str(p),
        {
            "Schema": [
                ["subject", "predicate", "object"],
                ["Cell_type (subtype/child)", "PART_OF", "Anatomical_structure"],
                ["Cellular_component", "PART_OF", "Cell_type"],
                ["Gene", "EXPRESSED_IN", "Cell_type"],
            ],
            "Notes": [["ignored"]],
            "Terms": [
                ["term", "curie"],
                ["Cell_type", "CL_0000000"],
                ["Anatomical_structure", "UBERON_0000061"],
                ["PART_OF", "BFO_0000050"],
            ],
        },
    )
    schema, terms = sw.read_schema_sheets(spark, str(p), str(p))
    curied = sw.curie_join(sw.clean_schema(schema), terms)
    got = {
        (r.subject, r.subject_curie, r.predicate_curie, r.object_curie)
        for r in curied.collect()
    }
    assert ("Cell_type", "CL_0000000", "BFO_0000050", "UBERON_0000061") in got
    assert ("Gene", "NA", "NA", "CL_0000000") in got


def test_write_report_xlsx_k6(spark, tmp_path):
    tuples = spark.createDataFrame(
        [
            ("CL_1", "PART_OF", "UBERON_1", None),
            ("CL_1", "rdfs_label", "lbl", "macrophage"),
            ("CL_2", "PART_OF", "UBERON_1", None),
        ],
        "s string, p string, o string, lit string",
    )
    p = tmp_path / "report.xlsx"
    write_report_xlsx(triple_components_report(tuples), str(p))
    assert xlsx.sheet_names(str(p)) == [
        "subjects",
        "predicates",
        "objects",
        "edge_annotations",
    ]
    subs = xlsx.read_xlsx(str(p), "subjects")
    assert subs[0] == ["s"] and {r[0] for r in subs[1:]} == {"CL_1", "CL_2"}


def test_df_to_rows_guard_rail(spark):
    big = spark.range(50)
    with pytest.raises(ValueError, match="dimension-scale"):
        xlsx.df_to_rows(big, max_rows=10)


def test_unicode_and_extreme_numbers(tmp_path):
    rows = [
        ["λ", "日本語", "emoji 🎉"],
        [1e300, -1e-300, 0],
        [-(2**40), 2**52, 3.141592653589793],
    ]
    p = tmp_path / "u.xlsx"
    xlsx.write_xlsx(str(p), {"Ünïcode & <Sheet>": rows})
    assert xlsx.sheet_names(str(p)) == ["Ünïcode & <Sheet>"]
    got = xlsx.read_xlsx(str(p))
    assert got[0] == rows[0]
    assert got[1] == [1e300, -1e-300, 0]
    assert got[2] == [-(2**40), 2**52, 3.141592653589793]


def test_wide_sheet_column_letters(tmp_path):
    """Columns past Z (AA...) round-trip: bijective base-26 both ways."""
    row = [f"c{i}" for i in range(60)]  # through column BH
    p = tmp_path / "w.xlsx"
    xlsx.write_xlsx(str(p), {"S": [row]})
    assert xlsx.read_xlsx(str(p)) == [row]
