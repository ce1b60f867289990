"""Tests for the typed-path query battery (J10/J11/T8 compiler) and the
report/version utilities."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.graph import graph_from_tuples
from cell_kn_mvp_etl_results_spark.plans.battery import (
    HierarchySpec,
    PathSpec,
    run_battery,
    run_path_spec,
    touched_edges,
)
from cell_kn_mvp_etl_results_spark.sources import reports
from cell_kn_mvp_etl_results_spark.sources.sinks import extract_subgraph


def graph(spark):
    rows = [
        # CS -> BMC -> GS, plus a GO hierarchy behind GS
        ("CS_c1", "HAS_MARKER_SET", "BMC_m1", None),
        ("BMC_m1", "PART_OF", "BGS_g1", None),
        ("GS_TP53", "PART_OF", "BMC_m1", None),
        ("GS_TP53", "INVOLVED_IN", "GO_1", None),
        ("GO_1", "subClassOf", "GO_2", None),
        ("GO_2", "subClassOf", "GO_3", None),
        ("CS_c1", "Source", "BMC_m1", "NSForest"),
    ]
    t = spark.createDataFrame(rows, "s string, p string, o string, lit string")
    return graph_from_tuples(t)


def test_khop_any_direction_spec(spark):
    g = graph(spark)
    spec = PathSpec("CS-BMC-GS", anchor="CS", hops=["BMC", "GS"])
    paths = run_path_spec(g["vertices"], g["edges"], spec).collect()
    # ANY-direction: CS_c1 -> BMC_m1 -> (GS_TP53 via inbound PART_OF)
    assert [p.path for p in paths] == [["CS_c1", "BMC_m1", "GS_TP53"]]


def test_hierarchy_extension_spec(spark):
    g = graph(spark)
    spec = PathSpec(
        "CS-BMC-GS-GO+hier",
        anchor="CS",
        hops=["BMC", "GS", "GO"],
        hierarchy=HierarchySpec(label="subClassOf"),
    )
    paths = run_path_spec(g["vertices"], g["edges"], spec).collect()
    assert len(paths) == 1
    p = paths[0]
    assert p.path == ["CS_c1", "BMC_m1", "GS_TP53", "GO_1"]
    assert p.hierarchy_depth == 2
    assert p.hierarchy_path == "GO_1/GO_2/GO_3"


def test_battery_and_subgraph_extraction(spark):
    g = graph(spark)
    specs = [
        PathSpec("CS-BMC", anchor="CS", hops=["BMC"]),
        PathSpec("CS-BMC-BGS", anchor="CS", hops=["BMC", "BGS"]),
    ]
    out = run_battery(g["vertices"], g["edges"], specs)
    assert set(out) == {"CS-BMC", "CS-BMC-BGS", "_touched_edges"}
    sub = extract_subgraph(g["edges"], out["_touched_edges"], g["vertex_attrs"])
    edge_labels = {r.label for r in sub["edges"].collect()}
    assert edge_labels == {"HAS_MARKER_SET", "PART_OF"}
    verts = {(r.coll, r.key) for r in sub["vertices"].collect()}
    assert ("CS", "c1") in verts and ("BGS", "g1") in verts
    assert ("GO", "1") not in verts  # untouched by this battery


def test_touched_edges_undirected_orientation(spark):
    g = graph(spark)
    spec = PathSpec("BGS-back", anchor="BGS", hops=["BMC"])
    paths = run_path_spec(g["vertices"], g["edges"], spec)
    te = touched_edges(paths).collect()
    # path runs BGS->BMC (reverse of stored edge); endpoints reflect
    # traversal order, so subgraph extraction must try both orientations
    assert [(r.src_coll, r.dst_coll) for r in te] == [("BGS", "BMC")]


def test_triple_components_report(spark, tmp_path):
    rows = [
        ("CS_c1", "HAS", "BMC_m1", None),
        ("CS_c1", "Source", "BMC_m1", "NSForest"),
        ("BMC_m1", "F_score", "0.9", None),
    ]
    t = spark.createDataFrame(rows, "s string, p string, o string, lit string")
    rep = reports.triple_components_report(t)
    assert {r.p for r in rep["edge_annotations"].collect()} == {"Source"}
    assert rep["subjects"].count() == 2
    reports.write_report(rep, str(tmp_path / "report"))
    import os

    assert os.path.isdir(tmp_path / "report" / "subjects")


def test_version_compare():
    v1 = "http://purl.obolibrary.org/obo/cl/releases/2024-01-04/cl.owl"
    v2 = "2024-06-01"
    assert reports.parse_version_date(v1) == "2024-01-04"
    assert reports.is_newer_version(v1, v2)
    assert not reports.is_newer_version(v2, v1)
    assert reports.is_newer_version(None, v1)
    assert not reports.is_newer_version(v1, "no-date-here")
