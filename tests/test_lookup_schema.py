"""Tests for entity-resolution lookups (J3-J8, C5, A2) and the
schema-as-data pipeline (S3/T4/J8/U2/F7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.lookup import (
    broadcast_lookup,
    efo_to_mondo,
    normalize_annotation_term,
    strip_ensembl_version,
)
from cell_kn_mvp_etl_results_spark.sources import schema_workbook as sw


def test_broadcast_lookup_first_of_many(spark):
    facts = spark.createDataFrame([("g1",), ("g2",), ("g3",)], "gene string")
    dim = spark.createDataFrame(
        [("g1", "E2"), ("g1", "E1"), ("g2", "E9")], "gene string, ens string"
    )
    out = broadcast_lookup(facts, dim, "gene", "ens", multi="first", default="NA")
    got = {r.gene: r.ens for r in out.collect()}
    assert got == {"g1": "E1", "g2": "E9", "g3": "NA"}  # deterministic min


def test_broadcast_lookup_list(spark):
    facts = spark.createDataFrame([("g1",)], "gene string")
    dim = spark.createDataFrame(
        [("g1", "E2"), ("g1", "E1")], "gene string, ens string"
    )
    out = broadcast_lookup(facts, dim, "gene", "ens", multi="list").collect()
    assert out[0].ens == ["E1", "E2"]


def test_strip_ensembl_version(spark):
    df = spark.createDataFrame([("ENSG00000228222.1",), ("ENSG1",)], "g string")
    got = [r.s for r in df.select(strip_ensembl_version("g").alias("s")).collect()]
    assert got == ["ENSG00000228222", "ENSG1"]


def test_efo_to_mondo_passthrough(spark):
    facts = spark.createDataFrame(
        [("EFO_1",), ("MONDO_7",), ("HP_9",)], "term string"
    )
    dim = spark.createDataFrame([("EFO_1", "MONDO_1")], "EFO string, MONDO string")
    got = {r.term: r.mondo for r in efo_to_mondo(facts, dim, "term").collect()}
    assert got == {"EFO_1": "MONDO_1", "MONDO_7": "MONDO_7", "HP_9": None}


def test_normalize_annotation_term(spark):
    """Golden test mirroring the reference's NormalizeTermTestCase
    (AnnotationResultsTupleWriterTestCase.py): one row per branch of
    AnnotationResultsTupleWriter.normalize_term."""
    rows = [
        # (type, name, identifier, subject_identifier, expected)
        ("Anatomical_structure", "lung", "UBERON:0002048", "s", "UBERON_0002048"),
        ("Assay", "some assay", "EFO:0002772", "s", "EFO_0002772"),
        ("Biomarker_combination", "marker_set", "some-id", "abc123-rest", "BMC_marker_set-abc123"),
        ("Cell_set", "T cells alpha", "some-id", "uuid123-rest", "CS_T-cells-alpha-uuid123"),
        ("Cell_set_dataset", "dataset1", "NLP_dataset_v1", "s", "CSD_v1"),
        ("Cell_type", "macrophage", "<skos:related>CL:0000235", "s", "CL_0000235"),
        ("Cell_type", "macrophage", "CL:0000235", "s", "CL_0000235"),
        ("Disease", "some disease", "MESH:D000077192", "s", "MONDO_0004991"),
        ("Disease", "unknown disease", "MESH:D999999", "s", None),
        ("Gene", "TP53", "u1", "s", "GS_TP53"),
        ("Gene", "Myelin basic protein", "u2", "s", "GS_MBP"),
        ("Gene", "NotAGene", "u3", "s", None),
        ("Publication", "Sikkema", "37291214", "s", "PUB_doi.org/10.1038/s41591-023-02327-2"),
        ("Publication", "unknown", "99999999", "s", None),
        ("Some_other_type", "x", "y", "s", None),
    ]
    df = spark.createDataFrame(
        [r[:4] for r in rows], "t string, n string, i string, sid string"
    )
    got = [
        r.v
        for r in df.select(
            normalize_annotation_term("t", "n", "i", "sid").alias("v")
        ).collect()
    ]
    assert got == [r[4] for r in rows]


def test_normalize_annotation_term_unicode_cleanup(spark):
    # γδ pair -> "gamma-delta" in names; U+2212 -> '-' in names and ids
    df = spark.createDataFrame(
        [("Cell_set", "γδ T cells", "id", "u9-x")], "t string, n string, i string, sid string"
    )
    got = df.select(normalize_annotation_term("t", "n", "i", "sid").alias("v")).head().v
    assert got == "CS_gamma-delta-T-cells-u9"


def test_patch_dims_match_literal_maps(spark):
    """The broadcast-join form of the patch tables agrees with the
    literal-map form used inside the expression."""
    from cell_kn_mvp_etl_results_spark.operators.lookup import (
        MESH_TO_MONDO,
        PMID_TO_DOI,
        patch_dim,
    )

    facts = spark.createDataFrame(
        [(k,) for k in [*PMID_TO_DOI, "0000"]], "pmid string"
    )
    dim = patch_dim(spark, PMID_TO_DOI, "pmid", "doi")
    got = {r.pmid: r.doi for r in broadcast_lookup(facts, dim, "pmid", "doi").collect()}
    assert got == {**PMID_TO_DOI, "0000": None}
    assert MESH_TO_MONDO["MESH:D003643"] == "UBERON_0000071"  # the odd one out


def test_broadcast_lookup_unique_policy(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    facts = spark.createDataFrame([("g1",), ("g2",)], "gene string")
    ok_dim = spark.createDataFrame(
        [("g1", "E1"), ("g1", "E1"), ("g2", "E9")], "gene string, ens string"
    )
    got = {
        r.gene: r.ens
        for r in broadcast_lookup(facts, ok_dim, "gene", "ens", multi="unique").collect()
    }
    assert got == {"g1": "E1", "g2": "E9"}  # duplicate rows, one value: fine
    bad_dim = spark.createDataFrame(
        [("g1", "E1"), ("g1", "E2")], "gene string, ens string"
    )
    with pytest.raises(Exception) as ei:
        broadcast_lookup(facts, bad_dim, "gene", "ens", multi="unique").collect()
    assert "ambiguous" in str(ei.value)


def _schema_fixture(spark, tmp_path):
    schema_csv = tmp_path / "schema.csv"
    schema_csv.write_text(
        "subject,predicate,object\n"
        "Cell_type (subtype/child),PART_OF,Anatomical_structure\n"
        "Cellular_component,PART_OF,Cell_type\n"
        "Gene,EXPRESSED_IN,Cell_type\n"
    )
    terms_csv = tmp_path / "terms.csv"
    terms_csv.write_text(
        "term,curie\nCell_type,CL_0000000\nAnatomical_structure,UBERON_0000061\n"
        "PART_OF,BFO_0000050\n"
    )
    return sw.read_schema_sheets(spark, str(schema_csv), str(terms_csv))


def test_schema_pipeline(spark, tmp_path):
    schema, terms = _schema_fixture(spark, tmp_path)
    cleaned = sw.clean_schema(schema)
    rows = {(r.subject, r.predicate, r.object) for r in cleaned.collect()}
    # Cellular_component row dropped; suffix stripped
    assert rows == {
        ("Cell_type", "PART_OF", "Anatomical_structure"),
        ("Gene", "EXPRESSED_IN", "Cell_type"),
    }
    curied = sw.curie_join(cleaned, terms)
    got = {
        (r.subject, r.subject_curie, r.predicate_curie, r.object_curie)
        for r in curied.collect()
    }
    assert ("Cell_type", "CL_0000000", "BFO_0000050", "UBERON_0000061") in got
    assert ("Gene", "NA", "NA", "CL_0000000") in got  # NA defaults

    report = sw.consistency_report(cleaned, terms)
    missing_subjects = {r.t for r in report["subject"].collect()}
    assert missing_subjects == {"Gene"}

    tuples = sw.schema_graph_tuples(curied)
    keys = {r.edge_key for r in tuples.collect()}
    assert "CL_0000000-BFO_0000050-UBERON_0000061" in keys


def test_stateful_running_totals(spark, sf_dir):
    """applyInPandasWithState end-to-end over the events stream."""
    import tempfile

    from cell_kn_mvp_etl_results_spark.sources.readers import (
        read_events_stream,
        read_table,
    )
    from cell_kn_mvp_etl_results_spark.streaming.stateful import running_user_totals

    stream = read_events_stream(spark, sf_dir)
    out = running_user_totals(stream.select("user_id", "value"))
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 2))
        for r in spark.sql("SELECT * FROM running_totals").collect()
    }
    static = read_table(spark, sf_dir, "events")
    expected = {
        r.user_id: (r.n, round(r.s, 2))
        for r in static.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expected
