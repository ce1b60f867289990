"""Golden-style tests for the domain tuple writers (the reference's
style-2 testing: small fixed input -> exact expected tuple list,
SURVEY.md section 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.tuplewriters import (
    author_to_cl_tuples,
    nsforest_tuples,
)


def nsforest_fixture(spark):
    rows = [
        # clusterName, clusterSize, f_score, precision, TP, FP, FN, TN,
        # marker_count, NSForest_markers, binary_genes, uuid, dsv
        (
            "AII_1", 34655, 0.87, 0.98, 20578, 358, 14077, 1740516, 2,
            "['SLC12A7', 'OTOGL']", "['CLCNKA', 'GLCE']", "aaaaaaaaaaaa",
            "dv-1",
        ),
        (
            "Tiny", 3, 0.5, 0.5, 1, 1, 1, 1, 1,
            "['GENE1']", "['GENE2']", "bbbbbbbbbbbb", "dv-2",
        ),  # filtered: clusterSize < 10
    ]
    return spark.createDataFrame(
        rows,
        "clusterName string, clusterSize long, f_score double, precision double,"
        "TP long, FP long, FN long, TN long, marker_count long,"
        "NSForest_markers string, binary_genes string, uuid string,"
        "dataset_version_id string",
    )


def test_nsforest_tuples_golden(spark):
    out = sorted(
        tuple(r) for r in nsforest_tuples(nsforest_fixture(spark)).collect()
    )
    cs, bmc, bgs = "CS_AII-1-aaaaaaaaaaaa", "BMC_aaaaaaaaaaaa", "BGS_aaaaaaaaaaaa"
    expected = sorted(
        [
            (bmc, "rdf:type", "SO_biomarker_combination", None),
            (bgs, "rdf:type", "SO_binary_gene_set", None),
            (cs, "HAS_CHARACTERIZING_MARKER_SET", bmc, None),
            (cs, "Source", bmc, "NSForest"),
            (bmc, "PART_OF", bgs, None),
            (bmc, "Source", bgs, "NSForest"),
            (bmc, "F_score", "0.87", None),
            (bmc, "Cluster_size", "34655", None),
            (bmc, "Marker_names", "SLC12A7 OTOGL", None),
            (bgs, "Gene_names", "CLCNKA GLCE", None),
            (cs, "True_positives", bmc, "20578"),
            (cs, "False_positives", bmc, "358"),
            (cs, "False_negatives", bmc, "14077"),
            (cs, "True_negatives", bmc, "1740516"),
            (cs, "Precision", bmc, "0.98"),
            (cs, "Marker_count", bmc, "2"),
            (cs, "SOURCE_DATA_IN", "CSD_dv-1", None),
            ("GS_SLC12A7", "PART_OF", bmc, None),
            ("GS_SLC12A7", "Source", bmc, "NSForest"),
            ("GS_OTOGL", "PART_OF", bmc, None),
            ("GS_OTOGL", "Source", bmc, "NSForest"),
            ("GS_CLCNKA", "PART_OF", bgs, None),
            ("GS_GLCE", "PART_OF", bgs, None),
        ]
    )
    assert out == expected  # exact golden match; Tiny cluster filtered out


def author_fixture(spark):
    rows = [
        (
            "CAI", 12000, "['GAD1', 'GAD2']", "cccccccccccc",
            "https://purl.obolibrary.org/obo/CL_4030027", "GABAergic amacrine cell",
            "http://purl.obolibrary.org/obo/UBERON_0000966", "retina",
            "skos:broad", "manual", 38014002, "2e910e62",
        ),
        (
            "NoCl", 12000, "['X']", "dddddddddddd",
            "unmapped", "none",
            "http://purl.obolibrary.org/obo/UBERON_0000966", "retina",
            "skos:exact", "manual", 1, "dv",
        ),  # filtered: cell_ontology_id has no CL
    ]
    return spark.createDataFrame(
        rows,
        "author_cell_set string, clusterSize long, NSForest_markers string,"
        "uuid string, cell_ontology_id string, cell_ontology_term string,"
        "uberon_entity_id string, uberon_entity_term string, match string,"
        "mapping_method string, PMID long, dataset_version_id string",
    )


def test_author_to_cl_tuples(spark):
    out = {tuple(r) for r in author_to_cl_tuples(author_fixture(spark)).collect()}
    cs = "CS_CAI-cccccccccccc"
    assert ("CL_4030027", "PART_OF", "UBERON_0000966", None) in out
    assert (cs, "DERIVES_FROM", "UBERON_0000966", None) in out
    assert (cs, "COMPOSED_PRIMARILY_OF", "CL_4030027", None) in out
    assert (cs, "Match", "CL_4030027", "skos:broad") in out
    assert (cs, "Mapping_method", "CL_4030027", "manual") in out
    assert (cs, "EXPRESSES", "BGS_cccccccccccc", None) in out
    assert ("CSD_2e910e62", "HAS_SOURCE_PUBLICATION", "PUB_38014002", None) in out
    assert ("GS_GAD1", "PART_OF", "CL_4030027", None) in out
    assert ("CL_4030027", "SELECTIVELY_EXPRESSES", "GS_GAD2", None) in out
    # the unmappable row contributes nothing
    assert not any("dddddddddddd" in s for s, *_ in out)


def test_merge_author_mapping_then_tuples(spark):
    """J2 merge -> T2 writer: the full author-pipeline lifecycle."""
    from cell_kn_mvp_etl_results_spark.operators.tuplewriters import (
        merge_author_mapping,
    )

    mapping = spark.createDataFrame(
        [
            (
                "AII_1", "https://purl.obolibrary.org/obo/CL_4030027",
                "GABAergic amacrine cell",
                "http://purl.obolibrary.org/obo/UBERON_0000966", "retina",
                "skos:broad", "manual", 38014002, "2e910e62",
            ),
            (
                "NoMatch", "https://purl.obolibrary.org/obo/CL_1", "x",
                "http://purl.obolibrary.org/obo/UBERON_1", "y",
                "skos:exact", "manual", 1, "dv",
            ),
        ],
        "author_cell_set string, cell_ontology_id string,"
        "cell_ontology_term string, uberon_entity_id string,"
        "uberon_entity_term string, match string, mapping_method string,"
        "PMID long, dataset_version_id string",
    )
    merged = merge_author_mapping(mapping, nsforest_fixture(spark))
    rows = merged.collect()
    # inner join: only AII_1 has an NSForest row
    assert [r.author_cell_set for r in rows] == ["AII_1"]
    assert rows[0].clusterSize == 34655 and rows[0].uuid == "aaaaaaaaaaaa"

    out = {tuple(r) for r in author_to_cl_tuples(merged).collect()}
    assert ("CS_AII-1-aaaaaaaaaaaa", "COMPOSED_PRIMARILY_OF", "CL_4030027", None) in out
    assert ("GS_SLC12A7", "PART_OF", "CL_4030027", None) in out


def test_tuples_feed_graph_assembly(spark):
    """End-to-end: writer output -> graph assembly -> queryable edges
    (the reference lifecycle, SURVEY.md section 3)."""
    from cell_kn_mvp_etl_results_spark.operators.graph import graph_from_tuples

    tuples = nsforest_tuples(nsforest_fixture(spark))
    g = graph_from_tuples(tuples)
    edges = {
        (r.src_coll, r.src_key, r.dst_coll, r.dst_key, r.label)
        for r in g["edges"].collect()
    }
    assert ("CS", "AII-1-aaaaaaaaaaaa", "BMC", "aaaaaaaaaaaa",
            "HAS_CHARACTERIZING_MARKER_SET") in edges
    assert ("GS", "SLC12A7", "BMC", "aaaaaaaaaaaa", "PART_OF") in edges
    attrs = {
        (r.coll, r.key, r.attr): r.values for r in g["vertex_attrs"].collect()
    }
    assert attrs[("BMC", "aaaaaaaaaaaa", "F_score")] == ["0.87"]
    ea = {
        (r.src_coll, r.src_key, r.dst_coll, r.dst_key, r.attr): r.values
        for r in g["edge_attrs"].collect()
    }
    assert ea[("CS", "AII-1-aaaaaaaaaaaa", "BMC", "aaaaaaaaaaaa", "Precision")] == [
        "0.98"
    ]
