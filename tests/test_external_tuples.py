"""Tests for the external-API tuple writers (T3) on synthetic nested
fixtures shaped per FIXTURES.md sections 4-8."""

from __future__ import annotations

from cell_kn_mvp_etl_results_spark.operators import external_tuples as ext


def test_parse_citation_and_cellxgene_tuples(spark):
    rows = [
        (
            "dv-1",
            "retina atlas",
            1000,
            "Homo sapiens",
            "retina",
            "Publication: https://doi.org/10.1/abc Dataset Version: x "
            "Collection: https://cellxgene.example/coll/42",
        )
    ]
    df = spark.createDataFrame(
        rows,
        "dataset_version_id string, dataset_name string, n_cells long,"
        "organism string, tissue string, citation string",
    )
    out = {(r.s, r.p, r.o) for r in ext.cellxgene_tuples(df).collect()}
    assert ("CSD_dv-1", "HAS_SOURCE_PUBLICATION", "PUB_doi.org/10.1/abc") in out
    assert ("CSD_dv-1", "Number_of_cells", "1000") in out
    assert (
        "CSD_dv-1",
        "Link_to_collection",
        "https://cellxgene.example/coll/42",
    ) in out


def opentargets_fixture(spark):
    rows = [
        (
            "TP53",
            [
                (0.9, ("MONDO_0005148", "diabetes")),
                (0.7, ("EFO_0000001", "mapped disease")),
                (0.2, ("MONDO_0000001", "weak assoc")),  # F3: dropped
                (0.8, ("HP_0000001", "not a disease ns")),  # F6: dropped
            ],
            [
                ("CHEMBL25", "MONDO_0005148", ["NCT001", "NCT002"], 4, True, False),
                ("CHEMBL99", "MONDO_0005148", ["NCT003"], 2, True, False),  # phase<3
                ("CHEMBL77", "MONDO_0005148", [], 4, True, True),  # withdrawn
            ],
        )
    ]
    schema = (
        "gene_symbol string,"
        "diseases array<struct<score double, disease struct<id string, name string>>>,"
        "drugs array<struct<drugId string, diseaseId string, ctIds array<string>,"
        "maxPhase int, isApproved boolean, withdrawn boolean>>"
    )
    return spark.createDataFrame(rows, schema)


def test_opentargets_disease_tuples_with_mapping(spark):
    t = opentargets_fixture(spark)
    efo2mondo = spark.createDataFrame(
        [("EFO_0000001", "MONDO_0009999")], "EFO string, MONDO string"
    )
    out = {(r.s, r.p, r.o, r.lit) for r in ext.opentargets_disease_tuples(t, efo2mondo).collect()}
    assert ("GS_TP53", "GENETIC_BASIS_FOR", "MONDO_0005148", None) in out
    assert ("GS_TP53", "Score", "MONDO_0005148", "0.9") in out
    # EFO mapped through the dim table (J4)
    assert ("GS_TP53", "GENETIC_BASIS_FOR", "MONDO_0009999", None) in out
    # F3 threshold + F6 namespace guard
    assert not any(o == "MONDO_0000001" for _, _, o, _ in out)
    assert not any("HP_" in o for _, _, o, _ in out)


def test_opentargets_drug_tuples_filters_and_normalization(spark):
    out = {(r.s, r.p, r.o) for r in ext.opentargets_drug_tuples(opentargets_fixture(spark)).collect()}
    assert ("CHEMBL_25", "IS_SUBSTANCE_THAT_TREATS", "MONDO_0005148") in out
    assert ("CHEMBL_25", "EVALUATED_IN", "NCT_001") in out
    assert ("CHEMBL_25", "EVALUATED_IN", "NCT_002") in out
    # phase<3 and withdrawn drugs excluded (F3)
    assert not any(s == "CHEMBL_99" for s, _, _ in out)
    assert not any(s == "CHEMBL_77" for s, _, _ in out)


def test_asctb_tuples(spark):
    rows = [
        (
            [("UBERON:0000955", ["UBERON:0013702"]), ("FMA:1", ["UBERON:0013702"])],
            [
                ("CL:0000236", ["UBERON:0000955"]),
                ("PCL:999", ["UBERON:0000955"]),  # F4: PCL excluded
            ],
        )
    ]
    schema = (
        "anatomical_structures array<struct<id string, ccf_part_of array<string>>>,"
        "cell_types array<struct<id string, ccf_located_in array<string>>>"
    )
    df = spark.createDataFrame(rows, schema)
    out = {(r.s, r.p, r.o) for r in ext.asctb_tuples(df).collect()}
    assert ("UBERON_0000955", "PART_OF", "UBERON_0013702") in out
    assert ("CL_0000236", "PART_OF", "UBERON_0000955") in out
    assert not any(s.startswith("FMA") for s, _, _ in out)
    assert not any(s.startswith("PCL") for s, _, _ in out)

    # gated variant: restrict CL edges to known terms
    known = spark.createDataFrame([("CL:0009999",)], "term string")
    gated = {(r.s, r.p, r.o) for r in ext.asctb_tuples(df, known).collect()}
    assert not any(s.startswith("CL_") for s, _, _ in gated)
    assert ("UBERON_0000955", "PART_OF", "UBERON_0013702") in gated


def test_parse_pubmed_article():
    xml = """
    <PubmedArticle>
      <MedlineCitation>
        <PMID>38014002</PMID>
        <Article>
          <Journal><Title>Cell Reports</Title>
            <JournalIssue><PubDate><Year>2023</Year></PubDate></JournalIssue>
          </Journal>
          <ArticleTitle>A retina atlas</ArticleTitle>
        </Article>
      </MedlineCitation>
      <PubmedData>
        <ArticleIdList>
          <ArticleId IdType="pubmed">38014002</ArticleId>
          <ArticleId IdType="doi">10.1101/2023.11.07.566105</ArticleId>
        </ArticleIdList>
      </PubmedData>
    </PubmedArticle>
    """
    meta = ext.parse_pubmed_article(xml)
    assert meta["pmid"] == "38014002"
    assert meta["title"] == "A retina atlas"
    assert meta["journal"] == "Cell Reports"
    assert meta["year"] == "2023"
    assert meta["doi"] == "10.1101/2023.11.07.566105"


def test_ebi_rxnav_drug_cache_parsers(spark):
    """S9: the reference's drug-cache dict shapes
    (ExternalApiResultsFetcher.py:318-514) parse into lookup dims."""
    ebi_cache = {
        "drug_names": ["aspirin", "unobtainium"],  # bookkeeping key skipped
        "aspirin": {
            "response": {
                "docs": [
                    {"obo_id": "CHEBI:15365", "label": "acetylsalicylic acid",
                     "ontology_name": "chebi"},
                    {"obo_id": "DRON:00020113", "label": "aspirin",
                     "ontology_name": "dron"},
                ]
            }
        },
        "unobtainium": {},  # failed fetch -> empty payload, F6 drop
    }
    dim = ext.ebi_dron_dim(ext.load_drug_cache(spark, ebi_cache))
    rows = {(r.drug_name, r.dron_id, r.dron_label) for r in dim.collect()}
    assert rows == {("aspirin", "DRON:00020113", "aspirin")}

    rxnav_cache = {
        "drug_names": ["aspirin", "nothing"],
        "aspirin": {
            "idGroup": {"rxnormId": ["1191"]},
            "propConceptGroup": {
                "propConcept": [
                    {"propCategory": "CODES", "propName": "DRUGBANK",
                     "propValue": "DB00945"},
                    {"propCategory": "CODES", "propName": "UNII_CODE",
                     "propValue": "R16CO5Y76E"},
                    {"propCategory": "CODES", "propName": "DRUGBANK",
                     "propValue": "DB-DUP"},  # later dup: first must win
                ]
            },
        },
        "nothing": {"idGroup": {}},  # no rxnormId -> no property rows
    }
    props = ext.rxnav_props(ext.load_drug_cache(spark, rxnav_cache))
    got = {(r.drug_name, r.rxcui, r.prop_name, r.prop_value) for r in props.collect()}
    assert ("aspirin", "1191", "DRUGBANK", "DB00945") in got
    assert ("aspirin", "1191", "UNII_CODE", "R16CO5Y76E") in got
    assert not any(r[0] == "nothing" for r in got)

    first = {r.drug_name: r.prop_value for r in ext.drug_prop(props, "DRUGBANK").collect()}
    assert first == {"aspirin": "DB00945"}  # get_prop_for_drug first-wins


def test_uniprot_mapping_parsers(spark, tmp_path):
    """S11: id-mapping results parse identically from the JSON shape and
    the xlsx download format; first-accession selection is positional."""
    import json

    batch = {
        "results": [
            {"from": "ENSP01", "to": {"primaryAccession": "P111"}},
            {"from": "ENSP02", "to": {"primaryAccession": "P222"}},
            {"from": "ENSP01", "to": {"primaryAccession": "P333"}},  # collision
        ]
    }
    results = spark.createDataFrame(
        [(json.dumps(batch["results"]),)], "results string"
    )
    mapping = ext.uniprot_mapping_dim(results)
    got = {(r.src_id, r.accession) for r in mapping.collect()}
    assert got == {("ENSP01", "P111"), ("ENSP02", "P222"), ("ENSP01", "P333")}
    first = {r.src_id: r.accession for r in ext.uniprot_first_accession(mapping).collect()}
    assert first == {"ENSP01": "P111", "ENSP02": "P222"}  # first-wins

    from cell_kn_mvp_etl_results_spark.sources import xlsx

    wb = tmp_path / "idmapping.xlsx"
    xlsx.write_xlsx(
        str(wb),
        {
            "Sheet1": [
                ["From", "Entry", "Entry Name"],
                ["ENSP01", "P111", "X_HUMAN"],
                ["ENSP02", "P222", "Y_HUMAN"],
                ["ENSP01", "P333", "Z_HUMAN"],
            ]
        },
    )
    from_xlsx = ext.uniprot_mapping_from_xlsx(spark, str(wb))
    assert {(r.src_id, r.accession) for r in from_xlsx.collect()} == got
    first2 = {
        r.src_id: r.accession
        for r in ext.uniprot_first_accession(from_xlsx).collect()
    }
    assert first2 == first
