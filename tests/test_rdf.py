"""Tests for RDF/OWL ingestion + BNode reification (mirrors the
reference's OntologyParserLoader test intent -- parse_term branches,
fnode/bnode partitioning, reification reconstruction -- on our own
hand-written fixtures)."""

from __future__ import annotations

import textwrap

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators import rdf

# A tiny OWL/RDF-XML document in the OBO style: one class with a label,
# a plain subClassOf, a restriction-reified relation, and an axiom
# annotation. Written from scratch for this test.
OWL_FIXTURE = textwrap.dedent(
    """\
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
             xmlns:owl="http://www.w3.org/2002/07/owl#"
             xmlns:oio="http://www.geneontology.org/formats/oboInOwl#">
      <owl:Class rdf:about="http://purl.obolibrary.org/obo/XX_0000001">
        <rdfs:label>alpha cell</rdfs:label>
        <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/XX_0000002"/>
        <rdfs:subClassOf>
          <owl:Restriction>
            <owl:onProperty rdf:resource="http://purl.obolibrary.org/obo/RO_0000052"/>
            <owl:someValuesFrom rdf:resource="http://purl.obolibrary.org/obo/YY_0000009"/>
          </owl:Restriction>
        </rdfs:subClassOf>
      </owl:Class>
      <owl:Axiom>
        <owl:annotatedSource rdf:resource="http://purl.obolibrary.org/obo/XX_0000001"/>
        <owl:annotatedProperty rdf:resource="http://www.w3.org/2000/01/rdf-schema#subClassOf"/>
        <owl:annotatedTarget rdf:resource="http://purl.obolibrary.org/obo/XX_0000002"/>
        <oio:hasDbXref>PMID:99</oio:hasDbXref>
      </owl:Axiom>
    </rdf:RDF>
    """
)


def test_owl_xml_to_triples(spark):
    t = rdf.owl_xml_to_triples(spark, OWL_FIXTURE)
    rows = {(r.s, r.p.split("#")[-1].split("/")[-1], r.o) for r in t.collect()}
    xx1 = "http://purl.obolibrary.org/obo/XX_0000001"
    assert (xx1, "label", "alpha cell") in rows
    assert (xx1, "subClassOf", "http://purl.obolibrary.org/obo/XX_0000002") in rows
    # restriction became a bnode subject
    bnodes = [r for r in rows if r[0].startswith("_:")]
    assert any(p == "onProperty" for _, p, _ in bnodes)


def test_parse_term_branches(spark):
    df = spark.createDataFrame(
        [
            ("http://purl.obolibrary.org/obo/CL_0000235",),
            ("_:b12",),
            ("http://www.w3.org/2000/01/rdf-schema#label",),
            ("macrophage",),
        ],
        "t string",
    )
    out = [r.k for r in df.select(rdf.parse_term("t").alias("k")).collect()]
    assert out[0].kind == "obo_class" and out[0].ontology == "CL"
    assert out[0].number == "0000235"
    assert out[1].kind == "bnode"
    assert out[2].kind == "uri" and out[2].fragment == "label"
    assert out[3].kind == "literal"


def test_resolve_bnodes_relation_and_annotation(spark):
    t = rdf.owl_xml_to_triples(spark, OWL_FIXTURE)
    out = rdf.resolve_bnodes(t)
    xx1 = "http://purl.obolibrary.org/obo/XX_0000001"

    rels = {(r.s, r.p, r.o) for r in out["relations"].collect()}
    assert (
        xx1,
        "http://purl.obolibrary.org/obo/RO_0000052",
        "http://purl.obolibrary.org/obo/YY_0000009",
    ) in rels

    ann_t = {(r.s, r.o) for r in out["annotation_triples"].collect()}
    assert (xx1, "http://purl.obolibrary.org/obo/XX_0000002") in ann_t

    quads = {(r.s, r.p, r.o, r.lit) for r in out["annotation_quads"].collect()}
    assert (
        xx1,
        "hasDbXref",
        "http://purl.obolibrary.org/obo/XX_0000002",
        "PMID:99",
    ) in quads

    fn = out["fnode_triples"]
    assert fn.filter(F.col("s").startswith("_:") | F.col("o").startswith("_:")).count() == 0


def test_read_owl_dir_distributed(spark, tmp_path):
    """Distributed OWL parse: two files -> one triples DataFrame with
    per-file bnode namespaces."""
    (tmp_path / "a.owl").write_text(OWL_FIXTURE)
    (tmp_path / "b.owl").write_text(
        OWL_FIXTURE.replace("XX_0000001", "ZZ_0000008")
    )
    (tmp_path / "ignored.txt").write_text("not owl")
    t = rdf.read_owl_dir(spark, str(tmp_path))
    rows = t.collect()
    subjects = {r.s for r in rows}
    assert "http://purl.obolibrary.org/obo/XX_0000001" in subjects
    assert "http://purl.obolibrary.org/obo/ZZ_0000008" in subjects
    # bnodes from different files never collide
    bnodes = {r.s for r in rows if r.s.startswith("_:")}
    prefixes = {b[2:10] for b in bnodes}
    assert len(prefixes) == 2
    # downstream reification still works on the merged stream
    out = rdf.resolve_bnodes(t)
    assert out["relations"].count() == 2  # one restriction per file


def test_malformed_tuples_rows_dropped(spark, tmp_path):
    """S6 validation: wrong-arity and non-term rows are filtered, valid
    rows survive."""
    import json

    from cell_kn_mvp_etl_results_spark.sources.readers import read_tuples_json

    lines = [
        {"tuple": ["CL_1", "subClassOf", "CL_2"]},          # valid triple
        {"tuple": ["CL_1", "CL_2", "source", "PMID:1"]},     # valid quad
        {"tuple": ["CL_1", "only-two"]},                     # bad arity
        {"tuple": ["CL_1", "a", "b", "c", "d"]},             # bad arity
        {"tuple": ["no term shape", "nope", "x"]},           # fails term test
    ]
    p = tmp_path / "tuples"
    p.mkdir()
    (p / "part-0.json").write_text("\n".join(json.dumps(l) for l in lines))
    out = read_tuples_json(spark, str(p)).collect()
    assert len(out) == 2
    got = {(r.s, r.p, r.o, r.lit) for r in out}
    assert ("CL_1", "subClassOf", "CL_2", None) in got
    assert ("CL_1", "source", "CL_2", "PMID:1") in got


def test_read_ntriples(spark, tmp_path):
    nt = textwrap.dedent(
        """\
        <http://ex.org/a> <http://ex.org/p> <http://ex.org/b> .
        <http://ex.org/a> <http://www.w3.org/2000/01/rdf-schema#label> "Alpha \\"quoted\\"" .
        _:b1 <http://ex.org/p> <http://ex.org/c> .
        """
    )
    f = tmp_path / "t.nt"
    f.write_text(nt)
    rows = rdf.read_ntriples(spark, str(f)).collect()
    assert len(rows) == 3
    by_s = {(r.s, r.p): (r.o, r.is_literal) for r in rows}
    assert by_s[("http://ex.org/a", "http://ex.org/p")] == ("http://ex.org/b", False)
    lit = by_s[("http://ex.org/a", "http://www.w3.org/2000/01/rdf-schema#label")]
    assert lit[1] is True and lit[0].startswith("Alpha")
    assert ("_:b1", "http://ex.org/p") in by_s


def test_triple_type_histogram(spark):
    t = rdf.owl_xml_to_triples(spark, OWL_FIXTURE)
    hist = {
        (r.s_kind, r.p_kind, r.o_kind): r["count"]
        for r in rdf.triple_type_histogram(t).collect()
    }
    assert sum(hist.values()) == t.count()
    assert any(k[0] == "bnode" for k in hist)


RDF_EXTRAS = """\
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:obo="http://purl.obolibrary.org/obo/"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xml:base="http://example.org/">
  <owl:Class rdf:about="GO_1">
    <obo:IAO_0000233 rdf:datatype="http://www.w3.org/2001/XMLSchema#anyURI"\
>https://example.org/issues/1</obo:IAO_0000233>
    <rdfs:label xml:lang="en">macrophage activation</rdfs:label>
    <owl:equivalentClass>
      <owl:Class>
        <owl:intersectionOf rdf:parseType="Collection">
          <rdf:Description rdf:about="GO_2"/>
          <owl:Restriction>
            <owl:onProperty rdf:resource="RO_1"/>
          </owl:Restriction>
        </owl:intersectionOf>
      </owl:Class>
    </owl:equivalentClass>
  </owl:Class>
</rdf:RDF>
"""


def test_owl_parse_datatype_lang_collection(spark):
    """Guard-rail for RDF/XML beyond the plain striped subset: typed
    literals and lang literals keep lexical form only; Collections
    flatten to one membership row per member (documented behavior,
    _parse_owl_rows docstring)."""
    triples = rdf.owl_xml_to_triples(spark, RDF_EXTRAS)
    rows = {(r.s, r.p, r.o, r.is_literal) for r in triples.collect()}
    # rdf:datatype literal -> lexical value, datatype dropped
    assert ("GO_1", "http://purl.obolibrary.org/obo/IAO_0000233",
            "https://example.org/issues/1", True) in rows
    assert not any("anyURI" in o for _, _, o, _ in rows)
    # xml:lang literal -> text only, tag dropped
    assert ("GO_1", "http://www.w3.org/2000/01/rdf-schema#label",
            "macrophage activation", True) in rows
    # Collection -> one row per member on the containing bnode; the
    # Restriction member is itself a bnode carrying its onProperty
    inter = [r for r in rows if r[1].endswith("intersectionOf")]
    assert len(inter) == 2  # GO_2 + the Restriction bnode
    members = {o for _, _, o, _ in inter}
    assert "GO_2" in members
    bnodes = members - {"GO_2"}
    assert len(bnodes) == 1 and next(iter(bnodes)).startswith("_:")
    assert any(r[0] in bnodes and r[1].endswith("onProperty") for r in rows)


def test_owl_parse_reference_fixtures(spark):
    """Parse the reference's real OBO fixtures end-to-end (read-only):
    every subject non-empty, every literal flagged, typed-literal text
    preserved."""
    import os

    import pytest

    fixture_dir = "/root/reference/src/test/data/obo"
    if not os.path.isdir(fixture_dir):
        pytest.skip("reference fixtures not available")
    for fnm in ("macrophage.owl", "ro.owl"):
        with open(os.path.join(fixture_dir, fnm)) as f:
            triples = rdf.owl_xml_to_triples(spark, f.read())
        n = triples.count()
        assert n > 100, fnm
        assert triples.filter((F.col("s") == "") | F.col("s").isNull()).count() == 0
        assert triples.filter(F.col("is_literal")).count() > 0
    # the macrophage fixture's xsd:anyURI literals keep lexical form
    with open(os.path.join(fixture_dir, "macrophage.owl")) as f:
        t = rdf.owl_xml_to_triples(spark, f.read())
    issues = t.filter(
        F.col("o").contains("github.com/geneontology/go-ontology/issues")
    )
    assert issues.count() > 0
    assert issues.filter(~F.col("is_literal")).count() == 0
