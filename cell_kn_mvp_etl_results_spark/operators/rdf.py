"""RDF/OWL ingestion and BNode reification resolution
(SURVEY.md sections 2.1 S4/S5, 2.9 C4, 2.10 T5, 2.5 A6).

The reference parses OWL ontologies with rdflib + lxml
(``OntologyParserLoader.py:152-215``, ``:1243-1261``) and resolves
reified OWL constructs by grouping triples around shared blank nodes
(``OntologyParserLoader.py:315-586``). Neither rdflib nor lxml is
assumed here:

  * corpus-scale RDF arrives as N-Triples -> pure-DataFrame line parse
    (regex split; distributes like any text scan);
  * OWL/XML ontology files are dimension-scale -> stdlib xml.etree
    parse on the driver, emitted as a triples DataFrame.

Reification resolution is pure DataFrame algebra: group the
bnode-subject triples (A6), pivot the defining predicates into columns,
and reconstruct relation triples / annotation quads relationally.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# C4: the reference's URIREF_PATTERN (OntologyParserLoader.py:40) --
# OBO PURL terms like .../obo/CL_0000235.
OBO_TERM_RE = r"/obo/([A-Za-z][A-Za-z0-9]*)_([A-Za-z0-9\-+]+)$"

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"


def parse_term(col: Column | str) -> Column:
    """C4 ``parse_term``: classify a term string into a struct
    (kind, ontology, number, fragment) -- kind in
    {obo_class, bnode, uri, literal}.

    Reference: ``OntologyParserLoader.py:218-283`` (regex + URL-fragment
    rules). Pure Catalyst expression: regexp_extract + when-dispatch.
    """
    c = F.col(col) if isinstance(col, str) else col
    onto = F.regexp_extract(c, OBO_TERM_RE, 1)
    num = F.regexp_extract(c, OBO_TERM_RE, 2)
    frag = F.substring_index(c, "#", -1)
    is_uri = c.startswith("http")
    is_bnode = c.startswith("_:")
    kind = (
        F.when(is_bnode, "bnode")
        .when(is_uri & (onto != ""), "obo_class")
        .when(is_uri, "uri")
        .otherwise("literal")
    )
    return F.struct(
        kind.alias("kind"),
        F.when(onto != "", onto).alias("ontology"),
        F.when(num != "", num).alias("number"),
        F.when(is_uri & ~c.contains("/obo/"), frag).alias("fragment"),
    )


# Plain (unnamed) groups: the pattern is compiled by Java's regex
# engine inside regexp_extract, which rejects Python's (?P<name> syntax.
_NT_LINE = r"^(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+(.+?)\s*\.\s*$"


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """S5: N-Triples scan as a distributed text parse -> triples
    (s, p, o, is_literal). Every line is independent, so this scales
    like any line-oriented scan (no cross-row state)."""
    lines = spark.read.text(path)
    s = F.regexp_extract("value", _NT_LINE, 1)
    p = F.regexp_extract("value", _NT_LINE, 2)
    o = F.regexp_extract("value", _NT_LINE, 3)
    strip_angle = lambda c: F.regexp_replace(c, r"^<|>$", "")  # noqa: E731
    is_lit = o.startswith('"')
    o_clean = F.when(
        is_lit, F.regexp_extract(o, r'^"((?:[^"\\]|\\.)*)"', 1)
    ).otherwise(strip_angle(o))
    return (
        lines.filter(s != "")
        .select(
            strip_angle(s).alias("s"),
            strip_angle(p).alias("p"),
            o_clean.alias("o"),
            is_lit.alias("is_literal"),
        )
    )


def owl_xml_to_triples(spark: SparkSession, xml_text: str) -> DataFrame:
    """S4: OWL (RDF/XML striped syntax, the OBO subset) -> triples
    DataFrame (s, p, o, is_literal). Blank nodes get stable synthetic
    ids ``_:bN`` in document order, mirroring rdflib's BNode role.

    Ontologies are dimension tables (MBs, not TBs), so the XML parse
    runs on the driver; the *output* is a DataFrame that joins into the
    distributed pipeline. Corpus-scale RDF should arrive as N-Triples
    (read_ntriples) instead.
    """
    return spark.createDataFrame(
        _parse_owl_rows(xml_text), "s string, p string, o string, is_literal boolean"
    )


def read_owl_dir(spark: SparkSession, path: str) -> DataFrame:
    """S4 at scale: distributed OWL/XML parse. Files are read via the
    binaryFile source and parsed per-file inside mapInPandas (stdlib
    etree), so N ontology files parse on N cores and the driver never
    holds documents. BNode ids are prefixed with a per-file hash so
    blank nodes cannot collide across documents.
    """
    import pandas as pd

    def parse(batches):
        import hashlib

        for pdf in batches:
            out = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                prefix = hashlib.md5(str(fpath).encode()).hexdigest()[:8]
                rows = _parse_owl_rows(bytes(content).decode("utf-8"), bnode_prefix=prefix)
                out.extend(rows)
            yield pd.DataFrame(
                out, columns=["s", "p", "o", "is_literal"]
            )

    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.owl").load(path)
    return files.select("path", "content").mapInPandas(
        parse, "s string, p string, o string, is_literal boolean"
    )


def _parse_owl_rows(
    xml_text: str, bnode_prefix: str = "b"
) -> list[tuple[str, str, str, bool]]:
    """Shared RDF/XML striped-syntax walker (used by the driver-side
    and distributed entry points).

    Explicit handling of the RDF/XML features beyond the plain striped
    subset (guard-railed by tests/test_rdf.py):

    * ``rdf:datatype`` typed literals keep their *lexical form* only --
      the reference stringifies rdflib Literals the same way
      (``OntologyParserLoader.parse_term`` str()s the term), so
      ``xsd:anyURI``/``xsd:boolean``... tags are intentionally not
      propagated into the tuples IR.
    * ``xml:lang`` literals likewise keep text only; language tags are
      dropped on purpose (the reference pipeline never reads them).
    * ``rdf:parseType="Collection"`` (rdf:List in OBO
      ``owl:intersectionOf``) flattens to one (s, p, member) row per
      member instead of rdflib's first/rest bnode chain: downstream
      consumers (graph assembly, bnode reification) want the membership
      relation, not the cons cells.
    """
    rows: list[tuple[str, str, str, bool]] = []
    counter = [0]

    def qname(tag: str) -> str:
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns + local
        return tag

    def attr(el: ET.Element, name: str) -> str | None:
        return el.get(f"{{{RDF_NS}}}{name}")

    def new_bnode() -> str:
        counter[0] += 1
        return f"_:{bnode_prefix}{counter[0]}"

    def walk_node(el: ET.Element) -> str:
        subject = attr(el, "about") or attr(el, "ID") or new_bnode()
        type_uri = qname(el.tag)
        if type_uri not in (RDF_NS + "Description",):
            rows.append((subject, RDF_NS + "type", type_uri, False))
        for pred_el in el:
            pred = qname(pred_el.tag)
            res = attr(pred_el, "resource")
            if res is not None:
                rows.append((subject, pred, res, False))
                continue
            children = list(pred_el)
            if children:
                for child in children:
                    obj = walk_node(child)
                    rows.append((subject, pred, obj, False))
            else:
                rows.append((subject, pred, pred_el.text or "", True))
        return subject

    root = ET.fromstring(xml_text)
    for el in root:
        walk_node(el)
    return rows


def triple_type_histogram(triples: DataFrame) -> DataFrame:
    """A5: count triples grouped by the term-kind of (s, p, o)
    (reference ``OntologyParserLoader.py:286-312``)."""
    return (
        triples.select(
            parse_term("s")["kind"].alias("s_kind"),
            parse_term("p")["kind"].alias("p_kind"),
            F.when(F.col("is_literal"), "literal")
            .otherwise(parse_term("o")["kind"])
            .alias("o_kind"),
        )
        .groupBy("s_kind", "p_kind", "o_kind")
        .count()
    )


def resolve_bnodes(triples: DataFrame) -> dict[str, DataFrame]:
    """T5: BNode reification resolution, relationally.

    The reference partitions OWL triples into fnode triples (no BNode)
    and BNode-keyed sets (A6 group-collect,
    ``OntologyParserLoader.py:315-413``), then reconstructs from each set

      * a **relation**: bnode typed owl:Restriction with owl:onProperty P
        and owl:someValuesFrom O, referenced by (S, rdfs:subClassOf, B)
        => (S, P, O)                      (``:492-495``)
      * an **annotation**: bnode with owl:annotatedSource/Property/Target
        exactly-3 defining triples => (S, P, T) plus each extra literal
        on the bnode as an edge-annotation quad (S, T, pred, lit)
        (``:497-545``; exactly-3 rule ``:506-556``)

    Here the group-collect becomes a conditional-aggregation pivot over
    the bnode key -- one shuffle per construct, no per-row Python.
    Returns {"fnode_triples", "relations", "annotation_triples",
    "annotation_quads"}.
    """
    is_bnode = lambda c: F.col(c).startswith("_:")  # noqa: E731

    fnode = triples.filter(~is_bnode("s") & ~is_bnode("o"))
    bsubj = triples.filter(is_bnode("s"))

    # Pivot each bnode's defining predicates into columns. The local
    # name is taken after '#', '/' and ':' so full URIs and CURIEs
    # ('owl:annotatedSource') resolve to the same key.
    pred = F.substring_index(
        F.substring_index(F.substring_index("p", "#", -1), "/", -1), ":", -1
    )
    pivoted = (
        bsubj.select(F.col("s").alias("bnode"), pred.alias("pred"), "o", "is_literal")
        .groupBy("bnode")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.min(F.when(F.col("pred") == "onProperty", F.col("o"))).alias("on_property"),
            F.min(F.when(F.col("pred") == "someValuesFrom", F.col("o"))).alias(
                "some_values_from"
            ),
            F.min(F.when(F.col("pred") == "annotatedSource", F.col("o"))).alias("a_src"),
            F.min(F.when(F.col("pred") == "annotatedProperty", F.col("o"))).alias(
                "a_prop"
            ),
            F.min(F.when(F.col("pred") == "annotatedTarget", F.col("o"))).alias("a_tgt"),
            # literal-ness of the annotated target rides along: an
            # owl:Axiom may annotate a LITERAL triple (definitions,
            # synonyms -- the dominant pattern in real OBO files), and
            # dropping the flag would misclassify those as URI edges
            F.min(
                F.when(F.col("pred") == "annotatedTarget", F.col("is_literal"))
            ).alias("a_tgt_lit"),
            F.sum(
                F.when(
                    F.col("pred").isin(
                        "annotatedSource", "annotatedProperty", "annotatedTarget"
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_defining"),
        )
    )

    # Relations: (S, subClassOf, B) x restriction-bnodes.
    sub_to_bnode = triples.filter(
        is_bnode("o") & F.col("p").endswith("subClassOf")
    ).select(F.col("s").alias("rel_s"), F.col("o").alias("bnode"))
    relations = (
        sub_to_bnode.join(
            pivoted.filter(
                F.col("on_property").isNotNull()
                & F.col("some_values_from").isNotNull()
            ),
            "bnode",
        )
        .select(
            F.col("rel_s").alias("s"),
            F.col("on_property").alias("p"),
            F.col("some_values_from").alias("o"),
        )
    )

    # Annotations: exactly the 3 defining triples (reference requires
    # len==3) -> reconstructed triple; extra literals -> quads.
    ann = pivoted.filter(
        F.col("a_src").isNotNull()
        & F.col("a_prop").isNotNull()
        & F.col("a_tgt").isNotNull()
        & (F.col("n_defining") == 3)
    )
    annotation_triples = ann.select(
        F.col("a_src").alias("s"),
        F.col("a_prop").alias("p"),
        F.col("a_tgt").alias("o"),
        F.coalesce(F.col("a_tgt_lit"), F.lit(False)).alias("is_literal"),
    )
    extras = (
        bsubj.select(
            F.col("s").alias("bnode"), pred.alias("pred"), "o", "is_literal"
        )
        .filter(
            F.col("is_literal")
            & ~F.col("pred").isin(
                "annotatedSource", "annotatedProperty", "annotatedTarget"
            )
        )
    )
    annotation_quads = (
        ann.join(extras, "bnode")
        .select(
            F.col("a_src").alias("s"),
            F.col("pred").alias("p"),
            F.col("a_tgt").alias("obj"),
            F.col("o").alias("lit"),
        )
        .withColumnRenamed("obj", "o")
        .select("s", "p", "o", "lit")
    )

    return {
        "fnode_triples": fnode,
        "relations": relations,
        "annotation_triples": annotation_triples,
        "annotation_quads": annotation_quads,
    }
