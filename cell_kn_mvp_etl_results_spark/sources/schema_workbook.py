"""Schema-as-data pipeline (SURVEY.md S3, T4, J8, U2, F7).

The reference treats the Cell KN schema itself as data: an Excel
workbook of (Subject Node, Predicate Relation, Object Node) rows plus a
term->CURIE sheet, cleaned, CURIE-joined, and loaded as its own graph
(``CellKnSchemaUtilities.py:11-332``). Native .xlsx is read through the
stdlib codec in :mod:`.xlsx` (no Excel engine needed); CSV exports of
the two sheets remain accepted as a lossless interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lookup import broadcast_lookup
from .xlsx import xlsx_to_df


def read_schema_sheets(
    spark: SparkSession, schema_path: str, terms_path: str
) -> tuple[DataFrame, DataFrame]:
    """Read the schema rows + term->CURIE sheets from .xlsx or CSV.

    Mirrors ``CellKnSchemaUtilities.py:28-29``: the reference reads
    sheet 0 (schema triples) and sheet 2 (term->CURIE) of one workbook,
    so passing the same .xlsx path twice reproduces it exactly.
    """
    if schema_path.endswith(".xlsx"):
        schema = xlsx_to_df(spark, schema_path, sheet=0)
        sheet = 2 if terms_path == schema_path else 0
        terms = xlsx_to_df(spark, terms_path, sheet=sheet)
        return schema, terms
    read = lambda p: spark.read.option("header", True).csv(p)  # noqa: E731
    return read(schema_path), read(terms_path)


def clean_schema(schema: DataFrame) -> DataFrame:
    """F7: drop Cellular_component rows; strip structural suffixes
    (``(subtype/child)``, ``(parent)``, ``/pathway``, ``_class``) --
    reference ``CellKnSchemaUtilities.py:33-65``."""
    strip = lambda c: F.regexp_replace(  # noqa: E731
        c, r"\s*\((?:subtype/child|parent)\)|/pathway|_class", ""
    )
    return (
        schema.filter(F.col("subject") != "Cellular_component")
        .filter(F.col("object") != "Cellular_component")
        .select(
            strip(F.col("subject")).alias("subject"),
            F.col("predicate"),
            strip(F.col("object")).alias("object"),
        )
    )


def curie_join(schema: DataFrame, terms: DataFrame) -> DataFrame:
    """J8: look up subject/object/predicate CURIEs with 'NA' default
    (``CellKnSchemaUtilities.py:87-107``)."""
    dim = terms.select(F.col("term").alias("_k"), F.col("curie").alias("_v"))
    out = schema
    for col in ("subject", "predicate", "object"):
        out = broadcast_lookup(
            out.withColumn("_k", F.col(col)),
            dim,
            "_k",
            "_v",
            out=f"{col}_curie",
            default="NA",
        ).drop("_k")
    return out


def consistency_report(schema: DataFrame, terms: DataFrame) -> dict[str, DataFrame]:
    """U2: schema terms missing from the CURIE sheet, per role
    (``CellKnSchemaUtilities.py:69-77``: set differences)."""
    known = terms.select(F.col("term").alias("t")).distinct()
    out = {}
    for col in ("subject", "predicate", "object"):
        out[col] = (
            schema.select(F.col(col).alias("t")).distinct().exceptAll(known)
        )
    return out


def schema_graph_tuples(curied: DataFrame) -> DataFrame:
    """T4: emit schema tuples (one edge per schema row, keyed
    ``{s}-{p}-{o}`` as the reference does,
    ``CellKnSchemaUtilities.py:301-332``)."""
    return curied.select(
        F.col("subject_curie").alias("s"),
        F.col("predicate_curie").alias("p"),
        F.col("object_curie").alias("o"),
        F.lit(None).cast("string").alias("lit"),
        F.concat_ws("-", "subject_curie", "predicate_curie", "object_curie").alias(
            "edge_key"
        ),
    )
