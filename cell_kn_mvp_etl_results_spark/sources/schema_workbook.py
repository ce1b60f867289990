"""Schema-as-data pipeline (SURVEY.md S3, T4, J8, U2, F7).

The reference treats the Cell KN schema itself as data: an Excel
workbook of (Subject Node, Predicate Relation, Object Node) rows plus a
term->CURIE sheet, cleaned, CURIE-joined, and loaded as its own graph
(``CellKnSchemaUtilities.py:11-332``). Excel engines may be absent, so
the loader accepts CSV exports of the two sheets (the lossless
interchange) and uses pandas-on-Spark's read_excel only when openpyxl
is importable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lookup import broadcast_lookup


def read_schema_sheets(
    spark: SparkSession, schema_path: str, terms_path: str
) -> tuple[DataFrame, DataFrame]:
    """Read the schema rows + term->CURIE sheets from CSV (or .xlsx when
    an Excel engine is available)."""
    if schema_path.endswith((".xlsx", ".xls")):
        try:
            import pyspark.pandas as ps

            schema = ps.read_excel(schema_path, sheet_name=0).to_spark()
            terms = ps.read_excel(terms_path, sheet_name=2).to_spark()
            return schema, terms
        except ImportError as e:  # openpyxl missing
            raise ImportError(
                "Excel engine unavailable; export the workbook sheets to "
                "CSV and pass those paths instead"
            ) from e
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
