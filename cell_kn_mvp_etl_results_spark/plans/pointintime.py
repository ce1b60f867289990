"""Point-in-time join + deterministic sampling -- training-data-pipeline
operators beyond the reference's surface (SURVEY.md notes it has no
theta/range/as-of joins at all; a feature pipeline needs them for
leakage-free joins, and needs reproducible sampling for dataset splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import read_table
from .registry import TAIL, query


@query(
    "q_asof_join",
    tags=("join", "asof"),
    oracle="""
WITH ranked AS (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o
    ON o.o_custkey = e.user_id
   AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, o_orderkey AS last_orderkey,
       o_totalprice AS last_totalprice
FROM ranked WHERE rn = 1
ORDER BY event_id
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF (point-in-time) join: for each event, the most recent order
    of the same key strictly at-or-before the event time -- the
    leakage-free feature join every training pipeline needs. Spark
    shape: range-predicated equi-join + top-1 window (deterministic
    tie-break on orderkey). At scale, bound the range predicate with a
    time-bucket equi-key so the join does not degenerate into
    key-wise cross products across all history.
    """
    e = read_table(spark, sf_dir, "events")
    o = read_table(spark, sf_dir, "orders")
    # ts is LTZ; casting to NTZ would shift with the caller's session
    # timezone. Rebuild the (second-precision) NTZ wall-clock value by
    # pure arithmetic instead -- o_orderdate values are whole days, so
    # second truncation cannot flip the comparison.
    ts_ntz = F.expr(
        "timestampadd(SECOND, CAST(unix_micros(ts) div 1000000 AS BIGINT), "
        "timestamp_ntz'1970-01-01 00:00:00')"
    )
    joined = e.withColumn("ts_ntz", ts_ntz).join(
        o,
        (o.o_custkey == e.user_id) & (F.col("o_orderdate") <= F.col("ts_ntz")),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_totalprice").alias("last_totalprice"),
        )
        .orderBy("event_id")
    )


@query(
    "q_sample_hash",
    tags=("sampling",),
    # r4 rotation: promoted for a driver artifact row (pytest-only
    # through r3); q_sample_stratified and q_mixture_sample anchor the
    # sampling family.
    oracle="""
SELECT lang,
       count(*) AS n_sampled,
       min(doc_id) AS first_doc
FROM documents
WHERE ('0x' || substr(md5('seed42-' || doc_id), 1, 8))::BIGINT % 100 < 20
GROUP BY lang
ORDER BY lang
""",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% hash sample (content-addressed: the same doc is
    in or out regardless of partitioning, cluster size, or engine --
    unlike rand()-based sampling). The per-language counts audit
    stratification drift. Portable md5-derived bucket, same as the
    dedup hashes."""
    d = read_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("seed42-"), F.col("doc_id"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    return (
        d.filter(bucket < 20)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("first_doc"))
        .orderBy("lang")
    )


@query(
    "q_sample_stratified",
    tags=("sampling",),
    oracle="""
SELECT source, doc_id, rnk
FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('strat7-' || doc_id), doc_id
         ) AS rnk
  FROM documents
)
WHERE rnk <= 5
ORDER BY source, rnk
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum quota sample: exactly k docs per
    source, chosen by content-addressed md5 rank -- the balanced-split
    sampler a training pipeline uses so strata with wildly different
    sizes contribute equally, reproducibly across engines and
    partitionings.

    Scale shape: the rank<=k predicate compiles to WindowGroupLimit
    (Spark >= 3.5), which takes a partial per-partition top-k BEFORE
    the shuffle on source -- the reduce side sees at most k rows per
    (map partition, stratum), never the full stratum. Skewed sources
    therefore cannot overload a reducer.
    """
    d = read_table(spark, sf_dir, "documents")
    rank_key = F.md5(F.concat(F.lit("strat7-"), F.col("doc_id")))
    w = Window.partitionBy("source").orderBy(rank_key, "doc_id")
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 5)
        .orderBy("source", "rnk")
    )
