"""Analytics staples: exact percentiles (deterministic rank selection --
no interpolation-formula drift between engines) and pivot/conditional
aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import read_table
from .registry import TAIL, query


@query(
    "q_percentiles",
    tags=("agg", "window"),
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment, c_acctbal, c_custkey,
         row_number() OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
         ) AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
)
SELECT c_mktsegment,
       min(CASE WHEN rn = (n - 1) // 2 + 1 THEN c_acctbal END) AS p50,
       min(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN c_acctbal END) AS p90
FROM ranked
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 by deterministic rank selection: the value at row
    floor((n-1)*p)+1 of the (value, key)-ordered group. Avoids
    interpolation entirely, so any engine agrees bit-for-bit; the raw
    parquet double is emitted unchanged. One shuffle (the window), one
    tiny agg.
    """
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    ranked = c.select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda p_num, p_den: F.min(  # noqa: E731
        F.when(
            F.col("rn") == F.floor((F.col("n") - 1) * p_num / p_den) + 1,
            F.col("c_acctbal"),
        )
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(pick(1, 2).alias("p50"), pick(9, 10).alias("p90"))
        .orderBy("c_mktsegment")
    )


@query(
    "q_pivot",
    tags=("agg", "pivot"),
    # r4 rotation: 2 green driver rows (r2-r3); its slot goes to the new
    # q_interval_join so the interval-join operator earns a driver
    # artifact row. Still oracle-checked by pytest.
    priority=TAIL,
    oracle="""
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): order counts by priority x
    status. The explicit value list keeps the schema static -- the only
    sane pivot at scale (dynamic pivots scan twice to discover columns).
    """
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    )
