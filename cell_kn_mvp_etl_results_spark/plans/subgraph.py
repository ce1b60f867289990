"""T8 in the correctness gate: run a typed-path battery, harvest the
touched subgraph, and report it -- the phenotype-extraction lifecycle
(``PhenotypeGraphBuilder.java:48-258``) end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from ..sources.sinks import extract_subgraph
from .battery import PathSpec, run_battery
from .registry import query


@query(
    "q_subgraph_extract",
    tags=("graph", "T8", "K5"),
    oracle="""
WITH cust AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
co AS (
  SELECT DISTINCT 'C' AS sc, CAST(o_custkey AS VARCHAR) AS sk,
         'O' AS dc, CAST(o_orderkey AS VARCHAR) AS dk
  FROM orders JOIN cust ON o_custkey = c_custkey
),
op AS (
  SELECT DISTINCT 'O' AS sc, CAST(l_orderkey AS VARCHAR) AS sk,
         'P' AS dc, CAST(l_partkey AS VARCHAR) AS dk
  FROM lineitem WHERE l_orderkey IN (SELECT CAST(dk AS BIGINT) FROM co)
),
all_e AS (SELECT * FROM co UNION ALL SELECT * FROM op)
SELECT sc AS src_coll, dc AS dst_coll, count(*) AS n_edges
FROM all_e GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_subgraph_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8/K5: battery of two path specs anchored at one customer
    segment; every edge any path touched is harvested into the
    phenotype subgraph (dropDuplicates replaces the reference's O(n^2)
    List.contains dedup); reported per collection pair.
    """
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    c = read_table(spark, sf_dir, "customer")

    def edge(sc, sk, dc, dk, df):
        # Dedup on the raw LONG keys and stringify after (guide §2.3
        # "narrower types"): the distinct shuffle carries 16 fixed
        # bytes per edge instead of two variable-length strings.
        return (
            df.select(F.col(sk).alias("_sk"), F.col(dk).alias("_dk"))
            .dropDuplicates()
            .select(
                F.lit(sc).alias("src_coll"),
                F.col("_sk").cast("string").alias("src_key"),
                F.lit(dc).alias("dst_coll"),
                F.col("_dk").cast("string").alias("dst_key"),
                F.lit("has").alias("label"),
            )
        )

    # The deduped edge union is referenced by BOTH battery specs and
    # again by the extraction semi-join; Catalyst plans each reference
    # independently, so without materialization the two dedup shuffles
    # execute up to 3x per run (guide §3.3: materialise an intermediate
    # to truncate the plan). An eager per-run localCheckpoint computes
    # them once and every downstream hop/semi-join reads the
    # checkpointed blocks; nothing survives the run's DataFrame, so
    # rebuild runs stay honest from-scratch executions. Measured
    # 5.25 -> 4.70 s interleaved rebuild median at sf0.1 (box in its
    # noisy band; every pairwise sample but one favoured the
    # checkpointed shape), rows pinned identical.
    edges = edge("C", "o_custkey", "O", "o_orderkey", o).unionByName(
        edge("O", "l_orderkey", "P", "l_partkey", li)
    ).localCheckpoint(eager=True)
    anchors = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.lit("C").alias("coll"), F.col("c_custkey").cast("string").alias("key")
    )
    vertices = anchors  # battery only needs anchor rows from `vertices`
    specs = [
        PathSpec("C-O", anchor="C", hops=["O"], any_direction=False),
        PathSpec("C-O-P", anchor="C", hops=["O", "P"], any_direction=False),
    ]
    out = run_battery(vertices, edges, specs)
    sub = extract_subgraph(edges, out["_touched_edges"])
    return (
        sub["edges"]
        .groupBy("src_coll", "dst_coll")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .orderBy("src_coll", "dst_coll")
    )
