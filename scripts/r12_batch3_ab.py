"""Interleaved same-session rebuild A/B for the third r12 batch:
q_hierarchy_longest (path-only frontier through the traversal loop),
q_incremental_cycle (delta1's bucket index computed once and shared by
probe + upsert), q_jaccard_prefix (verify sets derived from the ordered
prefix aggregation instead of a second corpus-wide groupBy),
q_hll_overlap (distinct token set computed once; the tiny register
table checkpointed instead of re-derived per reference).

Same protocol as r12_batch2_ab.py: OLD = the current registry builder,
NEW = the candidate inline; timed alternately A,B,A,B,... under the
bench's rebuild regime (warm table cache, plans rebuilt per run), rows
AND dtypes compared for identity first.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r12_batch3_ab.py [pairs]
Prints one JSON line {name: {"old": med, "new": med, "rows_equal": bool}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
os.environ["SPARK_GRAFT_CACHE_TABLES"] = "all"
os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators import dedup as dd
from cell_kn_mvp_etl_results_spark.operators import sketches as sk
from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.session import get_spark
from cell_kn_mvp_etl_results_spark.sources.readers import read_table


# --- q_hierarchy_longest: path-only frontier ------------------------------


def _hierarchy_longest_path_new(edges, start, label=None, max_depth=64):
    """Frontier carries ONLY the path string: node (last element),
    start (first element), depth (size-1) and the visited set (split)
    are all derivable, so each round's shuffle + eager checkpoint moves
    one string instead of (start, node, depth, path, visited[]).
    Exact under the operator's existing output contract that node ids
    contain no '/' (consumers split the emitted path on '/')."""
    e = edges if label is None else edges.filter(F.col("label") == label)
    e = (
        e.select(
            F.concat_ws("_", "src_coll", "src_key").alias("src"),
            F.concat_ws("_", "dst_coll", "dst_key").alias("dst"),
        )
        .repartition(F.col("src"))
        .persist()
    )
    frontier = start.select(F.concat_ws("_", "coll", "key").alias("path"))
    all_paths = frontier
    depth = 0
    while depth < max_depth:
        nxt = (
            frontier.select(
                "path", F.substring_index("path", "/", -1).alias("node")
            )
            .join(e, F.col("node") == e.src)
            .filter(~F.array_contains(F.split("path", "/"), F.col("dst")))
            .select(F.concat_ws("/", "path", "dst").alias("path"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        all_paths = all_paths.union(nxt)
        frontier = nxt
        depth += 1
    e.unpersist()
    parts = F.split("path", "/")
    w = Window.partitionBy("start").orderBy(F.desc("depth"), "path")
    return (
        all_paths.select(
            F.substring_index("path", "/", 1).alias("start"),
            (F.size(parts) - F.lit(1)).alias("depth"),
            "path",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("start", "depth", "path")
    )


def new_q_hierarchy_longest(spark: SparkSession, sf: str) -> DataFrame:
    n = read_table(spark, sf, "nation")
    c = read_table(spark, sf, "customer")
    o = read_table(spark, sf, "orders")
    r = read_table(spark, sf, "region")

    def edge(src_coll, src_key, dst_coll, dst_key, df):
        return df.select(
            F.lit(src_coll).alias("src_coll"),
            F.col(src_key).cast("string").alias("src_key"),
            F.lit(dst_coll).alias("dst_coll"),
            F.col(dst_key).cast("string").alias("dst_key"),
            F.lit("contains").alias("label"),
        )

    edges = (
        edge("R", "n_regionkey", "N", "n_nationkey", n)
        .union(edge("N", "c_nationkey", "C", "c_custkey", c))
        .union(edge("C", "o_custkey", "O", "o_orderkey", o))
    )
    start = r.select(
        F.lit("R").alias("coll"), F.col("r_regionkey").cast("string").alias("key")
    )
    return _hierarchy_longest_path_new(
        edges, start, label="contains", max_depth=64
    ).orderBy("start")


# --- q_incremental_cycle: share delta1's bucket index ----------------------


def new_q_incremental_cycle(spark: SparkSession, sf: str) -> DataFrame:
    from cell_kn_mvp_etl_results_spark.plans.llmdata import (
        _incr_cycle_base_index,
    )

    d = read_table(spark, sf, "documents")
    m = F.col("doc_id") % 10
    base = d.filter((m != 0) & (m != 5))
    delta1 = d.filter(m == 0)
    delta2 = d.filter(m == 5)
    idx0 = _incr_cycle_base_index(spark, sf, base)
    # delta1's (id, band, bucket, sig) rows feed BOTH the p1 probe and
    # the idx1 upsert -- computed once per run (|delta| rows).
    d1_idx = dd.minhash_bucket_index(delta1, "doc_id", "text").localCheckpoint(
        eager=True
    )
    d1_buckets = d1_idx.select(
        F.col("id").alias("delta_id"),
        "band",
        "bucket",
        F.col("sig").alias("delta_sig"),
    )
    b0 = idx0.select(
        F.col("id").alias("base_id"),
        "band",
        "bucket",
        F.col("sig").alias("base_sig"),
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("delta_sig"),
            F.col("base_sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    p1 = (
        d1_buckets.join(b0, ["band", "bucket"])
        .select(
            "delta_id", "base_id", (matches / F.lit(32.0)).alias("est_jaccard")
        )
        .groupBy("delta_id", "base_id")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.25)
        .withColumn("kind", F.lit("delta1"))
    )
    idx1 = idx0.unionByName(d1_idx)
    p2 = dd.incremental_minhash_pairs(idx1, delta2, "doc_id", "text").withColumn(
        "kind", F.lit("delta2")
    )
    return (
        p1.unionByName(p2)
        .select("delta_id", "base_id", "est_jaccard", "kind")
        .orderBy("delta_id", "base_id")
    )


# --- q_jaccard_prefix: verify sets from the ordered aggregation ------------


def _jaccard_pairs_prefix_new(df, id_col, text_col, n=3, threshold=0.5):
    sh = (
        dd.shingle_set(df, id_col, text_col, n)
        .select("id", dd.portable_hash48(F.col("shingle")).alias("shingle"))
        .dropDuplicates()
        .persist()
    )
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
    ordered = (
        sh.join(freq, "shingle")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("freq", "shingle"))).alias("ord"))
        .persist()
    )
    sz = F.size("ord")
    p = (sz - F.ceil(sz * F.lit(threshold)) + 1).cast("int")
    prefix = ordered.select(
        "id",
        sz.alias("sz"),
        F.explode(
            F.transform(F.slice("ord", F.lit(1), p), lambda s: s["shingle"])
        ).alias("shingle"),
    )
    a = prefix.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "shingle")
    b = prefix.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("sz_a", "sz_b")
            >= F.greatest("sz_a", "sz_b") * F.lit(threshold) - F.lit(1.0)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # The verify sets are a projection of `ord` (sh is (id, shingle)-
    # distinct, so the collected list IS the set; only sizes of
    # intersections are consumed, so element order is irrelevant).
    sets = ordered.select(
        "id", F.transform("ord", lambda s: s["shingle"]).alias("shset")
    )
    sets_a = sets.select(F.col("id").alias("id_a"), F.col("shset").alias("set_a"))
    sets_b = sets.select(F.col("id").alias("id_b"), F.col("shset").alias("set_b"))
    return (
        cand.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("set_a", "set_b")).cast("long")
        )
        .withColumn(
            "union_sz",
            (F.size("set_a") + F.size("set_b")).cast("long") - F.col("inter"),
        )
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union_sz", "jaccard")
    )


def new_q_jaccard_prefix(spark: SparkSession, sf: str) -> DataFrame:
    d = read_table(spark, sf, "documents")
    return _jaccard_pairs_prefix_new(d, "doc_id", "text", n=3, threshold=0.5).orderBy(
        "id_a", "id_b"
    )


# --- q_hll_overlap: one distinct-token scan, checkpointed registers --------


def new_q_hll_overlap(spark: SparkSession, sf: str) -> DataFrame:
    d = read_table(spark, sf, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    # Registers are a function of the DISTINCT (source, tok) set, so
    # the exact-audit distinct is computed once and feeds both the
    # sketch and the audit self-join.
    dt = toks.distinct().persist()
    regs = sk.hll_registers(dt, "tok", "source").localCheckpoint(eager=True)
    srcs = regs.select("source").distinct()
    prs = (
        srcs.select(F.col("source").alias("src_a"))
        .crossJoin(srcs.select(F.col("source").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    members = prs.select(
        "src_a", "src_b", F.explode(F.array("src_a", "src_b")).alias("source")
    )
    uregs = (
        members.join(regs, "source")
        .groupBy("src_a", "src_b", "bucket")
        .agg(F.max("r").alias("r"))
    )
    uest = sk.hll_estimate(uregs, "src_a", "src_b").withColumnRenamed(
        "est_distinct", "est_union"
    )
    sest = sk.hll_estimate(regs, "source")
    ov = (
        dt.select(F.col("source").alias("src_a"), "tok")
        .join(dt.select(F.col("source").alias("src_b"), "tok"), "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    ea = sest.select(
        F.col("source").alias("src_a"), F.col("est_distinct").alias("_ea")
    )
    eb = sest.select(
        F.col("source").alias("src_b"), F.col("est_distinct").alias("_eb")
    )
    return (
        prs.join(uest, ["src_a", "src_b"])
        .join(ea, "src_a")
        .join(eb, "src_b")
        .join(ov, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            (F.col("_ea") + F.col("_eb") - F.col("est_union"))
            .cast("long")
            .alias("est_overlap"),
            "est_union",
            F.coalesce(F.col("exact_overlap"), F.lit(0))
            .cast("long")
            .alias("exact_overlap"),
        )
        .orderBy("src_a", "src_b")
    )


CASES = {
    "q_hierarchy_longest": new_q_hierarchy_longest,
    "q_incremental_cycle": new_q_incremental_cycle,
    "q_jaccard_prefix": new_q_jaccard_prefix,
    "q_hll_overlap": new_q_hll_overlap,
}


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "r12-batch3-ab",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name, new_builder in CASES.items():
        old_builder = REGISTRY[name].builder
        df_old = old_builder(spark, sf_dir)
        df_new = new_builder(spark, sf_dir)
        rows_old = sorted(map(tuple, df_old.collect()))
        rows_new = sorted(map(tuple, df_new.collect()))
        eq = rows_old == rows_new and df_old.dtypes == df_new.dtypes
        olds, news = [], []
        for _ in range(pairs):
            spark.sparkContext.setJobDescription(f"{name} OLD")
            t0 = time.perf_counter()
            old_builder(spark, sf_dir).collect()
            olds.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"{name} NEW")
            t0 = time.perf_counter()
            new_builder(spark, sf_dir).collect()
            news.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "old": round(sorted(olds)[len(olds) // 2], 3),
            "new": round(sorted(news)[len(news) // 2], 3),
            "olds": [round(x, 3) for x in olds],
            "news": [round(x, 3) for x in news],
            "rows_equal": eq,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
