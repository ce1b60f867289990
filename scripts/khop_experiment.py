"""Bench experiment: q_khop_paths variants at sf0.1 (VERDICT r1 item 8).

Variants:
  A current registry plan (union of 3 deduped edge sets, constant-folded)
  B persist the deduped union before the hop joins (include persist cost)
  C single lineitem scan: persist the 3-column projection, derive both
    lineitem edge sets from the cache
  D aggregation pushdown below the final hop: n_paths via a broadcast
    per-part supplier-count dim joined onto the hop-2 frontier
    (sum(ns)), n_terminals via distinct(start,part) |x| e3 then
    distinct -- hop 3's 3.7M path rows are never materialized.
    MEASURED RESULT (r2): identical output, NOT faster (3.3s vs 3.1s
    median) -- Spark's map-side partial agg already compresses the
    3.7M rows before the shuffle, and D adds two extra stages whose
    scheduling overhead eats the row savings at local scale. Kept the
    simpler plan; at 1000-executor scale D's shape wins when hop-3
    fan-out no longer fits the map-side hash (see BENCH_NOTES.md).
Run: python scripts/khop_experiment.py
"""
import time

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.session import get_spark
from cell_kn_mvp_etl_results_spark.sources.readers import read_table
from cell_kn_mvp_etl_results_spark.operators.graph import k_hop
from cell_kn_mvp_etl_results_spark.plans.graph_queries import q_khop_paths

SF = "/root/testdata/sf0.1"


def finish(paths):
    per_terminal = paths.groupBy("v0_key", "node_key").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_terminal.groupBy("v0_key")
        .agg(F.sum("n").alias("n_paths"), F.count(F.lit(1)).alias("n_terminals"))
        .select(
            F.concat(F.lit("C_"), F.col("v0_key")).alias("start"),
            "n_paths",
            "n_terminals",
        )
        .orderBy("start")
    )


def build_edges(spark, persist_union=False, single_scan=False):
    o = read_table(spark, SF, "orders")
    li = read_table(spark, SF, "lineitem")

    def tag(df, sc, dc, label):
        return df.select(
            F.lit(sc).alias("src_coll"),
            F.col("src_key"),
            F.lit(dc).alias("dst_coll"),
            F.col("dst_key"),
            F.lit(label).alias("label"),
        )

    e1 = (
        o.select(F.col("o_custkey").alias("src_key"), F.col("o_orderkey").alias("dst_key"))
        .dropDuplicates()
    )
    if single_scan:
        li3 = li.select("l_orderkey", "l_partkey", "l_suppkey").persist()
        li3.count()
        e2 = li3.select(F.col("l_orderkey").alias("src_key"), F.col("l_partkey").alias("dst_key")).dropDuplicates()
        e3 = li3.select(F.col("l_partkey").alias("src_key"), F.col("l_suppkey").alias("dst_key")).dropDuplicates()
    else:
        e2 = li.select(F.col("l_orderkey").alias("src_key"), F.col("l_partkey").alias("dst_key")).dropDuplicates()
        e3 = li.select(F.col("l_partkey").alias("src_key"), F.col("l_suppkey").alias("dst_key")).dropDuplicates()
    edges = (
        tag(e1, "C", "O", "PLACED")
        .union(tag(e2, "O", "P", "CONTAINS"))
        .union(tag(e3, "P", "S", "SUPPLIED_BY"))
    )
    if persist_union:
        edges = edges.persist()
        edges.count()
    return edges


def run_variant(spark, name, fn, reps=3):
    times = []
    for i in range(reps + 1):  # first rep is warmup
        for (_, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
            pass
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        if i:
            times.append(dt)
    print(f"{name}: median={sorted(times)[len(times)//2]:.3f}s runs={[round(t,3) for t in times]} rows={n}")


def main():
    spark = get_spark("khop-exp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    c = read_table(spark, SF, "customer")
    start = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.lit("C").alias("coll"), F.col("c_custkey").alias("key")
    )

    def variant_a():
        return len(q_khop_paths(spark, SF).collect())

    def variant_b():
        edges = build_edges(spark, persist_union=True)
        try:
            return len(finish(k_hop(edges, start, ["O", "P", "S"], carry_path=False)).collect())
        finally:
            edges.unpersist()

    def variant_c():
        edges = build_edges(spark, single_scan=True)
        try:
            return len(finish(k_hop(edges, start, ["O", "P", "S"], carry_path=False)).collect())
        finally:
            spark.catalog.clearCache()

    def variant_d():
        o = read_table(spark, SF, "orders")
        li = read_table(spark, SF, "lineitem")

        def tag(df, sc, dc, label):
            return df.select(
                F.lit(sc).alias("src_coll"),
                F.col("src_key"),
                F.lit(dc).alias("dst_coll"),
                F.col("dst_key"),
                F.lit(label).alias("label"),
            )

        def dedup2(df, a, b):
            return df.select(
                F.col(a).alias("src_key"), F.col(b).alias("dst_key")
            ).dropDuplicates()

        e12 = (
            tag(dedup2(o, "o_custkey", "o_orderkey"), "C", "O", "PLACED")
            .union(tag(dedup2(li, "l_orderkey", "l_partkey"), "O", "P", "CONTAINS"))
            .persist()
        )
        e3 = dedup2(li, "l_partkey", "l_suppkey").persist()
        e12.count(), e3.count()
        try:
            f2 = k_hop(e12, start, ["O", "P"], carry_path=False)
            nsupp = e3.groupBy("src_key").agg(F.count(F.lit(1)).alias("ns"))
            n_paths = (
                f2.join(F.broadcast(nsupp), f2.node_key == nsupp.src_key)
                .groupBy("v0_key")
                .agg(F.sum("ns").alias("n_paths"))
            )
            f2d = f2.dropDuplicates(["v0_key", "node_key"])
            n_term = (
                f2d.join(F.broadcast(e3), f2d.node_key == e3.src_key)
                .select("v0_key", "dst_key")
                .dropDuplicates()
                .groupBy("v0_key")
                .agg(F.count(F.lit(1)).alias("n_terminals"))
            )
            return len(
                n_paths.join(n_term, "v0_key")
                .select(
                    F.concat(F.lit("C_"), F.col("v0_key")).alias("start"),
                    "n_paths",
                    "n_terminals",
                )
                .orderBy("start")
                .collect()
            )
        finally:
            spark.catalog.clearCache()

    run_variant(spark, "A current", variant_a)
    run_variant(spark, "B persist-union", variant_b)
    run_variant(spark, "C single-scan-li", variant_c)
    run_variant(spark, "D agg-pushdown", variant_d)


if __name__ == "__main__":
    main()
