"""Bench experiment: q_khop_paths variants at sf0.1 (VERDICT r1 item 8).

Variants:
  A current registry plan (union of 3 deduped edge sets, constant-folded)
  B persist the deduped union before the hop joins (include persist cost)
  C single lineitem scan: persist the 3-column projection, derive both
    lineitem edge sets from the cache
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

    run_variant(spark, "A current", variant_a)
    run_variant(spark, "B persist-union", variant_b)
    run_variant(spark, "C single-scan-li", variant_c)


if __name__ == "__main__":
    main()
