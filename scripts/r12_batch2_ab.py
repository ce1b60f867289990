"""Interleaved same-session rebuild A/B for the second r12 batch:
q_dedup_sweep (single-aggregation threshold curve), q_path_revenue
(fused last hop in path_fold), q_subgraph_extract (dedup touched-edge
pairs before the string split). Guide section 1: justify every change
with an interleaved measurement, not cross-session artifact deltas.

For each query the OLD shape (the current registry builder) and the NEW
shape (candidate restructure, inline here) are timed alternately
A,B,A,B,... in one session under the bench's rebuild regime (warm table
cache, plans rebuilt per run), rows compared for identity first.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r12_batch2_ab.py [pairs]
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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators import dedup as dd
from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.session import get_spark
from cell_kn_mvp_etl_results_spark.sources.readers import read_table


def new_q_dedup_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Single-aggregation shape: the jaccard_pairs subtree is planned
    (and executed) ONCE. Each hit explodes to exactly two (threshold,
    id) rows, so n_pairs = count(*) div 2 and n_docs =
    count_distinct(id) come out of one aggregation -- the old
    per_pairs/per_docs split re-executed the whole inverted-index join
    per branch."""
    d = read_table(spark, sf, "documents")
    pairs = dd.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.05)
    th = spark.createDataFrame(
        [(50,), (100,), (200,), (400,)], "threshold_permille long"
    )
    hits = (
        pairs.crossJoin(F.broadcast(th))
        .filter(
            F.col("inter") * 1000 >= F.col("threshold_permille") * F.col("union_sz")
        )
        .select("threshold_permille", "id_a", "id_b")
    )
    agg = (
        hits.select(
            "threshold_permille", F.explode(F.array("id_a", "id_b")).alias("id")
        )
        .groupBy("threshold_permille")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_pairs"),
            F.count_distinct("id").alias("n_docs"),
        )
    )
    return (
        th.join(agg, "threshold_permille", "left")
        .select(
            "threshold_permille",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        )
        .orderBy("threshold_permille")
    )


def _path_fold_fused(edges, start, hop_colls, weight_col="weight"):
    """path_fold with the LAST hop's (v0, node) aggregation fused into
    the final per-start aggregation: the last frontier grouping is
    discarded immediately, so aggregate straight to v0 (sum is
    associative; identical results)."""
    cur = start.select(
        F.col("coll").alias("v0_coll"),
        F.col("key").alias("v0_key"),
        F.col("coll").alias("node_coll"),
        F.col("key").alias("node_key"),
        F.lit(1).cast("long").alias("_m"),
        F.lit(0).cast("long").alias("_s"),
    )
    for coll in hop_colls[:-1]:
        src = (
            edges[coll]
            if isinstance(edges, dict)
            else edges.filter(F.col("dst_coll") == coll)
        )
        hop = src.select(
            F.col("src_coll").alias("node_coll"),
            F.col("src_key").alias("node_key"),
            F.col("dst_coll").alias("h_dc"),
            F.col("dst_key").alias("h_dk"),
            F.col(weight_col).alias("_w"),
        )
        cur = (
            cur.join(hop, ["node_coll", "node_key"])
            .groupBy(
                "v0_coll",
                "v0_key",
                F.col("h_dc").alias("node_coll"),
                F.col("h_dk").alias("node_key"),
            )
            .agg(
                F.sum("_m").alias("_m"),
                F.sum(F.col("_s") + F.col("_m") * F.col("_w")).alias("_s"),
            )
        )
    coll = hop_colls[-1]
    src = (
        edges[coll]
        if isinstance(edges, dict)
        else edges.filter(F.col("dst_coll") == coll)
    )
    hop = src.select(
        F.col("src_coll").alias("node_coll"),
        F.col("src_key").alias("node_key"),
        F.col(weight_col).alias("_w"),
    )
    return (
        cur.join(hop, ["node_coll", "node_key"])
        .groupBy("v0_coll", "v0_key")
        .agg(
            F.sum("_m").alias("n_paths"),
            F.sum(F.col("_s") + F.col("_m") * F.col("_w")).alias("total_weight"),
        )
    )


def new_q_path_revenue(spark: SparkSession, sf: str) -> DataFrame:
    from cell_kn_mvp_etl_results_spark.functions.money import cents

    o = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    c = read_table(spark, sf, "customer")
    e1 = o.select(
        F.lit("C").alias("src_coll"),
        F.col("o_custkey").alias("src_key"),
        F.lit("O").alias("dst_coll"),
        F.col("o_orderkey").alias("dst_key"),
        cents("o_totalprice").alias("weight"),
    )
    e2 = (
        li.groupBy(
            F.col("l_orderkey").alias("src_key"),
            F.col("l_partkey").alias("dst_key"),
        )
        .agg(F.sum(cents("l_extendedprice")).alias("weight"))
        .select(
            F.lit("O").alias("src_coll"),
            "src_key",
            F.lit("P").alias("dst_coll"),
            "dst_key",
            "weight",
        )
    )
    e3 = (
        li.select(
            F.col("l_partkey").alias("src_key"), F.col("l_suppkey").alias("dst_key")
        )
        .dropDuplicates()
        .select(
            F.lit("P").alias("src_coll"),
            "src_key",
            F.lit("S").alias("dst_coll"),
            "dst_key",
            F.lit(0).cast("long").alias("weight"),
        )
    )
    start = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.lit("C").alias("coll"), F.col("c_custkey").alias("key")
    )
    return (
        _path_fold_fused({"O": e1, "P": e2, "S": e3}, start, ["O", "P", "S"])
        .select(
            F.concat(F.lit("C_"), F.col("v0_key")).alias("start"),
            "n_paths",
            F.col("total_weight").alias("total_weight_cents"),
        )
        .orderBy("start")
    )


def _touched_edges_new(paths: DataFrame) -> DataFrame:
    """touched_edges with the dedup BEFORE the string split: the
    distinct shuffle carries the 2-string (src, dst) struct instead of
    4 split columns, and substring_index/regexp_replace run on distinct
    pairs only. src -> (coll, key) is injective (src = coll || '_' ||
    key reconstructs it), so dedup-before == dedup-after."""

    def _pairs(arr):
        return F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.struct(
                F.element_at(arr, i).alias("src"),
                F.element_at(arr, i + 1).alias("dst"),
            ),
        )

    pairs = paths.select(F.explode(_pairs(F.col("path"))).alias("e"))
    if "hierarchy_path" in paths.columns:
        pairs = pairs.unionByName(
            paths.select(
                F.explode(_pairs(F.split("hierarchy_path", "/"))).alias("e")
            )
        )
    deduped = pairs.dropDuplicates()
    split = lambda c: (  # noqa: E731
        F.substring_index(c, "_", 1),
        F.regexp_replace(c, r"^[^_]*_", ""),
    )
    s_coll, s_key = split(F.col("e.src"))
    d_coll, d_key = split(F.col("e.dst"))
    return deduped.select(
        s_coll.alias("src_coll"),
        s_key.alias("src_key"),
        d_coll.alias("dst_coll"),
        d_key.alias("dst_key"),
    )


def new_q_subgraph_extract(spark: SparkSession, sf: str) -> DataFrame:
    from cell_kn_mvp_etl_results_spark.plans.battery import (
        PathSpec,
        run_path_spec,
    )
    from cell_kn_mvp_etl_results_spark.sources.sinks import extract_subgraph

    o = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    c = read_table(spark, sf, "customer")

    def edge(sc, sk, dc, dk, df):
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

    edges = edge("C", "o_custkey", "O", "o_orderkey", o).unionByName(
        edge("O", "l_orderkey", "P", "l_partkey", li)
    ).localCheckpoint(eager=True)
    anchors = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.lit("C").alias("coll"), F.col("c_custkey").cast("string").alias("key")
    )
    specs = [
        PathSpec("C-O", anchor="C", hops=["O"], any_direction=False),
        PathSpec("C-O-P", anchor="C", hops=["O", "P"], any_direction=False),
    ]
    union = None
    for spec in specs:
        paths = run_path_spec(anchors, edges, spec)
        te = _touched_edges_new(paths)
        union = te if union is None else union.unionByName(te)
    touched = union.dropDuplicates()
    sub = extract_subgraph(edges, touched)
    return (
        sub["edges"]
        .groupBy("src_coll", "dst_coll")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .orderBy("src_coll", "dst_coll")
    )


def new_q_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """The bands self-join references the simhash aggregation subtree
    on BOTH sides, so the tokenize+explode+33-agg pipeline executes
    twice per run (Catalyst does not dedup the shared subtree). An
    eager localCheckpoint of the |docs|-row (id, simhash) relation
    computes it once; the join reads checkpointed blocks. Per-run
    state only."""
    d = read_table(spark, sf, "documents")
    hashes = dd.simhash(d, "doc_id", "text", bits=32).localCheckpoint(eager=True)
    return (
        dd.simhash_pairs(hashes, max_hamming=2)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


def new_q_first_band_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Same shared-subtree fix as q_simhash_pairs: checkpoint the
    simhash relation before the band self-join."""
    d = read_table(spark, sf, "documents")
    hashes = dd.simhash(d, "doc_id", "text", bits=32).localCheckpoint(eager=True)
    bands = dd.simhash_bands(hashes, bands=2, bits=32)
    a = bands.select(
        F.col("id").alias("id_x"), F.col("simhash").alias("sh_x"), "band", "val"
    )
    b = bands.select(
        F.col("id").alias("id_y"), F.col("simhash").alias("sh_y"), "band", "val"
    )
    xor = F.col("sh_x").bitwiseXOR(F.col("sh_y"))
    first = dd.first_band_collision(2, 32, F.col("band"), xor)
    pairs = (
        a.join(b, ["band", "val"])
        .filter(F.col("id_x") < F.col("id_y"))
        .filter(first)
        .select(
            F.col("band").cast("int").alias("band"),
            F.col("id_x").alias("id_a"),
            F.col("id_y").alias("id_b"),
            F.bit_count(xor).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 1)
    )
    term = (F.col("id_a") * F.lit(1000003) + F.col("id_b")) % F.lit(1000000007)
    return (
        pairs.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("hamming").cast("long").alias("sum_hamming"),
            (F.sum(term) % F.lit(1000000007)).cast("long").alias("pair_checksum"),
        )
        .orderBy("band")
    )


CASES = {
    "q_dedup_sweep": new_q_dedup_sweep,
    "q_path_revenue": new_q_path_revenue,
    "q_subgraph_extract": new_q_subgraph_extract,
    "q_simhash_pairs": new_q_simhash_pairs,
    "q_first_band_pairs": new_q_first_band_pairs,
}


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "r12-batch2-ab",
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
        rows_old = sorted(map(tuple, old_builder(spark, sf_dir).collect()))
        rows_new = sorted(map(tuple, new_builder(spark, sf_dir).collect()))
        eq = rows_old == rows_new
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
