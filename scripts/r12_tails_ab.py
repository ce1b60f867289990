"""Interleaved same-session rebuild A/B for the r12 tail restructurings
of q_adaptive_quality and q_bloom_decontaminate (guide section 1:
justify every change with an interleaved measurement, not cross-session
artifact deltas).

For each query the OLD shape (the current registry builder) and the NEW
shape (candidate restructure, inline here) are timed alternately
A,B,A,B,... in one session under the bench's rebuild regime (warm table
cache, plans rebuilt per run), rows compared for identity first.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r12_tails_ab.py
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
from pyspark.sql.window import Window

from cell_kn_mvp_etl_results_spark.functions.text import tokens
from cell_kn_mvp_etl_results_spark.operators import dedup as dd
from cell_kn_mvp_etl_results_spark.operators import sketches as sk
from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.session import get_spark
from cell_kn_mvp_etl_results_spark.sources.readers import read_table


def new_q_adaptive_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Single-scan shape: per-source median via a second window over
    the same partitioning instead of a self-join (the tokenize
    projection -- the expensive part -- runs once, not twice)."""
    d = read_table(spark, sf, "documents")
    sig = d.select("doc_id", "source", F.size(tokens("text")).alias("n_tokens"))
    wp = Window.partitionBy("source")
    ranked = sig.select(
        "source",
        "n_tokens",
        F.row_number().over(wp.orderBy("n_tokens", "doc_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    med = F.max(
        F.when(F.col("rn") == F.expr("(cnt + 1) div 2"), F.col("n_tokens"))
    ).over(wp)
    return (
        ranked.withColumn("median_tokens", med)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("n_tokens") >= F.col("median_tokens"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
            F.min("median_tokens").alias("median_tokens"),
        )
        .orderBy("source")
    )


def new_q_bloom_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Fused shape: the 128-word bitmap (bounded by m_bits/32, NOT by
    data size) is pulled once and inlined as an array literal, so the
    bloom verdict is a map-side expression; exact hits are a LEFT
    broadcast mark against the distinct benchmark grams; ONE aggregation
    yields n_grams / n_exact / n_bloom (vs persist + 3 aggs + 3 joins +
    a shuffled probe-verdict join)."""
    m_bits, k_hashes = 4096, 3
    d = read_table(spark, sf, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("holdout-"), F.col("doc_id"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    with_b = d.withColumn("_holdout", bucket < 5)
    bench_docs = with_b.filter(F.col("_holdout"))
    train_docs = with_b.filter(~F.col("_holdout"))
    bench = (
        dd.shingle_set(bench_docs, "doc_id", "text", n=3)
        .select("shingle")
        .distinct()
    )
    train = dd.shingle_set(train_docs, "doc_id", "text", n=3)
    bitmap = sk.bloom_build(bench, "shingle", m_bits=m_bits, k_hashes=k_hashes)
    words = {r["word"]: r["bits"] for r in bitmap.collect()}  # <= 128 rows
    arr = F.expr(
        "array(" + ",".join(str(words.get(w, 0)) + "L" for w in range(m_bits // 32)) + ")"
    )
    probe = None
    for p in sk._bloom_positions(F.col("shingle"), m_bits, k_hashes):
        word = F.floor(p / 32).cast("int")
        hit = F.getbit(F.element_at(arr, word + 1), (p % 32).cast("int")) == 1
        probe = hit if probe is None else (probe & hit)
    marked = train.join(
        F.broadcast(bench.withColumn("_bhit", F.lit(1))), "shingle", "left"
    )
    return (
        marked.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_bhit"), F.lit(0))).cast("long").alias("n_exact"),
            F.sum(F.when(probe, 1).otherwise(0)).cast("long").alias("n_bloom"),
        )
        .select(
            "id",
            "n_grams",
            "n_exact",
            "n_bloom",
            (F.col("n_bloom") - F.col("n_exact")).alias("n_false_pos"),
        )
        .orderBy("id")
    )


CASES = {
    "q_adaptive_quality": new_q_adaptive_quality,
    "q_bloom_decontaminate": new_q_bloom_decontaminate,
}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "r12-tails-ab",
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
        old_rows = old_builder(spark, sf_dir).collect()
        new_rows = new_builder(spark, sf_dir).collect()
        eq = [tuple(r) for r in old_rows] == [tuple(r) for r in new_rows]
        schema_eq = (
            old_builder(spark, sf_dir).schema == new_builder(spark, sf_dir).schema
        )
        olds, news = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            old_builder(spark, sf_dir).collect()
            olds.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            new_builder(spark, sf_dir).collect()
            news.append(time.perf_counter() - t0)
        out[name] = {
            "old": round(sorted(olds)[len(olds) // 2], 3),
            "new": round(sorted(news)[len(news) // 2], 3),
            "old_all": [round(x, 3) for x in olds],
            "new_all": [round(x, 3) for x in news],
            "rows_equal": eq,
            "schema_equal": schema_eq,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
