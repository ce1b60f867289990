"""Interleaved same-session rebuild A/B for the r12 single-pass
restructurings of decontaminate / q_curation_funnel / q_sketch_profile
(guide section 1: justify every change with an interleaved measurement,
not cross-session artifact deltas).

For each query the OLD shape (the pre-change plan, replicated inline
from git history) and the NEW shape (the registry builder) are timed
alternately A,B,A,B,... in one session under the bench's rebuild regime
(warm table cache, plans rebuilt per run), and the rows are compared
for identity first -- an A/B of two non-equivalent plans is meaningless.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r12_inherited_ab.py
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


def old_decontaminate(docs, benchmark, id_col, text_col, n=8):
    """Pre-r12 shape: separate sizes/hits aggregations re-joined."""
    train = dd.shingle_set(docs, id_col, text_col, n=n)
    bench = (
        dd.shingle_set(benchmark, id_col, text_col, n=n)
        .select("shingle")
        .distinct()
    )
    sizes = train.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.join(sizes, "id").select(
        "id",
        "n_grams",
        "n_hits",
        F.round(F.col("n_hits") * 10000.0 / F.col("n_grams"))
        .cast("long")
        .alias("contamination_bp"),
    )


def old_q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    d = read_table(spark, sf, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("holdout-"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    with_b = d.withColumn("_holdout", bucket < 5)
    bench = with_b.filter(F.col("_holdout"))
    train = with_b.filter(~F.col("_holdout"))
    return old_decontaminate(train, bench, "doc_id", "text", n=3).orderBy("id")


def old_q_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    from cell_kn_mvp_etl_results_spark.streaming.windows import (
        curated_document_stream,
    )

    docs = read_table(spark, sf, "documents")
    qual = curated_document_stream(
        docs, id_col="doc_id", text_col="text",
        min_tokens=5, max_stop_ratio=0.9, max_dup_frac=0.5,
    ).select(docs["*"])
    keepers = dd.exact_dedup_groups(qual, "doc_id", "text").select(
        F.col("keeper").alias("doc_id")
    )
    kept = qual.join(keepers, "doc_id", "semi")
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    contaminated = old_decontaminate(kept, bench, "doc_id", "text").select(
        F.col("id").alias("doc_id")
    )
    clean = kept.join(contaminated, "doc_id", "anti")
    counts = [
        docs.agg(F.count(F.lit(1)).alias("n_input")),
        qual.agg(F.count(F.lit(1)).alias("n_quality")),
        kept.agg(F.count(F.lit(1)).alias("n_exact")),
        clean.agg(F.count(F.lit(1)).alias("n_clean")),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(F.broadcast(c))
    return out


def old_q_sketch_profile(spark: SparkSession, sf: str) -> DataFrame:
    d = read_table(spark, sf, "documents")
    row = d.agg(
        F.countDistinct("lang").alias("e_lang"),
        F.countDistinct("source").alias("e_src"),
        F.countDistinct("doc_id").alias("e_id"),
        F.approx_count_distinct("lang", 0.02).alias("a_lang"),
        F.approx_count_distinct("source", 0.02).alias("a_src"),
        F.approx_count_distinct("doc_id", 0.02).alias("a_id"),
    )
    ok = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= 0.05 * F.col(e)
    ).alias("approx_ok")
    return (
        row.select(
            F.lit("langs").alias("metric"),
            F.col("e_lang").alias("exact_distinct"),
            ok("a_lang", "e_lang"),
        )
        .unionAll(
            row.select(
                F.lit("sources").alias("metric"),
                F.col("e_src").alias("exact_distinct"),
                ok("a_src", "e_src"),
            )
        )
        .unionAll(
            row.select(
                F.lit("doc_ids").alias("metric"),
                F.col("e_id").alias("exact_distinct"),
                ok("a_id", "e_id"),
            )
        )
        .orderBy("metric")
    )


OLD = {
    "q_decontaminate": old_q_decontaminate,
    "q_curation_funnel": old_q_curation_funnel,
    "q_sketch_profile": old_q_sketch_profile,
}

PAIRS = int(os.environ.get("AB_PAIRS", "5"))


def main() -> None:
    spark = get_spark(
        "r12-inherited-ab",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    for name, old_builder in OLD.items():
        new_builder = REGISTRY[name].builder
        o_rows = sorted(map(tuple, old_builder(spark, sf_dir).collect()))
        n_rows = sorted(map(tuple, new_builder(spark, sf_dir).collect()))
        eq = o_rows == n_rows
        olds, news = [], []
        for _ in range(PAIRS):
            spark.sparkContext.setJobDescription(f"ab:{name}:old")
            t0 = time.perf_counter()
            old_builder(spark, sf_dir).collect()
            olds.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"ab:{name}:new")
            t0 = time.perf_counter()
            new_builder(spark, sf_dir).collect()
            news.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "old": round(sorted(olds)[len(olds) // 2], 3),
            "new": round(sorted(news)[len(news) // 2], 3),
            "rows_equal": eq,
            "old_samples": [round(x, 3) for x in olds],
            "new_samples": [round(x, 3) for x in news],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
