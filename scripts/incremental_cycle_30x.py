"""Measure the two-batch incremental-dedup cycle at the 30x corpus
(VERDICT r8 #6): index build (once), probe delta1, APPEND delta1's
index rows (the distributed write posture -- partition-aligned on the
bucket key), probe delta2 against the upserted table. Compare against
the from-scratch pairing cost of the same corpus.

Run: python scripts/incremental_cycle_30x.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data30/sf1"
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "all")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators import dedup as dd
from cell_kn_mvp_etl_results_spark.session import get_spark
from cell_kn_mvp_etl_results_spark.sources.readers import read_table

spark = get_spark(
    "incr-cycle-30x",
    shuffle_partitions=32,
    extra_conf={
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.constraintPropagation.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

d = read_table(spark, sf_dir, "documents")
base = d.filter((F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 10 != 5))
delta1 = d.filter(F.col("doc_id") % 10 == 0)
delta2 = d.filter(F.col("doc_id") % 10 == 5)


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f} s", flush=True)
    return out, dt


table = "incr_cycle_idx_30x"
spark.sql(f"DROP TABLE IF EXISTS {table}")

_, t_build = t(
    "index build (base, bucketed write, paid at ingest)",
    lambda: dd.minhash_bucket_index(base, "doc_id", "text")
    .repartition(32, "bucket")
    .write.bucketBy(32, "bucket")
    .sortBy("bucket")
    .mode("overwrite")
    .saveAsTable(table),
)
idx = spark.table(table)
(p1, t_p1) = t(
    "probe delta1 vs index",
    lambda: dd.incremental_minhash_pairs(idx, delta1, "doc_id", "text").count(),
)
_, t_up = t(
    "upsert: append delta1 index rows (distributed write)",
    lambda: dd.minhash_bucket_index(delta1, "doc_id", "text")
    .repartition(32, "bucket")
    .write.mode("append")
    .insertInto(table),
)
idx1 = spark.table(table)
(p2, t_p2) = t(
    "probe delta2 vs upserted index",
    lambda: dd.incremental_minhash_pairs(idx1, delta2, "doc_id", "text").count(),
)
print(f"pairs: probe1={p1} probe2={p2}")
print(f"two-batch cycle (probe1+append+probe2): {t_p1 + t_up + t_p2:.2f} s")

_, t_scratch = t(
    "from-scratch full-corpus pairing (the posture this replaces)",
    lambda: dd.minhash_lsh_pairs(d, "doc_id", "text", num_perm=32, bands=8)
    .filter(F.col("est_jaccard") >= 0.25)
    .count(),
)
print(f"cycle/from-scratch ratio: {(t_p1 + t_up + t_p2) / t_scratch:.2f}x")
spark.sql(f"DROP TABLE IF EXISTS {table}")
spark.stop()
