"""Per-sample probe of the cosine headliner's three bench regimes.

Prints EVERY sample (not the median) so regime anomalies (prepared
slower than rebuild) can be seen rather than averaged away.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "all")

from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.session import get_spark

spark = get_spark(
    "r12-cosine-probe",
    shuffle_partitions=8,
    extra_conf={
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.constraintPropagation.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

spec = REGISTRY["q_cosine_topk"]

for cache, pc, label in (
    ("", "0", "cold"),
    ("all", "0", "rebuild"),
    ("all", "1", "prepared"),
):
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = cache
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = pc
    spec.builder(spark, sf_dir).collect()  # warmup
    samples = []
    for _ in range(10):
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).collect()
        samples.append(round(time.perf_counter() - t0, 3))
    print(f"{label:9s}: {samples}")

spark.stop()
