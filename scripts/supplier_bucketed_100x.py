"""Measure the bucketed supplier claim at the 100x corpus (VERDICT r9
#3): A/B q_local_supplier_volume's shipped above-gate shape against
q_supplier_volume_bucketed (fact + order map co-bucketed on the
orderkey), interleaved medians, rows pinned identical. Also times the
one-time bucketed build and reports whether the fact-fact join plan is
exchange- and sort-free on both sides.

Run: python scripts/supplier_bucketed_100x.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data100/sf1"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "all")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
# rebuild regime: the per-run timings below re-parse + re-execute, the
# comparison the graded bar uses (prepared-plan reuse would hide the
# exchange cost this A/B exists to compare)
os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cell_kn_mvp_etl_results_spark.session import get_spark
from cell_kn_mvp_etl_results_spark.plans.relational import (
    materialize_supplier_bucketed,
    q_local_supplier_volume,
    q_supplier_volume_bucketed,
)

spark = get_spark("supplier-bucketed-ab", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def loadavg() -> str:
    with open("/proc/loadavg") as f:
        return f.read().split()[0]


t0 = time.perf_counter()
li_t, omap_t = materialize_supplier_bucketed(spark, sf_dir)
build_s = time.perf_counter() - t0
print(f"bucketed build (or reuse): {build_s:.2f}s  tables={li_t},{omap_t}")

plan = q_supplier_volume_bucketed(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
smj_region = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
print(
    "fact-join plan: smj=", "SortMergeJoin" in plan,
    " exchanges_total=", plan.count("Exchange"),
    " sorts_total=", plan.count("Sort "),
)


def med(fn, label):
    fn(spark, sf_dir).collect()  # warm table caches
    s = []
    rows = None
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        s.append(time.perf_counter() - t0)
    s.sort()
    print(
        f"{label}: median {s[len(s)//2]:.3f}s  all={[round(x,3) for x in s]}"
        f"  load~{loadavg()}  rows={len(rows)}",
        flush=True,
    )
    return [tuple(r) for r in rows]


# interleave A/B/A/B to share box conditions; cool between shapes so
# one shape's thermal load doesn't land on the next (the box throttles
# under sustained use, BENCH_NOTES r9)
ra1 = med(q_local_supplier_volume, "shipped shape   (pass 1)")
time.sleep(20)
rb1 = med(q_supplier_volume_bucketed, "bucketed twin   (pass 1)")
time.sleep(20)
ra2 = med(q_local_supplier_volume, "shipped shape   (pass 2)")
time.sleep(20)
rb2 = med(q_supplier_volume_bucketed, "bucketed twin   (pass 2)")

assert ra1 == ra2 == rb1 == rb2, "row mismatch between shapes!"
print("rows identical across all four passes:", ra1)
