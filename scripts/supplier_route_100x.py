"""Validate the r11 layout-exists ROUTE at the 100x corpus (VERDICT
r10 #5): with the co-bucketed twin tables on disk, q_local_supplier_
volume itself must serve the bucketed SMJ; A/B the routed headliner
against the shipped shuffle shape (route probe monkeypatched off),
alternated, rows pinned identical.

Run: python scripts/supplier_route_100x.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data100/sf1"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "all")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"  # rebuild regime, as graded

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cell_kn_mvp_etl_results_spark.plans import relational as rel
from cell_kn_mvp_etl_results_spark.session import get_spark

spark = get_spark("supplier-route-ab", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def loadavg() -> str:
    with open("/proc/loadavg") as f:
        return f.read().split()[0]


assert not rel._broadcast_map_ok(sf_dir, "orders", rel._SEL_ORDERS_SINCE_1996), (
    "100x must sit above the broadcast gate for this A/B to be meaningful"
)

t0 = time.perf_counter()
rel.materialize_supplier_bucketed(spark, sf_dir)  # ingest-time build (or reuse)
print(f"bucketed build (or reuse): {time.perf_counter() - t0:.2f}s")
assert rel.supplier_bucketed_layout_exists(spark, sf_dir)

plan = (
    rel.q_local_supplier_volume(spark, sf_dir)
    ._jdf.queryExecution()
    .executedPlan()
    .toString()
)
print(
    "routed headliner plan: reads twin tables =", "supb_" in plan,
    " exchanges_total =", plan.count("Exchange"),
)

probe = rel.supplier_bucketed_layout_exists
rows = {}


def timed(label: str, off: bool):
    rel.supplier_bucketed_layout_exists = (
        (lambda *_a, **_k: False) if off else probe
    )
    try:
        df = rel.q_local_supplier_volume(spark, sf_dir)
        got = df.collect()
        rows[label] = sorted(map(tuple, got))
        samples = []
        for _ in range(runs):
            t = time.perf_counter()
            rel.q_local_supplier_volume(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t)
        return samples
    finally:
        rel.supplier_bucketed_layout_exists = probe


gap = float(os.environ.get("ROUTE_AB_GAP", "20"))
for rnd in range(2):  # alternate so box drift cannot pick a winner
    time.sleep(gap)  # drain the previous leg's load before sampling
    a = timed("shipped", True)
    time.sleep(gap)
    b = timed("routed", False)
    fmt = lambda xs: "/".join(f"{x:.2f}" for x in sorted(xs))  # noqa: E731
    print(
        f"round {rnd}: load~{loadavg()} shipped[{fmt(a)}] routed[{fmt(b)}] "
        f"medians {sorted(a)[len(a)//2]:.2f} -> {sorted(b)[len(b)//2]:.2f}"
    )

assert rows["shipped"] == rows["routed"], "branch rows diverged"
print("rows identical:", len(rows["routed"]))
spark.stop()
