"""Rebuild-regime phase profile for the headliners: per run, split
  build   -- builder() call (py4j plan construction / spark.sql parse +
             analysis + any per-call jobs the builder runs)
  plan    -- force executedPlan (optimization + physical planning +
             codegen source generation)
  exec    -- collect() on the already-planned DataFrame
so the 2x-bar margin work attacks the right phase (VERDICT r11 #2:
"profile their rebuild-regime stages, not driver time").

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r12_replan_profile.py [runs]
Prints one JSON line {name: {"build": med, "plan": med, "exec": med}}.
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

from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.session import get_spark


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    only = os.environ.get("R12_ONLY", "")
    spark = get_spark(
        "r12-replan-profile",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    names = (
        [n for n in only.split(",") if n]
        if only
        else sorted(n for n, s in REGISTRY.items() if s.headline)
    )
    out = {}
    for name in names:
        spec = REGISTRY[name]
        spec.builder(spark, sf_dir).collect()  # warmup: codegen + init
        b, p, e = [], [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            b.append(t1 - t0)
            p.append(t2 - t1)
            e.append(t3 - t2)
        med = lambda xs: round(sorted(xs)[len(xs) // 2], 3)  # noqa: E731
        out[name] = {"build": med(b), "plan": med(p), "exec": med(e)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
