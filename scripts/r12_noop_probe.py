"""Noop-sink isolation probe (guide section 1.4): for the named queries,
time the prepared-regime computation through the noop sink (computes
every column of every row, discards the result) next to the bench's
collect() action, plus the result row count — separating engine compute
from driver result-pull for large-result queries.

Usage:
  SPARK_GRAFT_SF_DIR=... python scripts/r12_noop_probe.py q_a q_b ...
Prints one JSON line {name: {"noop": s, "collect": s, "rows": n}}.
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
os.environ["SPARK_GRAFT_PLAN_CACHE"] = "1"

from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.session import get_spark


def main() -> None:
    names = [n for n in sys.argv[1:] if n in REGISTRY]
    spark = get_spark(
        "r12-noop-probe",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    for name in names:
        spec = REGISTRY[name]
        df = spec.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warmup
        noop = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            noop.append(time.perf_counter() - t0)
        rows = None
        coll = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = spec.builder(spark, sf_dir).collect()
            coll.append(time.perf_counter() - t0)
            rows = len(r)
        out[name] = {
            "noop": round(sorted(noop)[1], 3),
            "collect": round(sorted(coll)[1], 3),
            "rows": rows,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
