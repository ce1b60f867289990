"""Benchmark harness: times the headline queries at the driver's scale
factor and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores).
"""

from __future__ import annotations

import json
import os
import time

from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("cell-kn-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup outside the timed region.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    headline = {n: s for n, s in REGISTRY.items() if s.headline}
    timings: dict[str, float] = {}
    for name, spec in sorted(headline.items()):
        t0 = time.perf_counter()
        rows = spec.builder(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
