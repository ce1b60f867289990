"""Time the DuckDB oracle for each headline query at the bench SF --
the comparison side of bench.py's JSON line, so Spark-vs-oracle ratios
in BENCH_NOTES.md are reproducible with one command.

Methodology mirrors bench.py: per-query warmup, median of three timed
runs. Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/oracle_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from cell_kn_mvp_etl_results_spark.plans import REGISTRY  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are directories of part files; glob them.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        if not spec.headline or spec.oracle is None:
            continue
        con.execute(spec.oracle).fetchall()  # warmup (page cache, JIT-free)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(sorted(samples)[1], 3)
    print(
        json.dumps(
            {
                "metric": "oracle_headline_total_wall_steady_state",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
