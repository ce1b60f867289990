"""30x scale sweep for queries without a BENCH_NOTES scale entry yet
(the r7-continuation additions): Spark cold + steady vs the DuckDB
oracle on scale_data30/sf1, one line per query.

Protocol matches the repo's earlier sweeps: SPARK_GRAFT_CACHE_TABLES=1
(steady-state table cache), SPARK_GRAFT_PLAN_CACHE=0 (rebuild-per-run
regime for round-over-round comparability), cold = first build+action,
steady = min of the next two. Small results are collected; large ones
go through a noop write so Python row materialization never pollutes
the wall. Oracles whose shape is quadratic in corpus size (the
degree-hist all-pairs simhash join) are skipped with a note, matching
the closure_oracle doctrine.

Usage: python scripts/sweep_30x_new.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
os.environ.setdefault("SPARK_GRAFT_PLAN_CACHE", "0")

DEFAULT_SF = "/root/repo/scale_data30/sf1"
DEFAULT_NAMES = [
    "q_weighted_sample",
    "q_dsir_select",
    "q_source_overlap",
    "q_mmr_rerank",
    "q_ingest_quota",
    "q_jl_topk",
    "q_degree_hist",
    "q_mutual_knn",
    "q_quantile_bins",
    "q_curriculum_order",
    "q_truncate_budget",
    "q_embedding_drift",
    "q_zscore_by_source",
]
# Oracles skipped at 30x: quadratic in corpus size (all-pairs joins the
# Spark plan avoids by construction). The r9 session measured the
# q_communities oracle climbing past 500 CPU-minutes / 27 GB RSS at the
# 30x corpus before being killed -- every oracle built on the all-pairs
# `sim a JOIN sim b ON a.id < b.id` body shares that shape.
ORACLE_SKIP = {
    "q_degree_hist": "all-pairs simhash join, O(n^2) at 150k docs",
    "q_communities": "all-pairs simhash join feeding LPA, O(n^2) at 186k docs",
    "q_modularity": "all-pairs simhash join feeding modularity, O(n^2)",
    "q_pair_index_upsert": "all-pairs simhash join in the oracle, O(n^2)",
    "q_first_band_pairs": "all-pairs simhash join in the oracle, O(n^2)",
    "q_incremental_cycle": "full cross-batch banding oracle, heavy at 30x",
}
# Results too large to ship through Python collect: noop-write instead.
BIG_OUTPUT = {"q_truncate_budget", "q_zscore_by_source", "q_ingest_quota"}


def run(name, builder, spark, sf_dir):
    def action():
        df = builder(spark, sf_dir)
        if name in BIG_OUTPUT:
            df.write.format("noop").mode("overwrite").save()
            return -1
        return len(df.collect())

    t0 = time.time()
    n = action()
    cold = time.time() - t0
    steadies = []
    for _ in range(2):
        t0 = time.time()
        action()
        steadies.append(time.time() - t0)
    return cold, min(steadies), n


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args else DEFAULT_SF
    names = args[1:] or DEFAULT_NAMES

    import duckdb

    from cell_kn_mvp_etl_results_spark.plans import REGISTRY
    from cell_kn_mvp_etl_results_spark.session import get_spark

    spark = get_spark("sweep30x", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'")

    print(f"# sweep at {sf_dir}, load={os.getloadavg()}")
    for name in names:
        spec = REGISTRY[name]
        cold, steady, n = run(name, spec.builder, spark, sf_dir)
        if name in ORACLE_SKIP:
            dd, dn = None, ORACLE_SKIP[name]
        else:
            t0 = time.time()
            dn = len(con.execute(spec.oracle).fetchall())
            dd = time.time() - t0
        print(
            f"{name}: spark cold {cold:.2f} steady {steady:.2f} "
            f"({n} rows) | duckdb "
            + (f"{dd:.2f} ({dn} rows)" if dd is not None else f"SKIPPED ({dn})")
        )


if __name__ == "__main__":
    main()
