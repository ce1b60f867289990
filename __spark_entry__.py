"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real content lives in ``cell_kn_mvp_etl_results_spark.plans`` --
the registry is the single source of truth shared by this entry point,
the pytest oracle-parity suite, and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cell_kn_mvp_etl_results_spark.plans import all_oracle_sql, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    lifecycle -- semantic-tuple generation -> property-graph assembly ->
    k-hop typed-path traversal (SURVEY.md section 3)."""
    from cell_kn_mvp_etl_results_spark.plans.graph_queries import q_khop_paths

    return q_khop_paths(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return all_oracle_sql()
