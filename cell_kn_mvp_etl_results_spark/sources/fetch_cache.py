"""Restartable batched fetch-and-checkpoint (SURVEY.md K2, S7-S13).

The reference fetches external REST/GraphQL resources in batches of 25,
rewriting a JSON cache + id list after every batch so a crashed run can
resume (``ExternalApiResultsFetcher.py:193-287``, repeated x6). The
Spark-native form: the cache is a parquet table keyed by id; the work
list is requested-ids ANTI-JOIN cached-ids; each batch of fetched rows
is appended. Restart = re-run -- the anti-join recomputes exactly the
missing ids. No driver-side bookkeeping files.

The fetch function itself is pluggable (and driver-side, like the
reference: these are rate-limited external APIs, not data-plane work).
Offline tests inject a deterministic fake fetcher.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def cached_ids(spark: SparkSession, cache_path: str, key: str) -> DataFrame | None:
    if not os.path.exists(cache_path):
        return None
    return spark.read.parquet(cache_path).select(key)


def pending_ids(
    spark: SparkSession, requested: DataFrame, cache_path: str, key: str
) -> list:
    """Ids still to fetch, deterministically ordered (the reference
    sorts its id lists 'for restarting', ``LoaderUtilities.py:684``)."""
    req = requested.select(key).distinct()
    cached = cached_ids(spark, cache_path, key)
    if cached is not None:
        req = req.join(cached, key, "left_anti")
    return [r[0] for r in req.orderBy(key).collect()]


def fetch_with_checkpoints(
    spark: SparkSession,
    requested: DataFrame,
    cache_path: str,
    key: str,
    fetch: Callable[[Iterable], list[dict]],
    schema: StructType | str,
    batch_size: int = 25,
) -> DataFrame:
    """Fetch every requested id not yet cached, appending one parquet
    batch per ``batch_size`` ids (the reference's checkpoint cadence).
    Returns the full cache DataFrame. Idempotent under restart: a
    re-run fetches only ids the cache is missing.
    """
    todo = pending_ids(spark, requested, cache_path, key)
    for i in range(0, len(todo), batch_size):
        batch = todo[i : i + batch_size]
        rows = fetch(batch)
        if rows:
            spark.createDataFrame(rows, schema).write.mode("append").parquet(
                cache_path
            )
    if os.path.exists(cache_path):
        return spark.read.parquet(cache_path)
    return spark.createDataFrame([], schema)
