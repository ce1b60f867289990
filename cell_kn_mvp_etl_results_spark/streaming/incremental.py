"""Incremental batch pattern (K2): the reference's restartable
fetch-and-checkpoint loops (``ExternalApiResultsFetcher.py:193-287``,
batch_size=25, rewrite cache JSON every batch) become an idempotent
anti-join: work = new keys not yet in the cache table.

This is the Spark-native restart seam: the cache is a parquet/Delta
table; a crashed run re-executes the anti-join and picks up exactly the
unfetched keys -- no driver-side bookkeeping files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def incremental_new_keys(
    requested: DataFrame, cached: DataFrame | None, key: str
) -> DataFrame:
    """Keys still to process = requested MINUS cached (left-anti join).

    ``cached`` may be None (first run). At scale the anti-join shuffles
    on the key unless the cached-key set is broadcastable -- for id
    caches (the reference's use case) it usually is.
    """
    req = requested.select(key).distinct()
    if cached is None:
        return req
    return req.join(cached.select(key).distinct(), key, "left_anti")
