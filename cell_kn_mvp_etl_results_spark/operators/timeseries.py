"""Time-series regularization: dense-grid gap fill with forward fill.

Event streams are irregular; downstream consumers (rolling features,
retention models, training-label joins) want one row per (key, period)
with the last observed value carried forward. This is the batch form
of what a stateful stream would do with ``applyInPandasWithState``
(streaming/stateful.py holds the debounce twin of the same idea).

Determinism doctrine (plans/registry.py): periods are integer epoch
days (``unix_micros div 86_400_000_000`` — timezone-independent, the
q_hourly_rollup/q_rolling_window convention), values are integer
cents, and the "last event of a period" is the max of the
(ts, event_id, cents) struct — a total order because event ids are
unique.

Scale shape: one (key, day)-keyed aggregation over the events; the
grid is |keys| × |days| built from a broadcast 1-row bounds aggregate
and a per-key ``sequence`` explode (never a shuffle); the
grid-to-observation join is key+day equi; the forward fill is one
window pass per key ordered by day. Grids are only as dense as the
key × period product you ask for — at 100 TB you gap-fill per
partition-pruned key range, not the whole keyspace at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["gap_fill_daily"]

_US_PER_DAY = 86_400_000_000


def gap_fill_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """One row per (key, epoch day) across the corpus's [min, max] day
    span, with the period's closing value (last event by (ts, id))
    forward-filled across silent days. Returns
    (key_col, d, n_obs, cents_filled); ``cents_filled`` is NULL for
    days before the key's first observation, ``n_obs`` is 0 on filled
    days.
    """
    cents = F.round(F.col(val_col) * 100).cast("long")
    base = events.select(
        F.col(key_col).alias("key"),
        F.expr(f"unix_micros({ts_col}) div {_US_PER_DAY}").alias("d"),
        F.col(ts_col).alias("ts"),
        F.col("event_id"),
        cents.alias("cents"),
    )
    daily = base.groupBy("key", "d").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.max(F.struct("ts", "event_id", "cents"))
        .getField("cents")
        .alias("cents_eod"),
    )
    bounds = base.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    grid = (
        base.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key", F.explode(F.sequence(F.col("dmin"), F.col("dmax"))).alias("d")
        )
    )
    w = Window.partitionBy("key").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(daily, ["key", "d"], "left")
        .select(
            F.col("key").alias(key_col),
            "d",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.last("cents_eod", ignorenulls=True).over(w).alias("cents_filled"),
        )
        .orderBy(key_col, "d")
    )
