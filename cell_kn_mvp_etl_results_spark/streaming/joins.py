"""Watermarked stream-stream joins.

The last §2.11 shape: correlating two live streams (view -> purchase
attribution, request -> error correlation) needs a JOIN whose state is
bounded on BOTH sides. Structured Streaming supports this only when
(a) both inputs carry watermarks and (b) the join predicate bounds the
two event times relative to each other -- together they let the state
store evict rows no future match can reach.

The same call runs on static frames (the batch-backfill agreement
guarantee all the twins in this package give): the time-range predicate
is an ordinary theta condition there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attributed_events_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    bound: str = "30 minutes",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner stream-stream join: each left event pairs with every right
    event of the same key whose timestamp falls in
    ``[left.ts, left.ts + bound]`` -- the attribution window shape
    (click -> conversion, trigger -> effect).

    State bounds at scale: both sides are watermarked, and the
    time-range predicate lets Spark compute a state-eviction horizon
    per side -- state size is O(rate x (watermark + bound)), not
    O(stream length). Columns are prefixed per side so the caller never
    hits ambiguous-name errors on the shared schema.
    """
    lp, rp = left_prefix, right_prefix

    def prefixed(df: DataFrame, p: str) -> DataFrame:
        renamed = df
        for c in df.columns:
            if c != key:
                renamed = renamed.withColumnRenamed(c, f"{p}{c}")
        return renamed

    l = prefixed(left, lp)
    r = prefixed(right, rp)
    if l.isStreaming:
        l = l.withWatermark(f"{lp}{ts_col}", watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{rp}{ts_col}", watermark)
    cond = (
        (F.col(f"{lp}{ts_col}") <= F.col(f"{rp}{ts_col}"))
        & (
            F.col(f"{rp}{ts_col}")
            <= F.col(f"{lp}{ts_col}") + F.expr(f"INTERVAL {bound}")
        )
    )
    return l.join(r, (l[key] == r[key]) & cond, "inner").drop(r[key])
