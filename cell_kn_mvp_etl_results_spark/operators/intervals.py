"""Bucketized interval (range-containment) join.

The reference has no theta/range joins at all (SURVEY.md section 2.4);
a training-data pipeline needs point-in-interval joins constantly --
events to validity windows, samples to collection periods, documents to
license terms. The naive Spark expression

    points.join(intervals, keys & (start <= p) & (p <= end))

compiles the range predicate as a post-join filter, so every point
meets every interval sharing its key: a key-wise cross product that
explodes on coarse keys (the r1 scale-killer pattern).

The scalable shape used here is equi-key bucketing: quantize the point
and the interval's [start, end] span to fixed-width buckets, equi-join
on (keys..., bucket), then refine with the exact range predicate. An
interval spanning B buckets is replicated B times (bounded by
ceil(span/width) + 1), and each point probes exactly one bucket -- the
shuffle is a plain hash exchange on (keys, bucket), never a cross
product. Pick ``bucket_width`` >= the typical interval span so the
replication factor stays ~2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def guard_internal_columns(df: DataFrame, names: tuple[str, ...], op: str) -> None:
    """Refuse inputs that already carry this operator's internal column
    names: silently overwriting them would corrupt the join/order keys
    (an ambiguous-column error is the GOOD outcome)."""
    clash = [c for c in df.columns if c in names]
    if clash:
        raise ValueError(
            f"{op}: input already has internal column(s) {clash}; "
            f"rename them before calling (reserved: {list(names)})"
        )


def floor_bucket(col: Column | str, width: int) -> Column:
    """Floor-division bucket index for a long-valued coordinate.

    Exact integer arithmetic (``(c - pmod(c, w)) / w``): correct for
    negative coordinates too (pmod is always non-negative, so the
    numerator is the largest multiple of ``w`` <= c). The division is
    exact because the numerator is divisible by ``w``; bucket indices
    stay far below 2^53, so the double intermediate cannot round.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = F.lit(int(width))
    return ((c - F.pmod(c, w)) / w).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` keys)
    whose closed range [start_col, end_col] contains ``point_col``.

    All three coordinate columns are integer-valued (days since epoch,
    epoch micros, positions...). Returns the joined rows with the
    internal bucket column dropped; column names from both sides must
    not collide apart from ``on`` (alias before calling, as with any
    join). Malformed intervals (end < start) match nothing, by filter
    rather than by error -- mirroring the reference's drop-don't-throw
    posture on malformed rows.

    Scale shape: one hash shuffle on (on..., bucket); interval rows are
    replicated ceil(span / bucket_width) + 1 times at most. No
    cross-product term appears in the plan for any key cardinality
    (asserted in tests/test_plan_quality.py).
    """
    guard_internal_columns(points, ("_bucket",), "interval_join")
    guard_internal_columns(intervals, ("_bucket",), "interval_join")
    b_point = floor_bucket(point_col, bucket_width)
    b_lo = floor_bucket(start_col, bucket_width)
    b_hi = floor_bucket(end_col, bucket_width)
    right = intervals.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "_bucket", F.explode(F.sequence(b_lo, b_hi))
    )
    left = points.withColumn("_bucket", b_point)
    return (
        left.join(right, [*on, "_bucket"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
