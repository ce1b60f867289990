"""Approximate aggregates for 100 TB profiling: cardinality (HLL),
frequency (count-min via stat.freqItems), and quantile sketches --
the constant-memory alternatives to exact aggregation when the answer
feeds a dashboard or a heuristic, not the correctness gate.

These stay out of the oracle registry on purpose: approximate results
are engine- and implementation-specific by design. The tests bound the
error against exact answers instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> int:
    """HyperLogLog++ distinct count (constant memory per partition,
    mergeable -- the only way to count distinct over 100 TB without a
    giant shuffle)."""
    return df.select(F.approx_count_distinct(col, rsd).alias("n")).collect()[0].n


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], rel_err: float = 0.01
) -> list[float]:
    """Greenwald-Khanna quantile sketch (bounded memory, mergeable)."""
    return df.approxQuantile(col, probabilities, rel_err)


def frequent_items(df: DataFrame, col: str, support: float = 0.01) -> list:
    """Heavy hitters above the support threshold (Karp et al. algorithm
    via DataFrame.stat.freqItems) -- the skew detector: feed the result
    to salting / bucket-cap decisions."""
    row = df.stat.freqItems([col], support).collect()[0]
    return sorted(row[f"{col}_freqItems"])


def column_profile(df: DataFrame, col: str) -> dict:
    """One-pass profile used for partition sizing decisions: approx
    distinct, null fraction, min/max."""
    agg = df.select(
        F.approx_count_distinct(col).alias("approx_distinct"),
        (F.sum(F.col(col).isNull().cast("int")) / F.count(F.lit(1))).alias(
            "null_fraction"
        ),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]
    return agg.asDict()
