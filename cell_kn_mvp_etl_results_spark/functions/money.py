"""Exact-arithmetic helpers for monetary/quantity doubles.

The synthetic star schema stores money as doubles that are exact cents
(TESTDATA.md generator). Summing doubles is order-dependent, which makes
distributed aggregates non-reproducible at the last ulp -- unacceptable
for a correctness gate and for any engine that promises deterministic
results. The fix is classic: aggregate in integer cents (exact,
associative, overflow-safe at 100 TB within int64 for per-group sums),
convert back with one final IEEE division (deterministic everywhere).

These are column-in/column-out expression builders -- fully JVM-side,
whole-stage-codegen friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Dollars-as-double -> exact integer cents."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def money(cents_col: Column) -> Column:
    """Integer cents -> dollars (single IEEE division; deterministic)."""
    return cents_col / F.lit(100.0)


def avg_money(cents_sum: Column, count_col: Column) -> Column:
    """Average of a money column from (sum-of-cents, count).

    Expression shape matters: ``sum / count / 100.0`` is two IEEE
    divisions in a fixed order, reproducible across engines as long as
    the oracle writes the same shape.
    """
    return cents_sum / count_col / F.lit(100.0)


def qty_long(col: Column | str) -> Column:
    """Integer-valued double quantity -> long (exact)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c).cast("long")
