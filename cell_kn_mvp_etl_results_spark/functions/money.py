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
    """Dollars-as-double -> exact integer cents.

    Implemented as ``cast(c*100 + signum(c)*0.5 as long)`` rather than
    ``round(c*100)``: Spark's ``round`` on doubles goes through
    ``BigDecimal.valueOf`` -- an allocation per row per call -- and the
    pricing aggregate spends more time rounding than aggregating
    (measured 0.69 -> 0.40 s on the 6M-row 10x-corpus scan,
    BENCH_NOTES.md r5). The signum term makes double->long truncation
    (toward zero) behave as round-half-away for either sign.

    Exactness domain: any double that *stores* an exact cent amount,
    i.e. ``c*100`` lands within +-0.499... of an integer -- the lake
    contract for money columns (TESTDATA.md generator emits exact
    cents; fp error of k/100 doubles is ~1e-13 relative). Both forms
    agree on every such value; a true half-cent input (where they could
    differ) violates the contract. ``tests/test_money_contract.py``
    pins form-equality row-wise over every money column of the test
    lake, so a generator change that breaks the contract fails one
    readable test, not a value-hash gate.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c * 100 + F.signum(c) * F.lit(0.5)).cast("long")


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
    """Integer-valued double quantity -> long (exact; same fast
    round-half-away shape as :func:`cents`, same contract/test)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c + F.signum(c) * F.lit(0.5)).cast("long")
