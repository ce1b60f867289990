"""Z-order (Morton) layout for multi-column data skipping.

Parquet min/max pruning only helps on columns the file layout is sorted
by; sorting by (a, b) gives perfect pruning on ``a`` and nearly none on
``b``. Interleaving the bits of both columns into one Morton key and
sorting by THAT gives every file a small rectangle of (a, b) space, so
min/max skipping works for predicates on either column -- the layout
trick behind Delta/Iceberg OPTIMIZE ZORDER, here as plain expressions
plus a plain parquet write.

The bit interleave is exact integer arithmetic (shifts and masks), so
the key -- and therefore the layout decision -- is reproducible in any
engine; ``z_value_sql`` emits the equivalent ANSI SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton key of two non-negative integer columns: bit i of x lands
    at position 2i, bit i of y at 2i+1. ``bits`` per column (<= 31);
    values are masked to that width first, so out-of-range inputs wrap
    rather than corrupt higher bits.
    """
    cx = (F.col(x) if isinstance(x, str) else x).cast("long")
    cy = (F.col(y) if isinstance(y, str) else y).cast("long")
    mask = (1 << bits) - 1
    cx = cx.bitwiseAND(F.lit(mask))
    cy = cy.bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_value_sql(x: str, y: str, bits: int = 16) -> str:
    """The same Morton key as ANSI SQL (DuckDB/Spark-SQL compatible),
    for oracle parity: ``z_value(F.col(x), F.col(y), b)`` and this
    string evaluate identically on identical inputs."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({x} & {mask}) >> {i} & 1) << {2 * i})")
        terms.append(f"((({y} & {mask}) >> {i} & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of
    (x, y): range-partition on the z key into ``n_files`` and sort
    within each, so every output file covers a compact rectangle of
    (x, y) space and parquet min/max skipping prunes on predicates over
    EITHER column. Range boundaries come from Spark's sampler (layout,
    not content -- row values are untouched)."""
    z = z_value(x, y, bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
