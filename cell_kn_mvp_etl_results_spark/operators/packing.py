"""Sequence packing: assign documents to fixed-capacity training bins.

A pretraining pipeline tokenizes documents and packs them back-to-back
into fixed-length sequences (2k/4k/8k tokens); the packing assignment
-- which bin each document starts in, at what offset -- must be
DETERMINISTIC (same corpus -> same shards, for resumable/reproducible
training) and must not funnel the corpus through one node.

The assignment here is contiguous packing in content-hash order: docs
are ordered by (md5(id), id), token counts are prefix-summed over that
order, and a doc starting at global token position P lands in bin
``P div capacity`` at offset ``P mod capacity`` (docs straddle bin
boundaries, as real packers split them).

The scale problem is the global prefix sum: a single ORDER BY window is
one partition holding the corpus. Instead the classic two-level shape:

  1. bucket docs by the first hex digits of the hash -- bucket order is
     a PREFIX of the total (md5, id) order, so per-bucket cumsums are
     contiguous slices of the global one;
  2. cumsum inside each bucket (parallel windows, one shuffle);
  3. cumsum the ~16^digits per-bucket totals (tiny) and broadcast-join
     them back as bucket base offsets.

No stage sees more than corpus/16^digits rows in one partition and no
global sort happens; raise ``bucket_digits`` (2 -> 256 buckets,
4 -> 65k) with corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_prefix_sum(
    df: DataFrame,
    id_col: str,
    value_col: str,
    bucket_digits: int = 2,
) -> DataFrame:
    """Deterministic global running sum of ``value_col`` in
    (md5(id), id) order, without a global sort. Adds columns
    ``_hash`` (the order key) and ``pos`` (sum of values strictly
    before this row in the total order).
    """
    from .intervals import guard_internal_columns

    guard_internal_columns(
        df, ("_hash", "_bucket", "_within", "_base", "pos"), "global_prefix_sum"
    )
    h = F.md5(F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, bucket_digits), 16, 10).cast("long")
    d = df.withColumn("_hash", h).withColumn("_bucket", bucket)

    w = (
        Window.partitionBy("_bucket")
        .orderBy("_hash", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(value_col).over(w), F.lit(0)).alias("_within")

    totals = d.groupBy("_bucket").agg(F.sum(value_col).alias("_total"))
    wb = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bucket", F.coalesce(F.sum("_total").over(wb), F.lit(0)).alias("_base")
    )
    # 16^bucket_digits rows: the single-partition window above and the
    # broadcast below are both bounded by the bucket count, not the data.
    return (
        d.select("*", within)
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("pos", (F.col("_base") + F.col("_within")).cast("long"))
        .drop("_bucket", "_within", "_base")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    capacity: int,
    bucket_digits: int = 2,
) -> DataFrame:
    """Contiguous deterministic packing: returns one row per input row
    with (id_col, n_tokens, bin, "offset") where ``bin``/``offset`` are
    the training sequence the document STARTS in and its token offset
    there. ``capacity`` is the sequence length in tokens.
    """
    sized = df.select(F.col(id_col), token_count.cast("long").alias("n_tokens"))
    pos = global_prefix_sum(sized, id_col, "n_tokens", bucket_digits)
    return pos.select(
        id_col,
        "n_tokens",
        F.expr(f"pos div {int(capacity)}").alias("bin"),
        F.pmod(F.col("pos"), F.lit(int(capacity))).cast("long").alias("offset"),
    )
