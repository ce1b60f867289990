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


def value_rank(
    df: DataFrame,
    id_col: str,
    value_col: str,
    bucket_width: int,
) -> DataFrame:
    """Deterministic 1-based global rank in ascending
    ``(value, md5(id), id)`` order, WITHOUT a global sort -- the
    rank primitive behind equal-frequency quantile binning.

    ``balanced_shards`` above buckets by the value itself, which
    degenerates when values are near-unique (every bucket is one row
    and the offsets window becomes a corpus-sized single partition).
    Here buckets are VALUE RANGES: ``value div bucket_width``. Bucket
    order is a prefix of the total value order, so per-bucket
    row_numbers plus cumulative bucket counts compose the global rank
    -- the same two-level discipline as ``global_prefix_sum`` with a
    range key instead of a hash prefix. The offsets window runs over
    (value range / bucket_width) rows, bounded by the value DOMAIN,
    not the corpus; pick ``bucket_width`` so that count stays in the
    thousands. Skew concentrates only when one bucket dominates --
    narrow ``bucket_width`` to split it.

    Returns ``(id_col, value_col, rnk)``.
    """
    from .intervals import guard_internal_columns

    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    guard_internal_columns(
        df, ("_h", "_vbucket", "_n", "_base"), "value_rank"
    )
    d = df.select(
        F.col(id_col),
        F.col(value_col).cast("long").alias(value_col),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
    ).withColumn(
        "_vbucket", F.floor(F.col(value_col) / F.lit(int(bucket_width)))
    )
    per_bucket = d.groupBy("_vbucket").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_vbucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "_vbucket",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_base"),
    )
    w_in = Window.partitionBy("_vbucket").orderBy(value_col, "_h", id_col)
    return (
        d.join(F.broadcast(offsets), "_vbucket")
        .select(
            id_col,
            value_col,
            (F.col("_base") + F.row_number().over(w_in))
            .cast("long")
            .alias("rnk"),
        )
    )


def balanced_shards(
    df: DataFrame, id_col: str, size_col: Column, n_shards: int
) -> DataFrame:
    """Deterministic token-balanced shard assignment: order documents by
    (size DESC, content-hash) and deal them to ``n_shards`` shards in
    serpentine (boustrophedon) order -- block b of n_shards docs is
    dealt left-to-right when b is even, right-to-left when odd, so the
    shard that just received the largest doc of a block receives the
    smallest of the next. Greedy LPT needs a sequential scan; the
    serpentine deal is its fully-parallel deterministic stand-in and
    keeps per-shard token totals within one document of each other for
    smoothly-distributed sizes.

    Returns (id, n_tokens, rnk, shard), rnk the 1-based global order.

    Scale shape: the global rank is NOT a global sort. Documents bucket
    exactly by their size value: rnk = (# docs with strictly larger
    size) + (row_number among equal sizes by hash). The per-size counts
    aggregate with map-side combine; their descending cumsum runs over
    the tiny distinct-size dimension (bounded by max sequence length,
    not corpus size -- same two-level discipline as global_prefix_sum
    above); the within-size window partitions by size value. One
    dominant size value concentrates its docs in one partition -- at
    pretraining scale sizes spread over thousands of values, and a
    pathological single-length corpus can pre-salt by hash prefix.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.md5(F.col(id_col).cast("string"))
    sized = df.select(
        F.col(id_col).alias("id"),
        size_col.cast("long").alias("n_tokens"),
        h.alias("_h"),
    )
    per_size = sized.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy(F.col("n_tokens").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_size.select(
        "n_tokens", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_base")
    )
    w_in = Window.partitionBy("n_tokens").orderBy("_h", "id")
    ranked = sized.join(F.broadcast(offsets), "n_tokens").select(
        "id",
        "n_tokens",
        (F.col("_base") + F.row_number().over(w_in)).cast("long").alias("rnk"),
    )
    r0 = F.col("rnk") - 1
    block = F.floor(r0 / n_shards)
    pos = r0 % n_shards
    shard = F.when(block % 2 == 0, pos).otherwise(n_shards - 1 - pos)
    return ranked.select(
        "id", "n_tokens", "rnk", shard.cast("long").alias("shard")
    )
