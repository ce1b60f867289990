"""Corpus snapshot diffing — the CDC primitive of an incremental
ingest pipeline.

A production crawl re-lands the whole corpus every cycle; the
training-data pipeline only wants to re-process what CHANGED. ``snapshot_diff``
classifies every document across two snapshots as added / removed /
changed / unchanged by content fingerprint, so downstream stages
(dedup, quality, tokenization) can run on the added+changed slice
only. The reference's restartable fetch cache
(``ExternalApiResultsFetcher.py``, cached-vs-requested anti-join) is
the same idea at API-call granularity; this is the corpus-level batch
form, and ``streaming/incremental.incremental_new_keys`` the
key-level streaming form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    label_col: str = "source",
) -> DataFrame:
    """Per-document diff of two corpus snapshots. Returns
    (``id_col``, ``label_col``, status, chars_old, chars_new) with
    status in {'added', 'removed', 'changed', 'unchanged'};
    chars_old/chars_new are 0 on the missing side.

    Scale shape: each side is reduced MAP-SIDE to
    (id, label, md5 fingerprint, length) before the join — the
    full-outer join on the id key shuffles ~50 bytes per document, not
    document bodies. No skew risk (ids are unique per side); at 100 TB
    this is one id-partitioned exchange per side plus a projection.
    """
    def prep(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias(f"{tag}_label"),
            F.md5(F.col(content_col)).alias(f"{tag}_fp"),
            F.length(F.col(content_col)).cast("long").alias(f"{tag}_len"),
        )

    o = prep(old, "o")
    n = prep(new, "n")
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("o_fp").isNull(), F.lit("added"))
        .when(F.col("n_fp").isNull(), F.lit("removed"))
        .when(F.col("o_fp") == F.col("n_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("n_label"), F.col("o_label")).alias(label_col),
        status.alias("status"),
        F.coalesce(F.col("o_len"), F.lit(0)).alias("chars_old"),
        F.coalesce(F.col("n_len"), F.lit(0)).alias("chars_new"),
    )


def incremental_rollup(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    label_col: str = "source",
) -> DataFrame:
    """Incremental view maintenance of the per-label corpus rollup
    (n_docs, n_tokens, n_chars): compute the NEW snapshot's rollup as
    ``rollup(old) ⊕ delta`` where the delta touches ONLY added /
    removed / changed documents — unchanged documents (the vast
    majority of a recrawl) never contribute to the update.

    This is the aggregate-level counterpart of ``snapshot_diff``: diff
    classifies, this maintains. The correctness gate is meaningful
    because the oracle recomputes the new rollup DIRECTLY from the new
    snapshot — equality proves the maintenance algebra, not just the
    arithmetic.

    Scale shape: per-document metrics are map-side projections; the
    only id-keyed exchange carries (id, label, fingerprint, metrics)
    — never bodies; the delta and both rollups are label-sized. In
    production ``rollup(old)`` is the stored aggregate from the
    previous cycle, so the whole update costs one changed-slice scan
    plus label-sized arithmetic — the point of IVM at 100 TB.
    """

    def prep(df: DataFrame, tag: str) -> DataFrame:
        from ..functions.text import tokens

        return df.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias(f"{tag}_label"),
            F.md5(F.col(content_col)).alias(f"{tag}_fp"),
            F.size(tokens(F.lower(F.col(content_col))))
            .cast("long")
            .alias(f"{tag}_tokens"),
            F.length(F.col(content_col)).cast("long").alias(f"{tag}_chars"),
        )

    o, n = prep(old, "o"), prep(new, "n")
    old_rollup = o.groupBy(F.col("o_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("o_tokens").cast("long").alias("n_tokens"),
        F.sum("o_chars").cast("long").alias("n_chars"),
    )
    j = o.join(n, "id", "full_outer")
    # rollup_new = rollup_old
    #              - contrib(old rows that are removed OR touched)
    #              + contrib(new rows that are added OR touched)
    # where "touched" = fingerprint changed OR label moved; unchanged
    # documents are dropped before any aggregation. A changed doc that
    # also moved label debits the OLD label and credits the NEW one.
    touched = (F.col("o_fp") != F.col("n_fp")) | (
        F.col("o_label") != F.col("n_label")
    )
    minus = j.filter(
        F.col("o_fp").isNotNull() & (F.col("n_fp").isNull() | touched)
    ).select(
        F.col("o_label").alias("label"),
        F.lit(-1).cast("long").alias("d_docs"),
        (-F.col("o_tokens")).cast("long").alias("d_tokens"),
        (-F.col("o_chars")).cast("long").alias("d_chars"),
    )
    plus = j.filter(
        F.col("n_fp").isNotNull() & (F.col("o_fp").isNull() | touched)
    ).select(
        F.col("n_label").alias("label"),
        F.lit(1).cast("long").alias("d_docs"),
        F.col("n_tokens").cast("long").alias("d_tokens"),
        F.col("n_chars").cast("long").alias("d_chars"),
    )
    delta = (
        minus.unionAll(plus)
        .groupBy("label")
        .agg(
            F.sum("d_docs").alias("d_docs"),
            F.sum("d_tokens").alias("d_tokens"),
            F.sum("d_chars").alias("d_chars"),
        )
    )
    merged = old_rollup.join(delta, "label", "full_outer").select(
        "label",
        (F.coalesce("n_docs", F.lit(0)) + F.coalesce("d_docs", F.lit(0)))
        .cast("long")
        .alias("n_docs"),
        (F.coalesce("n_tokens", F.lit(0)) + F.coalesce("d_tokens", F.lit(0)))
        .cast("long")
        .alias("n_tokens"),
        (F.coalesce("n_chars", F.lit(0)) + F.coalesce("d_chars", F.lit(0)))
        .cast("long")
        .alias("n_chars"),
    )
    return merged.filter(F.col("n_docs") > 0).select(
        F.col("label").alias(label_col), "n_docs", "n_tokens", "n_chars"
    )
