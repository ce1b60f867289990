"""Structured Streaming surfaces.

The reference is batch-only (SURVEY.md section 2.11); its restartable
fetch-checkpoint loops are the natural streaming seam. Here we provide
the standard streaming shapes for the events table: watermarked tumbling
windows and session windows -- the streaming twins of the batch
``q_hourly_rollup`` / ``q_sessionize`` plans, sharing semantics so batch
backfill and live streaming agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    Works on both a streaming DataFrame (readStream) and a static one --
    same plan, which is the point: batch backfill and the live stream
    produce identical windows. Late rows beyond the watermark are
    dropped (documented divergence from batch, which sees everything).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(F.window("ts", window_len).alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
    )


def deduplicated_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each key wins across
    micro-batches; state for keys older than the watermark is dropped
    (bounded state -- the scale requirement for infinite streams).
    Batch twin: dropDuplicates on the same keys.
    """
    keys = key_cols or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def sessionized_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) per user via the built-in
    ``session_window`` -- the streaming-native form of q_sessionize.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.session_window("ts", gap).alias("session"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))


def curated_document_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_stop_ratio: float = 0.9,
    max_dup_frac: float = 0.5,
) -> DataFrame:
    """Curation-on-ingest: the quality + repetition signals as inline
    stateless projections over a document stream -- no watermark, no
    state store, no shuffle, throughput = scan rate. The SAME call
    works on a static frame, so batch backfill and live ingest apply a
    byte-identical keep/drop policy (the agreement guarantee the
    windowed twins give for aggregation, here for filtering).

    The signal expressions are the shared definitions in
    ``operators.textanalysis`` (``quality_columns`` /
    ``dup_frac_column``) -- one source of truth, zero drift between
    this filter and the batch quality reports, and zero-guarded so an
    empty document cannot DIVIDE_BY_ZERO-kill the streaming query
    under ANSI mode.

    Returns surviving rows with (n_tokens, stop_ratio, dup_frac)
    attached for downstream threshold audits.
    """
    from ..operators.textanalysis import dup_frac_column, quality_columns

    q = quality_columns(F.col(text_col))
    out = docs.withColumns(
        {
            "n_tokens": q["n_tokens"],
            "stop_ratio": q["stop_ratio"],
            "dup_frac": dup_frac_column(F.col(text_col), 2),
        }
    )
    return out.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stop_ratio") <= max_stop_ratio)
        & (F.col("dup_frac") <= max_dup_frac)
    )


def interval_enriched_stream(
    events: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Stream-static interval join: each arriving event joins to every
    static interval (same keys) whose [start, end] range contains its
    coordinate -- validity windows, campaign periods, maintenance
    windows. The bucketized shape (operators.intervals.interval_join)
    is stream-legal because it is only a projection + stateless
    stream-static equi-join + filter: no state store, no watermark
    needed, and the static side's bucket explosion happens once per
    micro-batch plan, not per row.

    The SAME call works on a static events frame (the batch-backfill
    agreement guarantee of the other twins here).
    """
    from ..operators.intervals import interval_join

    return interval_join(
        events, intervals, on, point_col, start_col, end_col, bucket_width
    )


def neardup_probe_stream(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Decontamination-at-ingest: every arriving document is
    MinHash-signed map-side (the zero-shuffle wide-signature pipeline)
    and probed against the STATIC benchmark's band buckets, which ride
    one broadcast carrying buckets + signatures -- the streaming form
    of ``dedup.minhash_cross_match`` with the corpus side live.

    Returns one row PER COLLIDING BAND: (id, bench_id, band,
    est_jaccard). Per-band records keep the operator a stateless
    projection + stream-static equi-join -- append-legal with no
    watermark and no state store, throughput = scan rate -- and are
    what an ingest monitor wants anyway (band hit rate). Collapsing
    bands to distinct pairs is a per-pair groupBy downstream (or the
    batch operator, whose pair set equals this output's distinct
    (id, bench_id) -- test-pinned). The SAME call works on a static
    frame: batch backfill and live ingest flag byte-identical
    collisions.
    """
    from ..operators.dedup import lsh_band_buckets, minhash_signatures_wide

    b_sigs = minhash_signatures_wide(bench, id_col, text_col, num_perm, shingle_n)
    b_payload = lsh_band_buckets(b_sigs, num_perm, bands, carry=("sig",)).select(
        F.col("id").alias("bench_id"),
        "band",
        "bucket",
        F.col("sig").alias("bench_sig"),
    )
    c_sigs = minhash_signatures_wide(docs, id_col, text_col, num_perm, shingle_n)
    c_buckets = lsh_band_buckets(c_sigs, num_perm, bands, carry=("sig",))
    matches = F.aggregate(
        F.zip_with(
            F.col("sig"),
            F.col("bench_sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return c_buckets.join(F.broadcast(b_payload), ["band", "bucket"]).select(
        "id",
        "bench_id",
        "band",
        (matches / F.lit(float(num_perm))).alias("est_jaccard"),
    )


def incremental_probe_stream(
    docs: DataFrame,
    base_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental dedup at INGEST: every arriving document is
    MinHash-signed map-side and probed against the PERSISTED base-corpus
    LSH index (plans/materialized.minhash_index_frame) -- the streaming
    twin of ``dedup.incremental_minhash_probe``, for pipelines where
    the delta arrives as a stream rather than a batch.

    Returns one row PER COLLIDING BAND: (id, base_id, band,
    est_jaccard) -- a stateless projection + stream-static equi-join on
    (band, bucket), append-legal with no watermark and no state store.
    Unlike ``neardup_probe_stream`` (whose static side is a broadcast-
    sized benchmark) the base index here is corpus-sized, so no
    broadcast hint: the static side is a bucketed table scan and the
    join co-locates on the bucket key. The per-delta top-1 cut is a
    downstream batch aggregation (or ``incremental_minhash_probe``,
    whose pair set equals this output's distinct (id, base_id) --
    test-pinned).  The SAME call works on a static frame: batch
    backfill and live ingest flag byte-identical collisions.
    """
    from ..operators.dedup import lsh_band_buckets, minhash_signatures_wide

    b = base_index.select(
        F.col("id").alias("base_id"),
        "band",
        "bucket",
        F.col("sig").alias("base_sig"),
    )
    d_sigs = minhash_signatures_wide(docs, id_col, text_col, num_perm, shingle_n)
    d_buckets = lsh_band_buckets(d_sigs, num_perm, bands, carry=("sig",))
    matches = F.aggregate(
        F.zip_with(
            F.col("sig"),
            F.col("base_sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return d_buckets.join(b, ["band", "bucket"]).select(
        "id",
        "base_id",
        "band",
        (matches / F.lit(float(num_perm))).alias("est_jaccard"),
    )


def media_features_stream(
    media: DataFrame, kind: str = "image", fake: bool = False
) -> DataFrame:
    """Multimodal decode at INGEST: the SAME Arrow-batched
    ``mapInPandas`` decode bodies as the batch operators
    (operators/multimodal.image_features / audio_features -- REAL
    P6/BMP/WAV codecs since r11), applied to a streaming frame.
    Stateless and append-legal: decode is a pure per-row transform, so
    mapInPandas needs no watermark or state store, and ANY micro-batch
    split of the media stream yields exactly the batch twin's rows
    (test-pinned availableNow e2e in
    tests/test_multimodal_streaming.py). This is the 100 TB ingest
    shape: features extract once as media lands, not per downstream
    query; backfill (static frame) and live ingest share one code
    path."""
    from ..operators.multimodal import (
        audio_features,
        image_features,
        video_frame_features_fused,
    )

    if kind not in ("image", "audio", "video"):
        # An unknown kind must never fall through to another decoder
        # (ADVICE r11) -- it would fail rows individually instead of
        # loudly.
        raise ValueError(f"unsupported media kind {kind!r}")
    if kind == "video":
        # Per-frame fan-out FUSED into the per-row transform
        # (sample + decode in one mapInPandas): stateless and
        # append-legal like the others, where the batch twin's
        # plan/join shape would be a stateful stream-stream self-join.
        # Row-identical to video_frame_features (test-pinned).
        return video_frame_features_fused(media, fake=fake)
    fn = image_features if kind == "image" else audio_features
    return fn(media, fake=fake)


def hll_register_stream(
    docs: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Cardinality profiling at INGEST: every arriving document's
    tokens are hashed map-side into HLL (group, bucket, rho)
    contribution rows -- the streaming twin of
    ``operators/sketches.hll_registers``, for pipelines where the
    corpus arrives as a stream. Stateless and append-legal (no
    watermark, no state store): the register MERGE is a downstream
    max-aggregation (or the persisted base table's compaction job, the
    ``q_hll_incremental`` posture), and because max is order- and
    duplicate-insensitive, ANY partition of the stream into batches
    merges to exactly the batch operator's registers -- estimate
    included (test-pinned in tests/test_multimodal_streaming.py). The
    SAME call works on a static frame: backfill and live ingest
    contribute byte-identical rows.
    """
    from ..operators.sketches import hll_bucket_rho

    toks = docs.select(
        group_col,
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "tok"
        ),
    ).filter(F.col("tok") != "")
    bucket, rho = hll_bucket_rho(F.col("tok"))
    return toks.select(group_col, bucket.alias("bucket"), rho.alias("rho"))
