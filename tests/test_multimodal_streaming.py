"""Tests for multimodal plumbing (mapInPandas contract, stubbed decode)
and Structured Streaming surfaces."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators import multimodal as mm
from cell_kn_mvp_etl_results_spark.streaming import (
    incremental_new_keys,
    sessionized_stream,
    windowed_counts,
)


def media(spark):
    rows = [
        (1, "image", bytes([10, 20, 30, 40]), "image/png"),
        (2, "image", bytes([1] * 100), "image/png"),
        (3, "audio", b"\x00\x01", "audio/wav"),
        (4, "video", bytes(range(256)) * 20, "video/mp4"),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"abc")


def test_image_features_plumbing(spark):
    out = mm.image_features(media(spark), fake=True).collect()
    by_id = {r.media_id: r for r in out}
    assert set(by_id) == {1, 2}  # only image rows
    assert by_id[1].n_bytes == 4
    assert by_id[1].width == 16 + 10 and by_id[1].height == 16 + 40
    # Deterministic across runs.
    again = {r.media_id: r for r in mm.image_features(media(spark), fake=True).collect()}
    assert {k: tuple(v) for k, v in by_id.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_audio_features_plumbing(spark):
    out = {r.media_id: r for r in mm.audio_features(media(spark), fake=True).collect()}
    assert set(out) == {3}  # only the audio row
    assert out[3].n_bytes == 2 and out[3].est_duration_ms == 0

    import pytest

    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"xx")


def test_media_metadata_jvm_only(spark):
    out = {r.media_id: r for r in mm.media_metadata(media(spark)).collect()}
    assert out[4].n_bytes == 256 * 20
    assert len(out[1].content_hash) == 32


def test_frame_sample_plan(spark):
    out = mm.frame_sample_plan(media(spark), every_n=2).collect()
    assert all(r.media_id == 4 for r in out)
    idxs = sorted(r.frame_idx for r in out)
    assert idxs[0] == 0 and idxs == sorted(set(idxs))


def test_read_media_dir_binary_source(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(bytes([1, 2, 3, 4]))
    (tmp_path / "b.jpg").write_bytes(bytes([9] * 10))
    out = mm.read_media_dir(spark, str(tmp_path), kind="image").collect()
    by_mime = {r.mime: r for r in out}
    assert set(by_mime) == {"image/png", "image/jpeg"}
    assert bytes(by_mime["image/png"].payload) == bytes([1, 2, 3, 4])
    assert len({r.media_id for r in out}) == 2  # stable distinct ids
    # feeds straight into the feature extractor
    feats = mm.image_features(
        mm.read_media_dir(spark, str(tmp_path)), fake=True
    ).collect()
    assert {f.n_bytes for f in feats} == {4, 10}


def test_incremental_anti_join(spark):
    req = spark.createDataFrame([(i,) for i in range(10)], "id long")
    cached = spark.createDataFrame([(i,) for i in range(0, 10, 2)], "id long")
    todo = sorted(r.id for r in incremental_new_keys(req, cached, "id").collect())
    assert todo == [1, 3, 5, 7, 9]
    first_run = incremental_new_keys(req, None, "id").count()
    assert first_run == 10


def test_streaming_windowed_counts(spark, sf_dir):
    """End-to-end micro-batch: file-source stream over the events parquet,
    watermarked tumbling windows, memory sink."""
    from cell_kn_mvp_etl_results_spark.sources.readers import (
        read_events_stream,
        read_table,
    )

    static = read_table(spark, sf_dir, "events")
    stream = read_events_stream(spark, sf_dir)
    agg = windowed_counts(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM win_counts").collect()[0].n
    batch = windowed_counts(static).count()
    assert got == batch > 0


def test_streaming_dedup(spark, sf_dir):
    """dropDuplicatesWithinWatermark end-to-end: duplicated stream input
    collapses to the distinct key set."""
    import tempfile

    from cell_kn_mvp_etl_results_spark.sources.readers import (
        read_events_stream,
        read_table,
    )
    from cell_kn_mvp_etl_results_spark.streaming import deduplicated_stream

    stream = read_events_stream(spark, sf_dir)
    # duplicate every event, then dedup by event_id
    doubled = stream.union(stream)
    deduped = deduplicated_stream(doubled, ["event_id"])
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM dedup_stream").collect()[0].n
    expected = read_table(spark, sf_dir, "events").count()
    assert got == expected


def test_streaming_session_window_plan(spark, sf_dir):
    """session_window agg builds and runs in batch mode (same plan works
    as a stream; watermark branch exercised via isStreaming flag)."""
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    static = read_table(spark, sf_dir, "events")
    out = sessionized_stream(static)
    assert out.count() > 0


def test_streaming_curation_filter_matches_batch(spark, sf_dir, tmp_path):
    """curated_document_stream applies the identical keep/drop policy on
    a live stream and on the static frame (availableNow e2e)."""
    import os

    from cell_kn_mvp_etl_results_spark.sources.readers import read_table
    from cell_kn_mvp_etl_results_spark.streaming.windows import (
        curated_document_stream,
    )

    static = read_table(spark, sf_dir, "documents")
    batch_kept = curated_document_stream(
        static, min_tokens=20, max_dup_frac=0.4
    )
    expected = {r.doc_id for r in batch_kept.select("doc_id").collect()}
    assert 0 < len(expected) < static.count()  # thresholds actually bite

    stage = tmp_path / "docs_stream"
    stage.mkdir()
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"), stage / "part-0.parquet"
    )
    stream = spark.readStream.schema(static.schema).parquet(str(stage))
    kept_stream = curated_document_stream(
        stream, min_tokens=20, max_dup_frac=0.4
    )
    q = (
        kept_stream.writeStream.format("memory")
        .queryName("curated_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM curated_docs").collect()}
    assert got == expected


def test_repartition_for_decode_balances_and_preserves(spark):
    from cell_kn_mvp_etl_results_spark.operators.multimodal import (
        repartition_for_decode,
    )

    rows = [(i, "image", bytes([i % 251]) * (100 + i), "image/x-fake")
            for i in range(200)]
    df = spark.createDataFrame(rows, schema="media_id long, kind string, payload binary, mime string")
    out = repartition_for_decode(df, n_partitions=8, heavy_bytes=250)
    assert out.count() == 200  # nothing lost
    sizes = out.rdd.glom().map(len).collect()
    # union concatenates the normal + heavy children: 2 x 8 partitions
    assert len(sizes) == 16 and max(sizes) <= 2 * (200 // 8)  # no pile-up
    # determinism: same input, same partition assignment
    a = out.rdd.glom().map(lambda p: sorted(r.media_id for r in p)).collect()
    b = (
        repartition_for_decode(df.repartition(5), n_partitions=8, heavy_bytes=250)
        .rdd.glom()
        .map(lambda p: sorted(r.media_id for r in p))
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_repartition_for_decode_heavy_rows_spread_exactly(spark):
    """Heavy payloads round-robin exactly: 8 heavy rows over 4
    partitions -> exactly 2 per partition, regardless of id hashes."""
    from cell_kn_mvp_etl_results_spark.operators.multimodal import (
        repartition_for_decode,
    )

    rows = [(i, "video", b"v" * 1000, "video/x-fake") for i in range(8)]
    rows += [(100 + i, "image", b"i" * 10, "image/x-fake") for i in range(50)]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string"
    )
    out = repartition_for_decode(df, n_partitions=4, heavy_bytes=500)
    heavy_per_part = (
        out.rdd.glom()
        .map(lambda p: sum(1 for r in p if len(r.payload) >= 500))
        .collect()
    )
    # exact round-robin: no partition carries more than ceil(8/4) heavies
    assert max(heavy_per_part) == 2 and sum(heavy_per_part) == 8
    assert out.count() == 58


def test_video_frame_features_fanout(spark):
    """Sample -> decode -> per-frame features: deterministic fake
    decode over the sampled frame indices, one row per frame."""
    from cell_kn_mvp_etl_results_spark.operators.multimodal import (
        decode_frame,
        frame_sample_plan,
        video_frame_features,
    )

    payload = bytes(range(256)) * 40  # ~10KB -> ~10 estimated frames
    rows = [(7, "video", payload, "video/mp4"),
            (8, "image", b"img", "image/png")]  # non-video ignored
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string"
    )
    plan = {(r.media_id, r.frame_idx) for r in frame_sample_plan(df, every_n=3).collect()}
    got = {(r.media_id, r.frame_idx): r.mean_luma
           for r in video_frame_features(df, every_n=3).collect()}
    assert set(got) == plan and all(m == 7 for m, _ in got)
    for (mid, idx), luma in got.items():
        assert luma == decode_frame(payload, idx, fake=True)

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_frame(b"x", 0, fake=False)


def test_stream_stream_attribution_join(spark, sf_dir):
    """Watermarked stream-stream join end-to-end: view events joined to
    same-user purchase events within 30 minutes; identical row count to
    the batch twin over the same source."""
    import tempfile

    from cell_kn_mvp_etl_results_spark.sources.readers import (
        read_events_stream,
        read_table,
    )
    from cell_kn_mvp_etl_results_spark.streaming.joins import (
        attributed_events_stream,
    )

    static = read_table(spark, sf_dir, "events")
    views_b = static.filter(F.col("event_type") == "view")
    buys_b = static.filter(F.col("event_type") == "purchase")
    batch = attributed_events_stream(views_b, buys_b).count()
    assert batch > 0

    s1 = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "view")
    s2 = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    joined = attributed_events_stream(s1, s2)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            joined.writeStream.format("memory")
            .queryName("attrib")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    got = spark.sql("SELECT count(*) AS n FROM attrib").collect()[0].n
    assert got == batch


def test_streaming_neardup_probe_matches_batch_and_cross_match(spark, sf_dir, tmp_path):
    """neardup_probe_stream flags byte-identical collisions on a live
    stream and on the static frame (availableNow e2e), and its distinct
    (id, bench_id) pairs equal the batch cross-match operator's."""
    import os

    from pyspark.sql import functions as F
    from cell_kn_mvp_etl_results_spark.operators.dedup import minhash_cross_match
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table
    from cell_kn_mvp_etl_results_spark.streaming.windows import neardup_probe_stream

    static = read_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("xdedup-"), F.col("doc_id"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    with_b = static.withColumn("_holdout", bucket < 20)
    bench = with_b.filter(F.col("_holdout")).drop("_holdout")
    corpus = with_b.filter(~F.col("_holdout")).drop("_holdout")

    batch_rows = {
        (r.id, r.bench_id, r.band, r.est_jaccard)
        for r in neardup_probe_stream(corpus, bench).collect()
    }
    assert batch_rows  # the 20% split produces collisions at gate scale

    # distinct pairs agree with the batch cross-match operator
    pairs = {
        (r.id, r.bench_id)
        for r in minhash_cross_match(corpus, bench, "doc_id", "text").collect()
    }
    assert {(i, b) for i, b, _band, _e in batch_rows} == pairs

    stage = tmp_path / "docs_stream2"
    stage.mkdir()
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"), stage / "part-0.parquet"
    )
    stream_docs = (
        spark.readStream.schema(static.schema)
        .parquet(str(stage))
        .withColumn("_holdout", bucket < 20)
        .filter(~F.col("_holdout"))
        .drop("_holdout")
    )
    out = neardup_probe_stream(stream_docs, bench)
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.id, r.bench_id, r.band, r.est_jaccard)
        for r in spark.sql("SELECT * FROM neardup_probe").collect()
    }
    assert got == batch_rows


def test_streaming_debounce_matches_batch(spark, sf_dir):
    """Custom stateful debounce (applyInPandasWithState): identical
    kept-event set on a live availableNow stream and on the static
    frame; suppression is real (some events dropped)."""
    import tempfile

    from cell_kn_mvp_etl_results_spark.sources.readers import (
        read_events_stream,
        read_table,
    )
    from cell_kn_mvp_etl_results_spark.streaming import debounced_stream

    static = read_table(spark, sf_dir, "events")
    batch = debounced_stream(static, gap_us=3_600_000_000)
    stream = debounced_stream(
        read_events_stream(spark, sf_dir), gap_us=3_600_000_000
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("debounced")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        r.event_id: (r.user_id, r.event_type, r.ts_us)
        for r in spark.sql("SELECT * FROM debounced").collect()
    }
    want = {
        r.event_id: (r.user_id, r.event_type, r.ts_us)
        for r in batch.collect()
    }
    assert got == want
    assert 0 < len(want) < static.count()


def test_debounce_hand_computed(spark):
    """Gap is measured to the previous event KEPT OR DROPPED: a burst
    t=0,5,12,23 with gap 10 keeps only t=0 and t=23 (12 is within 10 of
    the dropped 5; 23 is 11 past the dropped 12, a true quiet gap)."""
    import datetime as dt

    from cell_kn_mvp_etl_results_spark.streaming import debounced_stream

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 7, "click", 0.0, "{}"),
        (2, base + dt.timedelta(seconds=5), 7, "click", 0.0, "{}"),
        (3, base + dt.timedelta(seconds=12), 7, "click", 0.0, "{}"),
        (4, base + dt.timedelta(seconds=23), 7, "click", 0.0, "{}"),
        (5, base + dt.timedelta(seconds=1), 7, "view", 0.0, "{}"),
        (6, base + dt.timedelta(seconds=2), 8, "click", 0.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    kept = {r.event_id for r in debounced_stream(e, gap_us=10_000_000).collect()}
    assert kept == {1, 4, 5, 6}


def test_streaming_forward_fill_matches_batch_span(spark, sf_dir):
    """Custom stateful forward-fill (applyInPandasWithState): the
    availableNow stream equals the non-streaming per-key-span twin,
    and equals q_gap_fill's global grid restricted to each key's
    [first, last] observation span."""
    import tempfile

    from cell_kn_mvp_etl_results_spark.sources.readers import (
        read_events_stream,
        read_table,
    )
    from cell_kn_mvp_etl_results_spark.streaming import filled_daily_stream

    static = read_table(spark, sf_dir, "events")
    batch = {
        (r.user_id, r.d): (r.n_obs, r.cents_filled)
        for r in filled_daily_stream(static).collect()
    }
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            filled_daily_stream(read_events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName("ffill")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        (r.user_id, r.d): (r.n_obs, r.cents_filled)
        for r in spark.sql("SELECT * FROM ffill").collect()
    }
    assert got == batch
    assert len(got) > static.select("user_id").distinct().count()  # dense

    # Consistency with the registered global-grid batch operator: equal
    # on each key's own observation span.
    from cell_kn_mvp_etl_results_spark.operators.timeseries import (
        gap_fill_daily,
    )

    spans = {}
    for (u, d), (n, _c) in got.items():
        lo, hi = spans.get(u, (d, d))
        spans[u] = (min(lo, d), max(hi, d))
    global_grid = {
        (r.user_id, r.d): (r.n_obs, r.cents_filled)
        for r in gap_fill_daily(static).collect()
    }
    restricted = {
        k: v
        for k, v in global_grid.items()
        if k[0] in spans and spans[k[0]][0] <= k[1] <= spans[k[0]][1]
    }
    assert restricted == got


def test_forward_fill_stream_carries_across_batches(spark):
    """State carries the close value across micro-batches: a silent
    day between two batches is emitted by the SECOND batch with the
    first batch's close."""
    import datetime as dt

    from cell_kn_mvp_etl_results_spark.streaming import filled_daily_stream

    base = dt.datetime(2024, 1, 1, 6, 0, 0)
    rows = [
        (1, base, 7, "click", 1.0, "{}"),
        (2, base + dt.timedelta(days=3), 7, "click", 2.5, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = sorted(
        (r.d, r.n_obs, r.cents_filled)
        for r in filled_daily_stream(df).collect()
    )
    d0 = got[0][0]
    assert got == [
        (d0, 1, 100),
        (d0 + 1, 0, 100),
        (d0 + 2, 0, 100),
        (d0 + 3, 1, 250),
    ]


def test_streaming_quota_matches_batch(spark, sf_dir):
    """Quota admission (applyInPandasWithState): identical admitted
    set + running totals on a live availableNow stream and on the
    static frame; the quota actually rejects events."""
    import tempfile

    from cell_kn_mvp_etl_results_spark.sources.readers import (
        read_events_stream,
        read_table,
    )
    from cell_kn_mvp_etl_results_spark.streaming import quota_admitted_stream

    static = read_table(spark, sf_dir, "events")
    batch = quota_admitted_stream(static, budget_cents=10000)
    stream = quota_admitted_stream(
        read_events_stream(spark, sf_dir), budget_cents=10000
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("quota_admitted")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        r.event_id: (r.user_id, r.cents, r.cum_cents)
        for r in spark.sql("SELECT * FROM quota_admitted").collect()
    }
    want = {
        r.event_id: (r.user_id, r.cents, r.cum_cents)
        for r in batch.collect()
    }
    assert got == want
    assert 0 < len(want) < static.count()


def test_quota_hand_computed(spark):
    """Prefix semantics: every seen event consumes budget, admitted or
    not -- a later small event cannot sneak under a quota an earlier
    big one exhausted."""
    import datetime

    rows = [
        # (event_id, ts, user_id, value): cents 600, 500, 300, 100
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 7, 6.0),
        (2, datetime.datetime(2024, 1, 1, 0, 0, 1), 7, 5.0),
        (3, datetime.datetime(2024, 1, 1, 0, 0, 2), 7, 3.0),
        (4, datetime.datetime(2024, 1, 1, 0, 0, 3), 7, 1.0),
    ]
    from cell_kn_mvp_etl_results_spark.streaming import quota_admitted_stream

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = sorted(
        (r.event_id, r.cum_cents)
        for r in quota_admitted_stream(df, budget_cents=1200).collect()
    )
    # 600 -> admit; 1100 -> admit; 1400 > 1200 -> reject; 1500 (the
    # 100-cent event STILL sits at prefix 1500) -> reject.
    assert got == [(1, 600), (2, 1100)]


def test_streaming_incremental_probe_matches_batch_twin(spark, sf_dir, tmp_path):
    """incremental_probe_stream (delta stream vs persisted base LSH
    index) availableNow e2e: its distinct (id, base_id) pairs equal the
    batch incremental_minhash_probe candidate set, and the per-delta
    top-1 derived from its rows equals the batch operator's output."""
    import os

    from pyspark.sql import functions as F
    from cell_kn_mvp_etl_results_spark.operators.dedup import (
        incremental_minhash_probe,
    )
    from cell_kn_mvp_etl_results_spark.plans.materialized import (
        minhash_index_frame,
    )
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table
    from cell_kn_mvp_etl_results_spark.streaming.windows import (
        incremental_probe_stream,
    )

    static = read_table(spark, sf_dir, "documents")
    index = minhash_index_frame(spark, sf_dir, base_mod=10)
    batch = incremental_minhash_probe(
        index, static.filter(F.col("doc_id") % 10 == 0), "doc_id", "text"
    ).collect()
    assert batch  # gate corpora collide at mod-10 split

    stage = tmp_path / "docs_stream3"
    stage.mkdir()
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"), stage / "part-0.parquet"
    )
    stream_docs = (
        spark.readStream.schema(static.schema)
        .parquet(str(stage))
        .filter(F.col("doc_id") % 10 == 0)
    )
    out = incremental_probe_stream(stream_docs, index)
    q = (
        out.writeStream.format("memory")
        .queryName("inc_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM inc_probe").collect()
    # per-delta top-1 at est >= 0.25, (est desc, base_id) order -- the
    # batch operator's exact cut, derived driver-side from stream rows
    best: dict = {}
    for r in rows:
        if r.est_jaccard < 0.25:
            continue
        cur = best.get(r.id)
        if cur is None or (-r.est_jaccard, r.base_id) < (-cur[1], cur[0]):
            best[r.id] = (r.base_id, r.est_jaccard)
    got = sorted((i, b, e) for i, (b, e) in best.items())
    want = sorted((r.delta_id, r.base_id, r.est_jaccard) for r in batch)
    assert got == want


def test_streaming_hll_registers_match_batch_twin(spark, sf_dir, tmp_path):
    """hll_register_stream availableNow e2e: the stream's contribution
    rows, max-merged per (source, bucket), equal the batch
    hll_registers table exactly -- and therefore so does the estimate
    (register merge is order- and duplicate-insensitive)."""
    import os

    from pyspark.sql import functions as F
    from cell_kn_mvp_etl_results_spark.operators import sketches as sk
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table
    from cell_kn_mvp_etl_results_spark.streaming.windows import (
        hll_register_stream,
    )

    static = read_table(spark, sf_dir, "documents")
    toks = static.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    want = sorted(
        map(tuple, sk.hll_registers(toks, "tok", "source").collect())
    )

    stage = tmp_path / "docs_hll_stream"
    stage.mkdir()
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"), stage / "part-0.parquet"
    )
    stream_docs = spark.readStream.schema(static.schema).parquet(str(stage))
    out = hll_register_stream(stream_docs)
    q = (
        out.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    merged = (
        spark.sql("SELECT * FROM hll_regs")
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    got = sorted(map(tuple, merged.collect()))
    assert got == want
    # estimate carried through the merge identically
    est_stream = sorted(
        map(tuple, sk.hll_estimate(merged, "source").collect())
    )
    est_batch = sorted(
        map(
            tuple,
            sk.hll_estimate(
                sk.hll_registers(toks, "tok", "source"), "source"
            ).collect(),
        )
    )
    assert est_stream == est_batch


def test_decode_ppm_real_roundtrip():
    # r11: decode is REAL for P6 -- header grammar (comments allowed),
    # sample layout, exact-integer mean.
    for ident in (0, 5, 12, 9999):
        w, h, luma = mm.decode_image(mm.encode_ppm(ident))
        n = (4 + ident % 13) * (3 + ident % 7) * 3
        assert (w, h) == (4 + ident % 13, 3 + ident % 7)
        assert luma == sum((ident * 31 + k) % 256 for k in range(n)) // n
    # comment in header parses
    w, h, luma = mm.decode_image(b"P6\n# a comment\n2 1\n255\n" + bytes(6))
    assert (w, h, luma) == (2, 1, 0)


def test_decode_ppm_truncated_raises():
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        mm.decode_image(b"P6\n4 4\n255\n" + bytes(5))


def test_decode_bmp_real():
    import struct

    w, h = 5, 3
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    row = bytes((7 * i) % 256 for i in range(row_bytes))
    px = b"".join(row + b"\x00" * (stride - row_bytes) for _ in range(h))
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0)
    )
    got = mm.decode_image(hdr + px)
    assert got == (w, h, sum(row) * h // (w * h * 3))


def test_decode_bmp_wrong_bpp_raises():
    import struct

    import pytest

    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiihhIIiiII", 40, 1, 1, 1, 8, 0, 0, 0, 0, 0, 0)
    )
    with pytest.raises(ValueError, match="24-bit"):
        mm.decode_image(hdr)


def test_decode_wav_real_roundtrip():
    import math

    for ident in (0, 3, 31, 12345):
        dur, rms = mm.decode_audio(mm.encode_wav(ident))
        n = 64 + ident % 32
        samples = [((ident * 7 + i * 13) % 2001) - 1000 for i in range(n)]
        assert dur == n // 8
        assert rms == math.isqrt(sum(s * s for s in samples) // n)


def test_decode_unknown_codec_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x04rest-of-an-mp3")


def test_synthetic_media_schema_and_decode_gate_shape(spark):
    ids = spark.range(8).selectExpr("id AS media_id")
    media = mm.synthetic_media(ids, "image")
    assert media.schema == mm.MEDIA_SCHEMA
    feats = mm.image_features(media, fake=False).collect()
    assert len(feats) == 8
    for r in feats:
        assert r.width == 4 + r.media_id % 13
        assert r.height == 3 + r.media_id % 7


def test_media_decode_stream_equals_batch(spark, tmp_path):
    """r11: the REAL decode path as an ingest stream -- availableNow
    file-source stream of media rows, decoded by the same mapInPandas
    bodies as the batch twin, split across micro-batches (one file per
    trigger), pinned row-identical to the batch result."""
    import tempfile

    from cell_kn_mvp_etl_results_spark.streaming import media_features_stream

    for kind, batch_fn, n in (("image", mm.image_features, 24),
                              ("audio", mm.audio_features, 24)):
        ids = spark.range(n).selectExpr("id AS media_id")
        src = f"{tmp_path}/media_src_{kind}"
        mm.synthetic_media(ids, kind).repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(mm.MEDIA_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        feats = media_features_stream(stream, kind, fake=False)
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                feats.writeStream.format("memory")
                .queryName(f"media_feats_{kind}")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        got = sorted(
            map(
                tuple,
                spark.sql(f"SELECT * FROM media_feats_{kind}").collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                batch_fn(spark.read.parquet(src), fake=False).collect(),
            )
        )
        assert got == want
        assert len(got) == n


def test_read_media_dir_feeds_real_decode(spark, tmp_path):
    """Ingest real bytes from disk via the binaryFile source and decode
    them: write parametric .ppm / .wav files, read_media_dir them, and
    check the decoded stats equal the encoders' closed forms -- the
    whole ingest->decode path on actual files, not synthesized frames."""
    import os

    img_dir = f"{tmp_path}/imgs"
    os.makedirs(img_dir)
    for i in range(6):
        with open(f"{img_dir}/fixture_{i}.ppm", "wb") as f:
            f.write(mm.encode_ppm(i))
    media = mm.read_media_dir(spark, img_dir, kind="image")
    rows = {
        r.mean_luma: (r.width, r.height)
        for r in mm.image_features(media, fake=False).collect()
    }
    assert len(rows) == 6
    for i in range(6):
        w, h, luma = mm.decode_image(mm.encode_ppm(i))
        assert rows[luma] == (w, h)

    wav_dir = f"{tmp_path}/wavs"
    os.makedirs(wav_dir)
    for i in range(6):
        with open(f"{wav_dir}/fixture_{i}.wav", "wb") as f:
            f.write(mm.encode_wav(i))
    media = mm.read_media_dir(spark, wav_dir, kind="audio")
    assert media.filter(media.mime == "audio/wav").count() == 6
    got = sorted(
        (r.est_duration_ms, r.rms_level)
        for r in mm.audio_features(media, fake=False).collect()
    )
    want = sorted(mm.decode_audio(mm.encode_wav(i)) for i in range(6))
    assert got == want


def test_media_features_stream_rejects_unknown_kind(spark):
    # ADVICE r11: an unsupported kind must raise, not silently route
    # through the audio decoder.
    import pytest

    from cell_kn_mvp_etl_results_spark.streaming.windows import (
        media_features_stream,
    )

    media = spark.createDataFrame([("d1", b"\x00")], "doc_id string, payload binary")
    with pytest.raises(ValueError, match="unsupported media kind"):
        media_features_stream(media, kind="hologram")


def test_video_decode_real_end_to_end(spark):
    """r12: REAL video -- the PVF1 sampling plan reads the frame count
    JVM-side from the container header, and the per-frame decode
    parses actual P6 bytes; fused single-pass twin pinned
    row-identical to the join-shaped plan."""
    ids = spark.range(17).selectExpr("id AS media_id")
    media = mm.synthetic_media(ids, "video")

    # the JVM-side header peek reads the REAL count (not len//1000)
    plan = {
        (r.media_id, r.frame_idx)
        for r in mm.frame_sample_plan(media, every_n=1).collect()
    }
    want_plan = {
        (i, j) for i in range(17) for j in range(2 + i % 4)
    }
    assert plan == want_plan

    got = sorted(
        map(tuple, mm.video_frame_features(media, every_n=1, fake=False).collect())
    )
    fused = sorted(
        map(
            tuple,
            mm.video_frame_features_fused(media, every_n=1, fake=False).collect(),
        )
    )
    assert got == fused and len(got) == len(want_plan)
    # spot-check one frame against the pure-Python decoder
    by_key = {(m, j): luma for m, j, luma in got}
    assert by_key[(5, 1)] == mm.decode_frame(mm.encode_video(5), 1)


def test_video_decode_stream_equals_batch(spark, tmp_path):
    """The video ingest stream (fused sample+decode, stateless) split
    across micro-batches is row-identical to the batch twin."""
    import tempfile

    from cell_kn_mvp_etl_results_spark.streaming import media_features_stream

    ids = spark.range(18).selectExpr("id AS media_id")
    src = f"{tmp_path}/media_src_video"
    mm.synthetic_media(ids, "video").repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(mm.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    feats = media_features_stream(stream, "video", fake=False)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            feats.writeStream.format("memory")
            .queryName("media_feats_video")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM media_feats_video").collect())
    )
    want = sorted(
        map(
            tuple,
            mm.video_frame_features(
                spark.read.parquet(src), every_n=30, fake=False
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_decode_aware_layout_chooser(spark):
    """The decode-repartition doctrine as a chooser: a clustered heavy
    tail routes to the range-balanced repartition; an already-balanced
    source passes through untouched; rows identical either way."""
    import pandas as pd

    def media_df(clustered: bool):
        # RANGE partitioning models the ingest layout deterministically:
        # clustered puts the 4 heavy ids (0..3) in one partition (the
        # large-originals prefix); spread places one heavy per range
        # stripe (ids 0, 100, 200, 300).
        n, step = 400, 100
        rows = []
        for mid in range(n):
            heavy = (mid < 4) if clustered else (mid % step == 0)
            payload = (b"\x7f" * 200_000) if heavy else bytes([mid % 256]) * 50
            rows.append((mid, "image", payload, "x"))
        return spark.createDataFrame(
            pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime"]
            )
        ).repartitionByRange(8, "media_id")

    out, decision = mm.decode_aware_layout(
        media_df(True), n_partitions=8, heavy_bytes=100_000, imbalance_x=3
    )
    assert decision == "repartition"
    assert sorted(r.media_id for r in out.select("media_id").collect()) == list(
        range(400)
    )

    spread = media_df(False)
    out2, decision2 = mm.decode_aware_layout(
        spread, n_partitions=8, heavy_bytes=100_000, imbalance_x=3
    )
    assert decision2 == "passthrough"
    assert out2 is spread


def test_video_fused_matches_join_twin_in_fake_mode(spark):
    """Review r12: the fused twin must mirror frame_sample_plan's
    sampling (PVF header count) even under fake decode -- gating the
    header read on `fake` silently broke row-identity for PVF fixtures
    run in plumbing mode."""
    ids = spark.range(9).selectExpr("id AS media_id")
    media = mm.synthetic_media(ids, "video")
    join_rows = sorted(
        map(tuple, mm.video_frame_features(media, every_n=1, fake=True).collect())
    )
    fused_rows = sorted(
        map(
            tuple,
            mm.video_frame_features_fused(media, every_n=1, fake=True).collect(),
        )
    )
    assert join_rows == fused_rows
    # and the sampled index set is the real per-id frame count
    assert {(m, i) for m, i, _ in join_rows} == {
        (m, i) for m in range(9) for i in range(2 + m % 4)
    }
