"""Unit tests for the bucketized interval join (operators/intervals.py):
boundary inclusion, multi-bucket spans, malformed intervals, negative
coordinates, and a randomized equivalence check against the naive
range-predicate join.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.intervals import floor_bucket, interval_join


def _points(spark, rows):
    return spark.createDataFrame(rows, "pid long, k string, p long")


def _intervals(spark, rows):
    return spark.createDataFrame(rows, "iid long, k string, lo long, hi long")


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.select("pid", "iid").collect())


def test_floor_bucket_negative_and_boundary(spark):
    df = spark.createDataFrame(
        [(-65,), (-64,), (-1,), (0,), (63,), (64,)], "v long"
    )
    got = [r.b for r in df.select(floor_bucket("v", 64).alias("b")).collect()]
    assert got == [-2, -1, -1, 0, 0, 1]


def test_closed_range_boundaries_included(spark):
    pts = _points(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 9), (4, "a", 21)])
    ivs = _intervals(spark, [(100, "a", 10, 20)])
    out = _pairs(interval_join(pts, ivs, ["k"], "p", "lo", "hi", bucket_width=64))
    assert out == [(1, 100), (2, 100)]


def test_interval_spanning_many_buckets(spark):
    # width 10, interval [5, 95] spans 10 buckets; points across all of
    # them match exactly once (explode replicates, join can't duplicate)
    pts = _points(spark, [(i, "a", i * 10) for i in range(11)])
    ivs = _intervals(spark, [(7, "a", 5, 95)])
    out = _pairs(interval_join(pts, ivs, ["k"], "p", "lo", "hi", bucket_width=10))
    assert out == [(i, 7) for i in range(1, 10)]


def test_malformed_interval_matches_nothing(spark):
    pts = _points(spark, [(1, "a", 10)])
    ivs = _intervals(spark, [(100, "a", 20, 10)])
    assert _pairs(interval_join(pts, ivs, ["k"], "p", "lo", "hi", bucket_width=8)) == []


def test_key_isolation(spark):
    pts = _points(spark, [(1, "a", 10), (2, "b", 10)])
    ivs = _intervals(spark, [(100, "a", 0, 100)])
    assert _pairs(interval_join(pts, ivs, ["k"], "p", "lo", "hi", bucket_width=16)) == [
        (1, 100)
    ]


def test_negative_coordinates(spark):
    pts = _points(spark, [(1, "a", -70), (2, "a", -64), (3, "a", -1), (4, "a", 1)])
    ivs = _intervals(spark, [(100, "a", -65, 0)])
    out = _pairs(interval_join(pts, ivs, ["k"], "p", "lo", "hi", bucket_width=64))
    assert out == [(2, 100), (3, 100)]


def test_randomized_equivalence_with_naive_join(spark):
    rnd = random.Random(1234)
    pts = [(i, rnd.choice("ab"), rnd.randint(-200, 200)) for i in range(120)]
    ivs = []
    for i in range(60):
        lo = rnd.randint(-220, 220)
        ivs.append((1000 + i, rnd.choice("ab"), lo, lo + rnd.randint(0, 150)))
    p, v = _points(spark, pts), _intervals(spark, ivs)
    for width in (7, 64, 512):
        got = _pairs(interval_join(p, v, ["k"], "p", "lo", "hi", bucket_width=width))
        naive = _pairs(
            p.join(v, "k").filter((F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi")))
        )
        assert got == naive, f"width={width}"


def test_no_cartesian_in_plan(spark):
    pts = _points(spark, [(1, "a", 10)])
    ivs = _intervals(spark, [(100, "a", 0, 100)])
    plan = interval_join(
        pts, ivs, ["k"], "p", "lo", "hi", bucket_width=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_stream_static_interval_join(spark, sf_dir):
    """End-to-end micro-batch: events file stream interval-joined to a
    static per-user validity window; identical rows to the batch twin."""
    import tempfile

    from cell_kn_mvp_etl_results_spark.sources.readers import (
        read_events_stream,
        read_table,
    )
    from cell_kn_mvp_etl_results_spark.streaming.windows import (
        interval_enriched_stream,
    )

    def day_col(df):
        return df.withColumn("d", F.expr("unix_micros(ts) div 86400000000"))

    static = day_col(read_table(spark, sf_dir, "events"))
    # per-user windows: [first seen day, first seen day + 10)
    wins = (
        static.groupBy("user_id")
        .agg(F.min("d").alias("lo"))
        .select("user_id", "lo", (F.col("lo") + 9).alias("hi"), F.lit(1).alias("win_id"))
    )
    args = (["user_id"], "d", "lo", "hi", 16)

    batch = interval_enriched_stream(static, wins, *args)
    stream = interval_enriched_stream(day_col(read_events_stream(spark, sf_dir)), wins, *args)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("ij_stream")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM ij_stream").collect()[0].n
    want = batch.count()
    assert got == want > 0


def test_internal_column_collision_guard(spark):
    import pytest

    from cell_kn_mvp_etl_results_spark.operators.intervals import interval_join
    from cell_kn_mvp_etl_results_spark.operators.packing import global_prefix_sum

    pts = spark.createDataFrame([(1, 5, 0)], "k long, p long, _bucket long")
    iv = spark.createDataFrame([(1, 0, 10)], "k long, lo long, hi long")
    with pytest.raises(ValueError, match="_bucket"):
        interval_join(pts, iv, ["k"], "p", "lo", "hi", 16)
    with pytest.raises(ValueError, match="_bucket"):
        interval_join(iv.withColumnRenamed("lo", "p"), pts.withColumnRenamed("p", "lo"), ["k"], "p", "lo", "_bucket", 16)
    docs = spark.createDataFrame([(1, 3, 9)], "doc_id long, n long, pos long")
    with pytest.raises(ValueError, match="pos"):
        global_prefix_sum(docs, "doc_id", "n")
