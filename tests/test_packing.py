"""Unit tests for deterministic sequence packing (operators/packing.py):
two-level prefix sum equals the naive global window, is invariant to
input partitioning, and packs contiguously with straddling documents.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cell_kn_mvp_etl_results_spark.operators.packing import (
    global_prefix_sum,
    pack_sequences,
)


def _docs(spark, n=200, seed=7, partitions=None):
    rnd = random.Random(seed)
    rows = [(i, rnd.randint(0, 500)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    return df.repartition(partitions) if partitions else df


def _naive_pos(spark, df):
    w = (
        Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.select(
        "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("pos")
    )


def test_prefix_sum_matches_naive_global_window(spark):
    df = _docs(spark)
    for digits in (1, 2, 3):
        got = {
            r.doc_id: r.pos
            for r in global_prefix_sum(df, "doc_id", "n_tokens", digits).collect()
        }
        want = {r.doc_id: r.pos for r in _naive_pos(spark, df).collect()}
        assert got == want, f"bucket_digits={digits}"


def test_prefix_sum_partitioning_invariant(spark):
    a = global_prefix_sum(_docs(spark, partitions=1), "doc_id", "n_tokens")
    b = global_prefix_sum(_docs(spark, partitions=13), "doc_id", "n_tokens")
    assert sorted(map(tuple, a.select("doc_id", "pos").collect())) == sorted(
        map(tuple, b.select("doc_id", "pos").collect())
    )


def test_pack_contiguous_and_straddling(spark):
    df = _docs(spark, n=100, seed=11)
    cap = 256
    out = pack_sequences(df, "doc_id", F.col("n_tokens"), capacity=cap)
    rows = out.collect()
    total = sum(r.n_tokens for r in rows)
    # every token position 0..total-1 is covered exactly once:
    # reconstruct the stream order and check starts are the prefix sums
    # key includes n_tokens so a zero-size doc orders before the
    # non-zero doc sharing its start position (tie otherwise depends
    # on collect order)
    by_start = sorted(rows, key=lambda r: (r.bin * cap + r.offset, r.n_tokens))
    acc = 0
    for r in by_start:
        assert r.bin * cap + r.offset == acc
        acc += r.n_tokens
    assert acc == total
    # straddlers exist for this size mix (offset + n_tokens > capacity)
    assert any(r.offset + r.n_tokens > cap for r in rows)
    assert out.filter((F.col("offset") < 0) | (F.col("offset") >= cap)).count() == 0


def test_zero_token_docs_get_positions(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 10), (3, 0)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: (r.bin, r.offset) for r in
           pack_sequences(df, "doc_id", F.col("n_tokens"), capacity=8).collect()}
    assert len(out) == 3


def test_balanced_shards_serpentine_and_balance(spark):
    # 8 docs with sizes 80..10, 4 shards: serpentine deal gives blocks
    # [80,70,60,50] left-to-right then [40,30,20,10] right-to-left, so
    # every shard totals 80+... pairs to exactly 90 tokens.
    from cell_kn_mvp_etl_results_spark.operators.packing import balanced_shards
    import pyspark.sql.functions as F

    rows = [(i, (8 - i + 1) * 10) for i in range(1, 9)]  # id 1 -> 80 ... id 8 -> 10
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = balanced_shards(df, "doc_id", F.col("n"), n_shards=4).collect()
    by_rank = sorted((r.rnk, r.n_tokens, r.shard) for r in out)
    # ranks follow size desc
    assert [n for _, n, _ in by_rank] == [80, 70, 60, 50, 40, 30, 20, 10]
    # serpentine: block 0 -> shards 0,1,2,3; block 1 -> 3,2,1,0
    assert [s for _, _, s in by_rank] == [0, 1, 2, 3, 3, 2, 1, 0]
    totals = {}
    for _, n, s in by_rank:
        totals[s] = totals.get(s, 0) + n
    assert set(totals.values()) == {90}


def test_balanced_shards_rank_deterministic_ties(spark):
    # Equal sizes break ties by md5(id) then id -- stable across runs
    # and partitionings.
    from cell_kn_mvp_etl_results_spark.operators.packing import balanced_shards
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(i, 5) for i in range(1, 20)], "doc_id long, n long")
    a = sorted((r.id, r.rnk) for r in balanced_shards(df, "doc_id", F.col("n"), 3).collect())
    b = sorted(
        (r.id, r.rnk)
        for r in balanced_shards(
            df.repartition(7), "doc_id", F.col("n"), 3
        ).collect()
    )
    assert a == b
    assert sorted(r for _, r in a) == list(range(1, 20))
