"""Data contract behind the fast exact-cents cast (functions/money.py):
for every money/quantity double in the lake, the truncation-based
round-half-away form must agree row-wise with BigDecimal ``round`` --
the two can only diverge on true half-cent values, which the exact-cents
contract excludes. If a testdata regeneration ever emits such values,
THIS test fails (readably), not a downstream value-hash gate.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.functions.money import cents, qty_long
from cell_kn_mvp_etl_results_spark.sources.readers import read_table

MONEY_COLS = {
    "lineitem": ["l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],  # negative balances exercise the signum term
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "events": ["value"],
}

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fast_cents_matches_bigdecimal_round_everywhere(spark, sf_dir):
    for table, cols in MONEY_COLS.items():
        df = read_table(spark, sf_dir, table)
        have = [c for c in cols if c in df.columns]
        if not have:
            continue
        checks = [
            F.sum(
                (cents(c) != F.round(F.col(c) * 100).cast("long")).cast("int")
            ).alias(c)
            for c in have
        ]
        row = df.agg(*checks).collect()[0]
        mism = {c: row[c] for c in have if row[c]}
        assert not mism, f"{sf_dir}/{table}: fast-cents mismatches {mism}"


def test_fast_cents_negative_and_edge_values(spark):
    rows = [(-999.99,), (-0.01,), (0.0,), (0.01,), (9999.99,), (-345.0,), (7.07,)]
    df = spark.createDataFrame(rows, "v double")
    got = df.select(
        cents("v").alias("fast"),
        F.round(F.col("v") * 100).cast("long").alias("bd"),
    ).collect()
    assert all(r["fast"] == r["bd"] for r in got), got


def test_qty_long_integer_doubles(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (50.0,), (-3.0,)], "v double")
    got = df.select(qty_long("v").alias("q")).collect()
    assert [r["q"] for r in got] == [0, 1, 50, -3]
