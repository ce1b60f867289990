"""Driver-testdata drift guard (VERDICT r4 #5).

The grading driver regenerates /root/testdata between rounds and has
already changed an encoding once (events.ts: TIMESTAMP(NANOS) in r1-r2,
TIMESTAMP_NTZ in r3+ -- which silently broke 30+ gates until the r3
post-mortem). ``read_table`` canonicalizes encodings, so what must stay
stable is its OUTPUT: column names and canonical Spark types per table.
If the driver adds a column, renames one, or re-encodes a type in a way
the tolerant read path doesn't canonicalize, this fails round-start
with a readable diff instead of 30 cryptic gate mismatches.

tests/test_events_encoding.py covers the encoding x timezone matrix for
events specifically; this guard covers every table's surface.
"""

from __future__ import annotations

import pytest

from cell_kn_mvp_etl_results_spark.sources.readers import TABLES, read_table

# Canonical post-read_table schemas. Key order matters (column order is
# part of the contract the oracle SQL relies on).
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),  # LTZ after read_table canonicalization
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_expected_covers_all_tables():
    assert set(EXPECTED) == set(TABLES)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_table_schema_stable(spark, sf_dir, name):
    got = read_table(spark, sf_dir, name).dtypes
    assert got == EXPECTED[name], (
        f"{name} drifted:\n  got      {got}\n  expected {EXPECTED[name]}\n"
        "If the driver regenerated testdata with a new encoding, extend "
        "read_table's canonicalization (sources/readers.py), then update "
        "this table ONLY if the logical schema really changed."
    )


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_table_nonempty(spark, sf_dir, name):
    assert read_table(spark, sf_dir, name).limit(1).count() == 1
