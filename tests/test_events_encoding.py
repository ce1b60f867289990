"""Encoding-matrix regression test for the events reader (VERDICT r3 #1/#2).

The lake has delivered ``events.ts`` three different ways across rounds:

* parquet TIMESTAMP(NANOS)              -> bigint under the legacy conf
* parquet TIMESTAMP(MICROS) w/o tz      -> inferred TIMESTAMP_NTZ (r3 data)
* parquet TIMESTAMP(MICROS) UTC-adjusted -> TIMESTAMP (LTZ)

``read_table`` must canonicalize all three to one LTZ type holding the same
epoch instants, *independent of spark.sql.session.timeZone* -- the r3 advice
showed a ``to_utc_timestamp`` rebase silently shifts instants by the session
offset, so this test varies the session zone as well as the encoding.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.sources.readers import read_table

QUERIES = ("q_sessionize", "q_hourly_rollup", "q_asof_join")
ENCODINGS = ("us_ntz", "ns", "us_utc")
TIMEZONES = ("UTC", "Asia/Tokyo")


def _write_events(src_events: str, out_dir: str, encoding: str) -> None:
    tbl = pq.read_table(src_events)
    i = tbl.schema.get_field_index("ts")
    col = tbl.column(i).cast(pa.timestamp("us"))
    if encoding == "us_ntz":
        pass  # already timestamp[us], no tz -> parquet isAdjustedToUTC=false
    elif encoding == "ns":
        col = col.cast(pa.timestamp("ns"))
    elif encoding == "us_utc":
        col = col.cast(pa.timestamp("us", tz="UTC"))
    tbl = tbl.set_column(i, pa.field("ts", col.type), col)
    # version=2.6 keeps nanos as TIMESTAMP(NANOS) instead of truncating
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"), version="2.6")


@pytest.fixture(scope="module")
def encoded_dirs(sf_dir, tmp_path_factory):
    """One sf-dir per encoding: all sf0.001 tables symlinked, events
    rewritten with that encoding's parquet timestamp type."""
    src = os.path.join(sf_dir, "events.parquet")
    dirs = {}
    for enc in ENCODINGS:
        d = tmp_path_factory.mktemp(f"events-{enc}")
        for f in os.listdir(sf_dir):
            if f != "events.parquet" and f.endswith(".parquet"):
                os.symlink(os.path.join(sf_dir, f), os.path.join(d, f))
        _write_events(src, str(d), enc)
        dirs[enc] = str(d)
    return dirs


def _physical_type(path: str) -> str:
    t = pq.read_schema(os.path.join(path, "events.parquet")).field("ts").type
    return str(t)


def test_fixture_encodings_are_distinct(encoded_dirs):
    assert _physical_type(encoded_dirs["us_ntz"]) == "timestamp[us]"
    assert _physical_type(encoded_dirs["ns"]) == "timestamp[ns]"
    assert _physical_type(encoded_dirs["us_utc"]) == "timestamp[us, tz=UTC]"


def test_read_table_canonicalizes_to_ltz(spark, encoded_dirs):
    for enc, d in encoded_dirs.items():
        dt = dict(read_table(spark, d, "events").dtypes)["ts"]
        assert dt == "timestamp", f"{enc}: got {dt}"


def test_epoch_instants_agree_across_encodings_and_zones(spark, encoded_dirs):
    from pyspark.sql import functions as F

    saved = spark.conf.get("spark.sql.session.timeZone")
    seen = {}
    try:
        for tz in TIMEZONES:
            spark.conf.set("spark.sql.session.timeZone", tz)
            for enc, d in encoded_dirs.items():
                row = (
                    read_table(spark, d, "events")
                    .agg(
                        F.min(F.unix_micros("ts")).alias("mn"),
                        F.max(F.unix_micros("ts")).alias("mx"),
                        F.sum(F.unix_micros("ts")).alias("sm"),
                    )
                    .collect()[0]
                )
                seen[(tz, enc)] = (row["mn"], row["mx"], row["sm"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    baseline = seen[("UTC", "us_ntz")]
    assert all(v == baseline for v in seen.values()), seen


@pytest.mark.parametrize("qname", QUERIES)
def test_timestamp_queries_agree(spark, encoded_dirs, qname):
    fn = REGISTRY[qname].builder
    saved = spark.conf.get("spark.sql.session.timeZone")
    results = {}
    try:
        for tz in TIMEZONES:
            spark.conf.set("spark.sql.session.timeZone", tz)
            for enc, d in encoded_dirs.items():
                rows = sorted(map(tuple, fn(spark, d).collect()))
                results[(tz, enc)] = rows
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    baseline = results[("UTC", "us_ntz")]
    assert len(baseline) > 0
    for key, rows in results.items():
        assert rows == baseline, f"{qname} diverges at {key}"
