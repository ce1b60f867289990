"""Both branches of the size-gated plan splits produce identical rows.

q_local_supplier_volume / q_shipping_priority pick between a
broadcast-map shape (orders parquet <= 512 MB) and the classic
bucketable equi-join shape. Local test data is always below the gate,
so the fallback branch would otherwise never execute in CI; these
tests force it by patching the byte probe and compare row-for-row.
"""

from __future__ import annotations

import pytest

from cell_kn_mvp_etl_results_spark.plans import relational


@pytest.mark.parametrize(
    "qname", ["q_local_supplier_volume", "q_shipping_priority"]
)
def test_gate_branches_agree(spark, sf_dir, qname, monkeypatch):
    fn = getattr(relational, qname)
    below = sorted(map(tuple, fn(spark, sf_dir).collect()))
    monkeypatch.setattr(relational, "_path_bytes", lambda *_a: 1 << 62)
    above = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert below == above
    assert len(below) > 0


def test_path_bytes_handles_missing(tmp_path):
    assert relational._path_bytes(str(tmp_path), "no_such_table") == 0


def test_decayed_rollup_clamps_shift_out_of_range(spark, tmp_path):
    """Spark's shiftright masks the shift mod 64 (Java) while DuckDB's
    >> does not -- events >63 days before the anchor, or after it,
    would silently diverge without the [0, 63] clamp both engines now
    carry. Age > 63 days means fully decayed (0); a post-anchor event
    counts at age 0."""
    import duckdb

    from cell_kn_mvp_etl_results_spark.plans import REGISTRY
    from cell_kn_mvp_etl_results_spark.plans.relational import _DECAY_ANCHOR_DAY

    day = 86400
    rows = [
        # age 100 days: unclamped Spark would shift by 100 % 64 = 36
        (1, (_DECAY_ANCHOR_DAY - 100) * day, 1, "view", 90.0, "{}"),
        # age 0 (same day as anchor)
        (2, _DECAY_ANCHOR_DAY * day, 1, "view", 2.5, "{}"),
        # AFTER the anchor: negative age clamps to 0 in both engines
        (3, (_DECAY_ANCHOR_DAY + 10) * day, 2, "view", 4.0, "{}"),
        # age 3: normal in-range decay, cents >> 3
        (4, (_DECAY_ANCHOR_DAY - 3) * day, 2, "view", 80.0, "{}"),
    ]
    df = spark.createDataFrame(
        [(i, e, u, t, v, p) for (i, e, u, t, v, p) in rows],
        "event_id long, epoch long, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id",
        "timestamp_seconds(epoch) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    spec = REGISTRY["q_decayed_rollup"]
    got = sorted(map(tuple, spec.builder(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    want = sorted(map(tuple, con.execute(spec.oracle).fetchall()))
    assert got == want
    # user 1: 9000 cents aged 100 days -> fully decayed to 0; 250 at age 0
    # user 2: 400 cents post-anchor -> age 0; 8000 >> 3 = 1000
    assert got == [(1, 250), (2, 1400)]
