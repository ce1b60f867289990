"""Unit tests for operators/timeseries.gap_fill_daily. Oracle parity
(q_gap_fill) pins the full pipeline vs DuckDB; here we pin fill
semantics on a hand-built stream.
"""

from __future__ import annotations

import datetime as dt

from cell_kn_mvp_etl_results_spark.operators.timeseries import gap_fill_daily

_D0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    # rows: (event_id, day_offset, user, value)
    data = [
        (eid, _D0 + dt.timedelta(days=day, seconds=eid), user, float(val))
        for eid, day, user, val in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, value double"
    )


def test_gap_fill_carries_forward_and_leads_null(spark):
    ev = _events(
        spark,
        [
            (1, 0, 1, 10.0),  # user 1 day 0
            (2, 3, 1, 20.0),  # user 1 day 3 (days 1-2 silent)
            (3, 2, 2, 5.0),  # user 2 first appears day 2
        ],
    )
    got = {
        (r.user_id, r.d % 100000): (r.n_obs, r.cents_filled)
        for r in gap_fill_daily(ev).collect()
    }
    days = sorted({d for _, d in got})
    assert len(days) == 4  # global span day0..day3
    d0, d1, d2, d3 = days
    assert got[(1, d0)] == (1, 1000)
    assert got[(1, d1)] == (0, 1000)  # forward-filled
    assert got[(1, d2)] == (0, 1000)
    assert got[(1, d3)] == (1, 2000)
    assert got[(2, d0)] == (0, None)  # before first observation
    assert got[(2, d1)] == (0, None)
    assert got[(2, d2)] == (1, 500)
    assert got[(2, d3)] == (0, 500)


def test_gap_fill_last_event_of_day_wins(spark):
    # Same user/day: higher (ts, event_id) wins -- event_id 5 has the
    # later ts within the day (ts offset = eid seconds).
    ev = _events(spark, [(4, 0, 7, 1.0), (5, 0, 7, 2.0)])
    rows = gap_fill_daily(ev).collect()
    assert len(rows) == 1
    assert rows[0].n_obs == 2 and rows[0].cents_filled == 200


def test_gap_fill_grid_is_dense_per_user(spark):
    ev = _events(spark, [(1, 0, 1, 1.0), (2, 9, 2, 1.0)])
    rows = gap_fill_daily(ev).collect()
    # 2 users x 10-day global span
    assert len(rows) == 20
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r.d)
    for ds in per_user.values():
        assert sorted(ds) == list(range(min(ds), min(ds) + 10))
