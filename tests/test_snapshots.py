"""Unit tests for operators/snapshots.snapshot_diff — corpus CDC.

Complements the registry-level oracle parity of ``q_snapshot_diff``
(tests/test_oracle_parity.py): here we pin the per-document statuses
on a hand-built pair of snapshots and assert the scale-shape claim
that only fingerprints (never bodies) cross the join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.snapshots import snapshot_diff


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_snapshot_diff_statuses(spark):
    old = _mk(
        spark,
        [
            (1, "a", "same text"),
            (2, "a", "will change"),
            (3, "b", "will be removed"),
        ],
    )
    new = _mk(
        spark,
        [
            (1, "a", "same text"),
            (2, "a", "has changed"),
            (4, "b", "brand new"),
        ],
    )
    got = {
        r["doc_id"]: (r["source"], r["status"], r["chars_old"], r["chars_new"])
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        1: ("a", "unchanged", 9, 9),
        2: ("a", "changed", 11, 11),
        3: ("b", "removed", 15, 0),
        4: ("b", "added", 0, 9),
    }


def test_snapshot_diff_label_prefers_new_side(spark):
    # A document that moved source between crawls reports the NEW label.
    old = _mk(spark, [(1, "old-src", "x")])
    new = _mk(spark, [(1, "new-src", "x")])
    row = snapshot_diff(old, new).collect()[0]
    assert (row["source"], row["status"]) == ("new-src", "unchanged")


def test_snapshot_diff_joins_fingerprints_not_bodies(spark):
    # Scale contract: the full-outer join's inputs project each side to
    # (id, label, md5, length) BEFORE the exchange — document bodies
    # never shuffle. Assert no plan node carries the text column past
    # the join input projections.
    old = _mk(spark, [(1, "a", "t" * 10)])
    new = _mk(spark, [(1, "a", "t" * 10)])
    plan = (
        snapshot_diff(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    join_part = plan[: plan.index("Join")]
    assert "text" not in join_part  # output columns are fp/len-derived


def test_snapshot_diff_empty_old_is_all_added(spark):
    old = _mk(spark, []).filter(F.lit(False))
    new = _mk(spark, [(7, "a", "doc")])
    rows = snapshot_diff(old, new).collect()
    assert len(rows) == 1 and rows[0]["status"] == "added"
    assert rows[0]["chars_old"] == 0 and rows[0]["chars_new"] == 3


# ---- incremental_rollup (IVM) ----

from cell_kn_mvp_etl_results_spark.operators.snapshots import (  # noqa: E402
    incremental_rollup,
)


def _direct(rows):
    # Pure-Python direct rollup of a snapshot: {label: (docs, toks, chars)}
    out = {}
    for _, lab, text in rows:
        d, t, c = out.get(lab, (0, 0, 0))
        out[lab] = (d + 1, t + len(text.lower().split()), c + len(text))
    return out


def test_incremental_rollup_equals_direct_recompute(spark):
    old = _mk(
        spark,
        [
            (1, "a", "one two three"),
            (2, "a", "to be removed"),
            (3, "b", "will change here"),
            (4, "b", "stays the same"),
        ],
    )
    new_rows = [
        (1, "a", "one two three"),  # unchanged
        (3, "b", "changed now with more tokens"),  # changed
        (4, "b", "stays the same"),  # unchanged
        (5, "c", "brand new doc"),  # added (new label)
    ]
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["n_chars"])
        for r in incremental_rollup(old, _mk(spark, new_rows)).collect()
    }
    assert got == _direct(new_rows)


def test_incremental_rollup_label_move_debits_old_credits_new(spark):
    # Doc 1 moves from label a to label b with the same content: the
    # IVM delta must debit a and credit b.
    old = _mk(spark, [(1, "a", "same text"), (2, "a", "other")])
    new_rows = [(1, "b", "same text"), (2, "a", "other")]
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["n_chars"])
        for r in incremental_rollup(old, _mk(spark, new_rows)).collect()
    }
    assert got == _direct(new_rows)


def test_incremental_rollup_drops_emptied_label(spark):
    old = _mk(spark, [(1, "a", "x"), (2, "b", "y")])
    new_rows = [(1, "a", "x")]  # label b fully removed
    got = incremental_rollup(old, _mk(spark, new_rows)).collect()
    assert [r["source"] for r in got] == ["a"]
