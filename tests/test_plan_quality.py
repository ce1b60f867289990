"""Plan-quality audit: assert the physical plans have the shape a
100 TB deployment needs -- filters pushed to the parquet scan, columns
pruned, dimension joins broadcast, aggregates partial+final, codegen
active. This is the '.explain and iterate' discipline encoded as tests
so a plan regression fails CI, not a cluster run.
"""

from __future__ import annotations

import pytest

from cell_kn_mvp_etl_results_spark.plans import REGISTRY


import contextlib
import io


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_of(spark, sf_dir, name: str) -> str:
    return _explain(REGISTRY[name].builder(spark, sf_dir))


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_min_size_filter")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan or "l_quantity" in plan.split(
        "PushedFilters"
    )[1].split("\n")[0]
    # projection pruned to the 4 needed columns -- prices never read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema
    assert "l_quantity" in read_schema


def test_dim_joins_broadcast_no_fact_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_local_supplier_volume")
    # all five dim joins broadcast (formatted mode names each node twice:
    # once in the tree, once in the detail section)
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan
    # the only exchanges: dim broadcasts + final agg/sort
    fact_shuffles = [
        l
        for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "l_" in l
    ]
    assert fact_shuffles == []  # lineitem is never hash-repartitioned


def test_partial_final_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_pricing_summary")
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "partial_sum" in plan


def test_semi_anti_joins_planned(spark, sf_dir):
    anti = plan_of(spark, sf_dir, "q_anti_join")
    assert "LeftAnti" in anti
    semi = plan_of(spark, sf_dir, "q_semi_join")
    assert "LeftSemi" in semi


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_shipping_priority")
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """Cross joins must be broadcast nested loops against a tiny side,
    never CartesianProduct (both sides shuffled everywhere)."""
    for name in sorted(REGISTRY):
        if name == "q_hierarchy_longest":
            continue  # iterative: plan built at runtime
        plan = _explain(REGISTRY[name].builder(spark, sf_dir))
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name", ["q_pricing_summary", "q_equi_join", "q_dedup_exact", "q_text_quality"]
)
def test_codegen_active(spark, sf_dir, name):
    """'codegen' explain mode reports generated subtrees. AQE defers
    codegen until execution, so it is disabled for the audit -- the
    non-adaptive plan shows what each stage compiles to."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            REGISTRY[name].builder(spark, sf_dir).explain("codegen")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen" in plan, name
    assert "Found 0 WholeStageCodegen" not in plan, name


def test_stratified_sample_partial_window_limit(spark, sf_dir):
    """q_sample_stratified's rank<=k must compile to a PARTIAL
    WindowGroupLimit before the shuffle (map-side per-stratum top-k),
    and only read the two needed columns."""
    plan = plan_of(spark, sf_dir, "q_sample_stratified")
    # node ids number bottom-up from the scan, so upstream = lower id:
    # the Partial WindowGroupLimit must carry a lower id than the
    # hash-partitioning Exchange it feeds.
    import re

    detail = {}
    for line in plan.splitlines():
        m = re.match(r"\((\d+)\) (\w+)", line)
        if m:
            detail.setdefault(m.group(2), []).append(int(m.group(1)))
    partial_ids = [
        int(re.match(r"\((\d+)\)", l).group(1))
        for l in plan.splitlines()
        if re.match(r"\(\d+\) WindowGroupLimit", l)
    ]
    assert partial_ids, "no WindowGroupLimit in plan"
    assert min(partial_ids) < min(detail.get("Exchange", [10**6]))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema and "source" in read_schema


def test_single_projection_text_ops_no_shuffle(spark, sf_dir):
    """winnow fingerprints and repetition scoring are one projection per
    row: the only Exchange in the plan is the final presentation sort."""
    for name in ("q_winnow_fingerprint", "q_repetition"):
        plan = plan_of(spark, sf_dir, name)
        n_exchanges = plan.count("+- Exchange") + plan.count("Exchange (")
        # formatted explain lists each node once in the tree + once in
        # the detail section; assert on the numbered detail entries.
        detail = [l for l in plan.splitlines() if l.startswith("(")]
        exchanges = [l for l in detail if "Exchange" in l]
        assert len(exchanges) <= 1, f"{name}: unexpected shuffles {exchanges}"
        aggs = [l for l in detail if "HashAggregate" in l]
        assert not aggs, f"{name}: unexpected aggregation {aggs}"


def test_boilerplate_window_group_limit(spark, sf_dir):
    """q_boilerplate's rnk<=k must compile to WindowGroupLimit (partial
    per-partition top-k before the rank shuffle) and broadcast the tiny
    per-group totals side."""
    plan = plan_of(spark, sf_dir, "q_boilerplate")
    assert "WindowGroupLimit" in plan, "rank<=k did not compile to WindowGroupLimit"
    assert "BroadcastHashJoin" in plan, "group totals not broadcast"


def test_interval_join_no_cross_product_at_sf(spark, sf_dir):
    """q_interval_join on the real tables: hash equi-join on
    (key, bucket), never a nested-loop/cartesian term."""
    plan = plan_of(spark, sf_dir, "q_interval_join")
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_pack_sequences_single_partition_only_for_totals(spark, sf_dir):
    """q_pack_sequences may use a SinglePartition exchange ONLY for the
    per-bucket totals table (bounded at 16^digits rows); the data path
    must stay hash-partitioned."""
    plan = plan_of(spark, sf_dir, "q_pack_sequences")
    # formatted explain puts the distribution on Arguments: lines
    assert plan.count("SinglePartition") <= 1, plan
    assert "hashpartitioning(_bucket" in plan, (
        "data-path window lost its per-bucket hash partitioning"
    )


def test_khop_counts_never_materializes_last_hop(spark, sf_dir):
    """q_khop_paths counts under the final join (semiring + terminal
    bitmaps): the plan must aggregate bitmaps, and must contain exactly
    the k-1 hop joins plus the terminal-summary join -- a third hop
    join means the path explosion came back."""
    plan = plan_of(spark, sf_dir, "q_khop_paths")
    assert "bitmap_construct" in plan
    assert "bitmap_or" in plan
    # one "(<id>) <Op>Join" detail block per physical join
    joins = len(
        [
            l
            for l in plan.splitlines()
            if l.startswith("(") and l.rstrip().endswith("Join")
        ]
    )
    assert joins <= 3, f"expected <=3 joins (2 hops + terminal), saw {joins}"


def test_minhash_signatures_are_map_side(spark, sf_dir):
    """The signature stage must not shuffle: no exchange between the
    parquet scan and the Arrow-vectorized signature UDF, and no
    per-row (non-Arrow) Python evaluation anywhere."""
    from cell_kn_mvp_etl_results_spark.operators import dedup as dd
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents")
    plan = _explain(dd.minhash_signatures_wide(d, "doc_id", "text"))
    assert "ArrowEvalPython" in plan          # vectorized, not row-at-a-time
    assert "BatchEvalPython" not in plan
    # the only allowed exchange is the small-input rebalance (round
    # robin); no hash/range partitioning = no aggregation shuffle
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_new_graph_ops_no_cartesian(spark, sf_dir):
    for name in ("q_dup_triangles", "q_pagerank", "q_dup_spans",
                 "q_ngram_novelty", "q_balanced_shards", "q_countmin_tokens",
                 "q_bloom_decontaminate", "q_decayed_rollup",
                 "q_event_funnel", "q_cohort_retention",
                 "q_fuzzy_name_pairs",
                 # r6 additions
                 "q_semantic_clusters", "q_cluster_exemplars",
                 "q_communities", "q_khop_paths_bucketed"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_kmeans_assignment_is_pure_projection(spark, sf_dir):
    """The Lloyd assignment must be map-side math against centroid
    LITERALS: the final assignment plan may contain no join of any
    kind and no aggregation exchange -- one scan of the (persisted)
    quantized vectors, k distance expressions, argmin."""
    from cell_kn_mvp_etl_results_spark.operators.clustering import kmeans_integer
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    plan = _explain(kmeans_integer(emb, k=4, iters=1))
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_balanced_shards_no_global_sort_before_rank(spark, sf_dir):
    """The rank must come from the two-level shape: the only global
    sort allowed is the final presentation orderBy; the within-size
    window sorts inside hash partitions of the size value."""
    from cell_kn_mvp_etl_results_spark.operators.packing import balanced_shards
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table
    import pyspark.sql.functions as F
    from cell_kn_mvp_etl_results_spark.functions.text import tokens

    d = read_table(spark, sf_dir, "documents")
    plan = _explain(balanced_shards(d, "doc_id", F.size(tokens(F.col("text"))), 8))
    # no presentation sort in the operator itself -> no range exchange
    # over the full row set (the tiny per-size offsets frame may sort)
    range_exchanges = [
        l for l in plan.splitlines() if "Exchange rangepartitioning" in l
    ]
    assert all("n_tokens" not in l or "_n" in l for l in range_exchanges) or (
        len(range_exchanges) <= 1
    )


def test_cross_neardup_bench_side_broadcasts(spark, sf_dir):
    """q_cross_neardup's bucket join must broadcast the benchmark side:
    the corpus may shuffle only for the cross-band pair dedup (hash on
    id+bench_id) and the final ordering -- never on (band, bucket)."""
    plan = plan_of(spark, sf_dir, "q_cross_neardup")
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "band" not in line and "bucket" not in line, line


def test_lm_score_models_never_key_on_document(spark, sf_dir):
    """q_lm_score's scoring joins are keyed on vocabulary columns
    (w1/w2), never on the document id: no exchange may hash-partition
    on the id column except the final per-document aggregation."""
    plan = plan_of(spark, sf_dir, "q_lm_score")
    assert "CartesianProduct" not in plan
    id_exchanges = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "id#" in line
    ]
    # exactly the one per-document aggregation exchange
    assert len(id_exchanges) <= 1, id_exchanges


def test_label_rebalance_window_group_limit(spark, sf_dir):
    """The literal-quota design decision: the rank predicate must
    compile to WindowGroupLimit (partial per-label top-k before the
    window shuffle). A column-valued cutoff silently loses it."""
    plan = plan_of(spark, sf_dir, "q_label_rebalance")
    assert "WindowGroupLimit" in plan


def test_kcore_no_cartesian_semi_join_shape(spark, sf_dir):
    # r8 decremental peeling: the per-round survivor semi-joins became
    # ONE full degree count + broadcast joins against the (tiny)
    # dropped/decrement sets (operators/graph.kcore_members).
    plan = plan_of(spark, sf_dir, "q_kcore")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # dropped-set restriction broadcasts


def test_decode_gates_prune_to_id_only(spark, sf_dir):
    """The decode gates synthesize payloads map-side from the id alone:
    the documents scan must read exactly doc_id (never text/source),
    and the only exchange is the bounded final sort -- at 100 TB this
    is 'the scan feeds the Arrow stage directly'."""
    for name in ("q_decode_image", "q_decode_image_bmp", "q_decode_audio"):
        plan = plan_of(spark, sf_dir, name)
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "doc_id" in read_schema, (name, read_schema)
        assert "text" not in read_schema, (name, read_schema)
        exec_plan = (
            REGISTRY[name]
            .builder(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert exec_plan.count("Exchange") <= 1, (name, exec_plan)


def test_token_stats_hll_broadcasts_registers(spark, sf_dir):
    """The card's estimate side is a |sources| x 512 register read --
    it must BROADCAST into the stats join (never shuffle the exact
    side's aggregate on its account), and the register scan must prune
    to (source, r)."""
    plan = (
        REGISTRY["q_token_stats_hll"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    schemas = [
        l.split("ReadSchema:", 1)[1]
        for l in plan.splitlines()
        if "ReadSchema" in l
    ]
    reg_reads = [s for s in schemas if "r:int" in s]
    assert reg_reads and all("bucket" not in s for s in reg_reads), schemas


def test_decode_video_gate_prunes_to_id_only(spark, sf_dir):
    """The video gate synthesizes PVF1 payloads map-side from the id
    alone (same doctrine as the image/audio gates): the documents scan
    reads exactly doc_id. The plan/join fan-out shape means more than
    one exchange is legal here; what must hold is that no document
    column beyond the id ever leaves the scan."""
    plan = plan_of(spark, sf_dir, "q_decode_video")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema, read_schema
    assert "text" not in read_schema, read_schema


def test_frame_sample_plan_header_peek_is_jvm_side(spark):
    """The PVF1 frame count comes from substring/hex built-ins -- the
    sampling PLAN must contain no Python evaluation node (the payload
    bytes cross into Python only in the decode stage)."""
    from cell_kn_mvp_etl_results_spark.operators import multimodal as mm

    ids = spark.range(8).selectExpr("id AS media_id")
    media = mm.synthetic_media(ids, "video")
    # the plan UP TO the sample fan-out, with the payload source mocked
    # as a parquet-less local relation: only the generator stage of the
    # media itself is Python; frame_sample_plan adds none.
    plan = _explain(mm.frame_sample_plan(media, every_n=1))
    stages = plan.split("MapInPandas")
    # exactly one MapInPandas -- the synthetic media generator; the
    # sampling logic itself adds no second Python stage
    assert len(stages) <= 3, plan  # formatted mode names nodes twice


def test_skew_chooser_gate_prunes_and_aggregates_partially(spark, sf_dir):
    """The skew-chooser gate's fact scan reads exactly the three used
    lineitem columns, and the aggregate is partial+final (map-side
    combine before the nation shuffle)."""
    plan = plan_of(spark, sf_dir, "q_skew_chooser_join")
    read_schema = [
        l for l in plan.splitlines() if "ReadSchema" in l and "lineitem" in l
    ] or [l for l in plan.splitlines() if "ReadSchema" in l][:1]
    rs = read_schema[0]
    assert "l_orderkey" in rs and "l_suppkey" in rs and "l_extendedprice" in rs
    for unused in ("l_comment", "l_shipdate", "l_quantity"):
        assert unused not in rs, (unused, rs)
    assert "partial_count" in plan or "HashAggregate" in plan
