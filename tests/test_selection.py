"""Unit tests for the data-selection operators (operators/selection,
operators/graph.modularity): behavioral properties the oracle-parity
gate cannot see -- bias direction, determinism under repartitioning,
and known-graph metric values."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.graph import modularity
from cell_kn_mvp_etl_results_spark.operators.selection import (
    dsir_importance,
    group_minhash_overlap,
    weighted_sample,
)


def test_weighted_sample_is_deterministic_and_bounded(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17 + 1).alias("w")
    )
    a = weighted_sample(df, "doc_id", "w", k=50).collect()
    b = weighted_sample(df.repartition(13), "doc_id", "w", k=50).collect()
    assert len(a) == 50
    assert a == b  # pure function of (id, weight), not of partitioning
    pris = [r.priority for r in a]
    assert pris == sorted(pris)


def test_weighted_sample_prefers_heavy_rows(spark):
    # Two weight classes, 500 ids each: weight 1000 vs weight 1. The
    # heavy class should dominate the sample overwhelmingly.
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, 1000).otherwise(1).alias("w"),
    )
    got = weighted_sample(df, "doc_id", "w", k=100).collect()
    heavy = sum(1 for r in got if r.id < 500)
    assert heavy >= 95


def test_weighted_sample_clamps_nonpositive_weights(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), (F.col("id") - 5).alias("w")
    )
    got = weighted_sample(df, "doc_id", "w", k=10).collect()
    assert all(r.weight >= 1 for r in got)  # clamped, never div-by-zero


def test_dsir_ranks_targetlike_docs_higher(spark):
    # Target domain speaks {alpha..delta}; raw pool has one doc in the
    # target vocabulary and many in a disjoint one. The in-vocabulary
    # raw doc must carry the highest importance weight.
    rows = [(i, "alpha beta gamma delta alpha beta", "t") for i in range(20)]
    rows += [(100, "alpha beta gamma delta", "r")]
    rows += [(200 + i, "zork quux blorp flem zork quux", "r") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, side string")
    w = dsir_importance(
        df, "doc_id", "text", F.col("side") == "t", n_buckets=64
    ).collect()
    assert {r.id for r in w} == {100, *range(200, 220)}  # raw side only
    best = max(w, key=lambda r: (r.weight, -r.id))
    assert best.id == 100
    per_tok = {r.id: r.weight / r.n_tokens for r in w}
    assert per_tok[100] > max(per_tok[i] for i in range(200, 220))


def test_group_overlap_identical_and_disjoint_groups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base, "a"), (2, base, "b")]  # b duplicates a exactly
    rows += [(3, "completely different words live here entirely apart now", "c")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    got = {
        (r.src_a, r.src_b): r.est_jaccard
        for r in group_minhash_overlap(df, "src", "text", num_perm=32).collect()
    }
    assert got[("a", "b")] == 1.0  # identical shingle sets
    assert got[("a", "c")] == 0.0 and got[("b", "c")] == 0.0


def test_modularity_two_cliques(spark):
    # Two 4-cliques joined by a single bridge edge. With the natural
    # partition, m=13, each community: e_c=6, D_c=13 ->
    # S = 2*(4*13*6 - 169) = 286, Q = 286/676 ~ 0.4231 -> 423076 ppm.
    edges = []
    for base in (0, 10):
        ids = [base + i for i in range(4)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges.append((0, 10))
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    labels = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(10 + i, 10) for i in range(4)],
        "id long, label long",
    )
    row = modularity(e, labels).collect()[0]
    assert (row.m, row.n_vertices, row.n_communities, row.intra_edges) == (
        13,
        8,
        2,
        12,
    )
    assert row.q_ppm == 423076


def test_modularity_single_community_is_zero(spark):
    # All vertices in one community: Q = m/m - (2m/2m)^2 = 0 exactly.
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    labels = spark.createDataFrame(
        [(i, 7) for i in range(4)], "id long, label long"
    )
    row = modularity(e, labels).collect()[0]
    assert row.q_ppm == 0 and row.n_communities == 1


def test_mmr_skips_near_duplicate_candidates(spark):
    # Query along e1. Candidates: an exact duplicate pair (ids 1, 2)
    # and a relevant-but-different vector (id 3). Plain top-2 would
    # return the duplicate twice; MMR at k=2 (lambda = 0.5: the dup's
    # mmr is rel - 1.0 < 0) must pick one copy then the diverse vector.
    from cell_kn_mvp_etl_results_spark.operators.selection import mmr_rerank

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.1]),
        (2, [0.99, 0.1]),
        (3, [0.8, -0.6]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0")
    c = df.filter("vec_id != 0")
    got = mmr_rerank(c, q, n_candidates=3, k=2).collect()
    assert [r.id for r in got] == [1, 3]
    assert [r["rank"] for r in got] == [1, 2]
    assert got[0].mmr == got[0].rel  # first pick's mmr is its relevance


def test_mmr_handles_fewer_candidates_than_k(spark):
    from cell_kn_mvp_etl_results_spark.operators.selection import mmr_rerank

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.1, 0.9])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = mmr_rerank(
        df.filter("vec_id != 0"), df.filter("vec_id = 0"), n_candidates=16, k=8
    ).collect()
    assert len(got) == 2  # bounded by the candidate pool


def test_jl_topk_recall_vs_brute_force(spark, sf_dir):
    """The JL prefilter is an approximation with a MEASURED quality:
    at (dim_out=32, n_candidates=128) the mean recall@5 against exact
    brute force on the real embedding table is 0.84; pin a
    conservative floor so a broken projection (wrong signs, wrong
    distance) fails loudly rather than degrading silently."""
    from collections import defaultdict

    from cell_kn_mvp_etl_results_spark.operators.similarity import (
        cosine_topk,
        jl_topk,
    )
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    bf = defaultdict(set)
    for r in cosine_topk(e, q, k=5).collect():
        bf[r.q_id].add(r.cand_id)
    jl = defaultdict(set)
    for r in jl_topk(e, q, dim_out=32, n_candidates=128, k=5).collect():
        jl[r.q_id].add(r.cand_id)
    recalls = [len(jl[k] & bf[k]) / 5 for k in bf]
    assert sum(recalls) / len(recalls) >= 0.5


def test_jl_projection_is_exact_integers(spark):
    """Every projected component is an exact integer carried in a
    double (quantized inputs, +-1 signs), so candidate distances are
    order-independent -- the determinism the oracle gate relies on."""
    from cell_kn_mvp_etl_results_spark.operators.similarity import (
        _quantized,
        jl_project,
    )

    df = spark.createDataFrame(
        [(0, [0.123456] * 64), (1, [-0.98765] * 64)],
        "vec_id long, embedding array<float>",
    )
    rows = df.select(
        jl_project(_quantized(F.col("embedding"), 4), 64, 32).alias("p")
    ).collect()
    for r in rows:
        assert all(v == int(v) for v in r.p)
        assert len(r.p) == 32


def test_degree_hist_bins_exact(spark):
    """Known graph: star(5 leaves) + one triangle. Degrees: hub 5,
    leaves 1x5, triangle 2x3 -> bins: 0:{1}x5, 1:{2,2,2}, 2:{5}."""
    from cell_kn_mvp_etl_results_spark.plans.selection import q_degree_hist  # noqa: F401
    # exercise the same binning logic directly on a handmade edge list
    edges = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (10, 12)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    und = e.selectExpr("id_a AS src", "id_b AS dst").unionAll(
        e.selectExpr("id_b AS src", "id_a AS dst")
    )
    deg = (
        und.dropDuplicates()
        .filter("src != dst")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    hist = {
        r.bin: (r.n_vertices, r.min_deg, r.max_deg)
        for r in deg.groupBy(F.floor(F.log2("d")).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
        )
        .collect()
    }
    assert hist == {0: (5, 1, 1), 1: (3, 2, 2), 2: (1, 5, 5)}


def test_mutual_knn_drops_one_directional_hubs(spark):
    """A hub that everyone lists but that lists only its own top-k:
    mutual pairs keep only reciprocated edges. Clone pair (1,2) is
    mutual; distant vector 9 lists the hub but is nobody's top-1."""
    from cell_kn_mvp_etl_results_spark.operators.similarity import cosine_topk

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0]),
        (9, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tk = cosine_topk(df, df, k=1).select("q_id", "cand_id", "score")
    r = tk.select(
        F.col("q_id").alias("cand_id"), F.col("cand_id").alias("q_id")
    )
    got = (
        tk.join(r, ["q_id", "cand_id"], "left_semi")
        .filter("q_id < cand_id")
        .collect()
    )
    assert [(x.q_id, x.cand_id) for x in got] == [(1, 2)]


def test_jl_arrow_matches_expression_form(spark, sf_dir):
    """The Arrow matmul path and the pure-Catalyst expression path are
    the SAME operator: exact-integer intermediates make the summation
    order irrelevant, so rows match bit-for-bit."""
    from cell_kn_mvp_etl_results_spark.operators.similarity import (
        jl_topk,
        jl_topk_arrow,
    )
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, jl_topk(e, q, dim_out=32, n_candidates=64, k=5).collect()))
    b = sorted(map(tuple, jl_topk_arrow(e, q, dim_out=32, n_candidates=64, k=5).collect()))
    assert a == b
