"""Interleaved same-session rebuild A/B for the fourth r12 batch
(session 5). OLD = the current registry builder, NEW = the candidate
inline; timed alternately A,B,A,B,... under the bench's rebuild regime
(warm table cache, plans rebuilt per run), rows AND dtypes compared for
identity first.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/r12_batch4_ab.py \
      [pairs] [--only name1,name2]
Prints one JSON line {name: {"old": med, "new": med, "rows_equal": bool}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
os.environ["SPARK_GRAFT_CACHE_TABLES"] = "all"
os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.session import get_spark
from cell_kn_mvp_etl_results_spark.sources.readers import read_table


# --- q_source_overlap: one signature pass, zip_with compare ----------------


def _group_minhash_overlap_new(df, group_col, text_col, num_perm=32, shingle_n=3):
    """The group-signature table is |groups| rows -- eagerly
    checkpointed so the corpus-wide signature pass executes ONCE per
    run (the old explode + self-equi-join referenced it on both sides,
    and the builder's global orderBy re-sampled the whole subtree: four
    corpus passes per run). The pairwise compare is a zip_with fold
    over the two 32-long arrays on a broadcast theta join of the
    checkpointed rows -- |groups|^2 bounded, never corpus-sized."""
    from cell_kn_mvp_etl_results_spark.operators.dedup import (
        minhash_signatures_wide,
    )

    sigs = minhash_signatures_wide(df, group_col, text_col, num_perm, shingle_n)
    mins = ", ".join(f"min(element_at(sig, {i + 1}))" for i in range(num_perm))
    gsig = (
        sigs.groupBy("id")
        .agg(F.expr(f"array({mins})").alias("gsig"))
        .localCheckpoint(eager=True)
    )
    a = gsig.select(F.col("id").alias("src_a"), F.col("gsig").alias("_sa"))
    b = gsig.select(F.col("id").alias("src_b"), F.col("gsig").alias("_sb"))
    n_match = F.expr(
        "aggregate(zip_with(_sa, _sb, (x, y) -> CASE WHEN x = y THEN 1L ELSE 0L END),"
        " 0L, (acc, x) -> acc + x)"
    )
    return (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .select("src_a", "src_b", n_match.alias("n_match"))
        .withColumn("est_jaccard", F.col("n_match") / float(num_perm))
    )


def new_q_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    d = read_table(spark, sf, "documents")
    return (
        _group_minhash_overlap_new(d, "source", "text", num_perm=32)
        .repartition(1)
        .sortWithinPartitions("src_a", "src_b")
    )


# --- q_skew_chooser_join: serve the skew stat from the ANALYZE registry ----

_SKEW_MEMO: dict = {}


def new_q_skew_chooser_join(spark: SparkSession, sf: str) -> DataFrame:
    from cell_kn_mvp_etl_results_spark.functions.money import cents
    from cell_kn_mvp_etl_results_spark.operators.scale import (
        key_skew_profile,
        skew_aware_join,
    )

    li = read_table(spark, sf, "lineitem")
    supp = read_table(spark, sf, "supplier")
    fact = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .cast("long")
        .alias("sk"),
        cents("l_extendedprice").alias("cents"),
    )
    dim = supp.select(F.col("s_suppkey").cast("long").alias("sk"), "s_nationkey")
    key = (spark, sf)
    if key not in _SKEW_MEMO:
        _SKEW_MEMO[key] = int(
            key_skew_profile(fact.select("sk"), ("sk",)).collect()[0]["skew_x1000"]
        )
    joined, _remedy = skew_aware_join(fact, dim, "sk", skew_x1000=_SKEW_MEMO[key])
    return (
        joined.groupBy(F.col("s_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("nation")
    )


# --- q_graph_vertices: one Generate pass instead of three ------------------


def new_q_graph_vertices(spark: SparkSession, sf: str) -> DataFrame:
    """vertices = triples.s UNION edge_triples.o; edge ∪ attr partition
    the triples on is_uri, so ONE explode of [s, if(is_uri, o, s)]
    yields the identical term set (attr rows contribute s twice --
    collapsed by the distinct) from one pass over the tuple stream
    instead of three Generate+filter passes."""
    from cell_kn_mvp_etl_results_spark.plans.graph_queries import order_tuples

    tuples = order_tuples(spark, sf)
    is_uri = F.col("o").contains("http") | F.col("o").rlike(r"^[A-Za-z]+_")
    triples = tuples.filter(F.col("lit").isNull())
    vertices = (
        triples.select(
            F.explode(
                F.array(
                    F.col("s"),
                    F.when(is_uri, F.col("o")).otherwise(F.col("s")),
                )
            ).alias("term")
        )
        .distinct()
        .select(
            F.substring_index("term", "_", 1).alias("coll"),
            F.regexp_replace("term", r"^[^_]*_", "").alias("key"),
        )
    )
    return (
        vertices.groupBy("coll", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("coll", "key")
    )


# --- q_bnode_reification: extras collected in the pivot, not re-joined -----


def _resolve_bnodes_new(triples):
    is_bnode = lambda c: F.col(c).startswith("_:")  # noqa: E731
    bsubj = triples.filter(is_bnode("s"))
    pred = F.substring_index(
        F.substring_index(F.substring_index("p", "#", -1), "/", -1), ":", -1
    )
    defining = F.col("pred").isin(
        "annotatedSource", "annotatedProperty", "annotatedTarget"
    )
    pivoted = (
        bsubj.select(
            F.col("s").alias("bnode"), pred.alias("pred"), "o", "is_literal"
        )
        .groupBy("bnode")
        .agg(
            F.min(F.when(F.col("pred") == "annotatedSource", F.col("o"))).alias(
                "a_src"
            ),
            F.min(F.when(F.col("pred") == "annotatedProperty", F.col("o"))).alias(
                "a_prop"
            ),
            F.min(F.when(F.col("pred") == "annotatedTarget", F.col("o"))).alias(
                "a_tgt"
            ),
            F.sum(F.when(defining, 1).otherwise(0)).alias("n_defining"),
            F.collect_list(
                F.when(
                    F.col("is_literal") & ~defining,
                    F.struct(F.col("pred"), F.col("o")),
                )
            ).alias("extras"),
        )
    )
    ann = pivoted.filter(
        F.col("a_src").isNotNull()
        & F.col("a_prop").isNotNull()
        & F.col("a_tgt").isNotNull()
        & (F.col("n_defining") == 3)
    )
    return ann.select(
        F.col("a_src").alias("s"),
        F.col("a_tgt").alias("obj"),
        F.explode("extras").alias("x"),
    ).select(
        "s",
        F.col("x.pred").alias("p"),
        F.col("obj").alias("o"),
        F.col("x.o").alias("lit"),
    )


def new_q_bnode_reification(spark: SparkSession, sf: str) -> DataFrame:
    o = read_table(spark, sf, "orders")
    bnode = F.concat(F.lit("_:a"), F.col("o_orderkey"))
    cust = F.concat(F.lit("C_"), F.col("o_custkey"))
    okey = F.concat(F.lit("O_"), F.col("o_orderkey"))
    price = F.round(F.col("o_totalprice") * 100).cast("long").cast("string")
    mk = lambda p, obj, lit: F.struct(  # noqa: E731
        bnode.alias("s"),
        F.lit(p).alias("p"),
        obj.alias("o"),
        F.lit(lit).alias("is_literal"),
    )
    triples = o.select(
        F.explode(
            F.array(
                mk("owl:annotatedSource", cust, False),
                mk("owl:annotatedProperty", F.lit("PLACED"), False),
                mk("owl:annotatedTarget", okey, False),
                mk("price_cents", price, True),
            )
        ).alias("t")
    ).select("t.s", "t.p", "t.o", "t.is_literal")
    out = _resolve_bnodes_new(triples)
    return out.select(
        "s",
        F.lit("PLACED").alias("p"),
        "o",
        F.col("lit").cast("long").alias("price_cents"),
    ).orderBy("s", "o")


# --- q_fk_integrity: one pass per child table -------------------------------


def _fk_integrity_new(edges):
    from functools import reduce

    groups: dict = {}
    for name, child, ckey, parent, pkey in edges:
        groups.setdefault(id(child), (child, []))[1].append(
            (name, ckey, parent, pkey)
        )
    outs = []
    for child, specs in groups.values():
        joined = child.select(
            *[F.col(ck).alias(f"_k{i}") for i, (_n, ck, _p, _pk) in enumerate(specs)]
        )
        for i, (_name, _ck, parent, pk) in enumerate(specs):
            pkd = parent.select(
                F.col(pk).alias(f"_k{i}"), F.lit(1).alias(f"_hit{i}")
            ).distinct()
            joined = joined.join(pkd, f"_k{i}", "left")
        agg = joined.agg(
            F.count(F.lit(1)).cast("long").alias("_n_child"),
            *[
                F.sum(F.when(F.col(f"_hit{i}").isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"_o{i}")
                for i in range(len(specs))
            ],
        )
        outs.append(
            agg.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("fk_name"),
                                F.col("_n_child").alias("n_child"),
                                F.col(f"_o{i}").alias("n_orphans"),
                            )
                            for i, (name, _ck, _p, _pk) in enumerate(specs)
                        ]
                    )
                ).alias("r")
            ).select("r.*")
        )
    return reduce(lambda a, b: a.unionAll(b), outs).orderBy("fk_name")


def new_q_fk_integrity(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, sf, "lineitem")
    o = read_table(spark, sf, "orders")
    c = read_table(spark, sf, "customer")
    return _fk_integrity_new(
        [
            (
                "customer.c_nationkey->nation",
                c,
                "c_nationkey",
                read_table(spark, sf, "nation"),
                "n_nationkey",
            ),
            ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
            (
                "lineitem.l_partkey->part",
                li,
                "l_partkey",
                read_table(spark, sf, "part"),
                "p_partkey",
            ),
            (
                "lineitem.l_suppkey->supplier",
                li,
                "l_suppkey",
                read_table(spark, sf, "supplier"),
                "s_suppkey",
            ),
            ("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        ]
    )


# --- q_kmv_overlap: one shingle distinct, checkpointed sketch --------------


def new_q_kmv_overlap(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from cell_kn_mvp_etl_results_spark.operators import sketches as sk
    from cell_kn_mvp_etl_results_spark.plans.llmdata import _kmv_source_shingles

    sh = _kmv_source_shingles(spark, sf)
    dt = sh.distinct().persist()
    sketch = (
        sk.kmv_sketch(dt, "key", "source")
        .select("source", "key", "h")
        .localCheckpoint(eager=True)
    )
    srcs = sketch.select("source").distinct()
    prs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
    )
    pe = (
        prs.join(
            sketch,
            (F.col("source") == F.col("src_a"))
            | (F.col("source") == F.col("src_b")),
        )
        .groupBy("src_a", "src_b", "key", "h")
        .agg(
            F.max(
                F.when(F.col("source") == F.col("src_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("source") == F.col("src_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("h", "key")
    m = pe.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= sk.KMV_K
    )
    est = m.groupBy("src_a", "src_b").agg(
        F.expr("CAST(1000 * sum(in_a * in_b) div count(*) AS BIGINT)").alias(
            "est_jaccard_permille"
        )
    )
    sz = dt.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        dt.alias("x")
        .join(
            dt.alias("y"),
            (F.col("x.key") == F.col("y.key"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return (
        est.join(
            sz.select(F.col("source").alias("src_a"), F.col("n").alias("_na")),
            "src_a",
        )
        .join(
            sz.select(F.col("source").alias("src_b"), F.col("n").alias("_nb")),
            "src_b",
        )
        .join(inter, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "est_jaccard_permille",
            F.expr(
                "CAST(1000 * COALESCE(n_inter, 0) div "
                "(_na + _nb - COALESCE(n_inter, 0)) AS BIGINT)"
            ).alias("exact_jaccard_permille"),
        )
        .orderBy("src_a", "src_b")
    )


# --- q_cross_neardup: split the pinned signature view, not the corpus ------


def new_q_cross_neardup(spark: SparkSession, sf: str) -> DataFrame:
    from cell_kn_mvp_etl_results_spark.operators import dedup as dd
    from cell_kn_mvp_etl_results_spark.plans.llmdata import _minhash_views

    sig_name, _b, _c = _minhash_views(spark, sf)
    sig_df = spark.table(sig_name)
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("xdedup-"), F.col("id"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    b_sigs = sig_df.filter(bucket < 20)
    c_sigs = sig_df.filter(~(bucket < 20))
    b_payload = dd.lsh_band_buckets(b_sigs, 32, 8, carry=("sig",)).select(
        F.col("id").alias("bench_id"),
        "band",
        "bucket",
        F.col("sig").alias("bench_sig"),
    )
    c_buckets = dd.lsh_band_buckets(c_sigs, 32, 8, carry=("sig",))
    matches = F.aggregate(
        F.zip_with(
            F.col("sig"),
            F.col("bench_sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    collided = c_buckets.join(F.broadcast(b_payload), ["band", "bucket"]).select(
        "id", "bench_id", (matches / F.lit(32.0)).alias("est_jaccard")
    )
    return (
        collided.groupBy("id", "bench_id")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .orderBy("id", "bench_id")
    )


CASES = {
    "q_source_overlap": new_q_source_overlap,
    "q_skew_chooser_join": new_q_skew_chooser_join,
    "q_graph_vertices": new_q_graph_vertices,
    "q_bnode_reification": new_q_bnode_reification,
    "q_fk_integrity": new_q_fk_integrity,
    "q_kmv_overlap": new_q_kmv_overlap,
    "q_cross_neardup": new_q_cross_neardup,
}


def main() -> None:
    pairs = 5
    only = None
    for arg in sys.argv[1:]:
        if arg.startswith("--only"):
            only = set(arg.split("=", 1)[1].split(","))
        else:
            pairs = int(arg)
    spark = get_spark(
        "r12-batch4-ab",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name, new_builder in CASES.items():
        if only and name not in only:
            continue
        old_builder = REGISTRY[name].builder
        df_old = old_builder(spark, sf_dir)
        df_new = new_builder(spark, sf_dir)
        rows_old = sorted(map(tuple, df_old.collect()))
        rows_new = sorted(map(tuple, df_new.collect()))
        eq = rows_old == rows_new and df_old.dtypes == df_new.dtypes
        olds, news = [], []
        for _ in range(pairs):
            spark.sparkContext.setJobDescription(f"{name} OLD")
            t0 = time.perf_counter()
            old_builder(spark, sf_dir).collect()
            olds.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"{name} NEW")
            t0 = time.perf_counter()
            new_builder(spark, sf_dir).collect()
            news.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "old": round(sorted(olds)[len(olds) // 2], 3),
            "new": round(sorted(news)[len(news) // 2], 3),
            "olds": [round(x, 3) for x in olds],
            "news": [round(x, 3) for x in news],
            "rows_equal": eq,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
