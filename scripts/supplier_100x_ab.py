"""A/B the supplier above-gate shapes at the 100x corpus (verdict r6
#3): (a) current shipped shape (li JOIN o SMJ, dims broadcast after),
(b) pre-reduced omap shape (orders joined map-side to broadcast dims
BEFORE the fact shuffle), (c) = (b) + runtime Bloom filter injection
(application-side threshold lowered so the li scan qualifies).

Run: python scripts/supplier_100x_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data100/sf1"
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "all")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cell_kn_mvp_etl_results_spark.functions.money import cents
from cell_kn_mvp_etl_results_spark.session import get_spark
from cell_kn_mvp_etl_results_spark.sources.readers import read_table

from pyspark.sql import functions as F

spark = get_spark(
    "supplier-ab",
    shuffle_partitions=32,
    extra_conf={
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.constraintPropagation.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def tables():
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    return c, o, li, s, n, r


def finish(joined):
    disc_bp = F.lit(100) - cents("l_discount")
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            (F.sum(cents("l_extendedprice") * disc_bp) / F.lit(10000.0)).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


def shape_current():
    c, o, li, s, n, r = tables()
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return finish(joined)


def shape_omap():
    c, o, li, s, n, r = tables()
    n2 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    omap = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("o_orderkey"),
            F.col("c_nationkey").alias("cust_nation"),
            "n_name",
        )
    )
    joined = li.join(omap, li.l_orderkey == omap.o_orderkey).join(
        F.broadcast(s),
        (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("cust_nation")),
    )
    return finish(joined)


def med(fn, label, conf=None):
    old = {}
    if conf:
        for k, v in conf.items():
            old[k] = spark.conf.get(k)
            spark.conf.set(k, v)
    try:
        df = fn()
        plan = df._jdf.queryExecution().executedPlan().toString()
        has_bloom = "bloom" in plan.lower() or "might_contain" in plan.lower()
        df.collect()  # warm
        s = []
        for _ in range(3):
            # Rebuild per run: a re-collected DataFrame reuses shuffle
            # map outputs (skipped stages), which would hide the very
            # exchange cost this A/B compares.
            t0 = time.perf_counter()
            rows = fn().collect()
            s.append(time.perf_counter() - t0)
        print(
            f"{label}: median {sorted(s)[1]:.3f}s  bloom={has_bloom}  "
            f"rows={len(rows)}",
            flush=True,
        )
        return [tuple(r) for r in rows]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


# SMJ vs SHJ on the reduced omap (the r6 SHJ A/B used FULL orders as
# the build side and lost; the reduced map is ~5x smaller).
def shape_omap_shj():
    c, o, li, s, n, r = tables()
    n2 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    omap = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("o_orderkey"),
            F.col("c_nationkey").alias("cust_nation"),
            "n_name",
        )
        .hint("shuffle_hash")
    )
    joined = li.join(omap, li.l_orderkey == omap.o_orderkey).join(
        F.broadcast(s),
        (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("cust_nation")),
    )
    return finish(joined)


# r9 (VERDICT r8 #5): aggregate-below-join -- collapse the fact-fact
# join's output to (suppkey, cust_nation, n_name) partial sums BEFORE
# the supplier join, so the broadcast probe + final agg run over
# |S|x|nations| rows instead of |li| rows.
def shape_agg_below_join():
    c, o, li, s, n, r = tables()
    n2 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    omap = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("o_orderkey"),
            F.col("c_nationkey").alias("cust_nation"),
            "n_name",
        )
    )
    disc_bp = F.lit(100) - cents("l_discount")
    pre = (
        li.join(omap, li.l_orderkey == omap.o_orderkey)
        .groupBy("l_suppkey", "cust_nation", "n_name")
        .agg(
            F.sum(cents("l_extendedprice") * disc_bp).alias("amt"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        pre.join(
            F.broadcast(s),
            (pre.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == F.col("cust_nation")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            (F.sum("amt") / F.lit(10000.0)).alias("revenue"),
            F.sum("n").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


# r9 (VERDICT r8 #5): semi-join-reduced fact scan -- broadcast the
# reduced map's (unique) orderkeys into a left-semi BHJ over lineitem
# first, so the SMJ's exchange+sort runs over only qualifying fact
# rows (~34% after the date+region filters).
def shape_semi_reduced():
    c, o, li, s, n, r = tables()
    n2 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    omap = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("o_orderkey"),
            F.col("c_nationkey").alias("cust_nation"),
            "n_name",
        )
    )
    okeys = omap.select(F.col("o_orderkey").alias("ok"))
    li_red = li.join(
        F.broadcast(okeys), li.l_orderkey == F.col("ok"), "left_semi"
    )
    joined = li_red.join(omap, li_red.l_orderkey == omap.o_orderkey).join(
        F.broadcast(s),
        (li_red.l_suppkey == s.s_suppkey)
        & (s.s_nationkey == F.col("cust_nation")),
    )
    return finish(joined)


a = med(shape_current, "current li-join-o       ")
b = med(shape_omap, "pre-reduced omap        ")
c_ = med(
    shape_omap,
    "omap + runtime bloom    ",
    conf={
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "64MB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "512MB",
    },
)
d_ = med(shape_omap_shj, "omap SHJ hint           ")
e_ = med(shape_agg_below_join, "agg-below-supplier-join ")
f_ = med(shape_semi_reduced, "semi-reduced fact scan  ")
print("identical:", a == b == c_ == d_ == e_ == f_)
spark.stop()
