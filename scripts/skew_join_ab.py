"""Measure the skew doctrine (SCALE.md): a fact-dim equi-join whose
fact side is pathologically skewed (one key owns half the rows), under

  a) static SMJ, AQE off            -- the skew lands on one task;
  b) AQE skew-join splitting on     -- runtime re-plan splits the
                                       oversized partition;
  c) operators/scale.salted_join,   -- content-derived salt spreads the
     AQE off                           hot key across `salt` subkeys.

All three must return identical aggregates (asserted); legs alternate
across two rounds so box drift cannot pick the winner.

Run: python scripts/skew_join_ab.py [fact_rows] [runs]
"""

from __future__ import annotations

import os
import sys
import time

fact_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.scale import salted_join
from cell_kn_mvp_etl_results_spark.session import get_spark

spark = get_spark(
    "skew-ab",
    shuffle_partitions=32,
    extra_conf={
        # start with AQE off; leg b flips it on at runtime
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ: the
        # dim is broadcastable at this synthetic size, but at lake scale
        # the skewed join's dim side is not -- the skew path is what is
        # under test, not the broadcast escape hatch.
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    },
)
spark.sparkContext.setLogLevel("ERROR")

n_keys = 1_000_000
# one hot key (0) owns half the fact; the rest spread uniformly
facts = spark.range(fact_rows).select(
    F.when(F.col("id") % 2 == 0, F.lit(0))
    .otherwise(F.pmod(F.hash(F.col("id")), F.lit(n_keys)))
    .cast("long")
    .alias("k"),
    (F.col("id") % 97).alias("v"),
)
dim = spark.range(n_keys).select(
    F.col("id").alias("k"), (F.col("id") % 13).alias("w")
)
facts.persist().count()
dim.persist().count()


def agg(joined):
    return joined.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    )


def leg(label: str, aqe: bool, salted: bool):
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    j = (
        salted_join(facts, dim, "k", salt=8)
        if salted
        else facts.join(dim, "k")
    )
    got = tuple(agg(j).collect()[0])
    samples = []
    for _ in range(runs):
        t = time.perf_counter()
        agg(j).collect()
        samples.append(time.perf_counter() - t)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    return got, sorted(samples)


def loadavg() -> str:
    with open("/proc/loadavg") as f:
        return f.read().split()[0]


results = {}
for rnd in range(2):
    for label, aqe, salted in (
        ("static-smj", False, False),
        ("aqe-skew", True, False),
        ("salted", False, True),
    ):
        got, s = leg(label, aqe, salted)
        results.setdefault(label, got)
        assert results[label] == got
        fmt = "/".join(f"{x:.2f}" for x in s)
        print(
            f"round {rnd} {label:10s} load~{loadavg():>5s} "
            f"[{fmt}] median {s[len(s) // 2]:.2f}s",
            flush=True,
        )

vals = set(results.values())
assert len(vals) == 1, f"legs disagree: {results}"
print("aggregates identical across all three legs:", results["salted"])
spark.stop()
