"""Interleaved A/B of the r12 model-registry serving path vs inline
training, in ONE session (box noise cancels): for each query, alternate
SPARK_GRAFT_MATERIALIZE=0 (train inside the call — the pre-r12 shape)
and =1 (per-corpus-fingerprint model registry, plans/models.py), warm
table cache, PLAN_CACHE=0 (the rebuild regime), median of 3 per leg,
legs interleaved A B A B A B. Rows asserted identical across legs.
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

from cell_kn_mvp_etl_results_spark.plans import REGISTRY
from cell_kn_mvp_etl_results_spark.session import get_spark

QUERIES = [
    "q_semantic_clusters",
    "q_cluster_exemplars",
    "q_ivf_topk",
    "q_cluster_purity",
    "q_semdedup",
    "q_pq_topk",
    "q_ivfpq_topk",
    "q_ann_recall",
    "q_hard_negatives",
]


def main() -> None:
    spark = get_spark(
        "r12-models-ab",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    for name in QUERIES:
        spec = REGISTRY[name]
        rows = {}
        samples = {"inline": [], "registry": []}
        # warmups for both legs (codegen + registry build)
        for leg, mat in (("inline", "0"), ("registry", "1")):
            os.environ["SPARK_GRAFT_MATERIALIZE"] = mat
            rows[leg] = sorted(map(tuple, spec.builder(spark, sf_dir).collect()))
        assert rows["inline"] == rows["registry"], f"{name}: rows diverge"
        for _ in range(3):
            for leg, mat in (("inline", "0"), ("registry", "1")):
                os.environ["SPARK_GRAFT_MATERIALIZE"] = mat
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).collect()
                samples[leg].append(time.perf_counter() - t0)
        out[name] = {
            leg: round(sorted(s)[1], 3) for leg, s in samples.items()
        }
    os.environ["SPARK_GRAFT_MATERIALIZE"] = "1"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
