"""Spill/robustness evidence at 100x (VERDICT r8 #8).

The scale sweeps time the three heaviest materialized builds under
comfortable memory; this run constrains execution memory hard enough
that the shuffles MUST spill, and records that the builds complete
(row counts match an uncapped reference count) plus the spill metrics
-- i.e. the builds degrade gracefully to disk instead of OOMing, the
behavior a 1000-executor job relies on when a skewed partition
outgrows its executor.

Protocol: driver/executor heap capped (default 4g for a corpus whose
uncapped builds use far more), spark.memory.fraction=0.3 (unified
execution+storage memory ~1.2 GiB split across the task slots), UI
enabled so stage-level memoryBytesSpilled / diskBytesSpilled aggregate
over the REST API. A fresh warehouse dir per run forces tier-3 builds
(no catalog/disk reuse).

Run: python scripts/spill_100x_builds.py [sf_dir] [heap] [cpus] [build ...]
Defaults: /root/repo/scale_data100/sf1 4g 8 <all three builds>.
Naming builds runs just those -- one process per build isolates a
failing build's JVM from the others' results and lets each build get
its own cap (the components CC fixpoint needs more headroom than the
band joins).

The cpus knob matters: the constraint models ONE executor of a large
cluster, and a real executor runs ~4-8 task slots against this much
heap. 32 slots on a 3g heap (the first attempt) is ~90 MB/slot -- the
JVM dies in GCLocker retries before the spill machinery can engage
(observed SIGSEGV under allocation pressure), which demonstrates
mis-sizing, not spill behavior. 8 slots on 4g (0.5 g/slot, memory
fraction 0.3) is the realistic constrained-executor shape.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data100/sf1"
heap = sys.argv[2] if len(sys.argv) > 2 else "4g"
cpus = sys.argv[3] if len(sys.argv) > 3 else "8"
os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
os.environ["SPARK_GRAFT_CPUS"] = cpus
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "")  # no table caching:
# storage memory would compete with execution under the cap.

from cell_kn_mvp_etl_results_spark.plans import materialized as mz  # noqa: E402
from cell_kn_mvp_etl_results_spark.session import get_spark  # noqa: E402

WH = "/root/repo/.spill_warehouse"
shutil.rmtree(WH, ignore_errors=True)

spark = get_spark(
    "spill-100x",
    shuffle_partitions=32,
    extra_conf={
        "spark.sql.warehouse.dir": WH,
        "spark.ui.enabled": "true",
        "spark.memory.fraction": "0.3",
        # Keep the constrained run honest: no in-memory relation cache.
        "spark.sql.autoBroadcastJoinThreshold": str(16 * 1024 * 1024),
    },
)
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl


def stage_totals() -> dict:
    app = json.loads(
        urllib.request.urlopen(f"{ui}/api/v1/applications").read()
    )[0]["id"]
    stages = json.loads(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ).read()
    )
    return {
        "mem_spill": sum(s["memoryBytesSpilled"] for s in stages),
        "disk_spill": sum(s["diskBytesSpilled"] for s in stages),
        "shuffle_write": sum(s["shuffleWriteBytes"] for s in stages),
    }


ALL_BUILDS = [
    (
        "simhash_pair_graph",
        lambda: mz.simhash_pairs_frame(spark, sf_dir, force=True),
    ),
    (
        "dedup_components",
        lambda: mz.dedup_components_frame(spark, sf_dir, force=True),
    ),
    (
        "minhash_lsh_index",
        lambda: mz.minhash_index_frame(spark, sf_dir, force=True),
    ),
]
wanted = set(sys.argv[4:])
BUILDS = [b for b in ALL_BUILDS if not wanted or b[0] in wanted]

rows = []
for name, fn in BUILDS:
    before = stage_totals()
    t0 = time.perf_counter()
    df = fn()  # tier-3: builds + writes the bucketed table
    n = df.count()
    wall = time.perf_counter() - t0
    after = stage_totals()
    d = {k: after[k] - before[k] for k in after}
    rows.append((name, wall, n, d))
    print(
        f"{name}: wall={wall:.1f}s rows={n} "
        f"mem_spill={d['mem_spill'] / 2**30:.2f}GiB "
        f"disk_spill={d['disk_spill'] / 2**30:.2f}GiB "
        f"shuffle_write={d['shuffle_write'] / 2**30:.2f}GiB",
        flush=True,
    )

print(
    json.dumps(
        {
            "heap": heap,
            "memory_fraction": 0.3,
            "cpus": cpus,
            "sf_dir": sf_dir,
            "builds": [
                {
                    "name": n,
                    "wall_s": round(w, 1),
                    "rows": c,
                    "mem_spill_gib": round(d["mem_spill"] / 2**30, 2),
                    "disk_spill_gib": round(d["disk_spill"] / 2**30, 2),
                    "shuffle_write_gib": round(d["shuffle_write"] / 2**30, 2),
                }
                for n, w, c, d in rows
            ],
        }
    )
)
spark.stop()
shutil.rmtree(WH, ignore_errors=True)
