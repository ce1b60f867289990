"""Settled idle-box pair protocol for the graded sf0.1 rebuild ratio.

Alternates one bench.py run (Spark, rebuild regime read from the JSON
line) with one oracle_bench.py run (DuckDB), N times, sleeping between
runs so load-average from the previous JVM drains. Prints one line per
pair and the median ratio. This is the protocol behind the BENCH_NOTES
"five-pair spread" rows.

Usage: python scripts/settled_pairs.py [pairs] [sleep_s]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_json(cmd: list[str]) -> dict:
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, check=True
    ).stdout
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    gap = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0
    env_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_SF_DIR"] = env_sf
    rows = []
    for i in range(pairs):
        with open("/proc/loadavg") as f:
            load = f.read().split()[0]
        s = run_json([sys.executable, "bench.py"])
        time.sleep(gap)
        d = run_json([sys.executable, "scripts/oracle_bench.py"])
        time.sleep(gap)
        ratio = s["value_rebuild"] / d["value"]
        rows.append((s["value_rebuild"], d["value"], ratio))
        print(
            f"pair {i}: load~{load} spark_rebuild={s['value_rebuild']:.3f} "
            f"duckdb={d['value']:.3f} ratio={ratio:.2f}x "
            f"(prepared={s['value']:.3f} cold={s['value_cold']:.3f})",
            flush=True,
        )
    med = statistics.median(r[2] for r in rows)
    spread = (min(r[2] for r in rows), max(r[2] for r in rows))
    print(
        json.dumps(
            {
                "pairs": rows,
                "median_ratio": round(med, 3),
                "spread": [round(spread[0], 2), round(spread[1], 2)],
            }
        )
    )


if __name__ == "__main__":
    main()
