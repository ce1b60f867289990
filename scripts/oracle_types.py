"""Audit DuckDB oracle output types against Spark query schemas.

The driver's correctness gate hashes values after dataframe conversion,
where type WIDTH matters: DuckDB's sum() over integers yields HUGEINT,
which pandas converts to float64/object while Spark emits int64 — same
values, different hash (this broke q_pack_sequences in round 4). This
script DESCRIBEs every registered oracle at a small SF and flags:

  * any HUGEINT output column (always a hash hazard), and
  * integer-width / integer-vs-float disagreements between the DuckDB
    oracle schema and the Spark plan schema.

Usage: python scripts/oracle_types.py [sf_dir]
Exit code 1 if any HUGEINT column is found.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# DuckDB type -> comparison family. Only families that pandas encodes
# differently need to agree between engines.
_DUCK_FAMILY = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "HUGEINT": "HUGEINT",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "HUGEINT",  # pandas: uint64 -> may go object/float
    "FLOAT": "float",
    "DOUBLE": "float",
}

_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
}


def main(sf_dir: str) -> int:
    from pyspark.sql import SparkSession

    from cell_kn_mvp_etl_results_spark.plans import REGISTRY

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("oracle-types-audit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    hugeint_hits = []
    family_mismatches = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        duck_schema = {
            r[0]: r[1]
            for r in con.execute(f"DESCRIBE ({spec.oracle})").fetchall()
        }
        spark_schema = dict(spec.builder(spark, sf_dir).dtypes)
        for col, dtype in duck_schema.items():
            base = dtype.split("(")[0].upper()
            fam = _DUCK_FAMILY.get(base)
            if fam == "HUGEINT":
                hugeint_hits.append((name, col, dtype))
                continue
            sfam = _SPARK_FAMILY.get(
                spark_schema.get(col, "").split("(")[0].lower()
            )
            if fam and sfam and fam != sfam:
                family_mismatches.append(
                    (name, col, dtype, spark_schema.get(col))
                )

    for name, col, dtype in hugeint_hits:
        print(f"HUGEINT  {name}.{col} ({dtype}) — cast to BIGINT in oracle")
    for name, col, dtype, sdt in family_mismatches:
        print(f"MISMATCH {name}.{col}: duckdb={dtype} spark={sdt}")
    if not hugeint_hits and not family_mismatches:
        print("ok: no HUGEINT outputs, no int/float family mismatches")
    return 1 if hugeint_hits else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
