"""Guard the oracle-vs-Spark type-width contract (round-4 lesson).

The driver's value-hash encodes dataframe-level types: DuckDB's sum()
over integers yields HUGEINT (pandas: float64/object) while Spark emits
int64 — identical values, different hash. q_pack_sequences failed the
round-4 gate exactly this way. DESCRIBE every registered oracle and
assert no output column is HUGEINT and no int/float family mismatch
exists against the Spark plan schema. Plan-only: nothing executes.
"""

from __future__ import annotations

import duckdb
import pytest

from cell_kn_mvp_etl_results_spark.plans import REGISTRY

_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "HUGEINT", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "HUGEINT",
    "FLOAT": "float", "DOUBLE": "float",
}
_SPARK_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if REGISTRY[n].oracle is not None)
)
def test_oracle_output_types(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    duck_schema = {
        r[0]: r[1] for r in duck.execute(f"DESCRIBE ({spec.oracle})").fetchall()
    }
    spark_schema = dict(spec.builder(spark, sf_dir).dtypes)
    for col, dtype in duck_schema.items():
        fam = _DUCK_FAMILY.get(dtype.split("(")[0].upper())
        assert fam != "HUGEINT", (
            f"{name}.{col} is {dtype}: cast to BIGINT in the oracle SQL "
            "(pandas converts HUGEINT differently from Spark's int64)"
        )
        sfam = _SPARK_FAMILY.get(spark_schema.get(col, "").split("(")[0].lower())
        if fam and sfam:
            assert fam == sfam, (
                f"{name}.{col}: duckdb={dtype} vs spark={spark_schema.get(col)}"
            )
