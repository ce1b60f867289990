"""Query registry: one place where every implemented operator from
SURVEY.md section 2 (plus the LLM-data-pipeline operators) is exposed as

  name -> (Spark builder (spark, sf_dir) -> DataFrame,
           equivalent DuckDB oracle SQL or None)

``__spark_entry__.py``, the pytest oracle-parity suite, and ``bench.py``
all read from this registry, so a query cannot drift between the three.

Determinism contract (drives every plan in this package):
  * money/quantity aggregates go through integer cents (functions.money)
    so Spark and DuckDB hash bit-identically;
  * every computed column is aliased identically in builder and oracle;
  * floating-point results are produced by a *fixed shape* of IEEE ops
    (single final division / sqrt) on exact integers, never by
    order-dependent double summation.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over pre-registered table views
    doc: str = ""
    headline: bool = False  # included in bench.py timing set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder with its oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle.strip() if oracle else None,
            doc=doc or (fn.__doc__ or "").strip(),
            headline=headline,
            tags=tags,
        )
        return fn

    return deco


def all_queries() -> dict[str, Builder]:
    return {n: s.builder for n, s in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}
