"""Entity-resolution lookups (SURVEY.md J3-J8, C5, A2).

The reference holds small id-mapping tables in pandas and resolves ids
with indexed ``.loc`` lookups returning a *list* of matches, callers
taking the first (``LoaderUtilities.py:338-363``, ``:716-719``). The
Spark form: broadcast dimension joins with an explicit multi-match
policy -- 'first' (deterministic min), 'list' (collect_set), or
'unique' (fail on ambiguity). Broadcast keeps the fact side
shuffle-free regardless of fact scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    value: str,
    out: str | None = None,
    multi: str = "first",
    default: str | None = None,
) -> DataFrame:
    """Left-join ``facts`` to broadcast ``dim`` on column ``on``; attach
    ``value`` as ``out``.

    multi='first': deterministic first match (min of value) -- the
    reference's caller-takes-first semantics made reproducible.
    multi='list': all matches as a sorted array.
    ``default``: value when no match (the reference's ``"NA"`` default
    in the schema CURIE join, ``CellKnSchemaUtilities.py:87-107``).
    """
    out = out or value
    if multi == "first":
        d = dim.groupBy(on).agg(F.min(value).alias(out))
    elif multi == "list":
        d = dim.groupBy(on).agg(F.sort_array(F.collect_set(value)).alias(out))
    else:
        raise ValueError(f"unknown multi policy {multi!r}")
    joined = facts.join(F.broadcast(d), on, "left")
    if default is not None and multi == "first":
        joined = joined.withColumn(out, F.coalesce(F.col(out), F.lit(default)))
    return joined


def strip_ensembl_version(col: Column | str) -> Column:
    """A2: normalize versioned Ensembl ids (``ENSG00000228222.1`` ->
    ``ENSG00000228222``; reference ``LoaderUtilities.py:711``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\.\d+$", "")


def efo_to_mondo(
    facts: DataFrame, efo2mondo: DataFrame, term_col: str, out: str = "mondo"
) -> DataFrame:
    """J4: EFO->MONDO mapping with MONDO passthrough and None for other
    namespaces (reference ``get_mondo_term``,
    ``ExternalApiResultsTupleWriter.py:36-63``)."""
    looked = broadcast_lookup(
        facts.withColumn("_k", F.col(term_col)),
        efo2mondo.select(F.col("EFO").alias("_k"), F.col("MONDO").alias("_v")),
        "_k",
        "_v",
        out="_mapped",
    )
    return looked.withColumn(
        out,
        F.when(F.col(term_col).startswith("MONDO"), F.col(term_col)).otherwise(
            F.col("_mapped")
        ),
    ).drop("_k", "_mapped")


# C5: annotation term normalization (AnnotationResultsTupleWriter.py:93-186)
# -- a when-chain over term types plus small hardcoded patch tables.


def normalize_annotation_term(type_col: Column | str, name_col: Column | str) -> Column:
    """C5 subset, as a pure expression: unicode cleanup, type-prefix
    dispatch, whitespace hyphenation. Patch-table lookups (MeSH->MONDO,
    PMID->DOI) compose around this as broadcast joins."""
    t = F.col(type_col) if isinstance(type_col, str) else type_col
    n = F.col(name_col) if isinstance(name_col, str) else name_col
    cleaned = F.translate(n, "γδ−", "gd-")  # gamma/delta/minus
    hyph = F.regexp_replace(F.trim(cleaned), r"[ _,/]+", "-")
    return (
        F.when(t == "Cell_set", F.concat(F.lit("CS_"), hyph))
        .when(t == "Biomarker_combination", F.concat(F.lit("BMC_"), hyph))
        .when(t == "NLP_dataset", F.concat(F.lit("CSD_"), hyph))
        .when(t == "Cell_type", hyph)
        .when(
            t == "Gene",
            # all-caps gate: only uppercase alnum symbols are genes
            F.when(n.rlike(r"^[A-Z0-9\-]+$"), F.concat(F.lit("GS_"), n)),
        )
        .when(t == "Publication", F.concat(F.lit("PUB_"), hyph))
        .otherwise(hyph)
    )
