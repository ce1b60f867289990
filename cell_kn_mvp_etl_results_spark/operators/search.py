"""Text-search view analog (SURVEY.md T6, K7).

The reference serves UI search from an ArangoSearch view with ngram(3,4)
and edge-ngram analyzers over selected display fields
(``ArangoDbUtilities.py:209-358``). Spark-first, the view is a derived
inverted-index table  grams(gram, coll, key, field)  and a search is a
gram-match join scored by the number of shared grams -- the same
first-pass ranking an ngram analyzer gives.

Index build: one explode + one dedup, linear in text bytes, shuffle on
the gram key (bounded key space). Query: broadcast the (tiny) query-gram
set, aggregate matches per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams, edge_ngrams


def build_gram_index(
    df: DataFrame,
    key_cols: list[str],
    text_col: str,
    n: int = 3,
    analyzer: str = "ngram",
    max_gram: int = 12,
) -> DataFrame:
    """Inverted index rows (gram, <key_cols...>) -- deduped per doc.

    ``analyzer='ngram'`` emits fixed-length character grams (substring
    search); ``analyzer='edge'`` emits per-token prefixes of length
    ``n..max_gram`` -- the type-ahead analyzer
    (``ArangoDbUtilities.py:235-250`` edge-ngram(3,12), lowercase).
    Both are one explode + dedup, shuffle on the bounded gram key.
    """
    if analyzer == "ngram":
        grams = F.array_distinct(char_ngrams(F.lower(F.col(text_col)), n))
    elif analyzer == "edge":
        grams = edge_ngrams(F.col(text_col), n, max_gram)
    else:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    return df.select(*key_cols, F.explode(grams).alias("gram"))


def query_grams(query: str | Column, n: int = 3) -> list[str] | Column:
    if isinstance(query, str):
        q = query.lower()
        return [q[i : i + n] for i in range(max(0, len(q) - n + 1))]
    return F.array_distinct(char_ngrams(F.lower(query), n))


def search(
    index: DataFrame, key_cols: list[str], query: str, n: int = 3, k: int = 10
) -> DataFrame:
    """Top-k documents by shared-gram count (ties break on the key
    columns for determinism). The query-gram set is a literal in the
    plan -- the filter pushes into the index scan."""
    grams = query_grams(query, n)
    if not grams:
        return index.select(*key_cols).limit(0).withColumn("score", F.lit(0))
    hits = (
        index.filter(F.col("gram").isin(*set(grams)))
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("score"))
    )
    return hits.orderBy(F.desc("score"), *key_cols).limit(k)


def search_prefix(
    index: DataFrame,
    key_cols: list[str],
    query: str,
    min_gram: int = 3,
    max_gram: int = 12,
    k: int = 10,
) -> DataFrame:
    """Type-ahead over an ``analyzer='edge'`` index: each query token is
    matched as an exact gram (a token prefix of that length exists iff
    some indexed token starts with it -- ArangoDB ``STARTS_WITH``
    semantics); score = number of matched query tokens. Tokens shorter
    than ``min_gram`` can't be in the index and are ignored; longer
    than ``max_gram`` are truncated to the indexed prefix length.
    """
    toks = {
        t[:max_gram]
        for t in query.lower().split()
        if len(t) >= min_gram
    }
    if not toks:
        return index.select(*key_cols).limit(0).withColumn("score", F.lit(0))
    hits = (
        index.filter(F.col("gram").isin(*toks))
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("score"))
    )
    return hits.orderBy(F.desc("score"), *key_cols).limit(k)


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of N
    retrieval systems' rank lists: rrf(d) = Σ_systems 1/(k + rank_s(d)),
    the standard way to combine lexical (BM25) and vector retrieval
    without score calibration. Integer-exact: each contribution is
    1_000_000 div (k + rank) and a document absent from a system
    contributes 0 (its rank column comes back NULL), so the fused
    score is an exact BIGINT in every engine.

    ``rankings`` is [(name, df)] where each df carries (id_col, rank)
    with rank 1-based; output is the fused top-``topk`` as
    (id_col, <name>_rank ... per system, rrf_x1m), ties broken by
    id. Scale shape: rank lists are top-N-sized (not corpus-sized) by
    construction, so the fusion is a few small outer joins + one
    ordered limit -- driver-light, executor-trivial.
    """
    from functools import reduce

    named = [
        (name, df.select(F.col(id_col).alias("id"), F.col("rank").alias(f"{name}_rank")))
        for name, df in rankings
    ]
    joined = reduce(
        lambda a, b: a.join(b, "id", "full_outer"), [df for _, df in named]
    )
    contribs = [
        F.when(
            F.col(f"{name}_rank").isNotNull(),
            F.expr(f"1000000 div ({int(k)} + {name}_rank)"),
        ).otherwise(F.lit(0))
        for name, _ in named
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return (
        joined.select(
            F.col("id").alias(id_col),
            *[F.col(f"{name}_rank") for name, _ in named],
            total.cast("long").alias("rrf_x1m"),
        )
        .orderBy(F.desc("rrf_x1m"), id_col)
        .limit(topk)
    )
