"""Scalar string/id expression library (SURVEY.md section 2.9, C1-C14).

Every helper in the reference is a row-at-a-time Python function
(``LoaderUtilities.py``, ``AnnotationResultsTupleWriter.py``). Here each
is a Catalyst *expression builder*: Column in, Column out, executed
JVM-side inside whole-stage codegen. No Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hyphenate(col: Column | str) -> Column:
    """C1 -- replace space/underscore/comma/slash runs with ``-``.

    Reference: ``LoaderUtilities.py:263-284`` (per-char loop).
    """
    return F.regexp_replace(_c(col), r"[ _,/]+", "-")


def stable_uuid(*cols: Column | str, length: int = 12) -> Column:
    """C2 -- deterministic surrogate id.

    The reference draws a *random* 12-char id and writes it back into its
    input CSV (``LoaderUtilities.py:228-259``) -- unreproducible and
    input-mutating. We derive the id from identifying columns instead
    (SURVEY.md section 7).
    """
    return F.substring(F.sha2(F.concat_ws("", *[_c(c) for c in cols]), 256), 1, length)


def curie_normalize(col: Column | str) -> Column:
    """C3 -- CURIE normalization ``:`` -> ``_``.

    Reference: ``CellKnSchemaUtilities.py:146``,
    ``ExternalApiResultsTupleWriter.py:919`` etc.
    """
    return F.translate(_c(col), ":", "_")


def strip_purl(col: Column | str) -> Column:
    """C3/C6 -- strip OBO PURL prefix, keep the term id.

    Reference: ``LoaderUtilities.py:60-61`` (str.replace),
    ``AuthorToClResultsTupleWriter.py:99-102`` (urlparse basename).
    """
    return F.regexp_replace(_c(col), r"^https?://purl\.obolibrary\.org/obo/", "")


def remove_protocols(col: Column | str) -> Column:
    """C6 -- strip ``http(s)://`` from string values.

    Reference: ``ExternalApiResultsTupleWriter.py:1017-1033``.
    """
    return F.regexp_replace(_c(col), r"^https?://", "")


def parse_list_literal(col: Column | str) -> Column:
    """C7 -- parse a stringified Python list cell ``"['A', 'B']"``.

    Reference uses ``ast.literal_eval`` per row
    (``NSForestResultsTupleWriter.py:57-58``). Spark-side: normalize the
    quoting and ``from_json`` to ``array<string>`` -- vectorized, no UDF.
    """
    jsonish = F.regexp_replace(_c(col), r"'", '"')
    return F.from_json(jsonish, "array<string>")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (drops empty tokens).

    array_remove instead of a higher-order filter(lambda): the lambda
    path falls out of whole-stage codegen and profiled ~6x slower.
    """
    return F.array_remove(F.split(F.trim(_c(col)), r"\s+"), "")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of a text column -> array<string>.

    Built from ``sequence`` + ``transform`` + ``slice`` over the token
    array: pure Catalyst expressions, no UDF, arbitrarily wide rows ok.
    """
    toks = tokens(col)
    count = F.size(toks)
    # sequence(1, 0) would be a DESCENDING sequence in Spark -- guard the
    # too-short case with an explicit empty array.
    idx = F.when(count >= n, F.sequence(F.lit(1), count - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-grams -> array<string> (T6 search-index analog).

    The reference's ArangoSearch view uses ngram(3,4) analyzers
    (``ArangoDbUtilities.py:222-250``). Same Catalyst-only pattern.
    """
    s = _c(col)
    length = F.length(s)
    idx = F.when(length >= n, F.sequence(F.lit(1), length - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: s.substr(i, F.lit(n)))


def edge_ngrams(
    col: Column | str, min_gram: int = 3, max_gram: int = 12
) -> Column:
    """Edge (prefix) n-grams per whitespace token -> array<string>.

    The reference's UI type-ahead runs on an ArangoSearch edge-ngram
    analyzer over display fields -- min 3, max 12, lowercase
    (``ArangoDbUtilities.py:235-250``): every token contributes its
    prefixes of length ``min_gram..min(max_gram, len(token))``, so a
    partial query like "macroph" hits "macrophage" by exact gram
    equality. Pure Catalyst (sequence + transform + substr), distinct
    to bound index fan-out at ``max_gram - min_gram + 1`` grams/token.
    """
    toks = tokens(F.lower(_c(col)))
    per_tok = F.transform(
        toks,
        lambda t: F.transform(
            F.when(
                F.length(t) >= min_gram,
                F.sequence(F.lit(min_gram), F.least(F.length(t), F.lit(max_gram))),
            ).otherwise(F.array().cast("array<int>")),
            lambda l: t.substr(F.lit(1), l),
        ),
    )
    return F.array_distinct(F.flatten(per_tok))
