"""Unit tests for the scalar expression library (mirrors the reference's
style-1 tests on helpers, SURVEY.md section 5: LoaderUtilitiesTestCase)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.functions import (
    char_ngrams,
    curie_normalize,
    hyphenate,
    parse_list_literal,
    remove_protocols,
    stable_uuid,
    strip_purl,
    tokens,
    word_shingles,
)


def one(spark, expr, value: str):
    return spark.createDataFrame([(value,)], "v string").select(
        expr("v").alias("r")
    ).collect()[0].r


def test_hyphenate(spark):
    # Reference semantics: LoaderUtilities.py:263-284.
    assert one(spark, hyphenate, "a b_c,d/e") == "a-b-c-d-e"
    assert one(spark, hyphenate, "a  __  b") == "a-b"


def test_curie_normalize(spark):
    assert one(spark, curie_normalize, "CL:0000235") == "CL_0000235"


def test_strip_purl(spark):
    assert (
        one(spark, strip_purl, "http://purl.obolibrary.org/obo/UBERON_0000966")
        == "UBERON_0000966"
    )
    assert (
        one(spark, strip_purl, "https://purl.obolibrary.org/obo/CL_4030027")
        == "CL_4030027"
    )


def test_remove_protocols(spark):
    assert one(spark, remove_protocols, "https://example.org/x") == "example.org/x"
    assert one(spark, remove_protocols, "plain") == "plain"


def test_parse_list_literal(spark):
    # Reference: ast.literal_eval of "['A', 'B']" cells
    # (NSForestResultsTupleWriter.py:57-58).
    assert one(spark, parse_list_literal, "['SLC12A7', 'OTOGL']") == [
        "SLC12A7",
        "OTOGL",
    ]


def test_tokens_and_shingles(spark):
    assert one(spark, tokens, "  a  b c ") == ["a", "b", "c"]
    assert one(spark, lambda c: word_shingles(c, 2), "a b c") == ["a b", "b c"]
    assert one(spark, lambda c: word_shingles(c, 3), "a b") == []


def test_char_ngrams(spark):
    assert one(spark, lambda c: char_ngrams(c, 3), "abcd") == ["abc", "bcd"]
    assert one(spark, lambda c: char_ngrams(c, 3), "ab") == []


def test_stable_uuid_deterministic(spark):
    a = one(spark, lambda c: stable_uuid(F.lit("x"), c), "foo")
    b = one(spark, lambda c: stable_uuid(F.lit("x"), c), "foo")
    c2 = one(spark, lambda c: stable_uuid(F.lit("x"), c), "bar")
    assert a == b and a != c2 and len(a) == 12
