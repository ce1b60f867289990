"""Tests for the text-search view analog (T6)."""

from __future__ import annotations

from cell_kn_mvp_etl_results_spark.operators.search import (
    build_gram_index,
    query_grams,
    search,
)


def corpus(spark):
    rows = [
        (1, "macrophage"),
        (2, "histiocyte"),
        (3, "Macro Lens"),
        (4, "unrelated"),
    ]
    return spark.createDataFrame(rows, "id long, name string")


def test_gram_index_dedup(spark):
    idx = build_gram_index(corpus(spark), ["id"], "name", 3)
    rows = idx.collect()
    # per-doc grams are distinct
    assert len(rows) == len({(r.id, r.gram) for r in rows})
    assert {"mac", "acr", "cro"} <= {r.gram for r in rows if r.id == 1}


def test_query_grams_literal():
    assert query_grams("abcd") == ["abc", "bcd"]
    assert query_grams("ab") == []


def test_search_ranks_by_shared_grams(spark):
    idx = build_gram_index(corpus(spark), ["id"], "name", 3)
    out = search(idx, ["id"], "macrophag", k=3).collect()
    assert out[0].id == 1  # full prefix match wins
    ids = [r.id for r in out]
    assert 3 in ids  # 'Macro Lens' shares 'mac'/'acr'/'cro'
    assert 4 not in ids


def test_search_empty_query(spark):
    idx = build_gram_index(corpus(spark), ["id"], "name", 3)
    assert search(idx, ["id"], "ab", k=3).count() == 0


def test_edge_ngram_typeahead(spark):
    """Progressively longer prefixes of "macrophage" keep hitting the
    doc (type-ahead), while unrelated prefixes don't."""
    from cell_kn_mvp_etl_results_spark.operators.search import (
        build_gram_index,
        search_prefix,
    )

    rows = [(1, "Macrophage cell line"), (2, "T helper cell"), (3, "gizmo")]
    df = spark.createDataFrame(rows, "id long, name string")
    idx = build_gram_index(df, ["id"], "name", 3, analyzer="edge")
    for q in ("mac", "macro", "macroph", "macrophage"):
        hits = search_prefix(idx, ["id"], q).collect()
        assert [r.id for r in hits] == [1], q
    # two-token query scores both matched tokens
    top = search_prefix(idx, ["id"], "mac cel").collect()
    assert top[0].id == 1 and top[0].score == 2
    # below min_gram tokens are ignored; >max_gram truncates to 12
    assert search_prefix(idx, ["id"], "ma").collect() == []
    long_q = "macrophageXX"  # 12 chars = indexed prefix cap
    assert [r.id for r in search_prefix(idx, ["id"], "macrophagece").collect()] == []


def test_edge_ngrams_function_bounds(spark):
    from cell_kn_mvp_etl_results_spark.functions.text import edge_ngrams
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("Hi Chocolate",)], "s string")
    grams = df.select(edge_ngrams("s").alias("g")).collect()[0].g
    # 'hi' < min_gram contributes nothing; 'chocolate' yields len 3..9
    assert sorted(grams) == [
        "cho", "choc", "choco", "chocol", "chocola", "chocolat", "chocolate",
    ]


def test_rrf_fuse_integer_contract(spark):
    from cell_kn_mvp_etl_results_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(11, 1), (12, 2)], "doc_id long, rank long")
    got = {r.doc_id: (r.bm25_rank, r.vec_rank, r.rrf_x1m) for r in
           rrf_fuse([("bm25", a), ("vec", b)], topk=10).collect()}
    # doc 11: rank 2 + rank 1 -> 1000000//62 + 1000000//61
    assert got[11] == (2, 1, 1000000 // 62 + 1000000 // 61)
    # single-system docs carry a NULL rank for the other system
    assert got[10] == (1, None, 1000000 // 61)
    assert got[12] == (None, 2, 1000000 // 62)
    # fused order: doc 11 first (two contributions)
    order = [r.doc_id for r in rrf_fuse([("bm25", a), ("vec", b)]).collect()]
    assert order[0] == 11


def test_rrf_fuse_tie_breaks_by_id(spark):
    from cell_kn_mvp_etl_results_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(5, 1), (3, 1)], "doc_id long, rank long")
    # identical contributions -> lower id first
    got = [r.doc_id for r in rrf_fuse([("x", a.filter("doc_id=5")), ("y", a.filter("doc_id=3").withColumnRenamed("rank", "rank"))]).collect()]
    assert got == [3, 5]
