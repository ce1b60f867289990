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
