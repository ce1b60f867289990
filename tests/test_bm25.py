"""Unit tests for operators/textanalysis.bm25_topk — integer-exact
BM25 ranking. Oracle parity (q_bm25) pins the full pipeline vs DuckDB;
here we pin the scoring formula against a pure-Python mirror on a
hand-built corpus, plus ranking semantics and plan shape.
"""

from __future__ import annotations

from cell_kn_mvp_etl_results_spark.operators.textanalysis import bm25_topk


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _mirror(texts, terms, topk):
    toks = [t.lower().split() for t in texts]
    dl = [len(ts) for ts in toks]
    t_all, n = sum(dl), len(toks)
    tf = [{q: ts.count(q) for q in terms if q in ts} for ts in toks]
    df = {q: sum(1 for m in tf if q in m) for q in terms}
    rows = []
    for i, m in enumerate(tf):
        if not m:
            continue
        score = 0
        for q, f in m.items():
            idf = (1000 * (2 * n - 2 * df[q] + 1)) // (2 * df[q] + 1)
            sat = (22000 * f * t_all) // (
                10 * f * t_all + 3 * t_all + 9 * dl[i] * n
            )
            score += idf * sat
        rows.append((i, len(m), score))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return [(d, nt, s, r + 1) for r, (d, nt, s) in enumerate(rows[:topk])]


def test_bm25_matches_python_mirror(spark):
    texts = [
        "apple banana apple cherry",
        "banana banana banana dog",
        "cherry dog apple apple apple",
        "unrelated words only here",
        "apple",
    ]
    terms = ("apple", "dog")
    got = [tuple(r) for r in bm25_topk(_docs(spark, texts), "doc_id", "text", terms, topk=4).collect()]
    assert got == _mirror(texts, terms, 4)


def test_bm25_rare_term_outranks_common(spark):
    # 'rare' appears in 1 of 10 docs; 'common' in all. One hit of the
    # rare term must outscore one hit of the common term.
    texts = ["common filler text"] * 9 + ["common rare text"]
    got = bm25_topk(
        _docs(spark, texts), "doc_id", "text", ("rare", "common"), topk=10
    ).collect()
    assert got[0].doc_id == 9 and got[0].n_terms == 2
    # All common-only docs tie; ties break by doc_id ascending.
    rest = [r.doc_id for r in got[1:]]
    assert rest == sorted(rest)


def test_bm25_length_normalization(spark):
    # Same tf for 'x', shorter doc scores higher (b > 0).
    texts = ["x y", "x y y y y y y y y y y y y y y y"]
    got = bm25_topk(_docs(spark, texts), "doc_id", "text", ("x",), topk=2).collect()
    assert [r.doc_id for r in got] == [0, 1]
    assert got[0].bm25_micro > got[1].bm25_micro


def test_bm25_plan_broadcasts_stats(spark):
    # df + corpus totals are broadcast; no corpus-sized non-key join.
    df = bm25_topk(
        _docs(spark, ["a b c", "b c d", "c d e"]), "doc_id", "text", ("b", "d")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---- temperature_mixture ----

import math  # noqa: E402

from cell_kn_mvp_etl_results_spark.operators.textanalysis import (  # noqa: E402
    temperature_mixture,
)


def test_temperature_mixture_matches_python_mirror(spark):
    texts = {
        "big": ["w " * 400] * 50,  # ~20k tokens
        "mid": ["w " * 100] * 20,  # ~2k tokens
        "tiny": ["w " * 10] * 5,  # ~50 tokens
    }
    rows = [
        (i, src, t.strip())
        for i, (src, t) in enumerate(
            (s, t) for s, ts in texts.items() for t in ts
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.source: (r.n_tokens, r.weight, r.alloc_tokens, r.epochs_permille)
        for r in temperature_mixture(df, "source", "text").collect()
    }
    ntok = {s: sum(len(t.split()) for t in ts) for s, ts in texts.items()}
    w = {s: math.isqrt(n) for s, n in ntok.items()}
    t_all, w_sum = sum(ntok.values()), sum(w.values())
    for s in texts:
        alloc = ((t_all // 2) * w[s]) // w_sum
        assert got[s] == (ntok[s], w[s], alloc, alloc * 1000 // ntok[s])
    # Temperature property: the tiny source is upsampled relative to
    # proportional allocation, the big one downsampled.
    assert got["tiny"][3] > 500  # > the flat budget_div=2 epoch rate
    assert got["big"][3] < 500
