"""Unit tests for distributed BPE merge training."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.bpe import SEP, bpe_train_merges


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_bpe_known_merge_sequence(spark):
    # words: aa (x2), ab (x1) -> pairs (a,a):2 beat (a,b):1; after the
    # merge only ab still has a pair -> (a,b):1
    out = bpe_train_merges(_docs(spark, ["aa aa ab"]), n_merges=2).collect()
    assert [(r.step, r.left, r.right, r.merged, r.pair_count) for r in out] == [
        (1, "a", "a", "aa", 2),
        (2, "a", "b", "ab", 1),
    ]


def test_bpe_tie_breaks_to_smallest_pair(spark):
    # (a,b) and (c,d) both count 2: the lexicographically smaller wins
    out = bpe_train_merges(_docs(spark, ["ab cd ab cd"]), n_merges=1).collect()
    assert (out[0].left, out[0].right) == ("a", "b")


def test_bpe_canonical_single_pass_merge(spark):
    # 'aaa' (x3): round 1 pairs (a,a) count 6; after merging, each word
    # is [aa, a] -> round 2's top pair is (aa, a) with count 3 -- the
    # canonical left-to-right non-overlapping semantics
    out = bpe_train_merges(_docs(spark, ["aaa aaa aaa"]), n_merges=2).collect()
    assert (out[0].left, out[0].right, out[0].pair_count) == ("a", "a", 6)
    assert (out[1].left, out[1].right, out[1].merged, out[1].pair_count) == (
        "aa", "a", "aaa", 3,
    )


def test_bpe_partition_invariant(spark):
    texts = ["the quick brown fox", "the lazy dog the end", "quick quick"]
    a = bpe_train_merges(_docs(spark, texts), n_merges=4).collect()
    b = bpe_train_merges(
        _docs(spark, texts).repartition(7), n_merges=4
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_zero_merges_and_validation(spark):
    import pytest

    assert bpe_train_merges(_docs(spark, ["abc"]), n_merges=0).count() == 0
    with pytest.raises(ValueError):
        bpe_train_merges(_docs(spark, ["abc"]), n_merges=-1)


def test_bpe_exhausts_pairs_gracefully(spark):
    # single-char vocabulary: no pairs exist, training stops early
    out = bpe_train_merges(_docs(spark, ["a b c a"]), n_merges=5).collect()
    assert out == []


def _iddocs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_bpe_apply_reproduces_training_segmentation(spark):
    from cell_kn_mvp_etl_results_spark.operators.bpe import bpe_apply

    texts = ["the quick brown fox", "the lazy dog the end", "quick quick"]
    merges = [tuple(r) for r in bpe_train_merges(_docs(spark, texts), n_merges=4).collect()]
    out = {
        r.doc_id: (list(r.subwords), r.n_subwords)
        for r in bpe_apply(_iddocs(spark, texts), merges).collect()
    }
    # every doc present; subword concatenation reproduces the tokens in
    # document order; n_subwords consistent
    for i, text in enumerate(texts):
        subwords, n = out[i]
        assert n == len(subwords)
        joined = "".join(subwords)
        assert joined == text.replace(" ", "")
    # the learned merges actually merged something: at least one
    # multi-char subword appears
    assert any(len(s) > 1 for sw, _ in out.values() for s in sw)


def test_bpe_apply_order_and_partition_invariant(spark):
    from cell_kn_mvp_etl_results_spark.operators.bpe import bpe_apply

    texts = ["aa ab aa ba", "ab aa"]
    merges = [tuple(r) for r in bpe_train_merges(_docs(spark, texts), n_merges=2).collect()]
    a = {r.doc_id: list(r.subwords) for r in bpe_apply(_iddocs(spark, texts), merges).collect()}
    b = {
        r.doc_id: list(r.subwords)
        for r in bpe_apply(_iddocs(spark, texts).repartition(5), merges).collect()
    }
    assert a == b  # position-keyed reassembly, not shuffle order


def test_bpe_apply_empty_merges_is_characters(spark):
    from cell_kn_mvp_etl_results_spark.operators.bpe import bpe_apply

    out = bpe_apply(_iddocs(spark, ["ab c"]), []).collect()
    assert list(out[0].subwords) == ["a", "b", "c"]


def test_bpe_apply_agrees_with_segment_counts(spark):
    """The two apply paths -- in-query train+segment (bpe_segment_counts)
    and pretrained-merge bpe_apply -- must report identical token
    budgets for the same corpus and merge count."""
    from cell_kn_mvp_etl_results_spark.operators.bpe import (
        bpe_apply,
        bpe_segment_counts,
    )

    rows = [
        (0, "alpha", "the quick brown fox jumps"),
        (1, "alpha", "the quick quick end"),
        (2, "beta", "lazy dogs and lazy cats"),
        (3, "beta", "the lazy end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    merges = [
        tuple(r) for r in bpe_train_merges(df, "text", n_merges=4).collect()
    ]
    per_doc = bpe_apply(df, merges).collect()
    by_src = {}
    doc_src = {r[0]: r[1] for r in rows}
    for r in per_doc:
        s = doc_src[r.doc_id]
        w, sub = by_src.get(s, (0, 0))
        by_src[s] = (w + len([1 for _ in r.subwords]), sub + r.n_subwords)
    counts = {
        r.source: (r.n_words, r.n_subwords)
        for r in bpe_segment_counts(df, "text", "source", n_merges=4).collect()
    }
    # n_subwords must match exactly per source
    assert {s: v[1] for s, v in by_src.items()} == {
        s: v[1] for s, v in counts.items()
    }


def test_bpe_batched_accepts_disjoint_pairs_per_round(spark):
    # (a,b):2 and (c,d):2 are symbol-disjoint: batch=2 learns both in
    # ONE recount round with the same table sequential training gives.
    seq = bpe_train_merges(_docs(spark, ["ab cd ab cd"]), n_merges=2).collect()
    bat = bpe_train_merges(
        _docs(spark, ["ab cd ab cd"]), n_merges=2, batch=2
    ).collect()
    assert [tuple(r) for r in seq] == [tuple(r) for r in bat]


def test_bpe_batched_skips_symbol_conflicts(spark):
    # (a,b):3 then (b,c):2 share 'b': the batch must NOT take (b,c) at
    # its stale count; after merging (a,b), [a,b,c] words hold (ab,c).
    out = bpe_train_merges(
        _docs(spark, ["ab ab abc bc"]), n_merges=2, batch=4
    ).collect()
    seq = bpe_train_merges(_docs(spark, ["ab ab abc bc"]), n_merges=2).collect()
    assert [tuple(r) for r in seq] == [tuple(r) for r in out]


def test_bpe_batched_matches_sequential_on_gate_corpus(spark, sf_dir):
    # The r8 scale path (batch>1) reproduces the oracle-gated
    # sequential merge table on the driver's gate corpus at the gated
    # n_merges=8 -- the VERDICT r7 #6 contract.
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents")
    seq = bpe_train_merges(d, n_merges=8).collect()
    bat = bpe_train_merges(d, n_merges=8, batch=8).collect()
    assert [tuple(r) for r in seq] == [tuple(r) for r in bat]


def test_bpe_batched_matches_sequential_on_natural_vocabulary(spark):
    # VERDICT r8 #7: the certification contract at a vocabulary where
    # ties, interference, and created-pair shadowing actually occur --
    # a morphology-shaped Zipf corpus (sources/synthetic), not the
    # template-bound testdata. 96 merges, batch=16 vs batch=1, row for
    # row; also asserts the batching actually batched (rounds << merges)
    # via the stats out-param.
    from cell_kn_mvp_etl_results_spark.sources.synthetic import (
        natural_vocab_corpus,
    )

    corpus = natural_vocab_corpus(
        spark, n_words=2000, n_tokens=30_000, doc_len=128, seed=7
    ).persist()
    stats: dict = {}
    bat = bpe_train_merges(
        corpus, n_merges=96, batch=16, stats=stats
    ).collect()
    seq = bpe_train_merges(corpus, n_merges=96).collect()
    assert [tuple(r) for r in bat] == [tuple(r) for r in seq]
    assert len(bat) == 96
    assert stats["rounds"] < 96 / 2, stats
    corpus.unpersist()


def test_natural_vocab_corpus_deterministic_and_sized(spark):
    from cell_kn_mvp_etl_results_spark.sources.synthetic import (
        natural_vocab_corpus,
        natural_vocab_words,
    )

    words = natural_vocab_words(500, seed=3)
    assert len(words) == len(set(words)) == 500
    a = natural_vocab_corpus(spark, 300, 2_000, doc_len=64, seed=3)
    b = natural_vocab_corpus(spark, 300, 2_000, doc_len=64, seed=3)
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    n_tok = sum(len(t[2].split()) for t in ra)
    assert n_tok == 2_000
    vocab = {w for t in ra for w in t[2].split()}
    # Zipf sampling need not touch every rank, but must cover most.
    assert len(vocab) > 200
