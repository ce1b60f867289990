"""Unit tests for operators/pq — product quantization ANN.

The registry-level oracle parity (tests/test_oracle_parity.py,
q_pq_topk) pins the full unrolled-Lloyd + ADC pipeline against DuckDB;
here we pin the operator contracts on small hand-built corpora: code
ranges/shape, the encode-vs-codebook argmin, ADC's exactness when the
corpus IS the codebook, and determinism under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.pq import pq_fit, pq_topk


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_fit_shapes_and_ranges(spark):
    # 8 vectors, dim 8, m=2 subspaces, k=2 codewords.
    vecs = [[float(i)] * 8 for i in range(8)]
    codes, books = pq_fit(
        _emb(spark, vecs), dim=8, m=2, k=2, iters=1, quantize=2
    )
    assert len(books) == 2 and all(len(b) == 2 for b in books)
    assert all(len(c) == 4 for b in books for c in b.values())  # dim/m
    rows = codes.collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r.code_0 < 2 and 0 <= r.code_1 < 2


def test_pq_encode_matches_manual_argmin(spark):
    vecs = [[float(i)] * 8 for i in range(8)]
    codes, books = pq_fit(
        _emb(spark, vecs), dim=8, m=2, k=2, iters=1, quantize=2
    )
    for r in codes.collect():
        qv = list(r.q)
        for s, book in enumerate(books):
            sub = qv[s * 4 : (s + 1) * 4]
            dists = [
                (sum((a - b) * (a - b) for a, b in zip(sub, book[j])), j)
                for j in sorted(book)
            ]
            want = min(dists)[1]  # ties -> lowest code
            assert getattr(r, f"code_{s}") == want, (r.id, s)


def test_pq_adc_exact_when_corpus_is_codebook(spark):
    # With k >= n_vectors and enough iters, every vector becomes its own
    # codeword, so ADC distance == exact quantized distance.
    vecs = [
        [0.0, 0.0, 1.0, 1.0],
        [2.0, 2.0, 3.0, 3.0],
        [10.0, 10.0, 11.0, 11.0],
    ]
    got = pq_topk(
        _emb(spark, vecs),
        dim=4,
        m=2,
        k=3,
        iters=2,
        quantize=1,
        n_queries=1,
        topk=2,
    ).collect()
    # q=0: exact quantized d2 to v1 = 2*(20^2)+2*(20^2)=1600; to v2 = 2*(100^2)*2=40000
    assert [(r.cand_id, r.rank, r.adc_d2) for r in got] == [
        (1, 1, 1600),
        (2, 2, 40000),
    ]


def test_pq_topk_deterministic_under_repartition(spark):
    vecs = [[float((i * 7 + j * 3) % 5) for j in range(8)] for i in range(20)]
    emb = _emb(spark, vecs)
    a = pq_topk(emb, dim=8, m=4, k=4, iters=2, quantize=2, n_queries=2, topk=3)
    b = pq_topk(
        emb.repartition(7),
        dim=8,
        m=4,
        k=4,
        iters=2,
        quantize=2,
        n_queries=2,
        topk=3,
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_pq_scoring_plan_has_no_join(spark):
    # Scale contract: after the driver-side LUT fold-back, scoring is a
    # pure projection + WindowGroupLimit -- no join anywhere in the
    # ADC read path.
    vecs = [[float(i % 3)] * 8 for i in range(12)]
    df = pq_topk(
        _emb(spark, vecs), dim=8, m=2, k=2, iters=1, quantize=2,
        n_queries=2, topk=3,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


# ---- ivfpq_topk ----

from cell_kn_mvp_etl_results_spark.operators.pq import ivfpq_topk  # noqa: E402


def test_ivfpq_subset_of_pq_with_full_probe(spark):
    # With n_probe == coarse_k every cell is probed, so IVF-PQ must
    # reproduce plain PQ ADC ranking exactly.
    vecs = [[float((i * 7 + j * 3) % 5) for j in range(8)] for i in range(20)]
    emb = _emb(spark, vecs)
    full = ivfpq_topk(
        emb, dim=8, coarse_k=4, coarse_iters=1, m=4, k=4, iters=1,
        quantize=2, n_probe=4, n_queries=2, topk=3,
    )
    plain = pq_topk(
        emb, dim=8, m=4, k=4, iters=1, quantize=2, n_queries=2, topk=3
    )
    assert [tuple(r) for r in full.collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_ivfpq_probes_restrict_candidates(spark):
    # Two well-separated blobs: with n_probe=1 a query in blob A must
    # only retrieve blob-A members.
    vecs = [[0.0 + 0.01 * i] * 8 for i in range(6)] + [
        [100.0 + 0.01 * i] * 8 for i in range(6)
    ]
    got = ivfpq_topk(
        _emb(spark, vecs), dim=8, coarse_k=2, coarse_iters=2, m=2, k=2,
        iters=2, quantize=1, n_probe=1, n_queries=1, topk=5,
    ).collect()
    assert len(got) == 5
    assert all(r.cand_id < 6 for r in got)  # blob A only


def test_ivfpq_scoring_plan_is_join_free(spark):
    vecs = [[float(i % 4)] * 8 for i in range(16)]
    df = ivfpq_topk(
        _emb(spark, vecs), dim=8, coarse_k=2, coarse_iters=1, m=2, k=2,
        iters=1, quantize=1, n_probe=1, n_queries=2, topk=2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
