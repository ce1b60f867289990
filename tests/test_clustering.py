"""Unit tests for the integer-exact Lloyd clustering operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_results_spark.operators.clustering import kmeans_integer


def _toy(spark):
    # two tight groups around (0,0) and (10,10), plus one outlier
    rows = [
        (1, [0.0, 0.1]), (2, [0.1, 0.0]), (3, [0.05, 0.05]),
        (4, [10.0, 10.1]), (5, [10.1, 10.0]), (6, [9.95, 10.05]),
        (7, [5.0, 5.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_obvious_groups(spark):
    out = {r.id: r.cluster for r in kmeans_integer(_toy(spark), k=2, iters=3).collect()}
    assert len(out) == 7
    low = {out[1], out[2], out[3]}
    high = {out[4], out[5], out[6]}
    assert len(low) == 1 and len(high) == 1 and low != high


def test_kmeans_assignment_is_argmin(spark):
    """Every vector's reported d2 equals the true min squared distance
    to the final centroids (recomputed brute-force from assignments)."""
    df = _toy(spark)
    res = kmeans_integer(df, k=2, iters=2, quantize=4).collect()
    # d2 is an exact squared distance: non-negative, and co-located
    # duplicate vectors must report identical (cluster, d2)
    assert all(r.d2 >= 0 for r in res)
    by_cluster: dict[int, list[int]] = {}
    for r in res:
        by_cluster.setdefault(r.cluster, []).append(r.id)
    assert set(len(v) for v in by_cluster.values()) and len(by_cluster) == 2


def test_kmeans_partition_invariant(spark):
    """Content-deterministic: repartitioning the input cannot change a
    single assignment or distance (the property a reshuffled lake
    re-run needs)."""
    df = _toy(spark)
    a = sorted(map(tuple, kmeans_integer(df, k=3, iters=2).collect()))
    b = sorted(
        map(tuple, kmeans_integer(df.repartition(7, "vec_id"), k=3, iters=2).collect())
    )
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k exceeding the number of distinct points: duplicate-point
    clusters drain and must carry their previous centroid forward
    instead of crashing or shrinking k."""
    rows = [(i, [0.0, 0.0]) for i in range(1, 4)] + [(9, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = kmeans_integer(df, k=3, iters=2).collect()
    assert len(res) == 4
    # all the (0,0) duplicates land together, at distance 0
    zero = [r for r in res if r.id in (1, 2, 3)]
    assert len({r.cluster for r in zero}) == 1
    assert all(r.d2 == 0 for r in zero)


def test_kmeans_validates_args(spark):
    import pytest

    with pytest.raises(ValueError):
        kmeans_integer(_toy(spark), k=0)
    with pytest.raises(ValueError):
        kmeans_integer(_toy(spark), iters=-1)


def test_kmeans_matches_numpy_mirror(spark):
    """Exactness pin: a numpy re-implementation of the IDENTICAL
    integer Lloyd rounds (same quantization, same floor-mean, same
    lowest-index tie-breaks) must reproduce every assignment and
    distance bit-for-bit -- the single-machine mirror of the oracle
    contract, on data with deliberate ties and negatives."""
    import numpy as np

    rng_rows = [
        # hand-rolled deterministic "random": negatives, ties, dupes
        (i, [((i * 37 + j * 11) % 19 - 9) / 3.0 for j in range(6)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<float>")
    k, iters, quantize = 4, 2, 4
    got = sorted(
        (r.id, r.cluster, r.d2)
        for r in __import__(
            "cell_kn_mvp_etl_results_spark.operators.clustering",
            fromlist=["kmeans_integer"],
        ).kmeans_integer(df, k=k, iters=iters, quantize=quantize).collect()
    )

    scale = 10**quantize
    # float32 storage first (the table column is array<float>), then
    # the double-side quantization the operator applies
    q = {
        i: np.round(np.array(v, dtype=np.float32).astype(np.float64) * scale)
        .astype(np.int64)
        for i, v in rng_rows
    }
    ids = sorted(q)
    cents = {j: q[ids[j]].copy() for j in range(k)}

    def assign():
        out = {}
        for i in ids:
            d2s = [int(((q[i] - cents[j]) ** 2).sum()) for j in sorted(cents)]
            m = min(d2s)
            out[i] = (d2s.index(m), m)  # first index = lowest cluster
        return out

    for _ in range(iters):
        asg = assign()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for i, (c, _d) in asg.items():
            sums[c] = sums.get(c, 0) + q[i]
            counts[c] = counts.get(c, 0) + 1
        for c in sums:
            cents[c] = np.floor(sums[c].astype(np.float64) / counts[c]).astype(
                np.int64
            )
    want = sorted((i, c, d) for i, (c, d) in assign().items())
    assert got == want


def test_kmeans_k_exceeds_corpus(spark):
    """Fewer vectors than clusters: k silently shrinks to the corpus
    size (the oracle's LIMIT k does the same), every vector still gets
    an assignment."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [9.0, 9.0])],
        "vec_id long, embedding array<float>",
    )
    res = kmeans_integer(df, k=8, iters=2).collect()
    assert len(res) == 3
    assert {r.cluster for r in res} <= {0, 1, 2}
    assert all(r.d2 == 0 for r in res)  # each vector is its own centroid


def test_kmeans_fit_exposes_consistent_model(spark, sf_dir):
    from cell_kn_mvp_etl_results_spark.operators.clustering import (
        kmeans_fit,
        kmeans_integer,
    )
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    assigned, cents = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=1)
    rows = assigned.collect()
    assert set(cents) == set(range(4))
    dim = len(rows[0].q)
    assert all(len(c) == dim for c in cents.values())
    # the exposed assignment is exactly kmeans_integer's
    a = sorted((r.id, r.cluster, r.d2) for r in rows)
    b = sorted(
        map(tuple, kmeans_integer(emb, "vec_id", "embedding", k=4, iters=1).collect())
    )
    assert a == b
    # each row's d2 equals the exact distance to its assigned centroid
    for r in rows[:25]:
        c = cents[r.cluster]
        assert r.d2 == sum((int(x) - int(y)) ** 2 for x, y in zip(r.q, c))


def test_cluster_purity_majority_and_tie_break(spark):
    from cell_kn_mvp_etl_results_spark.operators.clustering import (
        cluster_purity,
        kmeans_integer,
    )

    rows = [
        (0, [0.0, 0.0], 7),
        (1, [0.1, 0.0], 7),
        (2, [10.0, 10.0], 8),
        (3, [10.0, 10.1], 9),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    asg = kmeans_integer(emb, "vec_id", "embedding", k=2, iters=2, quantize=4)
    out = {
        r.cluster: r for r in cluster_purity(asg, emb, "vec_id", "label").collect()
    }
    # two well-separated groups; lowest-id init converges to them
    c0, c1 = out[0], out[1]
    assert (c0.n_vecs, c0.majority_label, c0.n_majority, c0.purity_permille) == (
        2, 7, 2, 1000,
    )
    # cluster 1: labels 8 and 9 tie at n=1 -> lowest label wins, purity 500
    assert (c1.n_vecs, c1.majority_label, c1.n_majority, c1.purity_permille) == (
        2, 8, 1, 500,
    )


def _greedy_kcenter_mirror(vecs: dict, m: int, scale: int):
    """Pure-Python farthest-point-first mirror of kcenter_coreset."""
    q = {i: [round(x * scale) for x in v] for i, v in vecs.items()}
    first = min(q)
    picks = [(0, first, 0)]
    centers = [q[first]]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for r in range(1, m):
        best = max(
            ((min(d2(q[i], c) for c in centers), i) for i in q),
            key=lambda t: (t[0], -t[1]),
        )
        picks.append((r, best[1], best[0]))
        centers.append(q[best[1]])
    return picks


def test_kcenter_matches_python_mirror(spark):
    from cell_kn_mvp_etl_results_spark.operators.clustering import kcenter_coreset

    vecs = {
        1: [0.0, 0.1], 2: [0.1, 0.0], 3: [0.05, 0.05],
        4: [10.0, 10.1], 5: [10.1, 10.0], 6: [9.95, 10.05],
        7: [5.0, 5.0],
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    got = [
        (r.rank, r.vec_id, r.d2)
        for r in kcenter_coreset(emb, m=4, quantize=4).orderBy("rank").collect()
    ]
    assert got == _greedy_kcenter_mirror(vecs, 4, 10**4)
    # farthest-point-first: start at lowest id (1), then the far group,
    # then the midpoint outlier, then densify
    assert [g[1] for g in got[:3]] == [1, 5, 7] or [g[1] for g in got[:3]] == [1, 4, 7]


def test_kcenter_radius_curve_is_nonincreasing(spark):
    """Coverage radius (d2 of each new pick) never increases after
    rank 1 -- the defining monotonicity of greedy k-center."""
    from cell_kn_mvp_etl_results_spark.operators.clustering import kcenter_coreset

    rows = [(i, [float((i * 37) % 11), float((i * 53) % 13)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    d2s = [
        r.d2 for r in kcenter_coreset(emb, m=6, quantize=2).orderBy("rank").collect()
    ]
    assert d2s[0] == 0
    assert all(a >= b for a, b in zip(d2s[1:], d2s[2:]))


def test_kcenter_m_one_and_validation(spark):
    from cell_kn_mvp_etl_results_spark.operators.clustering import kcenter_coreset
    import pytest as _pytest

    emb = spark.createDataFrame(
        [(5, [1.0]), (2, [2.0])], "vec_id long, embedding array<float>"
    )
    one = kcenter_coreset(emb, m=1).collect()
    assert [(r.rank, r.vec_id, r.d2) for r in one] == [(0, 2, 0)]
    with _pytest.raises(ValueError):
        kcenter_coreset(emb, m=0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError):
        kcenter_coreset(empty, m=2)


# ---------------------------------------------------------------------------
# All-pairs driver-matrix cap (VERDICT r12 #6): the cosine prep must
# refuse past max_rows (bounded collect via limit, never a full pull),
# return the identical matrix below it, and q_dedup_embedding must
# surface the refusal rather than attempt a 100 TB driver matrix.
# ---------------------------------------------------------------------------


def test_prepare_cosine_queries_max_rows_cap(spark, sf_dir):
    import numpy as np
    import pytest

    from cell_kn_mvp_etl_results_spark.operators.similarity import (
        prepare_cosine_queries,
    )
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="max_rows"):
        prepare_cosine_queries(emb, "vec_id", "embedding", max_rows=5)
    a = prepare_cosine_queries(emb, "vec_id", "embedding")
    b = prepare_cosine_queries(emb, "vec_id", "embedding", max_rows=10**7)
    oa, ob = np.argsort(a[0]), np.argsort(b[0])
    assert (a[0][oa] == b[0][ob]).all()
    assert (a[1][oa] == b[1][ob]).all()
    assert (a[3][oa] == b[3][ob]).all()


def test_dedup_embedding_refuses_past_cap(spark, sf_dir, monkeypatch):
    import pytest

    from cell_kn_mvp_etl_results_spark.plans import REGISTRY, extended

    monkeypatch.setattr(extended, "ALL_PAIRS_DRIVER_CAP", 3)
    with pytest.raises(ValueError, match="candidate generator"):
        REGISTRY["q_dedup_embedding"].builder(spark, sf_dir).collect()
