"""Product quantization (PQ) — the compressed-domain ANN posture for
corpora whose raw embeddings don't fit the cluster.

IVF (``similarity.ivf_topk``) prunes WHICH vectors a query scores; PQ
compresses WHAT is stored and scored: each vector is split into ``m``
subvectors, each subvector is replaced by the id of its nearest
codeword from a per-subspace codebook of ``k`` centroids (Jégou,
Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011). A 64-dim float vector (256 B) becomes ``m`` small codes
(4 B at m=4/k=8, 8 B at m=8/k=256) — the difference between an
embedding table that must live on disk and one that fits in executor
memory at 100 TB corpus scale. Queries score candidates with an
asymmetric-distance lookup table (ADC): ``m × k`` exact
query-to-codeword distances computed once per query, after which every
candidate's approximate distance is ``m`` table lookups + adds — no
per-candidate float math at all.

Determinism doctrine (plans/registry.py): codebooks are trained with
the SAME integer-exact Lloyd as ``clustering.kmeans_integer`` (one fit
per subspace over the sliced subvectors — identical quantization,
lowest-id init, floor-mean updates, lowest-cluster tie-breaks), so
codes, LUTs, and ADC distances are bit-identical across engines and
partitionings.

Scale shape:
- TRAIN: m tiny fits; per round one map-side assignment + one
  ≤ k × (dim/m)-group aggregation each (at 100 TB you train on a
  sample — the codebook is a model artifact, like the IVF centroids).
- ENCODE: one projection of the corpus against m × k centroid
  LITERALS — no join, no shuffle; the m-code tuple is the only thing
  written. This is the map-side posture the reference's tuple
  generators use for vocabulary lookups.
- QUERY (ADC): the LUT is driver-built from the collected query rows
  (n_queries × m × k ints, thousands of times under the 1M-row collect
  guard) and folded back in as literal arrays, so scoring is again a
  pure projection (element_at per subspace + integer adds) exploded
  per query; the only exchange is the per-query top-k window, which
  compiles to WindowGroupLimit (each map partition forwards at most
  n_queries × topk rows).

Reference parity: the reference has no ANN surface; PQ extends the
brief's similarity-search family alongside brute-force cosine, IVF,
and sign-LSH (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .clustering import (
    _argmin_cluster_sql,
    _dists_array_sql,
    kmeans_fit,
)

__all__ = ["pq_fit", "pq_encode", "pq_topk", "ivfpq_topk"]


def _code_col(books: list[dict[int, list[int]]], s: int, d: int):
    """Map-side nearest-codeword argmin for subspace ``s`` over the
    quantized vector column ``q`` — ties toward the lowest code, the
    ``kmeans_integer`` convention. Built as one SQL-text parse (the
    clustering._sq_dist_sql doctrine): the k x dim/m codeword literals
    cost one JVM parse instead of hundreds of py4j calls per call."""
    dists = _dists_array_sql(f"slice(q, {s * d + 1}, {d})", books[s])
    return F.expr(f"CAST({_argmin_cluster_sql(dists)} AS BIGINT)")


def pq_encode(
    emb: DataFrame,
    books: list[dict[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    quantize: int = 4,
) -> DataFrame:
    """ENCODE against trained codebooks: the serving half of ``pq_fit``
    — a single map-side projection of the corpus to
    (id, q, code_0..code_{m-1}), no join, no shuffle, no driver sync.
    Row-identical to the codes frame ``pq_fit`` returns for the same
    ``books`` (the codebooks are the model artifact; training per query
    call was 3 corpus jobs per rebuild-regime run —
    OPTIMIZATION_r12.md)."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    d = dim // m
    scale = 10**quantize
    q = emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * scale).cast("long"),
        ).alias("q"),
    )
    return q.select(
        "id", "q", *[_code_col(books, s, d).alias(f"code_{s}") for s in range(m)]
    )


def pq_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    quantize: int = 4,
) -> tuple[DataFrame, list[dict[int, list[int]]]]:
    """Train per-subspace codebooks and encode the corpus.

    Returns (codes DataFrame (id, q, code_0..code_{m-1}) — quantized
    vector retained for downstream exact re-ranking — and the m
    codebooks as [{code: [int components]}]). Encoding is a single
    map-side projection; ties break toward the lowest code, matching
    ``kmeans_integer``'s argmin.

    All m codebooks train in ONE corpus pass per round (the FAISS
    layout): assignment is a map-side argmin per subspace against
    codeword literals, and the update is a single aggregation keyed
    (subspace, code, pos) — at most m × k × dim/m groups, map-side
    combined — rather than m separate Lloyd jobs. Per-subspace
    membership, floor-mean updates, and tie-breaks are identical to
    running ``clustering.kmeans_fit`` on each sliced subvector (the
    subspaces don't interact), so the unrolled per-subspace oracle
    still gates it bit-exactly.
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1 and iters >= 0, got k={k} iters={iters}")
    d = dim // m
    scale = 10**quantize
    q = emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * scale).cast("long"),
        ).alias("q"),
    ).persist()
    # Init: the k lowest-id vectors seed EVERY subspace (their slices),
    # code index = rank order — the kmeans_fit convention.
    init = q.orderBy("id").limit(k).collect()
    if len(init) < k:
        q.unpersist()
        raise ValueError(f"pq_fit: need >= k={k} vectors, got {len(init)}")
    books: list[dict[int, list[int]]] = [
        {j: list(init[j].q)[s * d : (s + 1) * d] for j in range(k)}
        for s in range(m)
    ]

    def code_col(s: int):
        return _code_col(books, s, d)

    for _ in range(iters):
        assigned = q.select(
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            code_col(s).alias("code"),
                            F.slice(F.col("q"), s * d + 1, d).alias("sub"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("s", "x")
        ).select(
            "s",
            F.col("x.code").alias("cluster"),
            F.posexplode("x.sub").alias("pos", "val"),
        )
        upd = assigned.groupBy("s", "cluster", "pos").agg(
            F.expr(
                "CAST(floor(CAST(sum(val) AS DOUBLE) / count(1)) AS BIGINT)"
            ).alias("cval")
        )
        by_sc: dict[tuple[int, int], dict[int, int]] = {}
        for r in upd.collect():  # <= m x k x dim/m rows
            by_sc.setdefault((int(r.s), int(r.cluster)), {})[int(r.pos)] = int(
                r.cval
            )
        for (s, j), posmap in by_sc.items():
            books[s][j] = [posmap[p] for p in range(len(posmap))]
        # (s, code) cells absent from upd keep their previous codeword
    codes = q.select(
        "id", "q", *[code_col(s).alias(f"code_{s}") for s in range(m)]
    )
    # Driver syncs done: release the cached quantization (kmeans_fit's
    # loop-state hygiene) — the returned plan recomputes the map-side
    # projection once when the caller executes it.
    q.unpersist()
    return codes, books


def pq_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    quantize: int = 4,
    n_queries: int = 4,
    topk: int = 5,
    books: list[dict[int, list[int]]] | None = None,
    query_rows: list | None = None,
) -> DataFrame:
    """ADC top-k: each of the first ``n_queries`` vectors (id <
    n_queries) retrieves its ``topk`` nearest OTHER vectors by
    asymmetric PQ distance. Returns (q_id, cand_id, rank, adc_d2),
    rank 1-based in (adc_d2, cand_id) order.

    The LUT fold-back keeps scoring a pure projection (see module
    docstring); approximate by construction — exact re-ranking of the
    survivors (cosine_topk over topk × n_queries rows) is the standard
    second stage.

    ``books``/``query_rows``: a pretrained codebook list and the
    collected (id, q) query rows — the serving path (plans/models.py
    registry): training and the query-side collect are per-corpus
    state, so a serving call is one encode projection + the top-k
    window. Omitted → trained/collected inline (row-identical; the
    from-scratch path the oracle checks either way).
    """
    if books is None:
        codes, codebooks = pq_fit(
            emb, id_col, vec_col, dim, m, k, iters, quantize
        )
    else:
        codebooks = books
        codes = pq_encode(emb, books, id_col, vec_col, dim, m, quantize)
    d = dim // m
    qrows = (
        query_rows
        if query_rows is not None
        else codes.filter(F.col("id") < n_queries).select("id", "q").collect()
    )
    if not qrows:
        raise ValueError("pq_topk: no query vectors with id < n_queries")
    # LUT fold-back as ONE SQL-text parse (clustering._sq_dist_sql
    # doctrine): the n_queries x m x k lookup-table literals cost one
    # JVM parse instead of a py4j call per literal.
    structs = []
    for r in sorted(qrows, key=lambda r: r.id):
        qv = list(r.q)
        terms = []
        for s in range(m):
            sub = qv[s * d : (s + 1) * d]
            lut = [
                sum((a - b) * (a - b) for a, b in zip(sub, codebooks[s][j]))
                for j in sorted(codebooks[s])
            ]
            lits = ", ".join(f"{int(v)}L" for v in lut)
            terms.append(
                f"element_at(array({lits}), CAST((code_{s} + 1) AS INT))"
            )
        adc = " + ".join(terms)
        structs.append(
            f"named_struct('q_id', {int(r.id)}L, "
            f"'adc_d2', CAST({adc} AS BIGINT))"
        )
    scored = (
        codes.select(
            "id", F.explode(F.expr(f"array({', '.join(structs)})")).alias("x")
        )
        .select(
            F.col("x.q_id").alias("q_id"),
            F.col("id").alias("cand_id"),
            F.col("x.adc_d2").alias("adc_d2"),
        )
        .filter(F.col("cand_id") != F.col("q_id"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_d2", "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("q_id", "cand_id", "rank", "adc_d2")
        .orderBy("q_id", "rank")
    )


def ivfpq_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    coarse_k: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    quantize: int = 4,
    n_probe: int = 2,
    n_queries: int = 4,
    topk: int = 3,
    books: list[dict[int, list[int]]] | None = None,
    coarse_cents: dict[int, list[int]] | None = None,
    query_rows: list | None = None,
) -> DataFrame:
    """IVF-PQ: the serving structure of large-scale ANN (FAISS's
    IndexIVFPQ). The coarse quantizer (integer-Lloyd cells) prunes
    WHICH vectors a query touches — each query probes its ``n_probe``
    nearest cells by exact centroid distance — and PQ codes compress
    WHAT is scored inside those cells (ADC lookups, no float math).
    Returns (q_id, cand_id, rank, adc_d2) for the first ``n_queries``
    vectors, rank 1-based in (adc_d2, cand_id) order over the probed
    candidates only (recall < 1 by construction; tune n_probe).

    Scale shape: everything is a projection. The coarse cell id is a
    map-side argmin against ``coarse_k`` centroid literals ON the
    codes frame (no corpus self-join with the kmeans assignment);
    probe sets and LUTs are driver-built from the collected query rows
    and folded back as literals, so per-candidate work is a cell-set
    membership test + m array lookups; the only exchange is the
    per-query top-k WindowGroupLimit. At 100 TB you additionally
    partition the codes table BY cell id so a probe reads only its
    cells' files — the layout ``sinks.write_graph`` applies to
    collection pairs, applied to cells.

    ``books``/``coarse_cents``/``query_rows``: pretrained PQ codebooks,
    coarse centroids, and collected (id, q) query rows — the serving
    path (plans/models.py); omitted → trained/collected inline
    (row-identical).
    """
    if books is None:
        codes, books = pq_fit(emb, id_col, vec_col, dim, m, k, iters, quantize)
    else:
        codes = pq_encode(emb, books, id_col, vec_col, dim, m, quantize)
    coarse = coarse_cents
    if coarse is None:
        _, coarse = kmeans_fit(
            emb, id_col, vec_col, k=coarse_k, iters=coarse_iters, quantize=quantize
        )
    cell_dists = _dists_array_sql("q", coarse)
    enriched = codes.withColumn(
        "cell", F.expr(_argmin_cluster_sql(cell_dists))
    )
    d = dim // m
    qrows = (
        query_rows
        if query_rows is not None
        else codes.filter(F.col("id") < n_queries).select("id", "q").collect()
    )
    if not qrows:
        raise ValueError("ivfpq_topk: no query vectors with id < n_queries")
    # Probe sets + LUTs folded back as ONE SQL-text parse (the pq_topk
    # shape, plus the per-query probed-cell membership test).
    structs = []
    for r in sorted(qrows, key=lambda r: r.id):
        qv = list(r.q)
        pd2 = [
            (sum((a - b) * (a - b) for a, b in zip(qv, coarse[j])), j)
            for j in sorted(coarse)
        ]
        probe_cells = [j for _, j in sorted(pd2)[:n_probe]]
        terms = []
        for s in range(m):
            sub = qv[s * d : (s + 1) * d]
            lut = [
                sum((a - b) * (a - b) for a, b in zip(sub, books[s][j]))
                for j in sorted(books[s])
            ]
            lits = ", ".join(f"{int(v)}L" for v in lut)
            terms.append(
                f"element_at(array({lits}), CAST((code_{s} + 1) AS INT))"
            )
        adc = " + ".join(terms)
        probes = ", ".join(str(int(c)) for c in probe_cells)
        structs.append(
            f"named_struct('q_id', {int(r.id)}L, "
            f"'adc_d2', CAST({adc} AS BIGINT), "
            f"'probed', cell IN ({probes}))"
        )
    scored = (
        enriched.select(
            "id", F.explode(F.expr(f"array({', '.join(structs)})")).alias("x")
        )
        .filter(F.col("x.probed") & (F.col("id") != F.col("x.q_id")))
        .select(
            F.col("x.q_id").alias("q_id"),
            F.col("id").alias("cand_id"),
            F.col("x.adc_d2").alias("adc_d2"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("adc_d2", "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("q_id", "cand_id", "rank", "adc_d2")
        .orderBy("q_id", "rank")
    )
