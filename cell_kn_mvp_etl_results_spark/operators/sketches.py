"""Approximate aggregates for 100 TB profiling: cardinality (HLL),
frequency (count-min via stat.freqItems), and quantile sketches --
the constant-memory alternatives to exact aggregation when the answer
feeds a dashboard or a heuristic, not the correctness gate.

The built-in approximations (HLL, GK quantiles, freqItems) stay out of
the oracle registry on purpose: their results are engine- and
implementation-specific by design, so the tests bound their error
against exact answers instead. The count-min sketch below is the
exception: its hash family is the portable md5-derived scheme, so the
sketch and its estimates are bit-identical across engines and ARE
oracle-gated (q_countmin_tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> int:
    """HyperLogLog++ distinct count (constant memory per partition,
    mergeable -- the only way to count distinct over 100 TB without a
    giant shuffle)."""
    return df.select(F.approx_count_distinct(col, rsd).alias("n")).collect()[0].n


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], rel_err: float = 0.01
) -> list[float]:
    """Greenwald-Khanna quantile sketch (bounded memory, mergeable)."""
    return df.approxQuantile(col, probabilities, rel_err)


def frequent_items(df: DataFrame, col: str, support: float = 0.01) -> list:
    """Heavy hitters above the support threshold (Karp et al. algorithm
    via DataFrame.stat.freqItems) -- the skew detector: feed the result
    to salting / bucket-cap decisions."""
    row = df.stat.freqItems([col], support).collect()[0]
    return sorted(row[f"{col}_freqItems"])


def column_profile(df: DataFrame, col: str) -> dict:
    """One-pass profile used for partition sizing decisions: approx
    distinct, null fraction, min/max."""
    agg = df.select(
        F.approx_count_distinct(col).alias("approx_distinct"),
        (F.sum(F.col(col).isNull().cast("int")) / F.count(F.lit(1))).alias(
            "null_fraction"
        ),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]
    return agg.asDict()


def countmin_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Deterministic count-min sketch (Cormode & Muthukrishnan '05):
    ``depth`` independent hash rows of ``width`` integer cells; every
    key occurrence increments cell (i, h_i(key)). Returns the sparse
    cell table (i, cell, c).

    Unlike the built-in approximations above, the hash family is the
    portable md5-derived scheme (row-seeded: md5(i || ':' || key)), so
    the sketch -- and every estimate read from it -- is bit-identical
    across engines and CAN be oracle-gated.

    Scale shape: one aggregation shuffle whose key space is bounded by
    depth x width cells (constant, not corpus-sized) -- map-side
    combine collapses each task's contribution to <= depth*width rows
    before the exchange. Sketches of corpus shards merge by summing
    cells, the property that makes CMS the standard distributed
    heavy-hitter structure.

    ``weight_col`` adds that column's value per row instead of 1 --
    pass pre-aggregated (key, n) rows to hash each DISTINCT key once
    (depth md5s per distinct key, not per occurrence; identical cells,
    measured ~4x faster on a 2M-occurrence / 50k-vocab corpus).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}x{width}")
    from .dedup import portable_hash48

    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    (
                        portable_hash48(
                            F.concat(F.lit(f"{i}:"), F.col(key_col))
                        )
                        % width
                    ).alias("cell"),
                )
                for i in range(depth)
            ]
        )
    )
    if weight_col is None:
        return (
            df.select(rows.alias("r"))
            .select("r.i", "r.cell")
            .groupBy("i", "cell")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    return (
        df.select(F.col(weight_col).alias("_w"), rows.alias("r"))
        .select("r.i", "r.cell", "_w")
        .groupBy("i", "cell")
        .agg(F.sum("_w").alias("c"))
    )


def countmin_estimates(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: the estimate is
    min over the depth rows of the addressed cells -- an overestimate
    of the true count by at most the expected collision mass e*N/width
    with probability 1 - e^-depth. Returns (key, est_n).

    The cell table is SPARSE (cells with zero mass have no row), so the
    probe LEFT-joins and an absent cell counts as 0: a key never added
    to the sketch estimates 0 (CMS answers the true min over its depth
    cells), and every probed key appears in the output. An inner join
    would silently overstate such keys (min over non-empty cells only)
    or drop them entirely.

    The probe side is typically tiny (candidate heavy hitters), so the
    join broadcasts the probes against the bounded cell table.
    """
    from .dedup import portable_hash48

    probe = keys.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (
                            portable_hash48(
                                F.concat(F.lit(f"{i}:"), F.col(key_col))
                            )
                            % width
                        ).alias("cell"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("r"),
    ).select("key", "r.i", "r.cell")
    return (
        probe.join(cells, ["i", "cell"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias("est_n")
        )
    )


def _bloom_positions(key, m_bits: int, k_hashes: int):
    from .dedup import portable_hash48

    return [
        (portable_hash48(F.concat(F.lit(f"{i}:"), key)) % m_bits)
        for i in range(k_hashes)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k_hashes: int = 3
) -> DataFrame:
    """Deterministic Bloom filter over a key set, as a relational bitmap:
    (word, bits) rows with word = position div 32 and bits the OR of the
    addressed 32-bit lanes (32, not 64: DuckDB raises on 1 << 63 while
    Spark silently wraps negative -- 32-bit lanes keep every mask a
    small positive BIGINT in both engines). The hash family is the
    portable md5 scheme,
    so filter contents -- and every membership verdict -- are
    bit-identical across engines and can be oracle-gated.

    The bitmap is m_bits/32 rows regardless of key count: the broadcast
    alternative to shipping an exact key set when the probe side only
    needs "definitely absent" (e.g. decontamination prefiltering, cache
    admission). False positives only, rate ~ (1 - e^{-kn/m})^k.

    Build cost: one aggregation with a fixed m_bits/32-row key space
    (map-side combine collapses each task to the bitmap size); filters
    of shards merge by OR-ing bits.
    """
    if m_bits < 32 or k_hashes < 1:
        raise ValueError(
            f"need m_bits >= 32 and k_hashes >= 1, got {m_bits}/{k_hashes}"
        )
    pos = F.explode(
        F.array(*_bloom_positions(F.col(key_col), m_bits, k_hashes))
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            F.expr("CAST(pos div 32 AS BIGINT)").alias("word"),
            F.expr("pos % 32").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            ).alias("bits")
        )
    )


def bloom_probe(
    keys: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Membership verdict per key against a ``bloom_build`` bitmap:
    (key, maybe_member). maybe_member=false is definite absence;
    true may be a false positive -- the caller decides whether to
    verify survivors exactly (the standard two-phase probe).

    The bitmap (m_bits/32 rows) broadcasts; the probe never shuffles
    the key set -- at 100 TB this is the whole point: the corpus-side
    grams stream past a few-KB build side.
    """
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(*_bloom_positions(F.col(key_col), m_bits, k_hashes))
        ).alias("pos"),
    ).select(
        "key",
        F.expr("CAST(pos div 32 AS BIGINT)").alias("word"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
        ).alias("mask"),
    )
    joined = probes.join(F.broadcast(bitmap), "word", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
        == F.col("mask")
    ).cast("int")
    return (
        joined.groupBy("key")
        .agg(F.sum(hit).alias("_hits"))
        .select("key", (F.col("_hits") == k_hashes).alias("maybe_member"))
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. '07) -- the cardinality member
# of the portable-sketch family beside count-min and Bloom: md5-derived
# hashes, integer-exact register math, so the sketch and its estimate
# are oracle-gateable (q_hll_distinct), unlike the engine-specific
# built-in HLL++ above.
# ---------------------------------------------------------------------------

HLL_P = 9  # 2^9 = 512 registers; std err ~ 1.04/sqrt(512) ~ 4.6%
HLL_M = 1 << HLL_P
_HLL_W = 48 - HLL_P  # bits of the 48-bit portable hash left for rho
HLL_RMAX = _HLL_W + 1  # rho of the all-zero suffix
# alpha_m * m^2 * 2^RMAX, precomputed HERE and inlined as the SAME
# float literal into the Spark plan and the DuckDB oracle, so neither
# engine evaluates the constant expression itself -- the estimator is
# then one exact-integer division per group on both sides.
HLL_CONST = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(1 << HLL_RMAX)
# linear-counting threshold 2.5 * m, the published small-range switch
HLL_SMALL = 2.5 * HLL_M


def hll_registers(df: DataFrame, key_col: str, *group_cols: str) -> DataFrame:
    """HLL register table (*group_cols, bucket, r): bucket = low
    ``HLL_P`` bits of the portable 48-bit md5 hash, r = max over the
    group of rho(w) where w is the remaining bits and rho = position of
    the LOWEST set bit (1-based; RMAX for w == 0) -- trailing-zero rank
    is geometric(1/2) exactly like the classical leading-zero rank and
    is expressible as the same branch chain in Spark and SQL. Absent
    buckets mean register 0 (no key hashed there).

    Duplicates of a key produce identical (bucket, rho) rows, so the
    max-aggregation makes the register table a function of the DISTINCT
    key set -- the sketch property. Registers of corpus shards merge by
    per-bucket max; the aggregation key space is bounded by
    |groups| x m, never corpus-sized (map-side combine collapses each
    task to <= m rows per group before the exchange).
    """
    bucket, rho = hll_bucket_rho(F.col(key_col))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_bucket_rho(key) -> tuple:
    """The per-key (bucket, rho) projection behind ``hll_registers`` --
    pure map-side expressions, shared with the streaming twin
    (streaming/windows.hll_register_stream) so batch and ingest
    contribute byte-identical register rows."""
    from .dedup import portable_hash48

    h = portable_hash48(key)
    bucket = h.bitwiseAND(F.lit(HLL_M - 1))
    w = F.shiftright(h, HLL_P)
    rho = F.lit(HLL_RMAX)
    for k in reversed(range(_HLL_W)):
        rho = F.when(
            F.shiftright(w, k).bitwiseAND(F.lit(1)) == 1, F.lit(k + 1)
        ).otherwise(rho)
    return bucket, rho


def hll_estimate(registers: DataFrame, *group_cols: str) -> DataFrame:
    """Distinct-count estimate per group from an ``hll_registers``
    table: (*group_cols, est_distinct).

    Exact-shape arithmetic: S = sum_j 2^(RMAX - M[j]) with empty
    registers contributing 2^RMAX is an exact long (<= m * 2^RMAX ~
    2^49); the raw estimate is ONE double division HLL_CONST / S of the
    inlined literal by that integer -- bit-identical across engines.
    The published small-range switch applies linear counting
    m * ln(m / V) when the raw estimate <= 2.5m and V (empty registers)
    > 0; ln is the one transcendental in the family and is within
    1 ulp on both engines, so the floor() to integer could in principle
    differ when m*ln(m/V) sits within a ulp of an integer -- the same
    accepted boundary class as q_modularity's q_ppm floor.
    """
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_RMAX} - r AS INT))")
    per = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n_present"),
        F.sum(term).alias("_s_present"),
    )
    v = F.lit(HLL_M) - F.col("_n_present")
    s_total = F.col("_s_present") + v.cast("long") * F.lit(1 << HLL_RMAX)
    e_raw = F.lit(HLL_CONST) / s_total.cast("double")
    e_lin = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double"))
    est = F.when((e_raw <= F.lit(HLL_SMALL)) & (v > 0), e_lin).otherwise(e_raw)
    return per.select(
        *group_cols, F.floor(est).cast("long").alias("est_distinct")
    )


def hll_rho_case_sql(w_expr: str) -> str:
    """The DuckDB spelling of the rho branch chain over ``w_expr`` --
    generated from the same constants as the Spark chain so the two
    cannot drift."""
    whens = "\n         ".join(
        f"WHEN ({w_expr} >> {k}) & 1 = 1 THEN {k + 1}"
        for k in range(_HLL_W)
    )
    return f"CASE {whens}\n         ELSE {HLL_RMAX} END"


def hll_estimate_sql(n_present: str, s_present: str) -> str:
    """The DuckDB spelling of ``hll_estimate``'s estimator over a
    register-count column and a register-sum column -- generated from
    the same constants as the Spark expression so oracle and plan
    cannot drift. Yields a BIGINT (floored) expression."""
    s_total = (
        f"CAST({s_present} + ({HLL_M} - {n_present})"
        f" * (CAST(1 AS BIGINT) << {HLL_RMAX}) AS DOUBLE)"
    )
    return f"""CAST(floor(
           CASE WHEN {HLL_CONST!r} / {s_total} <= {HLL_SMALL!r}
                 AND ({HLL_M} - {n_present}) > 0
                THEN {float(HLL_M)!r}
                     * ln({float(HLL_M)!r}
                          / CAST({HLL_M} - {n_present} AS DOUBLE))
                ELSE {HLL_CONST!r} / {s_total}
           END) AS BIGINT)"""


# ---------------------------------------------------------------------------
# Portable KMV / bottom-k sketch (Bar-Yossef et al. '02; the theta-
# sketch workhorse) -- the ORDER-STATISTICS member of the portable
# family beside HLL: keep the k distinct keys with the smallest
# portable 48-bit hashes per group. Unlike HLL's registers it carries
# the sampled KEYS themselves (a uniform sample of the distinct set --
# usable for overlap probes, drill-down, quantile estimation over key
# attributes), estimates cardinality from the k-th minimum, and merges
# by union + re-bottom-k: bottomk(bottomk(A) UNION bottomk(B)) ==
# bottomk(A UNION B), exactly. Everything is md5-derived integer
# arithmetic, so the sketch CONTENTS -- not just its estimate -- are
# oracle-gateable (q_kmv_sample / q_kmv_distinct / q_kmv_incremental).
# ---------------------------------------------------------------------------

KMV_K = 64  # std err of the cardinality estimate ~ 1/sqrt(k-2) ~ 12.7%
KMV_SCALE = 1 << 48  # the portable hash space


def kmv_sketch(
    df: DataFrame, key_col: str, *group_cols: str, k: int = KMV_K
) -> DataFrame:
    """Bottom-k sketch table (*group_cols, rn, h, key): the ``k``
    distinct keys with the smallest portable hashes per group, ranked
    1..k by (h, key) -- the key tie-break makes 48-bit hash collisions
    deterministic in both engines.

    Scale shape: one distinct on (group, key), then a row_number
    window whose rank filter Spark rewrites to WindowGroupLimit --
    each map task forwards at most k rows per group to the window
    exchange (the q_label_rebalance partial-top-k precedent), so the
    shuffle is |groups| x k regardless of corpus size.
    """
    from .dedup import portable_hash48
    from pyspark.sql import Window

    dedup = (
        df.select(*group_cols, F.col(key_col).alias("key"))
        .distinct()
        .withColumn("h", portable_hash48(F.col("key")))
    )
    w = Window.partitionBy(*group_cols).orderBy("h", "key")
    return dedup.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def kmv_estimate(
    sketch: DataFrame, *group_cols: str, k: int = KMV_K
) -> DataFrame:
    """Distinct-count estimate per group from a ``kmv_sketch`` table:
    (*group_cols, est_distinct). A group holding fewer than ``k`` keys
    reports its EXACT count (the sketch contains every key); otherwise
    the classical KMV estimator (k-1) * 2^48 / h_k over the k-th
    minimum hash -- ONE integer floor division of exact longs
    ((k-1) << 48 <= 2^54), bit-identical across engines."""
    per = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n_in"), F.max("h").alias("_h_k")
    )
    est = F.when(F.col("_n_in") < k, F.col("_n_in")).otherwise(
        F.expr(f"CAST({(k - 1) * KMV_SCALE} AS BIGINT) div _h_k")
    )
    return per.select(*group_cols, est.cast("long").alias("est_distinct"))


def kmv_merge(
    sketches: DataFrame, *group_cols: str, k: int = KMV_K
) -> DataFrame:
    """Merge unioned sketch rows (or sketch rows unioned with raw
    (group, key, h) delta rows) back into a valid bottom-k sketch:
    distinct keys, re-rank, keep k. Exact: the k smallest of a union
    are among the k smallest of each side."""
    from pyspark.sql import Window

    dedup = sketches.select(*group_cols, "key", "h").distinct()
    w = Window.partitionBy(*group_cols).orderBy("h", "key")
    return dedup.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def kmv_estimate_sql(n_in: str, h_k: str, k: int = KMV_K) -> str:
    """The DuckDB spelling of ``kmv_estimate`` -- generated from the
    same constants so oracle and plan cannot drift."""
    return (
        f"CAST(CASE WHEN {n_in} < {k} THEN {n_in} "
        f"ELSE {(k - 1) * KMV_SCALE} // {h_k} END AS BIGINT)"
    )
