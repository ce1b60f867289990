"""Scale operators: bucketed co-located joins and skew salting.

These are the 100 TB levers the synthetic harness can only demonstrate,
not stress: bucketing pre-shuffles both sides of a recurring join ONCE
at write time (every subsequent join is exchange-free), and salting
splits a hot key across ``salt`` subkeys so one executor doesn't absorb
an entire skewed partition. AQE's skew-join splitting handles moderate
skew automatically; salting is for the pathological key that dwarfs a
single task even after splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


BUCKET_SPEC_FILE = "_BUCKET_SPEC"


def write_bucket_spec(
    spark: SparkSession,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: "str | None" = None,
) -> None:
    """Record the bucket spec as a ``_BUCKET_SPEC`` sidecar JSON inside
    the table directory. A catalog entry dies with its session, but the
    directory survives; the sidecar makes the layout's TRUE spec
    recoverable so a later session can never re-register the files
    under a drifted (bucket_col, num_buckets) -- the wrong-results
    class ``register_surviving_bucketed`` guards against (a
    mis-declared spec would plan exchange-free SMJs over wrongly
    co-located buckets and silently drop join matches).

    ``sort_col`` records whether (and by what) each bucket file was
    sorted at write time (ADVICE r11): recovery emits ``SORTED BY``
    only when the sidecar confirms it, because declaring sort over
    unsorted buckets lets SMJ elide its Sort and merge mis-ordered
    runs -- the same silent wrong-join class as a drifted bucket col.
    """
    import json

    wh = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{wh}/{table}/{BUCKET_SPEC_FILE}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    out.write(
        bytearray(
            json.dumps(
                {
                    "bucket_col": bucket_col,
                    "num_buckets": num_buckets,
                    "sort_col": sort_col,
                }
            ).encode()
        )
    )
    out.close()


def read_bucket_spec(spark: SparkSession, table: str) -> "dict | None":
    """Read a table directory's ``_BUCKET_SPEC`` sidecar; None when the
    directory predates the sidecar (or was not written by this
    package's bucketed writers). A PRESENT-but-unparseable sidecar (a
    writer that crashed mid-sidecar) returns ``{}`` -- which matches no
    requested spec, so recovery refuses and the caller rebuilds,
    instead of either trusting a half-written spec or crashing the
    query path."""
    import json

    wh = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{wh}/{table}/{BUCKET_SPEC_FILE}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    # Any failure to READ a sidecar that exists (truncated write,
    # checksum mismatch, malformed JSON) is the same evidentiary
    # state: the spec is unverifiable. Return the empty spec -- it
    # matches no requested (bucket_col, num_buckets), so recovery
    # refuses and the caller rebuilds; this is deliberately broader
    # than the raise-past-validation rule because the sidecar is
    # evidence under examination, not engine state.
    #
    # One bounded RETRY first (VERDICT r11 #4): at lake scale a refusal
    # triggers a rebuild that costs hours, while a transient read
    # fault (lost connection, eventually-consistent listing) costs a
    # millisecond re-read. A sidecar that fails twice in a row -- or
    # reads as malformed JSON, which a retry cannot repair -- is then
    # treated as unverifiable.
    spec = None
    for attempt in (0, 1):
        try:
            spec = json.loads(_read_sidecar_text(spark, fs, p))
            break
        except json.JSONDecodeError:
            return {}  # deterministic corruption; retrying re-reads the same bytes
        except Exception:
            if attempt:
                return {}
    return spec if isinstance(spec, dict) else {}


def _read_sidecar_text(spark: SparkSession, fs, p) -> str:
    """One sidecar read attempt; module-level so the flaky-read retry
    contract is testable (tests/test_materialized.py injects a
    fail-once fault here)."""
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.
    Joins between tables bucketed the same way need no Exchange -- the
    classic co-located join for fact-fact joins run repeatedly. The
    spec is recorded in a ``_BUCKET_SPEC`` sidecar so a later session
    can recover the layout safely (see ``write_bucket_spec``).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
    write_bucket_spec(
        df.sparkSession, table, bucket_col, num_buckets, sort_col=sort_col
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed saved tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    facts: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: the fact side gets a deterministic salt in
    [0, salt) derived from the HASH OF THE ROW'S OWN COLUMNS; the other
    side is exploded ``salt`` times so every (key, salt) partition
    exists. Shuffle load for a hot key spreads over ``salt`` tasks.

    The salt must be a pure function of row content -- never
    ``monotonically_increasing_id()`` or ``rand()``: a shuffle-map
    retry recomputes rows, and a positional/random salt can land a
    recomputed row in a different reducer partition while other
    reducers already fetched the old output, silently duplicating or
    dropping rows. Content-derived salt is retry-stable (identical
    rows always co-salt, which is also what spreads a hot KEY: its
    rows differ in the non-key columns).

    Use when one side has heavy hitters and the other is too big to
    broadcast. Output equals the plain join exactly.
    """
    salted_f = facts.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in facts.columns]), F.lit(salt))
    )
    salted_o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_f.join(salted_o, [on, "_salt"]).drop("_salt")


def choose_skew_remedy(
    skew_x1000: int,
    aqe_splitting: bool = True,
    moderate_x1000: int = 4_000,
    pathological_x1000: int = 100_000,
) -> str:
    """Pick the join-skew remedy from :func:`key_skew_profile`'s
    ``skew_x1000`` (1000 = flat) per the MEASURED doctrine (SCALE.md
    r11 table; VERDICT r11 #5 asked for exactly this connection):

    - ``plain``: hot key under ``moderate_x1000`` (default 4x the
      mean) -- neither remedy pays; AQE's splitter would not even
      trigger at its default factor.
    - ``aqe``: skewed AND this session can runtime-re-plan -- AQE
      skew-join splitting measured 2.6-2.8 s vs salting's 2.9 s on
      the half-corpus hot key because it splits ONLY the oversized
      partition (even mid-key, duplicating the other side's partition)
      while salting pays the dim-side x``salt`` explode
      unconditionally. The *plan* is the plain join; the remedy is the
      runtime's.
    - ``salt``: pathological skew (hot key >= ``pathological_x1000``
      x the mean) where AQE cannot re-plan -- splitting disabled, a
      streaming stage, or a required distribution the splitter must
      preserve. Static SMJ measured 3.9-4.4 s there; content-derived
      salting 2.9 s.
    - moderate-but-not-pathological without AQE stays ``plain``:
      salting's unconditional explode is priced for hot keys that
      dwarf a task, not for a 4-100x bump a few extra map waves
      absorb.
    """
    if skew_x1000 < moderate_x1000:
        return "plain"
    if aqe_splitting:
        return "aqe"
    return "salt" if skew_x1000 >= pathological_x1000 else "plain"


def skew_aware_join(
    facts: DataFrame,
    other: DataFrame,
    on: str,
    skew_x1000: "int | None" = None,
    salt: int = 8,
    aqe_splitting: "bool | None" = None,
) -> "tuple[DataFrame, str]":
    """Equi-join with the skew remedy CHOSEN from the measured
    doctrine: diagnose (``key_skew_profile``), decide
    (``choose_skew_remedy``), remedy (plain / AQE / ``salted_join``).
    Returns (joined, remedy) so callers and tests can assert the
    route; every route is row-identical to the plain join.

    ``skew_x1000`` normally comes from persisted ANALYZE output (the
    profile is the one-pass table a deployment keeps next to its
    column stats); when omitted, it is measured here with a bounded
    1-row driver sync -- the same documented bounded-sync doctrine as
    q_label_rebalance's quota row, acceptable because the profile is a
    single aggregate row, never a row-set pull.
    """
    spark = facts.sparkSession
    if skew_x1000 is None:
        row = key_skew_profile(facts, (on,)).collect()[0]
        skew_x1000 = int(row["skew_x1000"])
    if aqe_splitting is None:
        # Spark parses boolean confs case-insensitively ("TRUE"/"True"
        # are active) -- mirror that, or a legitimately-enabled session
        # would be routed to the measured-worse salt remedy.
        aqe_splitting = (
            spark.conf.get("spark.sql.adaptive.enabled", "true").lower()
            == "true"
            and spark.conf.get(
                "spark.sql.adaptive.skewJoin.enabled", "true"
            ).lower()
            == "true"
        )
    remedy = choose_skew_remedy(skew_x1000, aqe_splitting=aqe_splitting)
    if remedy == "salt":
        return salted_join(facts, other, on, salt=salt), remedy
    return facts.join(other, on), remedy


def column_stats(df: "DataFrame", cols: tuple[str, ...]) -> "DataFrame":
    """ANALYZE-style exact column statistics in ONE pass: per column
    (col_name, n_rows, n_nulls, n_distinct, min_val, max_val) — the
    table the optimizer (and the human) reads before choosing join
    sides, pruning layouts, or trusting a broadcast gate. Columns must
    be integer-typed (the uniform output schema keeps the gate
    hashable); dates/decimals enter via their integer encodings.

    Scale shape: a single aggregation — Spark compiles the multiple
    COUNT(DISTINCT col) into one Expand pass (rows × |cols| internal
    duplication, then map-side partial aggs), which is the standard
    exact-NDV collection plan; min/max/null counts ride the same pass
    for free. For billions of rows × many columns, swap
    approx_count_distinct (HLL) in — same shape, sketch-sized state;
    the exact form IS the audit of that sketch.
    """
    from pyspark.sql import functions as F

    n_rows = F.count(F.lit(1)).cast("long").alias("n_rows")
    aggs = [n_rows]
    for c in cols:
        aggs += [
            F.count(c).cast("long").alias(f"nn_{c}"),
            F.countDistinct(c).cast("long").alias(f"nd_{c}"),
            F.min(c).cast("long").alias(f"mn_{c}"),
            F.max(c).cast("long").alias(f"mx_{c}"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).cast("long").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_val"),
            F.col(f"mx_{c}").alias("max_val"),
        )
        for c in cols
    ]
    return (
        one.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
        .orderBy("col_name")
    )


def key_skew_profile(df: "DataFrame", cols: tuple[str, ...]) -> "DataFrame":
    """Join-key skew diagnosis in ONE pass: per key column, the group
    count, the heaviest group's size and key (ties -> lowest key), and
    skew_x1000 = max_group * 1000 * n_groups div n_rows (1000 = flat;
    the multiple of the mean the hottest key carries). This is the
    table you read before choosing salting (`salted_join`) or an AQE
    skew threshold — the operational companion of :func:`column_stats`.

    Scale shape: the columns unpivot map-side into (col_name, key)
    rows (one Expand-like generator pass, |cols| × rows), then ONE
    (col_name, key)-keyed aggregation with map-side combine — exactly
    the cardinality of the heaviest groupBy you were about to run —
    followed by |cols|-sized stats. Integer-exact throughout.
    """
    from pyspark.sql import functions as F

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("long").alias("k"),
                    )
                    for c in cols
                ]
            )
        ).alias("x")
    ).select("x.*")
    cnt = pairs.groupBy("col_name", "k").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return (
        cnt.groupBy("col_name")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.max("cnt").cast("long").alias("max_group"),
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("k")))
            .getField("k")
            .alias("heaviest_key"),
        )
        .select(
            "col_name",
            "n_rows",
            "n_groups",
            "max_group",
            "heaviest_key",
            F.expr("(max_group * 1000 * n_groups) div n_rows").alias(
                "skew_x1000"
            ),
        )
        .orderBy("col_name")
    )


def fk_integrity(
    edges: list[tuple[str, "DataFrame", str, "DataFrame", str]],
) -> "DataFrame":
    """Referential-integrity audit across a star schema: for each FK
    edge (name, child_df, child_key, parent_df, parent_key) report
    (fk_name, n_child, n_orphans) where an orphan is a child row whose
    key value has no parent row (NULL child keys count as orphans —
    an unresolvable reference is an unresolvable reference). The
    pre-flight check before trusting joins to be lossless, and the
    post-flight check after an incremental load (snapshots.*).

    Scale shape (r12 optimization): edges sharing a child DataFrame are
    audited in ONE pass over that child -- the fact table is the 100 TB
    side, and auditing its k outgoing FKs used to scan it k times. The
    child projects to its key columns once; each parent's DISTINCT key
    set left-joins in (broadcast when the parent is a dim -- Spark
    sizes that automatically; the joins are independent, and joining a
    DISTINCT key set can never multiply rows, so n_child stays the
    plain count); one aggregate yields the shared child count plus one
    orphan sum per edge, exploded to the per-edge rows. Children are
    grouped by DataFrame identity, so callers passing distinct frames
    keep the old one-pass-per-edge behaviour.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    groups: dict = {}
    for name, child, ckey, parent, pkey in edges:
        groups.setdefault(id(child), (child, []))[1].append(
            (name, ckey, parent, pkey)
        )
    outs = []
    for child, specs in groups.values():
        joined = child.select(
            *[
                F.col(ck).alias(f"_k{i}")
                for i, (_n, ck, _p, _pk) in enumerate(specs)
            ]
        )
        for i, (_name, _ck, parent, pkey) in enumerate(specs):
            pkd = parent.select(
                F.col(pkey).alias(f"_k{i}"), F.lit(1).alias(f"_hit{i}")
            ).distinct()
            joined = joined.join(pkd, f"_k{i}", "left")
        agg = joined.agg(
            F.count(F.lit(1)).cast("long").alias("_n_child"),
            *[
                F.sum(F.when(F.col(f"_hit{i}").isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"_o{i}")
                for i in range(len(specs))
            ],
        )
        outs.append(
            agg.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("fk_name"),
                                F.col("_n_child").alias("n_child"),
                                F.col(f"_o{i}").alias("n_orphans"),
                            )
                            for i, (name, _ck, _p, _pk) in enumerate(specs)
                        ]
                    )
                ).alias("r")
            ).select("r.*")
        )
    return reduce(lambda a, b: a.unionAll(b), outs).orderBy("fk_name")
