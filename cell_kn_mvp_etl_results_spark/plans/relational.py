"""Relational plans covering SURVEY.md section 2's filter / join / agg /
window / sort / set-op / scalar operator inventory (F1-F10, J1-J9, A1-A10,
W1, O1-O4, U1-U3, C1-C14), re-expressed over the driver's synthetic star
schema. Each query cites the reference operator(s) it exercises.

Scale notes live on each query: what shuffles, what broadcasts, what
pushes down. All builders are pure DataFrame API -- Catalyst handles
join ordering, predicate pushdown, and partial aggregation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.money import avg_money, cents, money, qty_long
from ..functions.text import char_ngrams, hyphenate, stable_uuid, tokens
from ..sources.readers import read_table
from .registry import TAIL, query


def _parquet_rows(sf_dir: str, table: str) -> int:
    """Exact row count from parquet FOOTERS (metadata-only, no data
    read, no Spark job) -- the catalog-row-count stand-in the
    broadcast-map gates size their derived maps from."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for root, _dirs, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        # OSError (missing file) or pyarrow.ArrowInvalid (corrupt /
        # non-parquet footer): either way the size is UNKNOWN, so
        # return 0 and let the gate fail closed to the shuffle plan.
        return 0


# Broadcast budget for a DERIVED map (the filtered, projected order->dim
# relation a below-the-gate plan ships to every executor), as ESTIMATED
# IN-MEMORY bytes -- the quantity that actually costs executor memory
# and driver build time. The r1-r4 gate tested the fact table's raw
# on-disk bytes instead, so at its 512 MB boundary the "map" was ~2 GB
# of hashed relation (~25M narrow rows) -- far past the memory the
# broadcast doctrine (SCALE.md) budgets. 512 MB in-memory is the
# documented deployment knob: it must fit each executor's storage
# fraction alongside the scan, and the measured 30x corpus maps
# (~370 MB supplier / ~45 MB shipping) stay inside it.
_BROADCAST_MAP_BYTES = 512 << 20
# UnsafeRow bytes for a narrow (bigint, bigint, short-string) map row
# plus BytesToBytesMap pointer/paging overhead, measured-order estimate.
_MAP_ROW_BYTES = 96
# Filter selectivities of each gate's derived map, measured on the
# synthetic corpus (scripts: DuckDB counts at sf0.1) -- the
# column-histogram stand-in a lake catalog would provide. They only
# gate PLAN SHAPE, so being off by 2x moves the flip point, never
# correctness (both branches are row-identical, tests/test_plan_gates).
_SEL_ORDERS_SINCE_1996 = 0.85  # q_local_supplier_volume's date filter
_SEL_BUILDING_ORDERS = 0.11  # q_shipping_priority's segment x date join


def _broadcast_map_ok(sf_dir: str, table: str, selectivity: float) -> bool:
    """True when the derived broadcast map (``selectivity`` of
    ``table``'s rows, narrow projection) is estimated to fit the
    documented in-memory broadcast budget. Unknown size (no local
    footers -- e.g. a remote path) fails CLOSED to the shuffle plan:
    never broadcast what you cannot size."""
    rows = _parquet_rows(sf_dir, table)
    if rows <= 0:
        return False
    return rows * selectivity * _MAP_ROW_BYTES <= _BROADCAST_MAP_BYTES


# ---------------------------------------------------------------------------
# SQL-string builders (r8). The scan/join-agg headliners are expressed
# as Spark SQL text over fingerprint-registered temp views instead of
# DataFrame call chains: the logical plan is IDENTICAL (Catalyst parses
# to the same operators; correctness of the rewrite is guarded by the
# DuckDB oracle-parity gates over every query, and the two gate
# BRANCHES of each SQL form agree row-for-row per
# tests/test_plan_gates.py), but plan CONSTRUCTION is one
# py4j call instead of 100-250 -- profiled at 0.15-0.28 s of every
# rebuild-regime run per query, pure driver-side Python-API chatter
# that no engine's own SQL front end pays. This is also the symmetric
# methodology: scripts/oracle_bench.py measures DuckDB parsing SQL text
# per run against pre-registered views; now Spark does exactly the
# same. The SQL is parsed + analyzed + optimized PER CALL (spark.sql
# returns a fresh plan every time) -- no plan reuse; the prepared-plan
# cache sits above this in registry._memoized and stays off in the
# rebuild/cold regimes. View registration is catalog state keyed on
# (application, sf_dir, table fingerprint): a regenerated file gets a
# new view name, so stale data can never serve (read_table's
# cache-invalidation contract carries through).
# ---------------------------------------------------------------------------

_SQL_VIEWS: dict[tuple, str] = {}


def _view(spark: SparkSession, sf_dir: str, table: str) -> str:
    import hashlib

    from ..sources.readers import _fingerprint

    fp = _fingerprint(os.path.join(sf_dir, f"{table}.parquet"))
    # Keyed on the SparkSession OBJECT, not applicationId: temp views
    # are session-scoped while applicationId is shared across
    # spark.newSession() siblings -- an id-keyed cache would hand a
    # sibling a view name its catalog never registered (ADVICE r8).
    # Holding the session in the key is intentional: the cached view
    # is only valid while that exact session lives.
    key = (spark, sf_dir, table, fp)
    name = _SQL_VIEWS.get(key)
    if name is None:
        # A regenerated table gets a NEW view name; the displaced
        # fingerprint's view is catalog state nothing can reach through
        # this cache anymore -- drop it instead of letting the session
        # catalog grow one orphan view per regeneration (VERDICT r9 #3).
        from ..sources.readers import evict_where

        evict_where(
            _SQL_VIEWS,
            lambda k: k[:3] == (spark, sf_dir, table),
            lambda v: spark.catalog.dropTempView(v),
        )
        tag = hashlib.md5(repr((sf_dir, fp)).encode()).hexdigest()[:8]
        name = f"{table}_v{tag}"
        read_table(spark, sf_dir, table).createOrReplaceTempView(name)
        _SQL_VIEWS[key] = name
    return name


# Exact-integer money/quantity idioms, the SQL spelling of
# functions.money.cents / qty_long (identical arithmetic, see the
# cents() docstring for the round-half-away-by-signum construction;
# form-equality over every money column is pinned by
# tests/test_money_contract.py).
_CENTS = "CAST({c} * 100 + SIGN({c}) * 0.5 AS BIGINT)"
_QTY = "CAST({c} + SIGN({c}) * 0.5 AS BIGINT)"


# ---------------------------------------------------------------------------
# Aggregations (A5/A7-style) -- TPC-H Q1-shaped pricing summary.
# ---------------------------------------------------------------------------


@query(
    "q_pricing_summary",
    headline=True,
    tags=("agg", "A5"),
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_base_price_cents,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
    AS sum_disc_price_x10000,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))
           * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT)
    AS sum_charge_x1000000,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) // count(*) AS BIGINT)
    AS avg_price_cents,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary over lineitem (reference agg family A5/A7;
    TPC-H Q1 shape). Single scan -> partial agg -> 6-group final agg:
    the map-side combine makes the shuffle a few hundred bytes per
    partition regardless of input scale.

    All money columns are emitted as exact integer scaled values
    (cents / cents*bp / cents*bp*bp) -- never IEEE doubles -- so the
    gate's value hash is bit-identical regardless of how either
    engine's division types a ``BIGINT / literal`` expression
    (round-1 post-mortem: DuckDB typed ``/ 100.0`` as DECIMAL in the
    driver's build, hashing differently from Spark's DOUBLE despite
    numeric equality). Dollars are a *presentation* concern:
    ``functions.money.money()`` converts at the edge when a human
    needs them.
    """
    # SQL-string form (r8): same logical plan as the former DataFrame
    # chain (scan -> partial agg -> 6-group final agg), one parse call.
    li = _view(spark, sf_dir, "lineitem")
    pc = _CENTS.format(c="l_extendedprice")
    db = "(100 - " + _CENTS.format(c="l_discount") + ")"
    tb = "(100 + " + _CENTS.format(c="l_tax") + ")"
    q = _QTY.format(c="l_quantity")
    return spark.sql(f"""
SELECT l_returnflag, l_linestatus,
       SUM(q) AS sum_qty,
       SUM(pc) AS sum_base_price_cents,
       SUM(pc * db) AS sum_disc_price_x10000,
       SUM(pc * db * tb) AS sum_charge_x1000000,
       SUM(pc) DIV COUNT(*) AS avg_price_cents,
       COUNT(*) AS count_order
FROM (
  SELECT l_returnflag, l_linestatus, {q} AS q, {pc} AS pc,
         {db} AS db, {tb} AS tb
  FROM {li}
  WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
)
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")


# ---------------------------------------------------------------------------
# Filters + projection (F1, F3, F8).
# ---------------------------------------------------------------------------


@query(
    "q_min_size_filter",
    tags=("filter", "F1", "F8"),
    # r4 rotation: 3 green driver rows (r1-r3); q_compound_predicate
    # keeps the filter-family gate while the promoted tail queries earn
    # their first driver artifact rows. Still oracle-checked by pytest.
    priority=TAIL,
    oracle="""
SELECT l_orderkey, l_linenumber, CAST(round(l_quantity) AS BIGINT) AS qty
FROM lineitem
WHERE l_quantity >= 10
  AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
ORDER BY l_orderkey, l_linenumber
""",
)
def q_min_size_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-size threshold filter + column projection (F1 min-cluster-size
    ``clusterSize >= 10``, ``LoaderUtilities.py:39``; F8 projection).
    Both predicate and 3-column pruning push down into the parquet scan
    (verified via .explain: PushedFilters + ReadSchema).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 10)
            & (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", qty_long("l_quantity").alias("qty"))
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_compound_predicate",
    tags=("filter", "F3", "F4"),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice >= 200000
  AND o_orderstatus = 'O'
  AND o_orderpriority LIKE '1%'
ORDER BY o_orderkey
""",
)
def q_compound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicate (F3 score thresholds like
    ``score >= 0.5 AND isApproved AND NOT hasBeenWithdrawn``,
    ``ExternalApiResultsTupleWriter.py:344-349``; F4 prefix predicate).
    Raw parquet doubles are emitted unchanged -- bit-identical across
    engines, no conversion needed.
    """
    o = read_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_totalprice") >= 200000)
            & (F.col("o_orderstatus") == "O")
            & F.col("o_orderpriority").startswith("1")
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Joins (J1/J2 equi, J3 broadcast lookup first-of-many, F5/J12 anti, semi).
# ---------------------------------------------------------------------------


@query(
    "q_equi_join",
    tags=("join", "J1", "J2"),
    # r4 rotation: 3 green driver rows; join family stays anchored by
    # q_interval_join/q_asof_join/q_khop* this round. Slot goes to the
    # new q_boilerplate.
    priority=TAIL,
    oracle="""
SELECT o.o_orderkey, c.c_name, o.o_totalprice
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
ORDER BY o.o_orderkey
""",
)
def q_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact->dim (J1 silhouette merge
    ``NSForestResultsTupleWriter.py:345-358``; J2 author-to-CL merge).
    customer is a dimension: Catalyst broadcasts it (no shuffle of the
    orders fact); the segment filter is pushed below the join into the
    dim scan.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "q_anti_join",
    tags=("join", "F5", "J12"),
    # r4 rotation: 3 green driver rows; join family stays anchored by
    # q_equi_join/q_asof_join/q_khop_paths.
    priority=TAIL,
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (F5 deprecated-term anti-filter
    ``AuthorToClResultsTupleWriter.py:100-104``; J12 existence check
    before insert). Broadcast-able when the exclusion list is small; at
    scale the anti-join shuffles on the key like any equi-join.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_semi_join",
    tags=("join", "J12"),
    # r4 rotation: 3 green driver rows.
    priority=TAIL,
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 250000
)
ORDER BY c_custkey
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J12 ``collection.has(doc)`` existence semantics,
    ``OntologyParserLoader.py:1069-1074``)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 250000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_lookup_first_of_many",
    tags=("join", "J3", "W1"),
    # r4 rotation: 3 green driver rows; q_top1_per_group (promoted)
    # exercises the same first-of-many window shape this round.
    priority=TAIL,
    oracle="""
SELECT o_orderkey, p_name AS first_part_name
FROM (
  SELECT l_orderkey AS o_orderkey, l_partkey,
         row_number() OVER (
           PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
         ) AS rn
  FROM lineitem
) f
JOIN part ON f.l_partkey = p_partkey
WHERE rn = 1
ORDER BY o_orderkey
""",
)
def q_lookup_first_of_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup with first-of-many semantics (J3 gene-id lookups return a
    list and the caller takes the first match,
    ``LoaderUtilities.py:338-363``, ``:716-719``). Spark shape:
    row_number window to pick the deterministic first, then a broadcast
    join against the dimension. The window shuffles on l_orderkey once;
    the part join is broadcast (no second shuffle).
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data, so
    # the pick needs a total order to be engine-deterministic.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    first = (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_partkey")
    )
    return (
        first.join(F.broadcast(p), first.l_partkey == p.p_partkey)
        .select("o_orderkey", F.col("p_name").alias("first_part_name"))
        .orderBy("o_orderkey")
    )


_SUPPLIER_ORACLE = """
SELECT
  n.n_name AS nation,
  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
    / 10000.0 AS revenue,
  count(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@query(
    "q_local_supplier_volume",
    headline=True,
    tags=("join", "agg", "J10"),
    oracle=_SUPPLIER_ORACLE,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join chain + agg (TPC-H Q5 shape; exercises the J10
    k-hop typed-path pattern relationally: customer->orders->lineitem->
    supplier with a same-nation co-location predicate).

    Three plan shapes. The first gate is the DERIVED MAP's estimated
    in-memory size (footer row count x measured filter selectivity x
    map row bytes -- see ``_broadcast_map_ok``; r6 fix, the r1-r5 gate
    tested orders' raw on-disk bytes, the wrong quantity); above it, a
    second existence gate routes to the co-bucketed twin layout when
    an ingest job / prior call already paid for it (r11, VERDICT r10
    #5 -- see the inline comment and q_supplier_volume_bucketed):

    * **Broadcast-map** (map fits ``_BROADCAST_MAP_BYTES``): orders joins the
      broadcast customer/nation/region dims map-side into a narrow
      (o_orderkey, cust_nation, n_name) relation -- the region +
      date filters shrink it to ~40% of orders first -- and THAT is
      broadcast to the lineitem probe. The fact table is never
      shuffled: the whole query is one codegen pass over lineitem
      plus a 6-row agg. Measured (30x corpus, warm cache,
      median-of-3): 3.17 s -> 2.01 s; sf0.1: 0.50 -> 0.39 s.
    * **Shuffle** (above the gate, i.e. cluster scale where a
      per-executor copy of orders no longer fits): the SAME derived
      map is built -- orders joined map-side to the broadcast dims,
      narrowing to 3 columns x ~40% of rows BEFORE any fact shuffle --
      shuffled into the lineitem equi-join (the key both sides can be
      bucketed by at scale), and the join output is AGGREGATED BELOW
      the supplier join (r9, VERDICT r8 #5): partial sums per
      (l_suppkey, cust_nation, n_name) collapse the fact-sized stream
      to |S| x |nations| rows before the broadcast supplier probe and
      the final 6-row agg. A/B at the 100x corpus (interleaved
      medians, scripts/supplier_combo_ab.py): omap-SMJ 6.1-8.3 s ->
      agg-below 4.5-5.9 s, consistent across rounds. Losers recorded:
      runtime-Bloom injection 12.7 s (filter build cost exceeds the
      34%-selectivity savings); broadcast-okeys semi-reduction 9.2 s
      (same reason, paid as a BHJ); a shuffle_hash hint on the fact
      join measured 6.0-6.3 s this session but 15.4 s in the r7
      session under load -- SMJ is kept: its spill path is robust at
      lake scale and bucketing removes the exchange+sort entirely,
      while SHJ's build side must fit one task's memory.
    """
    # SQL-string form (r8): same two size-gated plan shapes, one parse.
    cust = _view(spark, sf_dir, "customer")
    orders = _view(spark, sf_dir, "orders")
    li = _view(spark, sf_dir, "lineitem")
    supp = _view(spark, sf_dir, "supplier")
    nat = _view(spark, sf_dir, "nation")
    reg = _view(spark, sf_dir, "region")
    amount = (
        _CENTS.format(c="l_extendedprice")
        + " * (100 - "
        + _CENTS.format(c="l_discount")
        + ")"
    )
    omap = f"""
  SELECT /*+ BROADCAST(c), BROADCAST(n2) */
         o.o_orderkey, c.c_nationkey AS cust_nation, n2.n_name
  FROM {orders} o
  JOIN {cust} c ON o.o_custkey = c.c_custkey
  JOIN (SELECT /*+ BROADCAST(r) */ n.n_nationkey, n.n_name
        FROM {nat} n JOIN {reg} r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name IN ('ASIA', 'EUROPE')) n2
    ON c.c_nationkey = n2.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"""
    if _broadcast_map_ok(sf_dir, "orders", _SEL_ORDERS_SINCE_1996):
        # Below the gate: broadcast map, zero fact shuffle, one 6-row
        # agg exchange. A pre-agg would only ADD an exchange here.
        return spark.sql(f"""
SELECT /*+ BROADCAST(omap), BROADCAST(s) */ omap.n_name AS nation,
       SUM({amount}) / CAST(10000.0 AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM {li} l
JOIN ({omap}
) omap ON l.l_orderkey = omap.o_orderkey
JOIN {supp} s
  ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = omap.cust_nation
GROUP BY omap.n_name
ORDER BY revenue DESC, nation
""")
    # Above the gate, FIRST preference (VERDICT r10 #5): when the
    # co-bucketed twin layout already exists for this corpus
    # fingerprint -- built by a previous call, an ingest job, or a
    # previous session (surviving directory) -- serve the bucketed SMJ
    # instead of re-paying the omap exchange the layout moved to ingest
    # time (measured at 100x: 2.17-2.80 s vs 5.6-15.2 s shipped, rows
    # identical; BENCH_NOTES r10). The probe never builds: a corpus
    # without the layout pays nothing here and takes the shuffle branch
    # below -- the same existence-gate doctrine as the broadcast branch
    # above (rows pinned identical across all three branches,
    # tests/test_plan_gates.py).
    if supplier_bucketed_layout_exists(spark, sf_dir):
        return _supplier_bucketed_frame(spark, sf_dir)
    # Above the gate: aggregate below the supplier join (see docstring
    # A/B). Integer partial sums regrouped by nation -- associative,
    # so revenue is bit-identical to the single-agg form (both gate
    # branches row-compared in tests/test_plan_gates.py). The shuffled
    # order map carries ONLY (o_orderkey, cust_nation) -- n_name rides
    # the 100x omap exchange as ~2x the bytes for information that is
    # 1:1 with cust_nation, so the name lookup joins the 6-row
    # aggregate at the very end instead (stage profile: the omap
    # exchange is the dominant cost, 1.09 GB at 100x with the name vs
    # the fact scan's ~MB pruned input; interleaved A/B at 100x:
    # 6.66/5.73 s named -> 5.79/5.28 s slim, rows identical).
    return spark.sql(f"""
SELECT /*+ BROADCAST(nn) */ nn.n_name AS nation, agg.revenue, agg.n_items
FROM (
  SELECT /*+ BROADCAST(s) */ pre.cust_nation,
         SUM(pre.amt) / CAST(10000.0 AS DOUBLE) AS revenue,
         SUM(pre.n) AS n_items
  FROM (
    SELECT l.l_suppkey, omap.cust_nation, SUM({amount}) AS amt, COUNT(*) AS n
    FROM {li} l
    JOIN (
      SELECT /*+ BROADCAST(c), BROADCAST(n2) */
             o.o_orderkey, c.c_nationkey AS cust_nation
      FROM {orders} o
      JOIN {cust} c ON o.o_custkey = c.c_custkey
      JOIN (SELECT /*+ BROADCAST(r) */ n.n_nationkey
            FROM {nat} n JOIN {reg} r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name IN ('ASIA', 'EUROPE')) n2
        ON c.c_nationkey = n2.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    ) omap ON l.l_orderkey = omap.o_orderkey
    GROUP BY l.l_suppkey, omap.cust_nation
  ) pre
  JOIN {supp} s
    ON pre.l_suppkey = s.s_suppkey AND s.s_nationkey = pre.cust_nation
  GROUP BY pre.cust_nation
) agg
JOIN {nat} nn ON nn.n_nationkey = agg.cust_nation
ORDER BY revenue DESC, nation
""")


_SUPB_FILES = ("orders", "lineitem", "customer", "nation", "region")


def _supplier_bucketed_names(
    spark: SparkSession, sf_dir: str, num_buckets: int = 32
) -> tuple[tuple[str, str], tuple[str, str]]:
    """((logical, bucket_col)...) for the supplier twin's two tables --
    one derivation shared by the builder and the routing probe so the
    two can never disagree about which layout they are talking about."""
    from .materialized import _auto_name

    li_t = _auto_name("supb_li_auto", sf_dir, num_buckets, files=_SUPB_FILES)
    omap_t = _auto_name(
        "supb_omap_auto", sf_dir, num_buckets, files=_SUPB_FILES
    )
    return (li_t, "l_orderkey"), (omap_t, "o_orderkey")


# Positive-probe memo for supplier_bucketed_layout_exists, keyed on
# (session, warehouse dir, physical table names) -- the names already
# carry the corpus fingerprint + bucket spec via _auto_name, so a
# regenerated corpus or changed spec lands on a different key. Only
# True is memoized (VERDICT r12 #2: the per-call Hadoop-FS probe --
# catalog.tableExists + FileSystem.exists over py4j -- was re-paid on
# EVERY builder call, the single largest per-call driver cost the r12
# round added): a True answer is durable for the session short of an
# explicit DROP of the paid-for layout, while a False answer must stay
# re-probeable so a layout built mid-session is picked up.
_SUPB_LAYOUT_OK: set = set()


def supplier_bucketed_layout_exists(
    spark: SparkSession, sf_dir: str, num_buckets: int = 32
) -> bool:
    """True iff BOTH of the twin's co-bucketed tables already exist for
    this corpus fingerprint -- in this session's catalog or as a
    complete (_SUCCESS) surviving warehouse directory. A pure probe:
    never builds, so the headliner can route to the paid-for layout
    without ever paying the build inside a query (VERDICT r10 #5).

    The directory probe goes through the Hadoop FS API (ADVICE r11),
    the same resolver ``register_surviving_bucketed``/``ensure_table``
    use -- an ``os.path`` probe silently answers False for any
    non-local warehouse (hdfs://, s3a://) and the route would never
    fire exactly where the layout matters most."""
    from .materialized import _warehouse_dir, physical_table_name

    names = tuple(
        physical_table_name(logical, col, num_buckets)
        for logical, col in _supplier_bucketed_names(spark, sf_dir, num_buckets)
    )
    memo_key = (spark, spark.conf.get("spark.sql.warehouse.dir"), names)
    if memo_key in _SUPB_LAYOUT_OK:
        return True
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for t in names:
        if spark.catalog.tableExists(t):
            continue
        p = jvm.org.apache.hadoop.fs.Path(f"{_warehouse_dir(spark, t)}/_SUCCESS")
        if not p.getFileSystem(hconf).exists(p):
            return False
    _SUPB_LAYOUT_OK.add(memo_key)
    return True


def materialize_supplier_bucketed(
    spark: SparkSession,
    sf_dir: str,
    num_buckets: int = 32,
) -> tuple[str, str]:
    """One-time steady-state build for the supplier-volume family
    (VERDICT r9 #3 on the query's 100x floor): write the fact side
    (l_orderkey, l_suppkey, l_extendedprice, l_discount) and the
    filtered ORDER MAP (o_orderkey, cust_nation -- orders joined
    map-side to the broadcast customer/nation/region dims, date filter
    applied) as co-BUCKETED + per-bucket-sorted tables on the
    orderkey. The 1.09 GB omap exchange that stage-profiling showed as
    q_local_supplier_volume's dominant 100x cost (BENCH_NOTES r9) is
    paid HERE once, at ingest/compaction time; every subsequent run's
    fact-fact SMJ reads co-located buckets with NO exchange on either
    side (``operators/scale.write_bucketed`` doctrine -- the
    ``materialize_khop_bucketed`` posture applied to the relational
    headliner; per-bucket Sorts remain, see q_supplier_volume_bucketed).
    Returns the two VIEW names to query."""
    from .materialized import ensure_table

    def build_li() -> DataFrame:
        return read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )

    def build_omap() -> DataFrame:
        o = read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate")
            >= F.lit("1996-01-01 00:00:00").cast("timestamp")
        )
        c = read_table(spark, sf_dir, "customer")
        n = read_table(spark, sf_dir, "nation")
        r = read_table(spark, sf_dir, "region").filter(
            F.col("r_name").isin("ASIA", "EUROPE")
        )
        n2 = n.join(
            F.broadcast(r), n.n_regionkey == r.r_regionkey
        ).select("n_nationkey")
        return (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey"))
            .select(
                "o_orderkey", F.col("c_nationkey").alias("cust_nation")
            )
        )

    (li_t, li_col), (omap_t, omap_col) = _supplier_bucketed_names(
        spark, sf_dir, num_buckets
    )
    li_df = ensure_table(spark, li_t, build_li, li_col, num_buckets)
    omap_df = ensure_table(spark, omap_t, build_omap, omap_col, num_buckets)
    # Query through temp views over the RETURNED frames, not the raw
    # catalog names: in a fresh session the tables exist only on disk
    # (ensure_table tier 2 reads the surviving parquet; the in-memory
    # catalog died with the builder's session), so SQL against the
    # saved name would fail. Tier-1 hits keep the bucketed scan -- the
    # view wraps the catalog relation; tier-2 falls back to a plain
    # parquet scan with identical rows (ensure_table's documented
    # metadata-loss caveat).
    li_v, omap_v = f"{li_t}_v", f"{omap_t}_v"
    li_df.createOrReplaceTempView(li_v)
    omap_df.createOrReplaceTempView(omap_v)
    return li_v, omap_v


@query(
    "q_supplier_volume_bucketed",
    tags=("join", "agg", "J10", "scale"),
    priority=TAIL,  # added r10 -- r11 rotation promotes it (same posture as khop's twin)
    oracle=_SUPPLIER_ORACLE,
)
def q_supplier_volume_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_local_supplier_volume`` in its STEADY-STATE DEPLOYMENT
    posture: fact and order map live on disk co-bucketed on the
    orderkey, so the fact-fact join -- whose 1.09 GB omap exchange is
    the query's profiled 100x floor -- runs with NO Exchange on either
    side; only the |suppkey x nations| partial-aggregate rows shuffle
    (the agg-below-join shape of the shipped above-gate branch,
    unchanged). MEASURED at 100x (scripts/supplier_bucketed_100x.py,
    BENCH_NOTES r10): the docstring claim the r9 verdict flagged read
    "bucketing removes the exchange+sort entirely" -- the measured
    truth is exchange YES, sort NO: Spark 4 no longer propagates disk
    sortBy ordering, so the SMJ keeps cheap per-bucket Sorts of
    already-sorted runs. Row-identical to q_local_supplier_volume
    (same oracle; the integer-cents partial sums are associative).
    First use per (sf_dir, fingerprints) auto-materializes the tables
    -- a deployment runs ``materialize_supplier_bucketed`` at ingest
    time instead; a later SESSION recovers the layout from disk via
    ``materialized.register_surviving_bucketed``."""
    return _supplier_bucketed_frame(spark, sf_dir)


def _supplier_bucketed_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed-SMJ supplier-volume plan over the co-bucketed
    tables -- shared by q_supplier_volume_bucketed (which builds on
    first use) and q_local_supplier_volume's layout-exists route (which
    only ever calls this when the tables are already on disk)."""
    li_t, omap_t = materialize_supplier_bucketed(spark, sf_dir)
    supp = _view(spark, sf_dir, "supplier")
    nat = _view(spark, sf_dir, "nation")
    amount = (
        _CENTS.format(c="l_extendedprice")
        + " * (100 - "
        + _CENTS.format(c="l_discount")
        + ")"
    )
    return spark.sql(f"""
SELECT /*+ BROADCAST(nn) */ nn.n_name AS nation, agg.revenue, agg.n_items
FROM (
  SELECT /*+ BROADCAST(s) */ pre.cust_nation,
         SUM(pre.amt) / CAST(10000.0 AS DOUBLE) AS revenue,
         SUM(pre.n) AS n_items
  FROM (
    SELECT l.l_suppkey, omap.cust_nation, SUM({amount}) AS amt, COUNT(*) AS n
    FROM {li_t} l
    JOIN {omap_t} omap ON l.l_orderkey = omap.o_orderkey
    GROUP BY l.l_suppkey, omap.cust_nation
  ) pre
  JOIN {supp} s
    ON pre.l_suppkey = s.s_suppkey AND s.s_nationkey = pre.cust_nation
  GROUP BY pre.cust_nation
) agg
JOIN {nat} nn ON nn.n_nationkey = agg.cust_nation
ORDER BY revenue DESC, nation
""")


@query(
    "q_shipping_priority",
    headline=True,
    tags=("join", "agg", "topk", "O1"),
    oracle="""
SELECT
  l.l_orderkey,
  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
    / 10000.0 AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k (TPC-H Q3 shape; O1/O3 ordering+limit family).
    Dates are emitted as formatted strings so both engines hash the same
    value regardless of timestamp carrier type. The limit is pushed into
    a TakeOrderedAndProject -- no global sort materialization.

    Same size-gated plan split as ``q_local_supplier_volume`` (gated on
    the derived map's estimated in-memory size, ``_broadcast_map_ok``):
    below the gate, orders pre-joins the broadcast BUILDING-segment
    customers map-side (shrinking to ~1/9 of orders) and the narrow result is
    broadcast to the shipdate-filtered lineitem probe -- no fact
    shuffle. Measured at the 30x corpus: 1.22 -> 0.86 s. Above the
    gate, the classic equi-join shape.
    """
    # SQL-string form (r8): same two size-gated plan shapes, one parse.
    cust = _view(spark, sf_dir, "customer")
    orders = _view(spark, sf_dir, "orders")
    li = _view(spark, sf_dir, "lineitem")
    amount = (
        _CENTS.format(c="l_extendedprice")
        + " * (100 - "
        + _CENTS.format(c="l_discount")
        + ")"
    )
    if _broadcast_map_ok(sf_dir, "orders", _SEL_BUILDING_ORDERS):
        joins = f"""
FROM (SELECT * FROM {li} WHERE l_shipdate > TIMESTAMP '1998-06-01 00:00:00') l
JOIN (
  SELECT /*+ BROADCAST(c) */ o.o_orderkey, o.o_orderdate, o.o_orderpriority
  FROM {orders} o
  JOIN {cust} c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
) omap ON l.l_orderkey = omap.o_orderkey"""
        hint = "/*+ BROADCAST(omap) */"
    else:
        # Sort-merge on orderkey, same rationale as
        # q_local_supplier_volume's above-gate branch (shuffle-hash
        # A/B-tested and slower there).
        joins = f"""
FROM (SELECT * FROM {li} WHERE l_shipdate > TIMESTAMP '1998-06-01 00:00:00') l
JOIN (SELECT * FROM {orders}
      WHERE o_orderdate < TIMESTAMP '1998-06-01 00:00:00') o
  ON l.l_orderkey = o.o_orderkey
JOIN {cust} c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'"""
        hint = "/*+ BROADCAST(c) */"
    return spark.sql(f"""
SELECT {hint} l.l_orderkey,
       SUM({amount}) / CAST(10000.0 AS DOUBLE) AS revenue,
       date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
       o_orderpriority
{joins}
GROUP BY l.l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")


# ---------------------------------------------------------------------------
# Window functions (W1 top-1-per-group; sessionization).
# ---------------------------------------------------------------------------


@query(
    "q_top1_per_group",
    tags=("window", "W1"),
    # r4 rotation: promoted into the driver budget so it earns a driver
    # artifact row (pytest-only through r3); q_hierarchy_longest keeps
    # the other W1 gate.
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
) t
WHERE rn = 1
ORDER BY o_custkey
""",
)
def q_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 per group (W1: the reference's only window --
    ``SORT LENGTH(p1.edges) DESC LIMIT 1`` per start vertex,
    ``AqlQuerySetBuilder.java:95-102``). row_number over a
    deterministically tie-broken ordering.
    """
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    )


@query(
    "q_sessionize",
    tags=("window", "events"),
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts)
                   - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM gaps
GROUP BY user_id
ORDER BY user_id
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events stream table (30-minute
    inactivity gap). The batch analog of the streaming session-window
    operator in streaming/. One shuffle on user_id serves both the lag
    window and the final per-user agg (same partitioning reused).
    """
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    prev_us = F.lag(micros).over(w)
    new_session = F.when(
        prev_us.isNull() | (micros - prev_us > 1800 * 1000 * 1000), 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "q_hourly_rollup",
    tags=("window", "events", "agg"),
    oracle="""
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
  event_type,
  count(*) AS n_events,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup (batch twin of the streaming windowed agg
    in streaming/windows.py). date_trunc keeps the bucket computation
    JVM-side; exact cents for the value sum.
    """
    e = read_table(spark, sf_dir, "events")
    # Hour bucket computed arithmetically from epoch-micros onto a
    # timestamp_ntz base: date_trunc/date_format on an LTZ value would
    # shift with the caller's session timezone (the driver harness may
    # not run UTC); this shape is timezone-independent in any session.
    hour_str = F.expr(
        "date_format(timestampadd(HOUR, "
        "CAST(unix_micros(ts) div 3600000000 AS INT), "
        "timestamp_ntz'1970-01-01 00:00:00'), 'yyyy-MM-dd HH:mm')"
    )
    return (
        e.groupBy(
            hour_str.alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum(cents("value"))).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


@query(
    "q_rolling_window",
    tags=("window", "events", "range-frame"),
    # New in r4 (past the 50-entry budget this round; pytest-oracle-
    # checked now, first driver row via the r5 rotation).
    priority=TAIL,
    oracle="""
WITH daily AS (
  SELECT user_id,
         epoch_us(ts) // 86400000000 AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM events
  GROUP BY 1, 2
)
SELECT user_id, d,
       day_cents,
       CAST(sum(day_cents) OVER (
         PARTITION BY user_id ORDER BY d
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rolling_7d_cents
FROM daily
ORDER BY user_id, d
""",
)
def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling per-user value sum via a RANGE-frame window
    (rangeBetween on the epoch-day index) -- the frame class the
    tumbling/session windows don't cover: the frame is defined by VALUE
    distance, so missing days still bound the window correctly (a
    rows-frame would silently span gaps). Exact integer cents
    throughout; epoch-day arithmetic is session-timezone-independent.
    """
    e = read_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    daily = e.groupBy(F.col("user_id"), day.alias("d")).agg(
        F.sum(cents("value")).cast("long").alias("day_cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rangeBetween(-6, Window.currentRow)
    )
    return (
        daily.withColumn(
            "rolling_7d_cents", F.sum("day_cents").over(w).cast("long")
        )
        .orderBy("user_id", "d")
    )


@query(
    "q_json_props",
    tags=("scalar", "C9", "events"),
    # r4 rotation: 3 green driver rows; events coverage stays via
    # q_sessionize/q_hourly_rollup/q_asof_join.
    priority=TAIL,
    oracle="""
SELECT
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
  count(*) AS n_events,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events
GROUP BY 1
ORDER BY 1
""",
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested key-path extraction (C9 ``get_value_or_none`` over nested
    API JSON, ``LoaderUtilities.py:945-989``) via get_json_object --
    JVM-side JSON path, no UDF.
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum(cents("value"))).alias("sum_value"),
        )
        .orderBy("k_mod")
    )


# ---------------------------------------------------------------------------
# Set operations (U1 union, U2 except).
# ---------------------------------------------------------------------------


@query(
    "q_union_distinct",
    tags=("setop", "U1"),
    # r4 rotation: 3 green driver rows; q_except (promoted) carries the
    # setop family this round.
    priority=TAIL,
    oracle="""
SELECT c_name AS name FROM customer WHERE c_acctbal >= 9000
UNION
SELECT s_name FROM supplier
ORDER BY name
""",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union (U1 ``pd.concat`` + set unions,
    ``CellKnSchemaUtilities.py:59``)."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 9000)
    s = read_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_name").alias("name"))
        .union(s.select("s_name"))
        .distinct()
        .orderBy("name")
    )


@query(
    "q_except_all",
    tags=("setop", "U2"),
    # r4 rotation: 3 green driver rows; swaps with its twin q_except.
    priority=TAIL,
    oracle="""
SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1997
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1998
ORDER BY o_orderpriority
""",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set difference (exceptAll): multiset of 1997 order
    priorities minus 1998's -- each surviving row represents one excess
    occurrence. Complements q_except's distinct semantics."""
    o = read_table(spark, sf_dir, "orders")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_orderpriority")
    y98 = o.filter(F.year("o_orderdate") == 1998).select("o_orderpriority")
    return y97.exceptAll(y98).orderBy("o_orderpriority")


@query(
    "q_except",
    # r4 rotation: promoted (q_except_all rotates to TAIL this round).
    tags=("setop", "U2"),
    oracle="""
SELECT DISTINCT n_name FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
EXCEPT
SELECT DISTINCT n_name FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
ORDER BY n_name
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (U2 missing-subject/object consistency checks,
    ``CellKnSchemaUtilities.py:69-77``)."""
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    cust_nations = n.join(c, c.c_nationkey == n.n_nationkey).select("n_name").distinct()
    supp_nations = n.join(s, s.s_nationkey == n.n_nationkey).select("n_name").distinct()
    return cust_nations.exceptAll(supp_nations).distinct().orderBy("n_name")


# ---------------------------------------------------------------------------
# Scalar expression queries (C1, C2, C3, A1, T6-gram index).
# ---------------------------------------------------------------------------


@query(
    "q_hyphenate",
    tags=("scalar", "C1", "C13"),
    # r4 rotation: promoted for a driver artifact row (pytest-only
    # through r3); q_stable_uuid carries the scalar family to TAIL.
    oracle="""
SELECT p_partkey,
       regexp_replace(p_name, '[ _,/]+', '-', 'g') AS slug,
       upper(substr(p_brand, 1, 1)) || lower(substr(p_brand, 2)) AS brand_cap
FROM part
ORDER BY p_partkey
""",
)
def q_hyphenate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String normalization (C1 hyphenate ``LoaderUtilities.py:263-284``;
    C13 capitalize). Pure codegen expressions."""
    p = read_table(spark, sf_dir, "part")
    brand = F.col("p_brand")
    return p.select(
        "p_partkey",
        hyphenate("p_name").alias("slug"),
        F.concat(
            F.upper(F.substring(brand, 1, 1)), F.lower(F.expr("substring(p_brand, 2)"))
        ).alias("brand_cap"),
    ).orderBy("p_partkey")


@query(
    "q_stable_uuid",
    tags=("scalar", "C2"),
    # r4 rotation: 3 green driver rows; q_hyphenate (promoted) carries
    # the scalar-map family this round.
    priority=TAIL,
    oracle="""
SELECT c_custkey, substr(sha256('cust' || c_name), 1, 12) AS uuid
FROM customer
ORDER BY c_custkey
""",
)
def q_stable_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate id (C2): the reference's random 12-char
    uuid (``LoaderUtilities.py:228-239``) replaced by a stable
    content-hash (SURVEY.md section 7 determinism note).
    """
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", stable_uuid(F.lit("cust"), "c_name").alias("uuid")
    ).orderBy("c_custkey")


@query(
    "q_distinct_tokens",
    tags=("agg", "A1", "explode"),
    # r4 rotation: 3 green driver rows; agg family anchored by
    # q_pricing_summary and the promoted q_collect_sorted_set.
    priority=TAIL,
    oracle="""
SELECT tok, count(*) AS n_parts
FROM (SELECT unnest(string_split(p_type, ' ')) AS tok FROM part) t
GROUP BY tok
ORDER BY tok
""",
)
def q_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode -> distinct/count (A1 distinct gene names from exploded
    marker lists, ``LoaderUtilities.py:661-684``)."""
    p = read_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("tok")
    )


@query(
    "q_ngram_index",
    tags=("text", "T6"),
    # r4 rotation: 3 green driver rows; T6 stays anchored by
    # q_search_prefix plus the promoted q_search_grams.
    priority=TAIL,
    oracle="""
SELECT gram, count(DISTINCT p_partkey) AS n_parts
FROM (
  SELECT p_partkey, substr(lower(p_name), i, 3) AS gram
  FROM part, generate_series(1, 500) g(i)
  WHERE i <= len(p_name) - 2
) t
GROUP BY gram
ORDER BY gram
""",
)
def q_ngram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-3-gram inverted index (T6: the ArangoSearch ngram(3,4)
    view analog, ``ArangoDbUtilities.py:222-250``). Grams are generated
    with sequence/transform Catalyst expressions (no UDF); the index
    build is one explode + one agg -- linear in text size, shuffle on
    gram (bounded key space).
    """
    p = read_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.explode(char_ngrams(F.lower(F.col("p_name")), 3)).alias("gram"))
        .groupBy("gram")
        .agg(F.count_distinct("p_partkey").alias("n_parts"))
        .orderBy("gram")
    )


@query(
    "q_acctbal_stats",
    tags=("agg", "A5"),
    # r4 rotation: promoted for a driver artifact row (pytest-only
    # through r3); q_pricing_summary (headline) anchors A5.
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_acctbal,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         / count(*) / 100.0 AS avg_acctbal,
       min(c_acctbal) AS min_acctbal,
       max(c_acctbal) AS max_acctbal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_acctbal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment stats (A5 histogram family). min/max of raw doubles
    are exact picks (no arithmetic), so they hash identically."""
    c = read_table(spark, sf_dir, "customer")
    bal_c = cents("c_acctbal")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money(F.sum(bal_c)).alias("sum_acctbal"),
            avg_money(F.sum(bal_c), F.count(F.lit(1))).alias("avg_acctbal"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_collect_sorted_set",
    tags=("agg", "A7"),
    # r4 rotation: promoted for a driver artifact row; q_attr_pivot
    # (3 green driver rows) rotates to TAIL this round.
    oracle="""
SELECT o_custkey,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|')
         AS priorities
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
""",
)
def q_collect_sorted_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-set with deterministic ordering (A7 attribute aggregation:
    duplicate predicates promote scalar -> deduped list,
    ``OntologyParserLoader.py:913-921``). sort_array(collect_set(...))
    makes the list value reproducible across partitionings.

    The gate serializes the list as a ``|``-joined string: the driver's
    row hasher cannot hash Python lists (round-1 err), and a canonical
    string is hash-stable across both engines. The array-valued operator
    API is unchanged -- this is gate-surface serialization only.
    """
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities")
        )
        .orderBy("o_custkey")
    )


# Anchor for decay arithmetic: 2024-01-31 as an epoch-day constant
# (the day after the synthetic events range ends). A fixed anchor keeps
# the operator a pure function of the data -- decay queries in
# production pass their own "as of" anchor the same way.
_DECAY_ANCHOR_DAY = 19753


@query(
    "q_decayed_rollup",
    tags=("events", "window"),
    priority=TAIL,  # new in r5 -- pytest-parity now, driver row in the r6 rotation
    oracle=f"""
WITH daily AS (
  SELECT user_id,
         epoch_us(ts) // 86400000000 AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM events
  GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(day_cents >>
                CAST(least(63, greatest(0, {_DECAY_ANCHOR_DAY} - d))
                     AS INTEGER))
            AS BIGINT) AS decayed_cents
FROM daily
GROUP BY user_id
ORDER BY user_id
""",
)
def q_decayed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed per-user value rollup with EXACT integer
    arithmetic: a one-day half-life is a right shift by the age in days
    (cents >> age), so the decayed sum is bit-identical across engines
    -- the shift formulation of exponential decay that floating-point
    pow() scoring cannot oracle-gate. Daily pre-aggregation first
    (map-side combine), then one shift-sum per user; epoch-day
    arithmetic is session-timezone-independent.

    The shift amount is clamped to [0, 63] in BOTH engines: Spark's
    shiftright masks the shift mod 64 (Java semantics) while DuckDB's
    >> does not, so an out-of-range age (an event older than 63 days,
    or after the anchor) would otherwise diverge silently. Age > 63
    means fully decayed (>> 63 == 0 for any sane cents value); a
    post-anchor event is treated as age 0.
    """
    e = read_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    daily = e.groupBy(F.col("user_id"), day.alias("d")).agg(
        F.sum(cents("value")).cast("long").alias("day_cents")
    )
    return (
        daily.groupBy("user_id")
        .agg(
            F.sum(
                F.expr(
                    "shiftright(day_cents, CAST(least(63, greatest(0, "
                    f"{_DECAY_ANCHOR_DAY} - d)) AS INT))"
                )
            )
            .cast("long")
            .alias("decayed_cents")
        )
        .orderBy("user_id")
    )


@query(
    "q_event_funnel",
    tags=("events", "window"),
    priority=TAIL,  # new in r5 -- pytest-parity now, driver row in the r6 rotation
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS step, 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
  UNION ALL
  SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
  UNION ALL
  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p
) t
ORDER BY step
""",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user
    advances a stage only with an event strictly AFTER their previous
    stage's first event -- sequence semantics the plain per-type counts
    cannot express. Each stage is one filtered min-aggregation joined to
    the previous frontier; per-stage user counts come out as one row per
    stage. Stage frontiers shrink monotonically, so the joins get
    cheaper as the funnel deepens (and the frontier broadcasts once it
    fits).
    """
    e = read_table(spark, sf_dir, "events")
    frontier = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_prev"))
    )
    stages = [("view", frontier)]
    for stage in ("click", "purchase"):
        prev = stages[-1][1]
        nxt = (
            e.filter(F.col("event_type") == stage)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t_prev"))
        )
        stages.append((stage, nxt))
    parts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i + 1).alias("step"),
            F.lit(name).alias("stage"),
            "n_users",
        )
        for i, (name, df) in enumerate(stages)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("step")


@query(
    "q_cohort_retention",
    tags=("events", "window"),
    priority=TAIL,  # new in r5 -- pytest-parity now, driver row in the r6 rotation
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // (86400000000 * 7) AS w
  FROM events
),
cohort AS (
  SELECT user_id, min(w) AS cohort_w FROM activity GROUP BY user_id
),
ret AS (
  SELECT c.cohort_w, a.w - c.cohort_w AS week_offset,
         CAST(count(*) AS BIGINT) AS n_users
  FROM activity a JOIN cohort c USING (user_id)
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_w, n_users AS cohort_size FROM ret WHERE week_offset = 0
)
SELECT r.cohort_w, r.week_offset, r.n_users,
       CAST(r.n_users * 1000 // s.cohort_size AS BIGINT) AS retained_permille
FROM ret r JOIN sizes s USING (cohort_w)
ORDER BY cohort_w, week_offset
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active epoch-week,
    counted per week offset, with integer-permille retention against
    the cohort size. The offset-0 row IS the cohort size (a user is
    active in their first week by construction), so no separate sizing
    scan. Epoch-week arithmetic is session-timezone-independent; all
    outputs exact integers. Shuffles: one distinct on (user, week), one
    min-agg, one join on user, one count agg -- all on narrow keys.
    """
    e = read_table(spark, sf_dir, "events")
    week = F.expr("unix_micros(ts) div (86400000000 * 7)")
    activity = e.select("user_id", week.alias("w")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    ret = (
        activity.join(cohort, "user_id")
        .groupBy("cohort_w", (F.col("w") - F.col("cohort_w")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    sizes = ret.filter(F.col("week_offset") == 0).select(
        "cohort_w", F.col("n_users").alias("cohort_size")
    )
    return (
        ret.join(sizes, "cohort_w")
        .select(
            "cohort_w",
            "week_offset",
            "n_users",
            F.expr("CAST(n_users * 1000 div cohort_size AS BIGINT)").alias(
                "retained_permille"
            ),
        )
        .orderBy("cohort_w", "week_offset")
    )


@query(
    "q_fuzzy_name_pairs",
    tags=("lookup", "dedup"),
    priority=TAIL,  # new in r5 -- pytest-parity now, driver row in the r6 rotation
    oracle="""
WITH k AS (SELECT s_suppkey AS id, s_name AS key FROM supplier),
v AS (
  SELECT DISTINCT id, key,
         CASE WHEN i = 0 THEN key
              ELSE substr(key, 1, i - 1) || substr(key, i + 1) END AS variant
  FROM k, generate_series(0, 64) g(i)
  WHERE i <= len(key)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.key AS key_a, b.key AS key_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
)
SELECT id_a, id_b, key_a, key_b,
       CAST(levenshtein(key_a, key_b) AS INTEGER) AS dist
FROM cand
WHERE levenshtein(key_a, key_b) <= 1
ORDER BY id_a, id_b
""",
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-name pairs within Levenshtein distance 1 via the FastSS
    deletion-neighborhood join (operators/lookup.fuzzy_key_pairs) --
    spelling-variant entity resolution without an all-pairs edit
    distance. The oracle spells out the same neighborhood construction;
    both engines verify candidates with exact levenshtein().
    """
    from ..operators.lookup import fuzzy_key_pairs

    s = read_table(spark, sf_dir, "supplier")
    return (
        fuzzy_key_pairs(s, "s_suppkey", "s_name")
        .select(
            "id_a", "id_b", "key_a", "key_b", F.col("dist").cast("int").alias("dist")
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "q_entity_resolution",
    # closure_oracle: the reach CTE materializes all-pairs reachability
    # WITHIN each entity -- quadratic in entity size. The 30x scaled
    # corpus clones every supplier name 30x, merging the clone cliques
    # with the digit-neighbor chain into one ~30k-member entity, i.e.
    # a ~900M-row closure (observed: DuckDB ran away; killed). The
    # parity suite size-gates this tag to gate-scale corpora; the
    # Spark fixpoint is linear-per-round and its 30x rows stand as the
    # scale evidence (BENCH_NOTES).
    tags=("lookup", "dedup", "graph", "closure_oracle"),
    priority=TAIL,  # new in r7 -- pytest-parity now, driver row in the r8 rotation
    oracle="""
WITH RECURSIVE k AS (SELECT s_suppkey AS id, s_name AS key FROM supplier),
v AS (
  SELECT DISTINCT id, key,
         CASE WHEN i = 0 THEN key
              ELSE substr(key, 1, i - 1) || substr(key, i + 1) END AS variant
  FROM k, generate_series(0, 64) g(i)
  WHERE i <= len(key)
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
  WHERE levenshtein(a.key, b.key) <= 1
),
bidir AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT id, id FROM k
  UNION
  SELECT r.src, e.b FROM reach r JOIN bidir e ON e.a = r.dst
),
comp AS (SELECT src AS id, min(dst) AS entity_id FROM reach GROUP BY src),
ent AS (
  SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members
  FROM comp GROUP BY entity_id
)
SELECT e.entity_id, e.n_members, k.key AS canonical_name
FROM ent e JOIN k ON k.id = e.entity_id
ORDER BY entity_id
""",
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: FastSS deletion-neighborhood
    blocking (operators/lookup.fuzzy_key_pairs, edit distance <= 1)
    feeds connected components (operators/dedup.connected_components),
    and each entity reports its canonical record (minimum member id's
    name) and member count -- the keep-one-per-entity read of the
    fuzzy-match family, composing the two machines the registry
    already gates separately (q_fuzzy_name_pairs, q_dedup_clusters).
    The oracle recomputes the same entities via recursive transitive
    closure over the spelled-out neighborhood join. Supplier-sized
    graph: the closure stays dimension-scale (no closure_oracle
    hazard); at corpus scale the Spark side inherits the fixpoint's
    linear-per-round posture while blocking keeps candidate pairs
    near-linear.
    """
    from .materialized import entity_components_frame

    # r8 (VERDICT r7 #4): the resolved assignment is served from the
    # auto-materialized bucketed table -- blocking + CC run once per
    # supplier snapshot, not per call (16.1 s/call at 30x before).
    # SPARK_GRAFT_MATERIALIZE=0 resolves inline (row-identical).
    s = read_table(spark, sf_dir, "supplier")
    comp = entity_components_frame(spark, sf_dir)
    ent = comp.groupBy(F.col("component").alias("entity_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    canon = s.select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("canonical_name"),
    )
    return (
        ent.join(canon, "entity_id")
        .select("entity_id", "n_members", "canonical_name")
        .orderBy("entity_id")
    )


@query(
    "q_table_stats",
    tags=("agg", "profile"),
    priority=TAIL,  # new in r7 -- pytest-parity now, driver row in the r8 rotation
    oracle="""
WITH s AS (
  SELECT 'l_linenumber' AS col_name,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count(l_linenumber) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct,
         CAST(min(l_linenumber) AS BIGINT) AS min_val,
         CAST(max(l_linenumber) AS BIGINT) AS max_val
  FROM lineitem
  UNION ALL
  SELECT 'l_orderkey', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(l_orderkey) AS BIGINT),
         CAST(count(DISTINCT l_orderkey) AS BIGINT),
         CAST(min(l_orderkey) AS BIGINT), CAST(max(l_orderkey) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'l_partkey', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(l_partkey) AS BIGINT),
         CAST(count(DISTINCT l_partkey) AS BIGINT),
         CAST(min(l_partkey) AS BIGINT), CAST(max(l_partkey) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(l_suppkey) AS BIGINT),
         CAST(count(DISTINCT l_suppkey) AS BIGINT),
         CAST(min(l_suppkey) AS BIGINT), CAST(max(l_suppkey) AS BIGINT)
  FROM lineitem
)
SELECT * FROM s ORDER BY col_name
""",
)
def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column statistics of the fact table in one pass
    (operators/scale.column_stats): n_rows / n_nulls / exact NDV /
    min / max for the lineitem key columns -- the stats table behind
    broadcast gates, z-order layout choices, and skew diagnosis.
    Spark compiles the multi-column COUNT(DISTINCT) into a single
    Expand pass; the oracle spells the same stats as per-column scans.
    """
    from ..operators.scale import column_stats

    li = read_table(spark, sf_dir, "lineitem")
    return column_stats(
        li, ("l_linenumber", "l_orderkey", "l_partkey", "l_suppkey")
    )


@query(
    "q_key_skew",
    tags=("agg", "profile"),
    priority=TAIL,  # new in r7 -- pytest-parity now, driver row in the r8 rotation
    oracle="""
WITH pairs AS (
  SELECT 'l_orderkey' AS col_name, l_orderkey AS k FROM lineitem
  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
),
cnt AS (
  SELECT col_name, k, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY col_name, k
),
ranked AS (
  SELECT col_name, k, cnt,
         row_number() OVER (
           PARTITION BY col_name ORDER BY cnt DESC, k
         ) AS rn
  FROM cnt
),
stats AS (
  SELECT col_name,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(max(cnt) AS BIGINT) AS max_group
  FROM cnt GROUP BY col_name
)
SELECT s.col_name, s.n_rows, s.n_groups, s.max_group,
       r.k AS heaviest_key,
       (s.max_group * 1000 * s.n_groups) // s.n_rows AS skew_x1000
FROM stats s JOIN ranked r ON r.col_name = s.col_name AND r.rn = 1
ORDER BY s.col_name
""",
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis (operators/scale.key_skew_profile): per
    lineitem join key, group count, heaviest group and its key, and
    the hottest key's multiple-of-mean in integer permille -- the read
    before choosing salting or an AQE skew threshold. One unpivot pass
    + one (col, key) aggregation; the oracle replays it with a
    per-column rank window.
    """
    from ..operators.scale import key_skew_profile

    li = read_table(spark, sf_dir, "lineitem")
    return key_skew_profile(li, ("l_orderkey", "l_partkey", "l_suppkey"))


@query(
    "q_skew_chooser_join",
    tags=("join", "scale", "profile"),
    priority=TAIL,  # added r12 -- named in the r13 promotion list
    oracle=f"""
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE l_suppkey END AS sk,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
)
SELECT s.s_nationkey AS nation,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(f.cents) AS BIGINT) AS revenue_cents
FROM fact f JOIN supplier s ON s.s_suppkey = f.sk
GROUP BY s.s_nationkey
ORDER BY nation
""",
)
def q_skew_chooser_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measured skew doctrine WIRED into an operator (VERDICT r11
    #5): a pathologically skewed fact -- every even-orderkey lineitem
    collapses onto supplier key 1, so one key owns half the corpus --
    joins its supplier dim through ``operators/scale.skew_aware_join``,
    which diagnoses (``key_skew_profile``: ~500x the mean at sf0.1),
    decides (``choose_skew_remedy`` per the SCALE.md r11 table: AQE
    splitting when the session can runtime-re-plan, content-salting for
    the pathological tail without AQE, plain below 4x), and remedies.
    Every route is row-identical (tests/test_scale_ops.py asserts the
    routing AND the identity on this synthetic); the gate hashes the
    joined aggregate, so the remedy can never change results. Integer
    cents keep the revenue hash engine-exact.
    """
    from ..functions.money import cents
    from ..operators.scale import skew_aware_join
    from .models import lineitem_hot1_skew

    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    fact = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .cast("long")
        .alias("sk"),
        cents("l_extendedprice").alias("cents"),
    )
    dim = supp.select(
        F.col("s_suppkey").cast("long").alias("sk"), "s_nationkey"
    )
    # The diagnostic stat is served from the fingerprint-keyed ANALYZE
    # registry (plans/models.lineitem_hot1_skew) instead of a full
    # profile scan per build -- the r12 optimization; the route cannot
    # change rows (every remedy is row-identical, test_scale_ops.py).
    joined, _remedy = skew_aware_join(
        fact, dim, "sk", skew_x1000=lineitem_hot1_skew(spark, sf_dir)
    )
    return (
        joined.groupBy(F.col("s_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("nation")
    )


@query(
    "q_fk_integrity",
    tags=("join", "profile"),
    priority=TAIL,  # new in r7 -- pytest-parity now, driver row in the r8 rotation
    oracle="""
SELECT * FROM (
  SELECT 'customer.c_nationkey->nation' AS fk_name,
         CAST(count(*) AS BIGINT) AS n_child,
         CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_orphans
  FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
  UNION ALL
  SELECT 'lineitem.l_orderkey->orders', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
  UNION ALL
  SELECT 'lineitem.l_partkey->part', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
  UNION ALL
  SELECT 'orders.o_custkey->customer', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
) t ORDER BY fk_name
""",
)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (operators/scale.fk_integrity) over
    the star schema's five FK edges: child count + orphan count per
    edge. The pre-flight check that joins are lossless and the
    post-flight check after an incremental load; parent key sets
    broadcast (dims), one aggregate per edge.
    """
    from ..operators.scale import fk_integrity

    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return fk_integrity(
        [
            (
                "customer.c_nationkey->nation",
                c,
                "c_nationkey",
                read_table(spark, sf_dir, "nation"),
                "n_nationkey",
            ),
            ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
            (
                "lineitem.l_partkey->part",
                li,
                "l_partkey",
                read_table(spark, sf_dir, "part"),
                "p_partkey",
            ),
            (
                "lineitem.l_suppkey->supplier",
                li,
                "l_suppkey",
                read_table(spark, sf_dir, "supplier"),
                "s_suppkey",
            ),
            ("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        ]
    )


@query(
    "q_product_profit",
    tags=("relational", "J1", "A5"),
    priority=TAIL,  # new in r8 -- pytest-parity now, driver row in the r9 rotation
    oracle="""
WITH amounts AS (
  SELECT s.s_nationkey,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
         - CAST(round(p.p_retailprice * 100) AS BIGINT)
           * CAST(l.l_quantity AS BIGINT) * 100 AS amount_cp
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE p.p_name LIKE '%red%'
)
SELECT n.n_name AS nation, a.o_year,
       sum(a.amount_cp) / 10000.0 AS profit
FROM amounts a JOIN nation n ON n.n_nationkey = a.s_nationkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
""",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit, adapted to this lake's
    schema: no partsupp, so cost = retail price x quantity): per
    (nation, year), sum of discounted revenue minus part cost over
    lineitems whose part name contains 'red' -- the classic 5-table
    join-ordering stressor (two dimension filters, one fact-fact
    equi-join).

    Plan shape: part is FILTERED THEN BROADCAST (the LIKE prunes it
    dimension-side before any fact work), supplier and nation
    broadcast, so lineitem is probed map-side by three dims and the
    only corpus-sized exchange is the lineitem-orders equi-join on
    orderkey -- the key both facts bucket on at lake scale
    (operators/scale.write_bucketed), where this query becomes
    exchange-free. Money stays in exact integer cent-percent units
    (functions/money.cents doctrine); the single final division is the
    one IEEE op, so profit hashes bit-identically to the oracle.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    amount = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    ) - cents("p_retailprice") * qty_long("l_quantity") * F.lit(100)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg((F.sum(amount) / F.lit(10000.0)).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )
