"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming, but its restartable fetch counters are
the moral equivalent of per-key running state. This module provides the
canonical custom-stateful shape: per-user running aggregates maintained
across micro-batches with explicit GroupState -- the tool to reach for
when watermarked windows can't express the semantics (e.g. lifetime
counters, custom session logic, cross-batch dedup).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime (n_events, sum_value), updated every
    micro-batch. State lives in the checkpointed state store; a restart
    resumes exactly (the streaming twin of the K2 fetch-cache pattern).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEBOUNCE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts_us", LongType()),
    ]
)

DEBOUNCE_STATE = StructType([StructField("last_us", LongType())])


def _ts_us(col: pd.Series) -> pd.Series:
    """Epoch micros from a pandas timestamp column, robust to the
    Arrow conversion yielding datetime64[ns] (pandas 1/2 default) or
    datetime64[us] (pandas 2 with us-precision Arrow types)."""
    return pd.Series(pd.DatetimeIndex(col).asi8, index=col.index) // (
        1000 if pd.DatetimeIndex(col).dtype == "datetime64[ns]" else 1
    )


def _make_debounce(gap_us: int):
    def _debounce(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.assign(_us=_ts_us(batch["ts"])).sort_values(
            ["_us", "event_id"], kind="mergesort"
        )
        keep = []
        for us in batch["_us"]:
            keep.append(last is None or us - last > gap_us)
            last = int(us)  # gap to the PREVIOUS event, kept or dropped
        state.update((last,))
        kept = batch[pd.Series(keep, index=batch.index)]
        yield pd.DataFrame(
            {
                "event_id": kept["event_id"].astype("int64"),
                "user_id": kept["user_id"].astype("int64"),
                "event_type": kept["event_type"],
                "ts_us": kept["_us"].astype("int64"),
            }
        )

    return _debounce


def debounced_stream(
    events: DataFrame, gap_us: int = 10_000_000
) -> DataFrame:
    """Streaming debounce-at-ingest: suppress events that follow
    another event of the same (user_id, event_type) within ``gap_us``,
    measured to the immediately preceding event (kept or dropped) --
    bit-identical to the batch twin q_event_debounce when run
    availableNow over the same frame. State is ONE i64 per live key
    (the last-seen event timestamp), the minimum possible for this
    semantics -- bounded regardless of stream length; a production
    deployment would add an event-time timeout to expire keys idle
    past the debounce horizon. Within a micro-batch each key's rows
    are sorted by (ts, event_id), so replays and availableNow runs
    are deterministic.

    Non-streaming input falls back to the lag-window formulation
    (identical semantics, no state store).
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id", "event_type").orderBy(
            "ts", "event_id"
        )
        micros = F.unix_micros(F.col("ts"))
        prev_us = F.lag(micros).over(w)
        return (
            events.select(
                "event_id",
                "user_id",
                "event_type",
                micros.alias("ts_us"),
                prev_us.alias("prev_us"),
            )
            .filter(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") > gap_us)
            )
            .select("event_id", "user_id", "event_type", "ts_us")
        )
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _make_debounce(gap_us),
        outputStructType=DEBOUNCE_SCHEMA,
        stateStructType=DEBOUNCE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FILL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("d", LongType()),
        StructField("n_obs", LongType()),
        StructField("cents_filled", LongType()),
    ]
)

FILL_STATE = StructType(
    [StructField("last_d", LongType()), StructField("last_cents", LongType())]
)

_US_PER_DAY = 86_400_000_000


def _fill(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.assign(_us=_ts_us(batch["ts"])).sort_values(
        ["_us", "event_id"], kind="mergesort"
    )
    batch["_d"] = batch["_us"] // _US_PER_DAY
    batch["_cents"] = (batch["value"] * 100).round().astype("int64")
    # Day-close value = last row per day in (ts, event_id) order;
    # n_obs = rows per day.
    closes = batch.groupby("_d")["_cents"].last()
    counts = batch.groupby("_d")["_cents"].size()
    last_d, last_cents = (
        state.get if state.exists else (None, None)
    )
    start = int(closes.index.min()) if last_d is None else last_d + 1
    end = int(closes.index.max())
    out_d, out_n, out_c = [], [], []
    for day in range(start, end + 1):
        if day in closes.index:
            last_cents = int(closes[day])
            n = int(counts[day])
        else:
            n = 0
        out_d.append(day)
        out_n.append(n)
        out_c.append(last_cents)
    state.update((end, last_cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out_d),
            "d": out_d,
            "n_obs": out_n,
            "cents_filled": out_c,
        }
    )


def filled_daily_stream(events: DataFrame) -> DataFrame:
    """Streaming forward-fill at ingest (the stateful twin of
    ``operators/timeseries.gap_fill_daily``): per user, one row per
    epoch day from the user's FIRST observation onward, the day-close
    value (last event by (ts, event_id)) carried across silent days.
    State is two i64 per live key (last emitted day + its close) — the
    minimum for carry-forward; a production deployment adds an
    event-time timeout to retire idle keys.

    Scope note vs the batch twin: the batch grid spans the GLOBAL
    [min, max] day range (leading NULLs before a key's first
    observation, trailing fill to the corpus's last day). A per-key
    stateful operator cannot know global bounds, so the stream emits
    each key's own [first, last-seen] span; run availableNow over the
    static frame, it equals the batch result restricted to that span
    (asserted in tests). Late (pre-state) events are dropped by
    construction — pair with a watermark upstream.

    Non-streaming input takes the same per-key-span computation as a
    batch plan (daily agg + per-key sequence explode + ffill window).
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        base = events.select(
            F.col("user_id").alias("key"),
            F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("d"),
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        daily = base.groupBy("key", "d").agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.max(F.struct("ts", "event_id", "cents"))
            .getField("cents")
            .alias("cents_eod"),
        )
        bounds = daily.groupBy("key").agg(
            F.min("d").alias("dmin"), F.max("d").alias("dmax")
        )
        grid = bounds.select(
            "key", F.explode(F.sequence("dmin", "dmax")).alias("d")
        )
        w = (
            Window.partitionBy("key")
            .orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return grid.join(daily, ["key", "d"], "left").select(
            F.col("key").alias("user_id"),
            "d",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.last("cents_eod", ignorenulls=True).over(w).alias("cents_filled"),
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _fill,
        outputStructType=FILL_SCHEMA,
        stateStructType=FILL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


QUOTA_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("cents", LongType()),
        StructField("cum_cents", LongType()),
    ]
)

QUOTA_STATE = StructType([StructField("total", LongType())])


def _make_quota(budget_cents: int):
    def _quota(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.assign(_us=_ts_us(batch["ts"])).sort_values(
            ["_us", "event_id"], kind="mergesort"
        )
        # Exact integer cents, identical to functions.money.cents: the
        # doubles are exact cents by construction, so round() == the
        # signum trick on this data.
        c = (batch["value"] * 100).round().astype("int64")
        keep, cums = [], []
        for v in c:
            total += int(v)  # prefix semantics: every event consumes
            keep.append(total <= budget_cents)
            cums.append(total)
        state.update((total,))
        kept = pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "user_id": batch["user_id"].astype("int64"),
                "cents": c,
                "cum_cents": pd.Series(cums, index=batch.index, dtype="int64"),
            }
        )[pd.Series(keep, index=batch.index)]
        yield kept

    return _quota


def quota_admitted_stream(
    events: DataFrame, budget_cents: int = 2000
) -> DataFrame:
    """Per-key quota admission at ingest: admit events, in (ts,
    event_id) order per user, while the user's PREFIX spend (every
    seen event counts, admitted or not) stays within ``budget_cents``
    -- the sampling/budget-enforcement step of an ingest pipeline run
    where the data arrives, not as a batch afterthought. Prefix
    semantics (rather than admitted-only spend) is what a window
    cumsum expresses, so the batch twin -- and the q_ingest_quota SQL
    oracle -- is one window pass, bit-identical to the streamed run.

    State is ONE i64 per user (lifetime prefix spend): bounded
    regardless of stream length, mergeable across restarts by
    construction. Within a micro-batch each user's rows are sorted by
    (ts, event_id), so availableNow replays are deterministic.

    Returns admitted (event_id, user_id, cents, cum_cents).

    Non-streaming input falls back to the window-cumsum formulation
    (identical semantics, no state store).
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from ..functions.money import cents

        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        c = cents(F.col("value"))
        return (
            events.select(
                "event_id",
                "user_id",
                c.alias("cents"),
                F.sum(c).over(w).alias("cum_cents"),
            )
            .filter(F.col("cum_cents") <= budget_cents)
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_quota(budget_cents),
        outputStructType=QUOTA_SCHEMA,
        stateStructType=QUOTA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
