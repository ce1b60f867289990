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
