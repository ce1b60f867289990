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
