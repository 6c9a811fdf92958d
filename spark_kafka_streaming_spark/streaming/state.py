"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's state is per-partition ``ConsumerData`` mutated inside
the receiver (``PartitionedSimpleConsumerKafkaInputDStream.scala:22-26``)
— infrastructure state. This module shows *user-level* keyed state, the
capability SURVEY.md §2b row "stateful streaming" requires: a running
per-key aggregate with timeout-based session emission.

Scale: state lives in the state store (RocksDB provider configured in
session.py), partitioned by key — the same shuffle as a streaming
groupBy; no driver-side state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)
SESSION_STATE_SCHEMA = "n long, total double, last_us long"


def _session_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per user; emit and clear on timeout."""
    if state.hasTimedOut:
        n, total, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )
        return
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    state.setTimeoutDuration(30 * 60 * 1000)  # 30 min session gap
    yield pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "total_value": pd.Series([], dtype="float64"),
            "last_ts": pd.Series([], dtype="datetime64[us]"),
        }
    )


def sessionize_with_state(events: DataFrame) -> DataFrame:
    """Keyed custom state machine over a stream of events rows.

    Emits one row per (user, session) when the 30-minute processing-time
    timeout fires — the `applyInPandasWithState` generalization of
    `session_window` for logic windows can't express.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def running_totals_with_state(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user totals (update mode, no timeout) —
    the simplest custom stateful operator; used by tests to pin state
    round-trip semantics."""

    def fn(key, pdfs, state: GroupState):
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
