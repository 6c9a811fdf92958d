"""Custom stateful streaming via the Spark 4.x ``transformWithState``
StatefulProcessor API (the successor of ``applyInPandasWithState``,
see ``state.py`` for the 3.x-style equivalents).

Why this API matters at scale: state is typed and composable
(ValueState / ListState / MapState per key instead of one opaque
tuple), supports per-state TTL (bounded state without manual timeout
bookkeeping — the knob that keeps a 100 TB dedup's RocksDB store from
growing forever), and timers are first-class (many per key, event- or
processing-time).

Reference parity: the reference's only state is per-partition
``ConsumerData`` mutated inside the receiver
(``PartitionedSimpleConsumerKafkaInputDStream.scala:22-26``); these are
the user-level keyed-state generalization SURVEY.md §2b requires.

Gated capability: the transformWithState state protocol speaks
protobuf between the JVM and the Python state server; environments
without ``google.protobuf`` (like this container) can construct these
plans but not run them — entry points raise a clear error up front,
mirroring the Kafka/Avro jar gates. ``state.py`` is the runnable
fallback with equivalent semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

class TransformWithStateNotAvailable(RuntimeError):
    """Raised when the protobuf dependency of transformWithState is absent."""


def is_tws_available() -> bool:
    """True when the Python side of the state protocol can run."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def require_tws() -> None:
    if not is_tws_available():
        raise TransformWithStateNotAvailable(
            "transformWithState needs the 'protobuf' package "
            "(google.protobuf) for the JVM<->Python state protocol; "
            "install protobuf or use streaming.state (applyInPandasWithState) "
            "which has equivalent operators with no extra dependency"
        )


EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)

TYPE_COUNTS_SCHEMA = "user_id bigint, event_type string, n bigint, total double"


class RunningTypeCountsProcessor(StatefulProcessor):
    """Per-user MapState: event_type → (count, value sum).

    Emits one row per (user, type) whose counts changed in the batch
    (update-mode semantics). MapState means a user with 1000 distinct
    event types only touches the entries present in the batch — a
    ValueState holding the whole dict would rewrite everything.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "n bigint, total double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        updated: dict[str, tuple[int, float]] = {}
        for pdf in rows:
            for et, grp in pdf.groupby("event_type"):
                if et in updated:
                    n, total = updated[et]
                elif self._counts.containsKey((et,)):
                    n, total = self._counts.getValue((et,))
                else:
                    n, total = 0, 0.0
                n += len(grp)
                total += float(grp["value"].sum())
                self._counts.updateValue((et,), (n, total))
                updated[et] = (n, total)
        if updated:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(updated),
                    "event_type": list(updated),
                    "n": [v[0] for v in updated.values()],
                    "total": [v[1] for v in updated.values()],
                }
            )

    def close(self) -> None:
        pass


class FirstSeenProcessor(StatefulProcessor):
    """Streaming exact dedup with TTL-bounded state: emit only the first
    row seen per key; remember the key for ``ttl_ms`` (forever if None).

    This is ``dropDuplicates`` with an explicit state budget — at 100 TB
    the TTL is what makes infinite-stream dedup feasible: RocksDB holds
    one boolean per key only for the TTL horizon, and re-occurrences
    beyond it are accepted as new (the documented trade-off).
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "seen boolean", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        self._seen.update((True,))
        for pdf in rows:
            if len(pdf):
                yield pdf.head(1)
                return

    def close(self) -> None:
        pass


class SessionTimerProcessor(StatefulProcessor):
    """Sessionization with first-class processing-time timers: accumulate
    (count, sum) per user, (re)arm a gap timer on every batch, emit and
    clear when the timer expires — the ``transformWithState`` version of
    ``state.py::sessionize_with_state``.
    """

    def __init__(self, gap_ms: int = 30 * 60 * 1000) -> None:
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._acc = handle.getValueState("acc", "n bigint, total double")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = self._acc.get() if self._acc.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._acc.update((n, total))
        # One timer per key: re-arming replaces the previous deadline.
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._gap_ms
        )
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if self._acc.exists():
            n, total = self._acc.get()
            self._acc.clear()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

    def close(self) -> None:
        pass


def running_type_counts_tws(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) running counts via transformWithState."""
    require_tws()
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTypeCountsProcessor(),
        outputStructType=TYPE_COUNTS_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def first_seen_dedup_tws(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Streaming exact dedup on event_id with optional state TTL."""
    require_tws()
    return events.groupBy("event_id").transformWithStateInPandas(
        FirstSeenProcessor(ttl_ms=ttl_ms),
        outputStructType=EVENT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def sessionize_tws(events: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Timer-driven sessionization (processing-time gap)."""
    require_tws()
    return events.groupBy("user_id").transformWithStateInPandas(
        SessionTimerProcessor(gap_ms=gap_ms),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="append",
        timeMode="processingTime",
    )
