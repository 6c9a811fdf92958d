"""Stream health monitoring — the engine's answer to the reference's
HBase bookkeeping columns + JMX metrics (M1-M3).

The reference persists, per (group, topic, partition): committed
offset, cumulative consumed count, hostname, error status, leader
(``persistOffset``, ``PartitionedSimpleConsumerKafkaInputDStream.scala:
384-415``), registers per-partition gauges/meters in Spark's
MetricRegistry (``addNewTpData`` `:214-232`), and computes consumer lag
client-side by zipping Kafka head offsets with HBase committed offsets
(``ProcessorMetrics.calculateDeltas``, ``ProcessorMetrics.scala:21-101``).

Structured Streaming already emits all of that in each progress event:
``sources[i].{startOffset,endOffset,latestOffset,numInputRows,
inputRowsPerSecond}`` — this module captures the events, persists them
as JSON lines (the HBase-table analog, pluggable to any sink), and
derives per-partition lag (the ``calculateDeltas`` analog) without a
second Kafka/ZK round-trip.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Persists every query-progress event as one JSON line.

    ``jsonl_path=None`` keeps events in memory only (tests).
    """

    def __init__(self, jsonl_path: str | None = None):
        self.jsonl_path = jsonl_path
        self.events: list[dict[str, Any]] = []
        self.terminated: list[str] = []
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface ------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        progress = json.loads(event.progress.json)
        with self._lock:
            self.events.append(progress)
            if self.jsonl_path:
                os.makedirs(os.path.dirname(self.jsonl_path) or ".", exist_ok=True)
                with open(self.jsonl_path, "a") as f:
                    f.write(json.dumps(progress) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self.terminated.append(str(event.id))

    # -- derived metrics (ProcessorMetrics.calculateDeltas analog) -----
    def latest_progress(self) -> dict[str, Any] | None:
        with self._lock:
            return self.events[-1] if self.events else None

    def consumer_lag(self) -> dict[str, dict[str, int]]:
        """Per topic-partition: latest broker offset − processed offset.

        Mirrors the (kafkaHead, committed) map of ``calculateDeltas``
        (``ProcessorMetrics.scala:86-89``) using the source progress of
        the last micro-batch. Non-Kafka sources (files, rate) have no
        per-partition offset JSON → empty dict.
        """
        progress = self.latest_progress()
        if not progress:
            return {}
        lags: dict[str, dict[str, int]] = {}
        for src in progress.get("sources", []):
            latest, end = src.get("latestOffset"), src.get("endOffset")
            try:
                latest_map = json.loads(latest) if isinstance(latest, str) else latest
                end_map = json.loads(end) if isinstance(end, str) else end
                for topic, parts in (latest_map or {}).items():
                    if not isinstance(parts, dict):
                        continue
                    for part, head in parts.items():
                        committed = (end_map or {}).get(topic, {}).get(part, 0)
                        lags.setdefault(topic, {})[part] = int(head) - int(committed)
            except (TypeError, ValueError, AttributeError):
                continue
        return lags

    def late_data(self) -> dict[str, int]:
        """Cumulative late-data accounting across all recorded batches:
        rows dropped by the watermark and the current state footprint.

        The correctness observable event-time pipelines must alarm on —
        a rising drop count means the watermark delay is too tight for
        the source's disorder (the reference's DStream path silently
        mis-bucketed late records; Structured Streaming drops them and
        REPORTS it here via ``stateOperators[i].numRowsDroppedByWatermark``).
        """
        with self._lock:
            events = list(self.events)
        dropped = 0
        state_rows = 0
        for progress in events:
            for op in progress.get("stateOperators", []) or []:
                dropped += int(op.get("numRowsDroppedByWatermark", 0) or 0)
        if events:
            for op in events[-1].get("stateOperators", []) or []:
                state_rows += int(op.get("numRowsTotal", 0) or 0)
        return {"rowsDroppedByWatermark": dropped, "stateRowsTotal": state_rows}

    def throughput(self) -> dict[str, float]:
        """Rows/sec in and processed (the per-partition meter analog,
        ``...InputDStream.scala:228``)."""
        progress = self.latest_progress()
        if not progress:
            return {}
        return {
            "inputRowsPerSecond": progress.get("inputRowsPerSecond", 0.0) or 0.0,
            "processedRowsPerSecond": progress.get("processedRowsPerSecond", 0.0)
            or 0.0,
            "numInputRows": progress.get("numInputRows", 0) or 0,
        }
