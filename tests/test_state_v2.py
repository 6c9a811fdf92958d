"""transformWithState (Spark 4.x StatefulProcessor) operator tests.

Runtime semantics tests auto-activate when ``protobuf`` is installed
(the state-protocol dependency); in this container only the gate
behavior is runnable.
"""

from __future__ import annotations

import json
import os

import pytest

from spark_kafka_streaming_spark.streaming.pipeline import file_stream, start_sink
from spark_kafka_streaming_spark.streaming.state_v2 import (
    TransformWithStateNotAvailable,
    first_seen_dedup_tws,
    is_tws_available,
    running_type_counts_tws,
)

needs_tws = pytest.mark.skipif(
    not is_tws_available(),
    reason="google.protobuf not installed (transformWithState state protocol)",
)


def test_tws_gated_clearly(spark, tmp_path):
    """Without protobuf the builders fail fast with a clear remedy."""
    if is_tws_available():
        pytest.skip("protobuf present; gate inactive")
    src = str(tmp_path / "gate_src")
    os.makedirs(src)
    with pytest.raises(TransformWithStateNotAvailable, match="protobuf"):
        running_type_counts_tws(file_stream(spark, src))


def _emit(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _row(eid, user, etype, value, minute=0):
    return {
        "event_id": eid,
        "ts": f"2024-01-01T10:{minute:02d}:00.000000Z",
        "user_id": user,
        "event_type": etype,
        "value": value,
        "props": "{}",
    }


@needs_tws
def test_running_type_counts_accumulate_across_batches(spark, tmp_path):
    """MapState per (user, type) accumulates; only touched types re-emit."""
    src = str(tmp_path / "tws_src")
    os.makedirs(src)
    _emit(src, "b1.json", [
        _row(1, 7, "click", 1.5, 0),
        _row(2, 7, "view", 2.5, 1),
        _row(3, 9, "click", 10.0, 2),
    ])
    q = start_sink(
        running_type_counts_tws(file_stream(spark, src, max_files_per_trigger=1)),
        "memory", query_name="tws_counts", output_mode="update",
        checkpoint=str(tmp_path / "ck_tws"),
    )
    q.processAllAvailable()
    _emit(src, "b2.json", [_row(4, 7, "click", 6.0, 3)])
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    latest = {}
    for r in spark.sql("SELECT * FROM tws_counts").collect():
        latest[(r.user_id, r.event_type)] = (r.n, r.total)
    assert latest[(7, "click")] == (2, 7.5)
    assert latest[(7, "view")] == (1, 2.5)
    assert latest[(9, "click")] == (1, 10.0)


@needs_tws
def test_first_seen_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """ValueState dedup: duplicate event_ids (same and later batches) drop."""
    src = str(tmp_path / "dedup_src")
    os.makedirs(src)
    _emit(src, "b1.json", [
        _row(1, 7, "click", 1.0, 0),
        _row(1, 7, "click", 1.0, 0),  # intra-batch dup
        _row(2, 9, "view", 2.0, 1),
    ])
    q = start_sink(
        first_seen_dedup_tws(file_stream(spark, src, max_files_per_trigger=1)),
        "memory", query_name="tws_dedup", output_mode="append",
        checkpoint=str(tmp_path / "ck_dedup"),
    )
    q.processAllAvailable()
    _emit(src, "b2.json", [
        _row(1, 7, "click", 1.0, 0),  # cross-batch dup
        _row(3, 7, "click", 3.0, 2),
    ])
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    rows = spark.sql("SELECT event_id FROM tws_dedup").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3]
