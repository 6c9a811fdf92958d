"""Streaming failure-injection tests: sink crashes, poison records,
schema drift — the failure modes the reference handles imperatively
(error-state machine, ``...InputDStream.scala:324-370``) re-expressed
as checkpoint-replay + dead-letter routing + permissive decode.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from spark_kafka_streaming_spark.streaming.decode import (
    dead_letters,
    decode_json_with_dlq,
    valid_records,
)
from spark_kafka_streaming_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    file_stream,
    start_sink,
)


def _row(eid, uid=7, value=1.0, minute=0):
    return {
        "event_id": eid,
        "ts": f"2024-01-01T10:{minute:02d}:00.000000Z",
        "user_id": uid,
        "event_type": "click",
        "value": value,
        "props": "{}",
    }


def _emit(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write((json.dumps(r) if isinstance(r, dict) else r) + "\n")


def test_sink_crash_then_restart_is_exactly_once(spark, tmp_path):
    """Inject a sink failure mid-batch; the query dies, the restart
    replays the uncommitted batch from the checkpoint, and the
    idempotent (batch_id-keyed) writer leaves exactly one copy."""
    src = str(tmp_path / "crash_src")
    out = str(tmp_path / "crash_out")
    ck = str(tmp_path / "crash_ck")
    poison_flag = tmp_path / "poison_armed"
    os.makedirs(src)
    poison_flag.touch()

    def upsert(df, batch_id):
        rows = df.collect()
        if poison_flag.exists() and any(r.event_id == 13 for r in rows):
            raise RuntimeError("injected sink failure")
        spark.createDataFrame(rows, df.schema).write.mode("overwrite").parquet(
            f"{out}/batch={batch_id}"
        )

    _emit(src, "b1.json", [_row(i) for i in range(10)])
    q = start_sink(file_stream(spark, src, max_files_per_trigger=1),
                   foreach_batch=upsert, checkpoint=ck)
    q.processAllAvailable()
    _emit(src, "b2.json", [_row(i) for i in range(10, 20)])  # contains 13
    with pytest.raises(StreamingQueryException, match="injected sink failure"):
        q.processAllAvailable()
        q.awaitTermination(60)
    assert not q.isActive

    poison_flag.unlink()  # "fix" the sink
    q2 = start_sink(file_stream(spark, src, max_files_per_trigger=1),
                    foreach_batch=upsert, checkpoint=ck)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    got = spark.read.parquet(out)
    assert got.count() == 20
    assert got.select("event_id").distinct().count() == 20


def test_poison_records_routed_to_dead_letter_not_lost(spark, tmp_path):
    """Malformed payloads neither kill the stream nor vanish: the DLQ
    split keeps them (raw) while valid rows keep flowing."""
    src = str(tmp_path / "dlq_src")
    os.makedirs(src)
    _emit(src, "b1.txt", [
        json.dumps(_row(1)),
        "{not json at all",
        json.dumps(_row(2)),
        "garbage-line",
    ])
    lines = spark.readStream.text(src)
    decoded = decode_json_with_dlq(lines, EVENTS_SCHEMA)

    q_ok = start_sink(valid_records(decoded), "memory", query_name="dlq_ok",
                      checkpoint=str(tmp_path / "ck_ok"))
    q_bad = start_sink(dead_letters(decoded), "memory", query_name="dlq_bad",
                       checkpoint=str(tmp_path / "ck_bad"))
    q_ok.processAllAvailable()
    q_bad.processAllAvailable()
    q_ok.stop(); q_bad.stop()
    q_ok.awaitTermination(30); q_bad.awaitTermination(30)

    ok = spark.sql("SELECT event_id FROM dlq_ok").collect()
    assert sorted(r.event_id for r in ok) == [1, 2]
    bad = spark.sql("SELECT _raw FROM dlq_bad").collect()
    assert sorted(r._raw for r in bad) == ["garbage-line", "{not json at all"]


def test_schema_drift_does_not_break_the_stream(spark, tmp_path):
    """Producer-side drift: unknown extra fields are ignored, missing
    fields decode as null — the stream keeps running either way (the
    declarative form of the reference's tolerant flat-mapper)."""
    src = str(tmp_path / "drift_src")
    os.makedirs(src)
    extra = dict(_row(1), brand_new_field="surprise")
    missing = {"event_id": 2, "ts": "2024-01-01T10:05:00.000000Z"}
    _emit(src, "b1.txt", [json.dumps(extra), json.dumps(missing)])

    decoded = decode_json_with_dlq(spark.readStream.text(src), EVENTS_SCHEMA)
    q = start_sink(valid_records(decoded), "memory", query_name="drift",
                   checkpoint=str(tmp_path / "ck_drift"))
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    rows = {r.event_id: r for r in spark.sql("SELECT * FROM drift").collect()}
    assert set(rows) == {1, 2}
    assert rows[1].value == 1.0          # extra field ignored
    assert rows[2].user_id is None       # missing fields → null
    assert rows[2].ts is not None
