"""Streaming pipeline builders: source → transform → sink.

The construction analog of the reference's
``SparkUtils.createStreamPartition`` + example wiring
(``examples/.../KafkaWordCount.scala:34-77``), expressed as
Structured Streaming. Offsets/commit bookkeeping (S6/S7) ride the
``checkpointLocation``; sinks Q6 (console) plus Kafka/parquet/memory/
noop/foreachBatch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

#: Schema of the events stream (FIXTURES.md) when replayed as files/Kafka.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_SCHEMA,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based stream (test/replay source; also the 100 TB pattern
    for landing-zone ingestion). ``maxFilesPerTrigger`` is the batch
    bound — the ``bufferSize`` analog (reference `:42`)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Synthetic load source — replaces the example's random-word Kafka
    producer (``KafkaWordCountProducer``, ``KafkaWordCount.scala:81-114``)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def start_sink(
    df: DataFrame,
    sink: str = "memory",
    query_name: str = "q",
    checkpoint: str | None = None,
    output_mode: str = "append",
    path: str | None = None,
    trigger_seconds: float | None = None,
    foreach_batch: Callable[[DataFrame, int], None] | None = None,
    available_now: bool = False,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Start a sink by name: memory | console | parquet | noop | foreachBatch.

    ``checkpoint`` carries the offset/commit logs — the engine's HBase
    replacement (S6/S7). ``foreach_batch`` is the idempotent-sink hook
    for exactly-once writes to non-transactional stores (the pattern the
    reference approximates with HBase flushCommits,
    ``...InputDStream.scala:409``).

    ``partition_by`` lays out file sinks hive-style (e.g. by event
    date) — the landing-zone layout that gives downstream batch readers
    partition pruning at 100 TB.
    """
    writer = df.writeStream.outputMode(output_mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    if foreach_batch is not None:
        return writer.foreachBatch(foreach_batch).start()
    if sink == "memory":
        return writer.format("memory").queryName(query_name).start()
    if sink == "console":
        return writer.format("console").start()
    if sink == "parquet":
        return writer.format("parquet").option("path", path).start()
    if sink == "noop":
        return writer.format("noop").start()
    raise ValueError(f"unknown sink {sink!r}")
