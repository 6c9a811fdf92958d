"""Kafka source/sink — the Structured Streaming replacement for the
reference's entire receiver stack.

Reference → engine mapping (SURVEY.md §2a):

* S1 receiver (``PartitionedSimpleConsumerKafkaInputDStream.scala:48-487``)
  → ``spark.readStream.format("kafka")``: one Spark task per Kafka
  partition, offsets tracked per micro-batch.
* S2 factory (``SparkUtils.scala:18-20``) → :func:`read_stream` /
  :func:`read_batch`.
* S3 multi-topic (``...InputDStream.scala:33,266-285``) → ``subscribe``
  CSV / ``subscribePattern``.
* S4 partition discovery (ZK walk, ``KafkaUtils.scala:94-116``; 15 s
  timer ``...InputDStream.scala:142``) → broker metadata refresh
  (``metadata.max.age.ms``); no code.
* S5 modulo sharding (``...InputDStream.scala:104-106``) → obsolete
  (source plans per-partition tasks); ``min_partitions`` oversplits
  instead, the knob that matters when one Kafka partition carries more
  than one executor's worth of data.
* S6/S7 offset persist/restore in HBase
  (``...InputDStream.scala:178-196,384-415``) → checkpointed offset +
  commit logs, atomic per micro-batch (strictly stronger: the
  reference's store-then-commit ordering is at-least-once with dupes
  on replay).
* S8 start-from-latest (``...InputDStream.scala:153-175``) →
  ``starting_offsets``.
* S9 offset-out-of-range jump (``fixOffsets``,
  ``...InputDStream.scala:352-370``) → ``fail_on_data_loss=False``.
* S10/S13 leader failover + ZK scans (``KafkaUtils.scala:71-148``) →
  handled by the modern Kafka client; no code.
* S11/S12 fetch & offset lookup (``KafkaUtils.scala:19-68,163-240``)
  → internal to the source; batch analog :func:`read_batch` with
  ``starting/endingOffsets``.

The Kafka connector jar (``spark-sql-kafka-0-10``) is not bundled with
a plain ``pip install pyspark``; every entry point degrades with a
clear error via :func:`require_kafka` so the rest of the engine works
without it.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: Fixed schema every Kafka relation exposes (replaces the reference's
#: untyped ``(String, String)`` pair model, ``...InputDStream.scala:48-51``).
KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


class KafkaNotAvailable(RuntimeError):
    """Raised when the spark-sql-kafka connector jar is absent."""


def is_kafka_available(spark: SparkSession) -> bool:
    """True if the Kafka DataSource V2 provider is on the classpath."""
    try:
        (
            spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.spark.sql.kafka010.KafkaSourceProvider"
            )
        )
        return True
    except Exception:
        return False


def require_kafka(spark: SparkSession) -> None:
    if not is_kafka_available(spark):
        raise KafkaNotAvailable(
            "Kafka connector not on classpath; add the spark-sql-kafka-0-10 "
            "package (e.g. spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)"
        )


@dataclass
class KafkaSourceConfig:
    """Declarative twin of the reference's ``KafkaStreamConsumerConfig``
    (``PartitionedSimpleConsumerKafkaInputDStream.scala:28-46``).

    ``topics`` ↔ ``config.topics``; ``starting_offsets`` ↔
    ``startFromLatestKafkaOffset``/``cleanOffsets`` (S8);
    ``fail_on_data_loss=False`` ↔ ``fixOffsets`` out-of-range recovery
    (S9); ``max_offsets_per_trigger`` ↔ the 1 MiB ``bufferSize`` fetch
    bound (`:42`) — the backpressure knob that matters at 100 TB;
    ``min_partitions`` ↔ (inverse of) modulo sharding (S5).
    """

    bootstrap_servers: str
    topics: list[str] = field(default_factory=list)
    subscribe_pattern: str | None = None
    assign: dict[str, list[int]] | None = None
    starting_offsets: str = "earliest"  # "earliest" | "latest" | offsets JSON
    ending_offsets: str | None = None  # batch reads only
    fail_on_data_loss: bool = False
    max_offsets_per_trigger: int | None = None
    min_partitions: int | None = None
    group_id_prefix: str | None = None
    extra: dict[str, str] = field(default_factory=dict)

    def options(self, streaming: bool = True) -> dict[str, str]:
        """Render to Kafka source options (pure function — unit-testable
        without a broker)."""
        chosen = [
            x
            for x in (self.topics or None, self.subscribe_pattern, self.assign)
            if x
        ]
        if len(chosen) != 1:
            raise ValueError(
                "exactly one of topics / subscribe_pattern / assign required"
            )
        opts: dict[str, str] = {"kafka.bootstrap.servers": self.bootstrap_servers}
        if self.topics:
            opts["subscribe"] = ",".join(self.topics)
        elif self.subscribe_pattern:
            opts["subscribePattern"] = self.subscribe_pattern
        else:
            opts["assign"] = json.dumps(self.assign)
        opts["startingOffsets"] = self.starting_offsets
        if not streaming:
            opts["endingOffsets"] = self.ending_offsets or "latest"
        else:
            opts["failOnDataLoss"] = str(self.fail_on_data_loss).lower()
            if self.max_offsets_per_trigger is not None:
                opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        if self.min_partitions is not None:
            opts["minPartitions"] = str(self.min_partitions)
        if self.group_id_prefix:
            opts["groupIdPrefix"] = self.group_id_prefix
        opts.update(self.extra)
        return opts


def read_stream(spark: SparkSession, config: KafkaSourceConfig) -> DataFrame:
    """Streaming Kafka source (replaces S1/S2: the receiver + factory)."""
    require_kafka(spark)
    reader = spark.readStream.format("kafka")
    for k, v in config.options(streaming=True).items():
        reader = reader.option(k, v)
    return reader.load()


def read_batch(spark: SparkSession, config: KafkaSourceConfig) -> DataFrame:
    """Bounded Kafka read between offsets (batch analog of S11/S12)."""
    require_kafka(spark)
    reader = spark.read.format("kafka")
    for k, v in config.options(streaming=False).items():
        reader = reader.option(k, v)
    return reader.load()


def write_stream_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    trigger_seconds: float | None = None,
):
    """Kafka sink: df must carry ``value`` (binary/string) and optionally
    ``key``/``topic``/``partition``. The checkpoint gives exactly-once
    offset tracking into an at-least-once sink (Kafka has no txn sink in
    Spark) — the upgraded analog of the reference's store-then-commit
    (``...InputDStream.scala:310-320``)."""
    require_kafka(df.sparkSession)
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
