#!/usr/bin/env python
"""Windowed streaming word count — the engine's version of the
reference's end-to-end example pair (`KafkaWordCount` consumer +
`KafkaWordCountProducer`, ``examples/src/main/scala/org/apache/spark/
examples/KafkaWordCount.scala:33-114``).

The reference wires N hand-sharded receivers, unions them, splits words
and runs ``reduceByKeyAndWindow(_+_, _-_, Minutes(10), Seconds(2), 2)``
with processing-time batches. Here the same query is one declarative
pipeline with event-time semantics:

* with a Kafka broker (pass ``--kafka host:port --topic t``): the
  source is ``readStream.format("kafka")`` via the engine wrapper —
  partition discovery, offset persistence and failover are built in;
* without one (default): a rate-source producer synthesizes the same
  random-word stream the reference's producer emitted at ~10 msg/s.

Run: ``python examples/streaming_wordcount.py [--seconds 15]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_kafka_streaming_spark import get_spark
from spark_kafka_streaming_spark.sources.kafka import (
    KafkaSourceConfig,
    is_kafka_available,
    read_stream,
)
from spark_kafka_streaming_spark.streaming.decode import token_counts_windowed
from spark_kafka_streaming_spark.streaming.monitor import ProgressRecorder
from spark_kafka_streaming_spark.streaming.pipeline import rate_stream, start_sink


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kafka", help="bootstrap servers (host:port)")
    ap.add_argument("--topic", default="words")
    ap.add_argument("--seconds", type=int, default=15)
    args = ap.parse_args()

    spark = get_spark(app_name="streaming_wordcount")

    if args.kafka and is_kafka_available(spark):
        source = read_stream(
            spark,
            KafkaSourceConfig(
                bootstrap_servers=args.kafka,
                topics=[args.topic],
                starting_offsets="latest",
                max_offsets_per_trigger=100_000,
            ),
        ).selectExpr("CAST(value AS STRING) AS value", "timestamp")
    else:
        # producer analog (KafkaWordCount.scala:102-111): ~10 msg/s of
        # 4 random digit-words each
        source = rate_stream(spark, rows_per_second=10).select(
            F.concat_ws(
                " ",
                *[(F.pmod(F.col("value") * (i + 7), F.lit(10))).cast("string")
                  for i in range(4)],
            ).alias("value"),
            "timestamp",
        )

    counts = token_counts_windowed(
        source, window="10 minutes", slide="2 seconds", watermark="10 minutes"
    )

    recorder = ProgressRecorder()
    spark.streams.addListener(recorder)
    query = start_sink(
        counts, "console", output_mode="update", trigger_seconds=2.0,
        checkpoint="/tmp/wordcount_ck_" + str(os.getpid()),
    )
    try:
        time.sleep(args.seconds)
    finally:
        query.stop()
        query.awaitTermination(30)
        spark.streams.removeListener(recorder)
    print("throughput:", recorder.throughput())
    print("lag:", recorder.consumer_lag())


if __name__ == "__main__":
    main()
