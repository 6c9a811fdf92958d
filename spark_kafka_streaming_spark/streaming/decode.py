"""Decode layer — the declarative replacement of the reference's
flat-mapper.

The reference's only schema hook is a user closure
``Array[Byte] => Seq[String]`` applied per message inside the receiver
(``PartitionedSimpleConsumerKafkaInputDStream.scala:50,310``), with the
key UTF-8-decoded (`:305-309`); refactoring it is an acknowledged TODO
(``README.md:16``). Here decoding is column expressions, so it runs in
whole-stage codegen, fans out with ``explode`` (one message → N rows),
and Catalyst can prune/push around it — a Python closure would force
row-at-a-time serde on every message at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_string(df: DataFrame) -> DataFrame:
    """(key,value) bytes → UTF-8 strings: the reference's default
    flat-mapper (``SparkUtils.scala:18``, single-string decode)."""
    cols = [
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    ]
    passthrough = [c for c in df.columns if c not in ("key", "value")]
    return df.select(*cols, *passthrough)


def decode_json(df: DataFrame, schema: T.StructType | str, column: str = "value") -> DataFrame:
    """value bytes → typed struct columns via ``from_json``.

    Generalizes the flat-mapper to real schemas: bad records yield
    nulls (permissive), keeping the stream alive exactly like the
    reference's drop-on-decode-error behavior.
    """
    parsed = F.from_json(F.col(column).cast("string"), schema)
    passthrough = [c for c in df.columns if c != column]
    return df.select(*passthrough, parsed.alias("_rec")).select(
        *passthrough, "_rec.*"
    )


def explode_tokens(df: DataFrame, column: str = "value", sep: str = " ") -> DataFrame:
    """One message → N elements (the fan-out the flat-mapper allowed,
    ``...InputDStream.scala:310``; word-split case
    ``KafkaWordCount.scala:70``)."""
    passthrough = [c for c in df.columns if c != column]
    return df.select(
        *passthrough,
        F.explode(F.split(F.col(column).cast("string"), sep)).alias("token"),
    ).filter(F.col("token") != "")


def decode_keyed_records(
    df: DataFrame, value_schema: T.StructType | str
) -> DataFrame:
    """Kafka frame → (key string, typed value struct, event timestamp):
    the full projection of the reference's ``(String, String)`` pair
    model onto typed columns."""
    return decode_json(decode_string(df), value_schema)


def token_counts_windowed(
    df: DataFrame,
    window: str = "10 minutes",
    slide: str | None = "2 seconds",
    watermark: str = "10 minutes",
    ts_col: str = "timestamp",
) -> DataFrame:
    """The flagship streaming query: sliding-window word count — the
    event-time, watermarked successor of
    ``reduceByKeyAndWindow(_+_, _-_, Minutes(10), Seconds(2), 2)``
    (``KafkaWordCount.scala:70-73``). Incrementality comes from the
    state store (no inverse function needed); late rows beyond the
    watermark are dropped instead of silently mis-bucketed.
    """
    tokens = explode_tokens(df)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        tokens.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col("token").alias("word"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "word", "n")
    )
