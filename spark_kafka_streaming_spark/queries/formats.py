"""Serialization-format queries: the Avro container-file, CSV, and
JSON wire paths run as driver-checked queries — the payload-decode
surface a Kafka-fed engine needs (reference T1/T3/T4 families).

Each encode→decode round-trip must reproduce the source rows exactly,
so the DuckDB oracle is simply the source table — a full value-hash
check of the codec (zigzag varints, unions, schema embedding +
discovery for Avro; quoting/escaping and schema-directed parsing for
CSV/JSON) without DuckDB needing to know the format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.avro import decode_avro_container, encode_avro_container
from ..sources.batch import load_table
from .registry import register


@register(
    "q_avro_container_roundtrip",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    doc="Avro container-file encode → self-describing decode (schema "
    "discovered from the blobs; reference AvroDatumUtils.scala:15-37). "
    "Round-trip must be byte-faithful, so the oracle is the source "
    "table itself.",
    tags=("formats", "avro"),
)
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .filter(F.col("doc_id") < 200)
    )
    encoded = encode_avro_container(docs, "doc_id", "lang", "n_chars")
    return decode_avro_container(encoded).orderBy("doc_id")


_WIRE_SCHEMA = "doc_id BIGINT, lang STRING, n_chars BIGINT"


def _session_temp_path(spark: SparkSession, name: str) -> str:
    """Session-scoped temp dir for file round-trip queries: the Spark
    application id makes the path unique per session, so two
    concurrent runs can't overwrite each other's landing zone mid-read
    (and a pre-existing fixed-name dir in a shared /tmp can't be
    planted ahead of time).  Self-overwriting WITHIN a session is
    still the contract — re-runs land in the same per-session dir."""
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"{name}-{spark.sparkContext.applicationId}"
    )


@register(
    "q_csv_line_roundtrip",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    doc="CSV wire-format round-trip: each row serialized to one CSV "
    "line (to_csv) and parsed back (from_csv) with an explicit schema "
    "— the per-record decode path a CSV-payload Kafka topic needs "
    "(reference T1 decode family). Map-only, codegen, no temp files; "
    "byte-faithful, so the oracle is the source table.",
    tags=("formats", "csv"),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .filter(F.col("doc_id") < 200)
    )
    wire = docs.select(
        F.to_csv(F.struct("doc_id", "lang", "n_chars")).alias("line")
    )
    return (
        wire.select(
            F.from_csv("line", _WIRE_SCHEMA).alias("r")
        )
        .select("r.doc_id", "r.lang", "r.n_chars")
        .orderBy("doc_id")
    )


@register(
    "q_json_line_roundtrip",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    doc="JSON-lines wire-format round-trip: to_json per row, then "
    "from_json with an explicit schema — the JSON Kafka-payload decode "
    "path (streaming/decode.py uses the same from_json plan under "
    "readStream). Map-only, codegen; oracle is the source table.",
    tags=("formats", "json"),
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .filter(F.col("doc_id") < 200)
    )
    wire = docs.select(
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("line")
    )
    return (
        wire.select(
            F.from_json("line", _WIRE_SCHEMA).alias("r")
        )
        .select("r.doc_id", "r.lang", "r.n_chars")
        .orderBy("doc_id")
    )


@register(
    "q_orc_file_roundtrip",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    doc="ORC file-format round-trip: the slice is written as ORC and "
    "read back through Spark's native vectorized ORC reader — the "
    "columnar-format leg next to the parquet scans every other query "
    "exercises (warehouses routinely carry both). Write → read must "
    "be value-faithful across the type bridge (BIGINT/STRING), so the "
    "oracle is the source table itself. The output lands in a "
    "SESSION-SCOPED self-overwriting temp directory (suffixed with the "
    "Spark application id) so concurrent sessions never clobber each "
    "other's round-trip; at scale this is the same partitioned-"
    "columnar landing-zone layout as the parquet sink, with predicate "
    "pushdown and column pruning intact.",
    tags=("formats", "orc"),
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .filter(F.col("doc_id") < 200)
    )
    path = _session_temp_path(spark, "spark_graft_orc_roundtrip")
    docs.write.mode("overwrite").orc(path)
    return spark.read.orc(path).orderBy("doc_id")
