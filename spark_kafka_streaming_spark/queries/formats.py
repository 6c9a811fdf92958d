"""Serialization-format queries: the Avro container-file path run as a
driver-checked query.

The encode→decode round-trip must reproduce the source rows exactly,
so the DuckDB oracle is simply the source table — a full value-hash
check of the whole Avro datum/container codec (zigzag varints, unions,
schema embedding + discovery) without DuckDB needing to know Avro.
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
