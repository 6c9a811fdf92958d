"""Avro encode/decode (reference T3/T4, ``AvroDatumUtils.scala:15-37``).

The reference serializes ``Seq[GenericContainer]`` to Avro
*container-file* bytes (schema embedded — dynamic/self-describing) and
decodes bytes back to ``(Schema, Seq[GenericRecord])``. Spark's
``from_avro``/``to_avro`` instead use the *raw datum* encoding with an
explicit reader schema — the scalable form (schema once per plan, not
once per row batch). The dynamic-schema case is handled as SURVEY.md
§7 prescribes: extract the schema in a discovery pass, then run the
fixed-schema decode.

Requires the ``spark-avro`` connector jar (not bundled with pip
pyspark); all entry points are gated with a clear error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class AvroNotAvailable(RuntimeError):
    """Raised when the spark-avro connector jar is absent."""


def is_avro_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


def require_avro(spark: SparkSession) -> None:
    if not is_avro_available(spark):
        raise AvroNotAvailable(
            "spark-avro connector not on classpath; add "
            "org.apache.spark:spark-avro_2.13:<spark-version>"
        )


def encode_avro(df: DataFrame, *cols: str, out: str = "avro_bytes") -> DataFrame:
    """struct(cols) → Avro datum bytes (T3: ``AvroDatumUtils.serialize``)."""
    require_avro(df.sparkSession)
    from pyspark.sql.avro.functions import to_avro

    return df.withColumn(out, to_avro(F.struct(*[F.col(c) for c in cols])))


def decode_avro(
    df: DataFrame, json_schema: str, column: str = "avro_bytes"
) -> DataFrame:
    """Avro bytes → typed struct columns (T4: ``avroRecords``)."""
    require_avro(df.sparkSession)
    from pyspark.sql.avro.functions import from_avro

    passthrough = [c for c in df.columns if c != column]
    return df.select(
        *passthrough, from_avro(F.col(column), json_schema).alias("_rec")
    ).select(*passthrough, "_rec.*")


def avro_schema_of(df: DataFrame, *cols: str) -> str:
    """Discovery pass for dynamic-schema data: derive the Avro JSON
    schema for selected columns from the DataFrame schema (the
    fixed-schema replacement for the reference's schema-in-data,
    ``AvroDatumUtils.scala:35``)."""
    import json

    def avro_type(dt):
        m = {
            "long": "long",
            "bigint": "long",
            "int": "int",
            "integer": "int",
            "double": "double",
            "float": "float",
            "string": "string",
            "boolean": "boolean",
            "binary": "bytes",
        }
        s = dt.simpleString()
        if s in m:
            return ["null", m[s]]
        if s.startswith("timestamp"):
            return ["null", {"type": "long", "logicalType": "timestamp-micros"}]
        raise ValueError(f"no avro mapping for {s}")

    fields = [
        {"name": f.name, "type": avro_type(f.dataType)}
        for f in df.schema.fields
        if f.name in cols
    ]
    return json.dumps(
        {"type": "record", "name": "rec", "fields": fields}
    )
