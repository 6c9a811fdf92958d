"""Multimodal column support (SURVEY.md §2c).

Images/audio/video are opaque ``binary`` payload columns plus a typed
metadata struct — the same model the reference applies to Kafka values
(raw ``Array[Byte]`` + pluggable decode,
``KafkaUtils.scala:163``/``...InputDStream.scala:50``), generalized to
content-addressed blobs.

The Spark-side plumbing (schema, content addressing, partitioned batch
decode via ``mapInPandas``) is real and tested; the codec calls
themselves are STUBBED (`decode_image`) because no image/audio
libraries exist in this environment — `extract_features` documents the
Arrow-batched shape a real decoder drops into.

Scale: payloads ride the normal columnar path; `mapInPandas` processes
Arrow record batches so a GPU/native decoder sees contiguous buffers;
`spark.sql.files.maxPartitionBytes` bounds per-task bytes; metadata
(width/height/codec) lives in a struct so filters prune without
touching payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical multimodal schema fragment
PAYLOAD_META = (
    "struct<modality:string, fmt:string, n_bytes:bigint, sha256:string>"
)


def attach_payload(
    df: DataFrame, source_col: str, modality: str = "text", fmt: str = "utf-8"
) -> DataFrame:
    """Wrap a column as a content-addressed binary payload + metadata.

    ``sha256`` gives exact-dup detection and stable shard assignment
    for blobs; both are computed JVM-side.
    """
    payload = F.col(source_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(fmt).alias("fmt"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """STUB: image decode requires a codec library (PIL/cv2) not present
    in this environment. The real implementation decodes one payload to
    an HxWxC array; everything around it (batching, schema, shuffle
    placement) is already wired."""
    raise NotImplementedError(
        "image codec not available in this environment; plug PIL/cv2 here"
    )


def extract_features(
    df: DataFrame, n_features: int = 8, batch_size_hint: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Uses a deterministic fake featurizer (byte histogram moments) in
    place of a neural encoder — the Spark-side contract (mapInPandas
    over payload batches → fixed-width float vector column) is exactly
    what a real model server integration needs.
    """
    out_schema = ", ".join(
        [f.name + " " + f.dataType.simpleString() for f in df.schema.fields]
        + [f"features array<double>"]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                # deterministic fake: moments of byte-value buckets
                row = []
                for i in range(n_features):
                    bucket = b[i::n_features]
                    row.append(
                        (sum(bucket) / len(bucket)) / 255.0 if bucket else 0.0
                    )
                feats.append(row)
            yield pdf.assign(features=feats)

    return df.mapInPandas(featurize, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (blob, frame_no)
    rows for frames ``0, every_n, 2·every_n, …`` based on metadata —
    the decode itself is the stubbed codec. Demonstrates the explode
    pattern that keeps sampling declarative (prunable/pushable)."""
    n_frames = (F.col("meta.n_bytes") / 1000 + 1).cast("int")  # fake: 1 frame/KB
    return df.withColumn(
        "frame_no",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))),
    ).select(id_col, "payload", "meta", "frame_no")
