#!/usr/bin/env python
"""End-to-end LLM training-data pipeline over the documents corpus —
the batch showcase of the §2c operator suite:

    read → exact dedup → near-dup filter (MinHash-LSH) → quality filter
    → language filter → fingerprint + payload metadata → partitioned write

Run: ``python examples/corpus_pipeline.py [--sf-dir /root/testdata/sf0.01]
[--out /tmp/corpus_out]``. Prints one JSON line of stage counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_kafka_streaming_spark import get_spark
from spark_kafka_streaming_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
)
from spark_kafka_streaming_spark.operators.multimodal import attach_payload
from spark_kafka_streaming_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
)
from spark_kafka_streaming_spark.sources.batch import load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/corpus_out")
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--min-quality", type=float, default=0.5)
    args = ap.parse_args()

    spark = get_spark(app_name="corpus_pipeline")
    docs = load_table(spark, args.sf_dir, "documents")
    n_raw = docs.count()

    # 1. exact dedup (content hash-groupBy, deterministic survivor)
    survivors = exact_dedup(docs, ["text"], "doc_id").select("doc_id", "text")
    n_exact = survivors.count()

    # 2. near-dup filter: drop the higher id of each MinHash-LSH pair
    pairs = minhash_lsh_pairs(survivors, jaccard_threshold=args.jaccard)
    to_drop = pairs.select(F.col("id2").alias("doc_id")).distinct()
    near_unique = survivors.join(to_drop, "doc_id", "left_anti")
    n_near = near_unique.count()

    # 3. quality + language gates (pure column expressions)
    gated = (
        language_id(quality_score(near_unique))
        .filter(
            (F.col("quality") >= args.min_quality) & (F.col("lang_pred") == "en")
        )
        .select("doc_id", "text", "quality")
    )
    n_quality = gated.count()

    # 4. fingerprints + content-addressed payload metadata, partitioned out
    final = attach_payload(fingerprint(gated), "text").select(
        "doc_id",
        "text",
        "quality",
        "fp_exact",
        "fp_fuzzy",
        F.col("meta.sha256").alias("sha256"),
        (F.col("doc_id") % 8).alias("shard"),
    )
    final.write.mode("overwrite").partitionBy("shard").parquet(args.out)
    n_written = spark.read.parquet(args.out).count()

    print(
        json.dumps(
            {
                "raw": n_raw,
                "after_exact_dedup": n_exact,
                "after_near_dedup": n_near,
                "after_quality_lang": n_quality,
                "written": n_written,
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
