#!/usr/bin/env python
"""End-to-end LLM training-data pipeline over the documents corpus —
the batch showcase of the §2c operator suite:

    read → exact dedup → near-dup filter (MinHash-LSH) → quality
    score/gate → benchmark decontamination → mixture realization
    → fingerprint + payload metadata → token-budget shards → write

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
from spark_kafka_streaming_spark.operators.decontaminate import (
    contamination_hits,
)
from spark_kafka_streaming_spark.operators.mixing import weighted_mixture
from spark_kafka_streaming_spark.operators.multimodal import attach_payload
from spark_kafka_streaming_spark.operators.sharding import (
    shard_by_token_budget,
    write_training_shards,
)
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
    ap.add_argument("--shard-budget", type=int, default=2000)
    args = ap.parse_args()

    spark = get_spark(app_name="corpus_pipeline")
    docs = load_table(spark, args.sf_dir, "documents")
    n_raw = docs.count()

    # 1. exact dedup (content hash-groupBy, deterministic survivor).
    #    exact_dedup returns the (possibly sha256-hashed) grouping key,
    #    not the original body — re-join the survivors' text by id.
    survivors = (
        exact_dedup(docs, ["text"], "doc_id")
        .select("doc_id")
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    n_exact = survivors.count()

    # 2. near-dup filter: drop the higher id of each MinHash-LSH pair
    pairs = minhash_lsh_pairs(survivors, jaccard_threshold=args.jaccard)
    to_drop = pairs.select(F.col("id2").alias("doc_id")).distinct()
    near_unique = survivors.join(to_drop, "doc_id", "left_anti")
    n_near = near_unique.count()

    # 3. quality gate (pure column expressions; the language heuristic
    #    is carried as a column — on this synthetic corpus an 'en'-only
    #    filter would gate out nearly everything)
    gated = (
        language_id(quality_score(near_unique))
        .filter(F.col("quality") >= args.min_quality)
        .select("doc_id", "text", "quality", "lang_pred")
    )
    n_quality = gated.count()

    # 4. benchmark decontamination: drop docs sharing ≥1 shingle with
    #    the (deterministic synthetic) eval slice
    eval_df = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    hits = contamination_hits(gated, eval_df)
    clean = gated.join(
        hits.select(F.col("doc_id")), "doc_id", "left_anti"
    )
    n_clean = clean.count()

    # 5. mixture realization: hash-deterministic per-source downsample
    #    (reproducible on any cluster — no rand())
    with_src = clean.join(docs.select("doc_id", "lang"), "doc_id")
    mixed = weighted_mixture(
        with_src, {"en": 900_000, "fr": 700_000}, default_ppm=500_000
    ).select("doc_id", "text", "quality", "lang_pred")
    n_mixed = mixed.count()

    # 6. fingerprints + content-addressed payload metadata
    enriched = attach_payload(fingerprint(mixed), "text").select(
        "doc_id",
        "text",
        "quality",
        "lang_pred",
        "fp_exact",
        "fp_fuzzy",
        F.col("meta.sha256").alias("sha256"),
    )

    # 7. token-budget training shards (global prefix-sum pack) +
    #    file-per-shard layout
    shards = shard_by_token_budget(enriched, budget=args.shard_budget)
    final = enriched.join(shards.select("doc_id", "shard_id"), "doc_id")
    write_training_shards(final, args.out, "shard_id")
    n_written = spark.read.parquet(args.out).count()
    n_shards = final.select("shard_id").distinct().count()

    print(
        json.dumps(
            {
                "raw": n_raw,
                "after_exact_dedup": n_exact,
                "after_near_dedup": n_near,
                "after_quality_lang": n_quality,
                "after_decontamination": n_clean,
                "after_mixture": n_mixed,
                "written": n_written,
                "shards": n_shards,
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
