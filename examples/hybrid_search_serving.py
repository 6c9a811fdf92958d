#!/usr/bin/env python
"""Hybrid-retrieval serving showcase: keep a lexical index AND a
vector index current as documents/embeddings stream in, then serve a
fused (Reciprocal Rank Fusion) top-k from the two maintained stores —
the end-to-end loop a retrieval deployment runs.

Pipeline: two file streams → ``foreachBatch`` maintenance
(:class:`~spark_kafka_streaming_spark.streaming.incremental_index.IncrementalIndexer`
tf partials, :class:`~spark_kafka_streaming_spark.streaming.incremental_vectors.IncrementalVectorIndexer`
cell-assigned vectors) → query-time fusion
(:func:`~spark_kafka_streaming_spark.streaming.serving.hybrid_rrf_from_stores`),
checked against the batch twin built from the SAME shared expressions
(``operators/index.py::rrf_fuse`` — the q_search_hybrid_rrf semantics
served incrementally).

The 100 TB point: query cost is independent of ingest history — the
BM25 leg reduces corpus stats from the tf-partial store, the ANN leg
scans only the probed ``cell=…`` directories, and fusion joins two
bounded rank lists.

Run: ``python examples/hybrid_search_serving.py
[--sf-dir /root/testdata/sf0.001]``.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from spark_kafka_streaming_spark import get_spark  # noqa: E402
from spark_kafka_streaming_spark.functions import texthash as TH  # noqa: E402
from spark_kafka_streaming_spark.operators import index as IX  # noqa: E402
from spark_kafka_streaming_spark.operators.similarity import ivf_topk  # noqa: E402
from spark_kafka_streaming_spark.streaming.incremental_index import (  # noqa: E402
    IncrementalIndexer,
)
from spark_kafka_streaming_spark.streaming.incremental_vectors import (  # noqa: E402
    IncrementalVectorIndexer,
)
from spark_kafka_streaming_spark.streaming.serving import (  # noqa: E402
    hybrid_rrf_from_stores,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark(app_name="hybrid_search_serving", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="hybrid_demo_")
    try:
        # ingest legs: 2 micro-batches each
        docs = [
            {"doc_id": r["doc_id"], "text": r["text"]}
            for r in spark.read.parquet(f"{args.sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .orderBy("doc_id")
            .limit(120)
            .collect()
        ]
        os.makedirs(f"{tmp}/docs")
        for i in range(2):
            with open(f"{tmp}/docs/b{i}.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in docs[i * 60 : (i + 1) * 60]))
        indexer = IncrementalIndexer(f"{tmp}/ix")
        (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .json(f"{tmp}/docs")
            .writeStream.foreachBatch(indexer)
            .option("checkpointLocation", f"{tmp}/ck1")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

        emb = (
            spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(120)
        )
        emb.persist().count()
        os.makedirs(f"{tmp}/vecs")
        for i, half in enumerate(
            (emb.filter("vec_id < 60"), emb.filter("vec_id >= 60"))
        ):
            half.coalesce(1).write.parquet(f"{tmp}/vh{i}")
            (part,) = glob.glob(f"{tmp}/vh{i}/part-*.parquet")
            shutil.copy(part, f"{tmp}/vecs/b{i}.parquet")
        vindexer = IncrementalVectorIndexer(f"{tmp}/vstore", n_cells=8, n_assign=2)
        (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/vecs")
            .writeStream.foreachBatch(vindexer)
            .option("checkpointLocation", f"{tmp}/ck2")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

        # serve from the stores
        queries = emb.filter("vec_id = 0")
        served_df = hybrid_rrf_from_stores(
            indexer, vindexer, queries, spark, leg_k=20, topk=10, n_probe=3
        )
        if served_df is None:
            raise SystemExit(
                "hybrid serving returned no result: one of the stores has "
                "not ingested a batch yet (check the two streaming ingests "
                "above terminated successfully)"
            )
        served = served_df.collect()

        # batch twin from the same shared expressions
        bdf = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
        tok = bdf.select(
            "doc_id", F.explode(F.expr(TH.spark_tokens("text"))).alias("term")
        )
        per_doc = tok.groupBy("doc_id").agg(
            F.count("*").alias("dl"),
            *[
                F.expr(IX.bm25_tf_case(t)).cast("bigint").alias(f"tf_{t}")
                for t in IX.BM25_TERMS
            ],
        )
        w = Window.orderBy(F.desc("score"), "doc_id")
        bm = (
            IX.bm25_score_per_doc(per_doc, topk=20)
            .withColumn("bm25_rank", F.row_number().over(w).cast("int"))
            .select("doc_id", "bm25_rank")
        )
        cv = ivf_topk(
            queries, emb, k=20, n_probe=3, n_assign=2,
            centroids=vindexer.centroids(spark),
        ).select(
            F.col("neighbor_id").alias("id"),
            F.col("rn").cast("int").alias("cos_rank"),
        )
        batch = IX.rrf_fuse(bm, cv, topk=10).collect()

        match = [tuple(r) for r in served] == [tuple(r) for r in batch]
        print(
            json.dumps(
                {
                    "served_topk": [
                        {"id": r["id"], "rrf": round(r["rrf"], 6)} for r in served
                    ],
                    "stream_equals_batch": match,
                }
            )
        )
        if not match:
            raise SystemExit(1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
