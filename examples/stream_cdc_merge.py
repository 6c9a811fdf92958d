#!/usr/bin/env python
"""Streaming CDC snapshot maintenance — the MERGE-loop showcase: seed
a keyed snapshot from the orders table, stream a change feed (deletes,
updates, inserts) through ``foreachBatch`` +
:class:`~spark_kafka_streaming_spark.streaming.incremental_merge.IncrementalMerger`,
and verify the maintained snapshot equals a one-shot batch merge of
the same changes (the ``q_cdc_apply_changes`` semantics applied
incrementally).

The 100 TB point: the snapshot is hash-bucketed by key, each trigger
reads and rewrites ONLY the buckets its change keys touch, and the
feed's absolute rows (upserts carry full state) make crash replay
converge.  This is the OSS-primitive form of a Delta/Iceberg MERGE
sink.

Run: ``python examples/stream_cdc_merge.py
[--sf-dir /root/testdata/sf0.001]``.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_kafka_streaming_spark import get_spark  # noqa: E402
from spark_kafka_streaming_spark.streaming.incremental_merge import (  # noqa: E402
    IncrementalMerger,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark(app_name="stream_cdc_merge", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="cdc_merge_")
    try:
        orders = spark.read.parquet(f"{args.sf_dir}/orders.parquet").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        )
        merger = IncrementalMerger(f"{tmp}/snap", key_col="k")
        merger(orders.selectExpr("k", "'U' AS op", "status", "price"), 0)

        # the deterministic change feed of q_cdc_apply_changes, split
        # into two micro-batches (deletes+updates, then inserts)
        ch = orders.selectExpr(
            "k", "status", "price", "k % 10 AS m"
        )
        b1 = ch.where("m = 0").selectExpr(
            "k", "'D' AS op", "CAST(NULL AS STRING) AS status",
            "CAST(NULL AS DOUBLE) AS price",
        ).unionByName(
            ch.where("m IN (1, 2)").selectExpr(
                "k", "'U' AS op", "'U' AS status", "price + 1.0 AS price"
            )
        )
        b2 = ch.where("m = 3").selectExpr(
            "k + 1000000000 AS k", "'U' AS op", "'N' AS status",
            "price AS price",
        )
        src = f"{tmp}/feed"
        b1.coalesce(1).write.mode("overwrite").json(f"{src}/batch=1")
        b2.coalesce(1).write.mode("overwrite").json(f"{src}/batch=2")

        stream = (
            spark.readStream.schema(
                "k LONG, op STRING, status STRING, price DOUBLE"
            )
            .option("maxFilesPerTrigger", 1)
            .json(f"{src}/batch=*")
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: merger(df, bid + 1)
            )
            .option("checkpointLocation", f"{tmp}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        snap = merger.snapshot(spark)
        got = {
            r["status"]: (r["n"], round(r["total"], 2))
            for r in snap.groupBy("status")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("price").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            .collect()
        }
        # batch comparator: the same merge in one shot
        orders.createOrReplaceTempView("snap_base")
        want = {
            r["status"]: (r["n_rows"], round(r["total_price"], 2))
            for r in spark.sql(
                """
                WITH changes AS (
                  SELECT k, 'D' AS op, CAST(NULL AS DOUBLE) np,
                         CAST(NULL AS STRING) ns
                  FROM snap_base WHERE k % 10 = 0
                  UNION ALL
                  SELECT k, 'U', price + 1.0, 'U'
                  FROM snap_base WHERE k % 10 IN (1, 2)
                  UNION ALL
                  SELECT k + 1000000000, 'I', price, 'N'
                  FROM snap_base WHERE k % 10 = 3
                ),
                merged AS (
                  SELECT CASE WHEN c.op IN ('U','I') THEN c.ns
                              ELSE s.status END AS status,
                         CASE WHEN c.op IN ('U','I') THEN c.np
                              ELSE s.price END AS price
                  FROM snap_base s
                  FULL OUTER JOIN changes c ON c.k = s.k
                  WHERE c.op IS NULL OR c.op <> 'D'
                )
                SELECT status, COUNT(*) AS n_rows,
                       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
                         AS total_price
                FROM merged GROUP BY status
                """
            ).collect()
        }
        print(
            json.dumps(
                {
                    "snapshot_rows": snap.count(),
                    "per_status": got,
                    "matches_batch_merge": got == want,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
