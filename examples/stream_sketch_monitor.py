#!/usr/bin/env python
"""Streaming sketch monitor — the mergeable-summary showcase: drain an
event stream and maintain, across micro-batches,

* a Count-Min sketch of per-user event counts (cell-wise sum merge),
* HyperLogLog registers for distinct users (bucket-wise max merge),

then answer "top users" and "how many distinct users" from the
sketches alone, comparing against the exact batch answers.  This is
the 100 TB streaming-analytics pattern the reference's windowed word
count gestures at (``KafkaWordCount.scala:70-73``): state is O(sketch)
per metric, not O(distinct keys), and every merge is associative so
partials combine exactly across triggers, partitions, or clusters.

Run: ``python examples/stream_sketch_monitor.py
[--sf-dir /root/testdata/sf0.001]``.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_kafka_streaming_spark import get_spark
from spark_kafka_streaming_spark.operators import sketches as SK
from spark_kafka_streaming_spark.sources.batch import load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark(app_name="stream_sketch_monitor")
    tmp = tempfile.mkdtemp(prefix="sketch_mon_")
    try:
        # Stage the events table as a 4-file JSON stream source.
        src = f"{tmp}/src"
        ev = load_table(spark, args.sf_dir, "events").select("user_id")
        ev.repartition(4).write.json(src)

        cms: dict = {}
        hll: dict = {i: 0 for i in range(SK.HLL_M)}
        batches = set()

        def absorb(df, epoch_id):
            # foreachBatch is at-least-once: a replayed epoch must not
            # double-count into the sum-merged CMS (max-merged HLL
            # would survive a replay, sums would not).
            if epoch_id in batches:
                return
            batches.add(epoch_id)
            for r in SK.cms_build(df, "user_id").collect():
                k = (r["r"], r["b"])
                cms[k] = cms.get(k, 0) + r["cnt"]
            for r in SK.hll_registers(df, "user_id").collect():
                hll[r["bucket"]] = max(hll[r["bucket"]], r["r"])

        q = (
            spark.readStream.schema("user_id BIGINT")
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .writeStream.foreachBatch(absorb)
            .option("checkpointLocation", f"{tmp}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        # Sketch-side answers.
        s = sum(2 ** (SK.HLL_SHIFT - r) for r in hll.values())
        est = SK.HLL_ALPHA * SK.HLL_M * SK.HLL_M * 2**SK.HLL_SHIFT / s
        n_empty = sum(1 for r in hll.values() if r == 0)
        if est <= 2.5 * SK.HLL_M and n_empty:  # linear-counting range
            est = SK.HLL_M * math.log(SK.HLL_M / n_empty)

        # Exact batch answers for comparison.
        exact_distinct = ev.distinct().count()
        top_true = (
            ev.groupBy("user_id").count()
            .orderBy(F.desc("count"), "user_id").limit(5).collect()
        )
        sketch_df = spark.createDataFrame(
            [(r, b, c) for (r, b), c in cms.items()], "r INT, b INT, cnt BIGINT"
        )
        est_counts = {
            row["user_id"]: row["est_cnt"]
            for row in SK.cms_estimate(
                ev.distinct(), sketch_df, "user_id"
            ).collect()
        }

        print(json.dumps({
            "micro_batches": len(batches),
            "distinct_users_exact": exact_distinct,
            "distinct_users_hll": round(est, 1),
            "top_users": [
                {
                    "user_id": r["user_id"],
                    "exact": r["count"],
                    "cms_est": est_counts[r["user_id"]],
                }
                for r in top_true
            ],
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
