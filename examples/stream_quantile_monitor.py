#!/usr/bin/env python
"""Streaming quantile monitoring showcase: maintain per-event-type
value quantiles as events stream in, from bounded state.

Pipeline: file stream → ``foreachBatch``
(:class:`~spark_kafka_streaming_spark.streaming.incremental_quantiles.IncrementalQuantileStore`
— each micro-batch appends its own per-group bottom-k priority sample,
exactly-once) → query-time snapshot
(:meth:`~spark_kafka_streaming_spark.streaming.incremental_quantiles.IncrementalQuantileStore.quantiles`),
checked against the batch twin built from the SAME derivation
(``operators/quantiles.py`` — the q_quantile_sketch_* semantics served
incrementally).

The 100 TB point: state is O(groups·k) rows however long the stream
runs (bottom-k of a union is the bottom-k of unioned per-batch cuts),
snapshot cost is independent of ingest history, and because the state
is an actual deterministic row sample — not an opaque digest — the
same store answers new quantiles, sub-range ranks, and audit sampling
after the fact.

Run: ``python examples/stream_quantile_monitor.py
[--sf-dir /root/testdata/sf0.001]``.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_kafka_streaming_spark import get_spark  # noqa: E402
from spark_kafka_streaming_spark.operators.quantiles import (  # noqa: E402
    bottomk_sample_grouped,
    quantile_estimates,
)
from spark_kafka_streaming_spark.streaming.incremental_quantiles import (  # noqa: E402
    IncrementalQuantileStore,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--n-batches", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="stream_quantile_monitor")
    work = tempfile.mkdtemp(prefix="quantile_monitor_")
    src = os.path.join(work, "in")
    os.makedirs(src)

    events = (
        spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )
    rows = [r.asDict() for r in events.collect()]
    per = max(1, len(rows) // args.n_batches)
    for i in range(args.n_batches):
        chunk = rows[i * per :] if i == args.n_batches - 1 else rows[i * per : (i + 1) * per]
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            f.write("\n".join(json.dumps(r) for r in chunk))

    store = IncrementalQuantileStore(
        os.path.join(work, "store"),
        group_col="event_type",
        value_col="value",
        key_sql="event_id",
        k=args.k,
        compact_every=2,
    )
    q = (
        spark.readStream.schema("event_id BIGINT, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(store)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    served = store.quantiles(spark)
    if served is None:
        print(json.dumps({"error": "store is empty — ingest produced no batches"}))
        sys.exit(1)
    got = sorted(tuple(r) for r in served.collect())

    batch_df = spark.createDataFrame(
        rows, "event_id BIGINT, event_type STRING, value DOUBLE"
    )
    want = sorted(
        tuple(r)
        for r in quantile_estimates(
            bottomk_sample_grouped(
                batch_df, "event_type", "value", "event_id", args.k
            ),
            grouped=True,
        ).collect()
    )
    medians = {g: est for (g, qq, est, m) in got if qq == 0.5}
    print(
        json.dumps(
            {
                "groups": len(medians),
                "rows_ingested": len(rows),
                "state_rows_max": f"{args.k} per group",
                "medians": medians,
                "stream_equals_batch": got == want,
            }
        )
    )
    assert got == want, "serving snapshot must equal the batch rebuild"


if __name__ == "__main__":
    main()
