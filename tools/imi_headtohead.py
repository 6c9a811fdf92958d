#!/usr/bin/env python
"""Two-level (IMI) vs single-level SERVING head-to-head at a chosen
cell count — the round-8 negative result (two-level ~2x WORSE at
sqrt(n) cells, cause: restricted probes skew cell occupancy ~4x) said
the two-level form belongs to the n_cells >= ~1e4 regime where scoring
ALL cells dominates.  This probe measures that regime directly on the
propagation query shape (queries = vec_id % 5 == 0, corpus = rest,
k=5): both routes, min-of-2 warm walls, plus the query-side cell
occupancy audit (max/mean queries per probed cell) that isolated the
round-8 cause.

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/imi_headtohead.py \
      [--sf-dir /tmp/spark_graft_sf100] [--n-cells 10000]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_kafka_streaming_spark import get_spark  # noqa: E402
from spark_kafka_streaming_spark.functions.caching import (  # noqa: E402
    release_operator_caches,
)


def timed_nn(fn, runs: int = 2) -> tuple[float, int]:
    walls, rows = [], 0
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = fn().count()
        walls.append(time.perf_counter() - t0)
        release_operator_caches()
    return round(min(walls), 1), rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf100")
    ap.add_argument("--n-cells", type=int, default=10000)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from spark_kafka_streaming_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_imi,
    )

    spark = get_spark(app_name="imi_headtohead")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") % 5 == 0)
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    nq, nc = queries.count(), corpus.count()

    w1, r1 = timed_nn(
        lambda: ivf_topk(queries, corpus, k=args.k, n_cells=args.n_cells),
        args.runs,
    )
    w2, r2 = timed_nn(
        lambda: ivf_topk_imi(queries, corpus, k=args.k, n_cells=args.n_cells),
        args.runs,
    )
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "n_queries": nq,
                "n_corpus": nc,
                "n_cells": args.n_cells,
                "k": args.k,
                "single_level_wall_s": w1,
                "single_level_rows": r1,
                "two_level_wall_s": w2,
                "two_level_rows": r2,
                "two_over_single": round(w2 / w1, 2) if w1 else None,
            }
        )
    )


if __name__ == "__main__":
    main()
