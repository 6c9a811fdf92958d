#!/usr/bin/env python
"""BPE ENCODE wall at depth: training depth is proven (1013 merges in
100 rounds, bit-identical to the DuckDB replay — round 8), but the
encode stage's cost model deserved its own measured row: the merge
list travels as ONE literal array through a constant-depth
``aggregate`` fold, so encode wall should be ~flat in depth (the fold
is O(merges) PER VOCAB WORD, vocab-bound, not corpus-bound; the
corpus-side work is the same broadcast join at any depth) — plus the
serialized-plan size, which is where a depth blowup would hide.

Usage:
  python tools/bpe_encode_depth.py [--sf-dir /tmp/spark_graft_sf10]
      [--rounds 100] [--shallow 82]
Trains once at --rounds, then times encode (warm min-of-2) at the
full learned depth and at the first --shallow merges.  Prints ONE
JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_kafka_streaming_spark import get_spark  # noqa: E402
from spark_kafka_streaming_spark.functions.caching import (  # noqa: E402
    release_operator_caches,
)


def encode_wall(docs, elems, runs: int = 2) -> tuple[float, int]:
    from spark_kafka_streaming_spark.operators.bpe import (
        bpe_encode_with_merges,
    )

    walls = []
    plan_chars = 0
    for _ in range(runs):
        df = bpe_encode_with_merges(docs, elems)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
        plan_chars = len(
            df._jdf.queryExecution().executedPlan().toString()
        )
        release_operator_caches()
    return round(min(walls), 1), plan_chars


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf10")
    ap.add_argument("--rounds", type=int, default=100)
    ap.add_argument("--shallow", type=int, default=82)
    args = ap.parse_args()

    from spark_kafka_streaming_spark.operators.bpe import bpe_train_batched

    spark = get_spark(app_name="bpe_encode_depth")
    docs = spark.read.parquet(
        os.path.join(args.sf_dir, "documents.parquet")
    ).select("doc_id", "text")

    t0 = time.perf_counter()
    merges = bpe_train_batched(docs, args.rounds).orderBy("rank").collect()
    train_wall = round(time.perf_counter() - t0, 1)
    elems = [f"{m['left_sym']} {m['right_sym']}" for m in merges]

    w_deep, plan_deep = encode_wall(docs, elems)
    w_shallow, plan_shallow = encode_wall(docs, elems[: args.shallow])
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "rounds": args.rounds,
                "n_merges": len(elems),
                "train_wall_s": train_wall,
                "encode_deep_wall_s": w_deep,
                "encode_deep_plan_chars": plan_deep,
                "shallow_merges": args.shallow,
                "encode_shallow_wall_s": w_shallow,
                "encode_shallow_plan_chars": plan_shallow,
                "deep_over_shallow": round(w_deep / w_shallow, 2)
                if w_shallow
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
