#!/usr/bin/env python
"""Reproduce the SCALE.md decade measurements: generate a scaled
replica of the sf0.1 test data (via ``make_scale_data.py``) if absent,
then time a set of catalog queries on it (warm min-of-2, noop sink)
and print ONE JSON line ``{"sf_dir": ..., "factor": N, "queries":
{name: sec, ...}}``.

Usage:
    python tools/scale_decades.py                 # sf1 (10x) default
    python tools/scale_decades.py --factor 100    # sf10, the third
                                                  # decade in SCALE.md
    python tools/scale_decades.py --queries q01_pricing_summary,...

Caveats encoded in the default list (see SCALE.md third-decade
section): at factor=100 the synthetic corpus saturates banded SimHash
(28.2B candidates — use q_dedup_simhash_capped there) and the exact
n-gram Jaccard prefix filter (tiny shingle space), and the replica
embeddings make sign-LSH bucket density irreducible; those queries are
excluded by default rather than silently timing out.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q06_forecast_revenue",
    "q_agg_grouping_sets",
    "q_window_topk_orders_per_customer",
    "q_window_tumbling_hourly",
    "q_events_sessionize_batch",
    "q_events_dedup_within_interval",
    "q_events_resample_gapfill",
    "q_events_rollup_time_grains",
    "q_audit_referential_integrity",
    "q_sketch_count_min",
    "q_sketch_hll_grouped",
    "q_sketch_quantile_hist",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash_capped",
    "q_text_inverted_index",
    "q_ngram_novelty",
    "q_decontaminate_bloom",
    "q_shard_token_budget",
    "q_text_collocations_lift",
    "q_similarity_ivfpq",
    "q_text_phrase_search",
    "q_text_fuzzy_match",
    "q_basket_brand_pairs",
    "q_layout_zorder",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None,
                    help="comma-separated catalog names (default: the "
                    "SCALE.md decade set)")
    ap.add_argument("--vocab", default="empirical",
                    choices=("empirical", "zipf"),
                    help="documents vocabulary mode (zipf = power-law "
                    "web-corpus shape with injected near-dups; see "
                    "make_scale_data.py)")
    args = ap.parse_args()
    # Name the default dir by the exact factor (sf1/sf10 kept for the
    # documented decades) — a rounded name would let `--factor 1..19`
    # silently reuse factor-10 data and mislabel the measurements.
    known = {10: "sf1", 100: "sf10"}
    suffix = "" if args.vocab == "empirical" else f"_{args.vocab}"
    out = args.out or (
        f"/tmp/spark_graft_{known.get(args.factor, f'f{args.factor}')}{suffix}"
    )
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES

    if not os.path.exists(os.path.join(out, "lineitem.parquet")):
        subprocess.check_call(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_scale_data.py"),
             out, str(args.factor), args.vocab]
        )

    from spark_kafka_streaming_spark import get_spark
    from spark_kafka_streaming_spark.functions.caching import (
        release_operator_caches,
    )
    from spark_kafka_streaming_spark.queries import REGISTRY

    from watchdog import StallWatchdog

    spark = get_spark(app_name="scale_decades", shuffle_partitions=32)
    results: dict[str, float] = {}
    for name in names:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            # stall guard (round-10): a hung stage (the round-9
            # read-ahead deadlock shape) dumps jstack + py stacks to
            # /tmp every SPARK_GRAFT_STALL_TIMEOUT seconds instead of
            # parking the measurement session silently.
            with StallWatchdog(name):
                REGISTRY[name].builder(spark, out).write.format(
                    "noop"
                ).mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            release_operator_caches()
            spark.catalog.clearCache()
        results[name] = round(min(ts[1:]), 3)  # warm min-of-2
        print(f"# {name}: {results[name]}s", file=sys.stderr)
    print(json.dumps(
        {"sf_dir": out, "factor": args.factor, "vocab": args.vocab,
         "queries": results}
    ))


if __name__ == "__main__":
    main()
