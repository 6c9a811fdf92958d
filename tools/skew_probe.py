#!/usr/bin/env python
"""Planted ENTITY-skew probes (VERDICT r7 #6): the zipf corpus
stresses vocabulary skew, but no decade probe planted a hot entity.
This derives a skew variant of an existing scale dir —

* ``events``: every ``user_id % 100 == 0`` row remaps to ONE user
  (~1% of the whole stream on a single key — a bot/service account);
* ``lineitem``: every ``l_orderkey % mod == 0`` row remaps to ONE
  order (mod sized so the hot order carries ~10⁴ lineitems);

all other tables symlink to the source dir — then times catalog
queries UNMODIFIED against it (same warm min-of-2, noop-sink protocol
as scale_decades.py).  The interesting shapes: user-keyed window sorts
(sessionize / SCD2 / session quantiles — the hot user's rows all land
in one task's window), user-keyed aggs (funnel), order-keyed aggs
(q18), and the salted-agg path.

Usage: python tools/skew_probe.py [--src /tmp/spark_graft_sf100]
           [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_events_sessionize_batch",
    "q_events_scd2_user_state",
    "q_events_session_duration_quantiles",
    "q_events_funnel",
    "q_agg_salted_skew",
    "q18_large_volume_customers",
    "q_window_topk_orders_per_customer",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_skew_dir(src: str, out: str, user_mod: int = 100) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    n_li = con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/lineitem.parquet')"
    ).fetchone()[0]
    # hot order: ~10⁴ lineitems on one key
    mod = max(1, n_li // 10_000)
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if os.path.exists(dst):
            continue
        if t == "events":
            cols = [
                c[0]
                for c in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{src}/events.parquet')"
                ).fetchall()
            ]
            proj = ", ".join(
                f"CASE WHEN user_id % {user_mod} = 0 THEN 42 ELSE user_id END"
                " AS user_id"
                if c == "user_id"
                else c
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {proj} FROM read_parquet('{src}/events.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
            )
        elif t == "lineitem":
            cols = [
                c[0]
                for c in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{src}/lineitem.parquet')"
                ).fetchall()
            ]
            proj = ", ".join(
                f"CASE WHEN l_orderkey % {mod} = 0 THEN 1 ELSE l_orderkey END"
                " AS l_orderkey"
                if c == "l_orderkey"
                else c
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {proj} FROM read_parquet('{src}/lineitem.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
            )
        else:
            os.symlink(f"{src}/{t}.parquet", dst)
    print(f"# skew dir ready: {out} (hot-order mod {mod})", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/spark_graft_sf100")
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument(
        "--user-mod", type=int, default=100,
        help="1-in-N users remap to the hot user (100 → ~1%% of "
        "events on one key; 10 → ~10%%)",
    )
    args = ap.parse_args()
    out = args.out or args.src.rstrip("/") + "_skew"
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES

    build_skew_dir(args.src, out, args.user_mod)

    from spark_kafka_streaming_spark import get_spark
    from spark_kafka_streaming_spark.functions.caching import (
        release_operator_caches,
    )
    from spark_kafka_streaming_spark.queries import REGISTRY

    from watchdog import StallWatchdog

    spark = get_spark(app_name="skew_probe", shuffle_partitions=32)
    results: dict[str, float] = {}
    for name in names:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            # stall guard — see tools/watchdog.py (round-10)
            with StallWatchdog(name):
                REGISTRY[name].builder(spark, out).write.format(
                    "noop"
                ).mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            release_operator_caches()
            spark.catalog.clearCache()
        results[name] = round(min(ts[1:]), 3)
        print(f"# {name}: {results[name]}s", file=sys.stderr)
    print(json.dumps({"src": args.src, "skew_dir": out, "queries": results}))


if __name__ == "__main__":
    main()
