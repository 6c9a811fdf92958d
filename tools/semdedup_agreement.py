#!/usr/bin/env python
"""SemDeDup drop-set agreement at production k: two-level (IMI)
assignment vs exact full-search Lloyd.

The two-level route's quality contract is pinned at k=300 on a planted
corpus (tests/test_round8_kmeans.py: assignment agreement >= 0.95);
this probe measures what the SemDeDup CONSUMER actually feels at the
production operating point — the per-vector kept/dropped decision on
the real scaled corpus at auto_k (k = n/400) — plus both routes'
walls.  A vector's kept flag can differ only when the approximate
assignment lands it in a different cluster AND that cluster contains a
>= tau neighbor the true cluster doesn't (or vice versa), so kept
agreement is expected to sit above raw assignment agreement.

Usage:
  python tools/semdedup_agreement.py [--sf-dir /tmp/spark_graft_sf10]
      [--k 0 (0 = auto_k)] [--tau 0.45]
Prints ONE JSON line: walls, drop counts, kept agreement, drop-set
Jaccard.
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


def run(spark, sf_dir: str, k: int, tau: float, two_level: bool,
        n_sprobe: int = 2):
    from spark_kafka_streaming_spark.operators.kmeans import semantic_dedup

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t0 = time.perf_counter()
    rows = semantic_dedup(
        emb, k=k, tau=tau, two_level=two_level, n_sprobe=n_sprobe
    ).select("vec_id", "kept").collect()
    wall = time.perf_counter() - t0
    release_operator_caches()
    spark.catalog.clearCache()
    return {int(r["vec_id"]): bool(r["kept"]) for r in rows}, round(wall, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf10")
    ap.add_argument("--k", type=int, default=0, help="0 = auto_k(n)")
    ap.add_argument("--tau", type=float, default=0.45)
    ap.add_argument("--n-sprobe", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="semdedup_agreement")
    if args.k == 0:
        from spark_kafka_streaming_spark.operators.kmeans import auto_k

        n = spark.read.parquet(
            os.path.join(args.sf_dir, "embeddings.parquet")
        ).count()
        args.k = auto_k(n)

    exact, w_exact = run(spark, args.sf_dir, args.k, args.tau, False)
    imi, w_imi = run(
        spark, args.sf_dir, args.k, args.tau, True, args.n_sprobe
    )
    assert exact.keys() == imi.keys()
    n = len(exact)
    same = sum(1 for i, kt in exact.items() if imi[i] == kt)
    de = {i for i, kt in exact.items() if not kt}
    di = {i for i, kt in imi.items() if not kt}
    union = len(de | di)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "n_vectors": n,
                "k": args.k,
                "tau": args.tau,
                "n_sprobe": args.n_sprobe,
                "wall_exact_s": w_exact,
                "wall_imi_s": w_imi,
                "drops_exact": len(de),
                "drops_imi": len(di),
                "kept_agreement": round(same / n, 5),
                "dropset_jaccard": round(
                    (len(de & di) / union) if union else 1.0, 5
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
