#!/usr/bin/env python
"""Dump .explain("formatted") for named catalog entries to files.

Usage: python tools/dump_plan.py <suffix> <query> [<query> ...]
Writes plans/r12/<query>_<suffix>.txt for each.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_kafka_streaming_spark import get_spark  # noqa: E402
from spark_kafka_streaming_spark.queries import REGISTRY  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump_plan")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
