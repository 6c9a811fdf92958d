"""Round-7 fixes and operators: null-aware heavy hitters,
session-scoped round-trip temp paths, sqrt-scaled IVF cell policy,
two-level (IMI) coarse quantization, batched BPE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_kafka_streaming_spark.operators.sketches import (
    heavy_hitters_exact,
)


def _token_df(spark, counts, extra_nulls=0):
    rows = [(t,) for t, c in counts.items() for _ in range(c)]
    rows += [(None,)] * extra_nulls
    return spark.createDataFrame(rows, "token string").repartition(4)


# ------------------------------------------- heavy hitters with NULLs


def test_heavy_hitters_null_items_do_not_inflate_n(spark):
    # 900 non-null items; phi=0.1 → threshold ceil(90)=90, so "edge"
    # (cnt 95) is a heavy hitter.  Before the fix, 600 null rows
    # inflated N to 1500 → threshold 150 → "edge" was wrongly dropped.
    counts = {"hot": 700, "edge": 95, **{f"t{i}": 1 for i in range(105)}}
    df = _token_df(spark, counts, extra_nulls=600)
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitters_exact(df, "token", phi=0.1, capacity=64).collect()
    }
    assert got == {"hot": 700, "edge": 95}


def test_heavy_hitters_frac_over_nonnull_total(spark):
    df = _token_df(spark, {"a": 60, "b": 40}, extra_nulls=100)
    out = {r["token"]: r["frac"] for r in
           heavy_hitters_exact(df, "token", phi=0.1).collect()}
    assert out == {"a": 0.6, "b": 0.4}


# ------------------------------------------- session-scoped temp path


def test_roundtrip_temp_path_is_session_scoped(spark, sf_dir):
    from spark_kafka_streaming_spark.queries.formats import (
        _session_temp_path,
        q_orc_roundtrip,
    )

    path = _session_temp_path(spark, "spark_graft_orc_roundtrip")
    app_id = spark.sparkContext.applicationId
    assert path.endswith(f"spark_graft_orc_roundtrip-{app_id}")
    out = q_orc_roundtrip(spark, sf_dir)
    assert out.count() > 0
    import os

    assert os.path.exists(path)
