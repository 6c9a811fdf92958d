"""Round-9 ADVICE fixes, each pinned by the failure it closes:

* recover_swap reclaims a stale ``.old`` / ``.compact.tmp`` copy when
  the store path is whole (disk leak after a crash between the final
  rename and its cleanup);
* quantile-store retention keeps rows whose event time evaluates to
  NULL (a misconfigured ``event_time_sql`` must not silently delete
  state; an all-NULL store must not empty itself);
* merge-store full-bucket deletion commits via an empty tombstone
  leaf, so a crash in the swap window cannot resurrect deleted keys on
  a stream that is never replayed;
* kmeans_assignments warns loudly when the DEFAULT flips to the
  approximate two-level (IMI) search at k >= IMI_ASSIGN_MIN_K, so an
  oracle run at a larger sf fails with a message instead of a
  confusing diff.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from spark_kafka_streaming_spark.streaming.incremental_quantiles import (
    IncrementalQuantileStore,
)
from spark_kafka_streaming_spark.streaming.swap import recover_swap


def test_recover_swap_reclaims_stale_copies(tmp_path):
    sp = str(tmp_path / "store")
    os.makedirs(sp)
    with open(os.path.join(sp, "part-0.parquet"), "w") as f:
        f.write("x")
    # crash landed after `tmp -> store` but before rmtree(old), plus a
    # stale tmp from an even earlier aborted compact
    shutil.copytree(sp, sp + ".old")
    shutil.copytree(sp, sp + ".compact.tmp")
    recover_swap(sp)
    assert os.path.exists(sp)
    assert not os.path.exists(sp + ".old")
    assert not os.path.exists(sp + ".compact.tmp")


def test_quantile_retention_keeps_null_event_times(spark, tmp_path):
    """Groups whose event_time_sql yields NULL survive compact();
    datable groups still evict past the horizon."""
    rows = (
        [(i, "2024-01-01 00:00:00", float(i)) for i in range(5)]
        + [(100 + i, "2024-01-01 07:00:00", float(i)) for i in range(5)]
        + [(200 + i, "not-a-timestamp", float(i)) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "rid bigint, win string, v double")
    store = IncrementalQuantileStore(
        str(tmp_path / "qn"),
        "win",
        "v",
        "rid",
        k=8,
        event_time_sql="TRY_CAST(g AS TIMESTAMP)",
        retention="2 HOURS",
    )
    store(df, 0)
    store.compact(spark)
    groups = {
        r["g"] for r in store.sample(spark).select("g").distinct().collect()
    }
    # hour 0 evicted (horizon 05:00), hour 7 live, un-datable group KEPT
    assert groups == {"2024-01-01 07:00:00", "not-a-timestamp"}


def test_quantile_retention_all_null_keeps_everything(spark, tmp_path):
    """All event times NULL → NULL horizon → nothing evicted (the old
    behavior emptied the whole store)."""
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(30)],
        "rid bigint, win string, v double",
    )
    store = IncrementalQuantileStore(
        str(tmp_path / "qa"),
        "win",
        "v",
        "rid",
        k=8,
        event_time_sql="TRY_CAST(g AS TIMESTAMP)",
        retention="2 HOURS",
    )
    store(df, 0)
    store.compact(spark)
    groups = {
        r["g"] for r in store.sample(spark).select("g").distinct().collect()
    }
    assert groups == {"g0", "g1", "g2"}


def test_merge_full_bucket_delete_survives_crash_without_replay(
    spark, tmp_path
):
    """Delete every key of one bucket, then plant the crash remnant (old
    bucket content sitting aside, final cleanup never ran): recovery
    must NOT resurrect the deleted keys — the empty tombstone leaf
    holds the bucket's slot."""
    from spark_kafka_streaming_spark.streaming.incremental_merge import (
        IncrementalMerger,
    )

    store = str(tmp_path / "ms")
    merger = IncrementalMerger(store, key_col="k", n_key_buckets=2)
    seed = spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "k bigint, name string"
    )
    merger(seed.selectExpr("k", "'U' AS op", "name"), 0)
    snap = merger.snapshot(spark)
    kb = F.pmod(F.xxhash64(F.col("k").cast("string")), F.lit(2)).cast("int")
    bucket0_keys = [
        r["k"] for r in snap.withColumn("kb", kb).where("kb = 0").collect()
    ]
    assert bucket0_keys  # the seed populates both buckets
    deletes = spark.createDataFrame(
        [(k,) for k in bucket0_keys], "k bigint"
    ).selectExpr("k", "'D' AS op", "CAST(NULL AS STRING) AS name")
    merger(deletes, 1)
    # tombstone leaf holds the slot
    assert os.path.isdir(os.path.join(store, "kb=0"))

    # plant the crash remnant: pre-delete bucket content aside, as if
    # the final rmtree(aside_root) never ran
    aside = store + ".aside"
    os.makedirs(aside, exist_ok=True)
    os.makedirs(os.path.join(aside, "kb=0"))
    with open(os.path.join(aside, "kb=0", "stale.parquet"), "w") as f:
        f.write("stale")
    got = {r["k"] for r in merger.snapshot(spark).collect()}
    assert got.isdisjoint(set(bucket0_keys))
    assert not os.path.exists(aside)


def test_merge_all_keys_deleted_snapshot_is_none(spark, tmp_path):
    from spark_kafka_streaming_spark.streaming.incremental_merge import (
        IncrementalMerger,
    )

    store = str(tmp_path / "ms2")
    merger = IncrementalMerger(store, key_col="k", n_key_buckets=2)
    seed = spark.createDataFrame(
        [(i, f"n{i}") for i in range(8)], "k bigint, name string"
    )
    merger(seed.selectExpr("k", "'U' AS op", "name"), 0)
    merger(seed.selectExpr("k", "'D' AS op", "CAST(NULL AS STRING) name"), 1)
    assert merger.snapshot(spark) is None


def test_kmeans_warns_on_default_two_level_flip(spark):
    from spark_kafka_streaming_spark.operators.kmeans import (
        IMI_ASSIGN_MIN_K,
        kmeans_assignments,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 11), float(i % 13)]) for i in range(600)],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.warns(UserWarning, match="two_level=False"):
        kmeans_assignments(emb, k=IMI_ASSIGN_MIN_K, iters=0).count()
    # pinned choice (either way) stays silent
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        kmeans_assignments(
            emb, k=IMI_ASSIGN_MIN_K, iters=0, two_level=False
        ).count()
