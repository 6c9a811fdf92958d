"""Bucketed co-located join: plan + correctness pins.

The scale property under test: two tables written bucketed on the join
key join WITHOUT any Exchange — the one-time pre-shuffle at write time
is reused by every subsequent join.  Broadcast is disabled inside the
tests so the assertions exercise the shuffle path a 100 TB fact-fact
join would actually take.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from spark_kafka_streaming_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from spark_kafka_streaming_spark.sources.batch import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def _conf(spark, key, value):
    prev = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, prev)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        "orders_bkt",
        ["o_orderkey"],
        num_buckets=8,
        sort_cols=["o_orderkey"],
        path=str(base / "orders_bkt"),
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        "lineitem_bkt",
        ["l_orderkey"],
        num_buckets=8,
        sort_cols=["l_orderkey"],
        path=str(base / "lineitem_bkt"),
    )
    yield "lineitem_bkt", "orders_bkt"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    lineitem_t, orders_t = bucketed_tables
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        joined = bucketed_join(
            spark, lineitem_t, orders_t, on=[("l_orderkey", "o_orderkey")]
        )
        plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, (
        "bucketed join re-shuffled — the write-time layout was not reused:\n"
        + plan
    )
    # Both scans read the bucket layout directly (no bucket pruning
    # needed here — an equality filter on the key would show < 8).
    assert plan.count("Bucketed: true") == 2
    assert plan.count("SelectedBucketsCount: 8 out of 8") == 2
    # Note: per-bucket Sort nodes remain — since Spark 3.0 the scan
    # reports bucket sort order only under
    # spark.sql.legacy.bucketedTableScan.outputOrdering (it forces
    # one-file-per-bucket reads, costing scan parallelism). The
    # Exchange elision is the scale win; the in-partition sort is
    # spill-free and local.


def test_bucket_pruning_on_key_filter(spark, bucketed_tables):
    """A point filter on the bucket key scans exactly one bucket."""
    from pyspark.sql import functions as F

    _, orders_t = bucketed_tables
    # The planner auto-disables bucketed scans where the layout gives
    # no join/agg benefit (a bucketed read caps scan parallelism at the
    # bucket count) — force it to see the pruning behavior itself.
    with _conf(spark, "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"):
        plan = _plan(spark.table(orders_t).filter(F.col("o_orderkey") == 7))
    assert "SelectedBucketsCount: 1 out of 8" in plan


def test_unbucketed_join_shuffles_both_sides(spark, sf_dir):
    """Control: the same join from plain parquet exchanges both sides."""
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        plan = _plan(li.join(o, li["l_orderkey"] == o["o_orderkey"]))
    assert plan.count("Exchange hashpartitioning") >= 2


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lineitem_t, orders_t = bucketed_tables
    bucketed = bucketed_join(
        spark, lineitem_t, orders_t, on=[("l_orderkey", "o_orderkey")]
    ).select("l_orderkey", "l_linenumber", "o_orderstatus")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_linenumber", "o_orderstatus"
    )
    assert bucketed.count() == plain.count()
    assert bucketed.exceptAll(plain).isEmpty()
    assert plain.exceptAll(bucketed).isEmpty()
