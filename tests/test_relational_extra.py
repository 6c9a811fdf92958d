"""Accuracy/behavior tests for operators without SQL oracles, plus
CSV/JSON source round-trips (the reference has no file sources at all;
these pin the engine's batch-source surface)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_kafka_streaming_spark.queries import REGISTRY
from spark_kafka_streaming_spark.sources.batch import load_table


def test_approx_agg_within_bounds(spark, sf_dir):
    """approx_count_distinct within its documented ~2.3% default error
    (allow 5%); percentile_approx within the value range."""
    rows = {
        r.l_returnflag: (r.approx_parts, r.approx_median)
        for r in REGISTRY["q_agg_approx"].builder(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.n, r.m)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("m"),
        )
        .collect()
    }
    for flag, (n_exact, med_exact) in exact.items():
        n_approx, med_approx = rows[flag]
        assert abs(n_approx - n_exact) / n_exact < 0.05
        assert abs(med_approx - med_exact) / med_exact < 0.10


def test_csv_json_source_roundtrip(spark, sf_dir, tmp_path):
    """CSV and JSON batch sources produce the same query result as the
    parquet original (schema-explicit reads, no inference in prod)."""
    nation = load_table(spark, sf_dir, "nation")
    csv_path, json_path = str(tmp_path / "nation_csv"), str(tmp_path / "nation_json")
    nation.write.option("header", True).csv(csv_path)
    nation.write.json(json_path)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    from_csv = spark.read.schema(schema).option("header", True).csv(csv_path)
    from_json = spark.read.schema(schema).json(json_path)
    expected = sorted(tuple(r) for r in nation.collect())
    assert sorted(tuple(r) for r in from_csv.collect()) == expected
    assert sorted(tuple(r) for r in from_json.collect()) == expected


def test_union_by_name_missing_columns(spark, sf_dir):
    """unionByName with allowMissingColumns (schema-evolution union)."""
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    b = spark.createDataFrame([(2, 5.0)], "id int, score double")
    u = a.unionByName(b, allowMissingColumns=True)
    rows = sorted((r.id, r.name, r.score) for r in u.collect())
    assert rows == [(1, "x", None), (2, None, 5.0)]


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing: a join between two tables bucketed on the key plans
    without a shuffle exchange on either side — the co-located-join
    strategy for repeated 100 TB joins."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("orders_b")
    li.withColumnRenamed("l_orderkey", "o_orderkey").write.bucketBy(
        4, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("lineitem_b")
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b").hint("merge"), "o_orderkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed join should not shuffle"
    )
    assert joined.count() > 0


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Hive-style partitioned parquet output + partition pruning on read
    — the layout strategy that makes date/type-ranged scans at 100 TB
    touch only relevant directories."""
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, (
        "partition pruning not applied"
    )
    expected = ev.filter(F.col("event_type") == "purchase").count()
    assert back.count() == expected


def test_fact_partitioned_by_month_layout(spark, sf_dir, tmp_path):
    """write_fact_partitioned_by_month: same query results, partition
    filters in the plan."""
    from spark_kafka_streaming_spark.sources.batch import (
        write_fact_partitioned_by_month,
    )

    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "li_by_month")
    write_fact_partitioned_by_month(li, "l_shipdate", out)
    part = spark.read.parquet(out).filter(
        (F.col("l_shipdate_month") >= "1996-01")
        & (F.col("l_shipdate_month") <= "1996-12")
    )
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "l_shipdate_month" in plan
    expected = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).count()
    assert part.count() == expected
