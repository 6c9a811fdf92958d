"""SQL entry-path parity: the engine is usable through ``spark.sql``
as well as the DataFrame builders.

The oracle strings in the registry are ANSI-first; for every dialect-
portable query the *same* SQL text runs unchanged on Spark over
registered views and must produce exactly the builder's rows — the
SQL/DataFrame dual-API guarantee (55 of the 74 oracle queries are
portable; the rest use DuckDB list_*/json dialect functions and are
excluded here).
"""

from __future__ import annotations

import pytest

from spark_kafka_streaming_spark.queries import REGISTRY
from spark_kafka_streaming_spark.sources.batch import TABLES, load_table

#: dialect-portable representatives across operator families (the full
#: portable set is 55 queries; this subset keeps the suite fast).
PORTABLE = [
    "q01_pricing_summary",
    "q02_min_cost_supplier",
    "q08_nation_market_share",
    "q13_customer_order_distribution",
    "q21_waiting_suppliers",
    "q_agg_grouping_sets",
    "q_agg_pivot_status_by_priority",
    "q_join_anti_customers_without_orders",
    "q_join_band_broadcast",
    "q_setops_intersect_active_both_years",
    "q_subquery_correlated_above_avg",
    "q_window_distribution_ranks",
    "q_window_session_30m",
    "q_window_topk_orders_per_customer",
    "q_events_sessionize_batch",
    "q_corpus_snapshot_diff",
    "q_stats_moments_merge",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    yield
    for t in TABLES:
        spark.catalog.dropTempView(t)


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_text_matches_builder(name, spark, sf_dir, views):
    q = REGISTRY[name]
    sql_rows = sorted(map(tuple, spark.sql(q.oracle).collect()), key=repr)
    df_rows = sorted(map(tuple, q.builder(spark, sf_dir).collect()), key=repr)
    assert sql_rows == df_rows, f"{name}: spark.sql != DataFrame builder"
