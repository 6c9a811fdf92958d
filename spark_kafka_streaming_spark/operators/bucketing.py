"""Bucketed (co-located) joins: pre-shuffle once, join shuffle-free forever.

The 100 TB pattern: fact tables that are repeatedly joined on the same
key (``lineitem ⋈ orders`` on the order key, a signature store probed
by band key every micro-batch, …) should be written **bucketed** on
that key.  ``bucketBy(n, key)`` hash-partitions rows into ``n``
physical buckets at write time and records the layout in the catalog;
every later equi-join between two tables bucketed the same way on the
join key skips the Exchange entirely — Spark scans matching bucket
pairs and (with ``sortBy``) can even skip the sort.

At 1000-executor scale this converts the dominant repeated cost — a
full ~TB shuffle of both join sides per query — into a one-time write
cost amortized over every subsequent join, and it removes the shuffle
skew risk for those joins entirely.  This is the batch twin of the
incremental-dedup store layout (:mod:`..streaming.incremental_dedup`
lays its accepted-signature store out by join key for the same
reason).

Reference parity: the reference engine keeps Kafka partitions pinned
to consumers so repeated per-partition work never re-partitions
(``PartitionedSimpleConsumerKafkaInputDStream.scala:48-487``); this
module is the at-rest analog — data laid out by key so repeated
joins never re-shuffle.

Bucket-count sizing (cluster guidance): pick
``n ≈ table_size / 256 MB`` rounded to a multiple of the executor
count, and use the SAME ``n`` and key on both sides — mismatched
bucket counts force Spark to re-shuffle one side (Spark can only
coalesce when one count divides the other and
``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table named ``table``.

    ``sort_cols`` (typically the bucket key) additionally sorts rows
    within each bucket file so downstream sort-merge joins on that key
    skip their Sort nodes.  ``path`` makes the table external (data at
    ``path``, metadata in the session catalog) — use a stable
    warehouse location in production; tests pass a tmpdir.
    """
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str | tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    ``on`` entries are either a shared column name or a
    ``(left_col, right_col)`` pair (bucket columns may be named
    differently per table, e.g. ``l_orderkey``/``o_orderkey``).  Both
    tables must have been written with :func:`write_bucketed` using
    the same bucket count, bucketed on the joined columns; the
    resulting physical plan then contains **no Exchange** on either
    side (pin: ``tests/test_bucketing.py``).
    """
    left, right = spark.table(left_table), spark.table(right_table)
    pairs = [(c, c) if isinstance(c, str) else c for c in on]
    cond = None
    for lc, rc in pairs:
        eq = left[lc] == right[rc]
        cond = eq if cond is None else (cond & eq)
    return left.join(right, on=cond, how=how)
