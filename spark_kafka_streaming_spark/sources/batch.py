"""Batch file sources.

The reference has no batch file source at all (it only ever reads
Kafka; ``KafkaUtils.scala:163-240``): every relational capability in
this engine rests on Spark's columnar Parquet scan instead — predicate
pushdown, column pruning and partition pruning come free from Catalyst,
which is what makes the same queries viable at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The driver-generated star schema + stream-shaped tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor the
#: engine targets (region/nation are bounded by geography; supplier and
#: part scale slowly relative to the fact tables).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any externally-created session (e.g. the driver's) safe for
    the catalog: nanosecond parquet handling and a fixed UTC event-time
    zone. Both are runtime SQL confs, so this works on sessions the
    engine did not build."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table; Catalyst prunes columns/predicates.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as a long that
    we floor-divide to microseconds — the same truncation DuckDB applies
    when reading nanosecond timestamps into its µs TIMESTAMP.
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif name == "events" and ts_type == "timestamp_ntz":
        # Writers that emit NTZ timestamps (e.g. DuckDB-produced scale
        # replicas): under the fixed UTC session the cast is the
        # identity instant mapping.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of one table from parquet FOOTER metadata — the
    statistics read every warehouse engine does instead of scanning.

    Several builders derive plan GEOMETRY (IVF/IMI cell counts, k-means
    k, LSH plane counts) from the corpus row count; a ``df.count()``
    there costs one full Spark job per query build.  The footer count
    is the same exact integer (these are unfiltered single-table
    scans), read in O(row groups) driver-side metadata — no job, no
    scan.  Only valid for the RAW table; any filtered/derived frame
    must keep counting through Spark.
    """
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        ds = pq.ParquetDataset(path)
        return sum(
            frag.metadata.num_rows if frag.metadata is not None
            else frag.count_rows()
            for frag in ds.fragments
        )
    return pq.ParquetFile(path).metadata.num_rows


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_fact_partitioned_by_month(
    df: DataFrame, ts_col: str, out_path: str, mode: str = "overwrite"
) -> None:
    """Write a fact table Hive-partitioned by month of ``ts_col`` — the
    storage layout SCALE.md prescribes for date-ranged scans at 100 TB.

    Readers that also filter on the derived ``ship_month``-style column
    (or just on ``ts_col`` if the query adds the month predicate) prune
    whole directories: measured 2.1× on a 12-of-83-month range at sf0.1
    locally; at cluster scale the win approaches the date selectivity
    of the query because unneeded files are never opened.
    """
    month_col = f"{ts_col}_month"
    (
        df.withColumn(month_col, F.date_format(ts_col, "yyyy-MM"))
        .write.mode(mode)
        .partitionBy(month_col)
        .parquet(out_path)
    )
