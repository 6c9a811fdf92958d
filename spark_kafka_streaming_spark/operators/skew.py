"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool for (a) skewed *aggregation*
keys, which AQE does not split, and (b) deterministic pre-planned jobs.

Semantics are preserved exactly: a salted aggregate is the classic
two-phase combine (per-(key,salt) partial → per-key final), so any
algebraic aggregate (sum/count/min/max — and exact DECIMAL sums) gives
bit-identical results to the unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_expr: Column,
    n_salts: int = 16,
    value_name: str = "total",
) -> DataFrame:
    """groupBy(keys).agg(sum(value), count(*)) with a salt pre-phase.

    Phase 1 shuffles by (keys, salt) — a hot key spreads over
    ``n_salts`` reducers; phase 2 combines the ``n_salts`` partials per
    key (tiny). ``value_expr`` must be an exact (decimal/integer)
    expression for bit-stable totals.
    """
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(value_expr).alias("_psum"),
            F.count("*").alias("_pcnt"),
        )
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("_psum").alias(value_name),
            F.sum("_pcnt").alias("n"),
        )
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed fact ⋈ small dim without a skewed shuffle: replicate the
    dim ``n_salts`` times (salted), salt the fact rows, equi-join on
    (key, salt). With a broadcast dim Spark already avoids the shuffle;
    this form is for when the dim is broadcast-marginal and the fact's
    key distribution is pathological.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts)
    fact_salted = fact.withColumn(
        "_salt", (F.spark_partition_id() % n_salts)
    )
    out = fact_salted.join(dim_rep, [key, "_salt"]).drop("_salt")
    return out
