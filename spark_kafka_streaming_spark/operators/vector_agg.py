"""Elementwise vector aggregation over ``array<float>`` embedding
columns: per-group centroids (the reduce step of k-means, class
prototypes, cluster summaries).

Plan shape: ``posexplode`` fans each vector into (group, position,
component) rows — dim× row inflation, but each row is 24 bytes and the
aggregation is fully map-side combinable, so the shuffle carries one
row per (group × position × map task), never per vector. The rebuild
side (``collect_list`` of (pos, value) structs per group) is bounded by
the embedding dimension, not the corpus: safe at any group cardinality.

Components are aggregated on the integer scale from
:mod:`..functions.vectors` — int64 sums are associative, so centroids
are bit-identical across partitionings and engines; the final
mean is one double division per component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V


def group_centroids(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group exact centroid: ``*group_cols, n_vecs, centroid``
    (array<double>, scaled back to component units)."""
    ex = df.select(
        *group_cols,
        F.posexplode(F.expr(V.spark_scaled(vec_col))).alias("pos", "c"),
    )
    sums = ex.groupBy(*group_cols, "pos").agg(
        F.sum("c").alias("s"), F.count("*").alias("n")
    )
    return (
        sums.groupBy(*group_cols)
        .agg(
            F.max("n").alias("n_vecs"),
            F.array_sort(
                F.collect_list(F.struct("pos", "s"))
            ).alias("_ps"),
        )
        .withColumn(
            "centroid",
            F.expr(
                f"transform(_ps, p -> CAST(p.s AS DOUBLE) / n_vecs / {V.SCALE})"
            ),
        )
        .drop("_ps")
    )
