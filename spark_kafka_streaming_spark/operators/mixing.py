"""Data mixing: realize a target corpus mixture as a deterministic,
reproducible sample.

Training-data pipelines rarely train on the corpus as-is — they train
on a *mixture* ("80% en, 30% zh, ...") realized by downsampling each
stratum at its own rate. The primitive here is the same one the
stratified sampler uses (a portable content hash of the id, never
``rand()``): a document is kept iff

    hash(salt || id) mod 1_000_000  <  rate_ppm(stratum)

so the sample is a pure function of the data — re-running the pipeline,
on any cluster, at any partitioning, yields the identical mixture, and
a DuckDB oracle reproduces it exactly.

Scale shape: the keep-predicate is a map-only filter (no shuffle, no
per-stratum pass); rates are compiled into one CASE expression, so a
20-source mixture costs the same single scan as a 2-source one. The
realized-mixture report is a map-side-combinable groupBy over the
stratum key — metadata-scale output (one row per stratum).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH

#: rates are expressed in parts-per-million of the stratum kept.
PPM = 1_000_000


def _case_ppm(stratum_col: str, rates_ppm: Mapping[str, int], default_ppm: int) -> str:
    arms = " ".join(
        f"WHEN '{k}' THEN {int(v)}" for k, v in sorted(rates_ppm.items())
    )
    return f"CASE {stratum_col} {arms} ELSE {int(default_ppm)} END"


def mixture_keep_expr(
    id_col: str,
    stratum_col: str,
    rates_ppm: Mapping[str, int],
    default_ppm: int = 0,
    salt: str = "mix",
) -> Column:
    """Deterministic keep-predicate realizing ``rates_ppm`` per stratum."""
    h = TH.spark_str_hash(f"concat('{salt}:', CAST({id_col} AS STRING))")
    return F.expr(
        f"pmod({h}, {PPM}) < ({_case_ppm(stratum_col, rates_ppm, default_ppm)})"
    )


def duck_mixture_keep_sql(
    id_col: str,
    stratum_col: str,
    rates_ppm: Mapping[str, int],
    default_ppm: int = 0,
    salt: str = "mix",
) -> str:
    """DuckDB twin of :func:`mixture_keep_expr` (same hash family)."""
    h = TH.duck_str_hash(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"(({h}) % {PPM}) < ({_case_ppm(stratum_col, rates_ppm, default_ppm)})"


def weighted_mixture(
    df: DataFrame,
    rates_ppm: Mapping[str, int],
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    default_ppm: int = 0,
    salt: str = "mix",
) -> DataFrame:
    """Downsample each stratum at its own rate, deterministically."""
    return df.filter(
        mixture_keep_expr(id_col, stratum_col, rates_ppm, default_ppm, salt)
    )


def mixture_report(
    df: DataFrame,
    rates_ppm: Mapping[str, int],
    size_col: str,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    default_ppm: int = 0,
    salt: str = "mix",
) -> DataFrame:
    """Realized-mixture audit: per stratum, input vs kept docs/tokens.

    One scan; conditional aggregation instead of a second pass over the
    sample. Output is one row per stratum (metadata-scale).
    """
    keep = mixture_keep_expr(id_col, stratum_col, rates_ppm, default_ppm, salt)
    return (
        df.withColumn("_keep", keep)
        .groupBy(stratum_col)
        .agg(
            F.count("*").alias("docs_in"),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("docs_kept"),
            F.sum(size_col).alias("tok_in"),
            F.sum(F.when(F.col("_keep"), F.col(size_col)).otherwise(0)).alias(
                "tok_kept"
            ),
        )
    )
