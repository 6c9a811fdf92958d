"""Skew-handling operators: salting for hot keys and hot LSH buckets.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool for (a) skewed *aggregation*
keys, which AQE does not split, (b) deterministic pre-planned jobs, and
(c) the LSH band self-joins, where a hot (band, key) bucket inflates
quadratically INSIDE one join group — AQE can split a partition's
input, but m² candidate generation from one bucket is still one
logical group (:func:`bounded_self_pairs` decomposes it exactly).

Semantics are preserved exactly in every helper: a salted aggregate is
the classic two-phase combine (per-(key,salt) partial → per-key final),
so any algebraic aggregate (sum/count/min/max — and exact DECIMAL sums)
gives bit-identical results to the unsalted plan, and the bucket
decomposition emits the identical pair set.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import reduce

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


def bounded_self_pairs(
    bands: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
    select_cols: Callable[[], Sequence[Column]],
    cap: int | None = None,
) -> DataFrame:
    """All intra-bucket pairs with ``l.{id_col} < r.{id_col}`` — the
    candidate-generation self-join of the LSH near-dup tiers
    (:func:`.dedup.minhash_lsh_pairs`,
    :func:`.similarity.cosine_dup_pairs`) — with a hot-bucket guard.

    On a corpus with a heavy near-duplicate cluster — exactly what a
    crawl snapshot full of boilerplate produces at 100 TB — one
    mega-bucket turns into one mega-task: every colliding row lands in
    a single join group that materializes m² candidates alone
    (straggler at best, executor OOM at worst).  The guard keeps the
    OUTPUT identical (the total m² candidate count is inherent to
    emitting all pairs) while bounding what any single task sees:

    * buckets ≤ ``cap`` members take the plain self-join, unchanged;
    * over-cap buckets are decomposed cell-wise: each member gets a
      salt cell ``c(id) = pmod(hash64(id), k)``, ``k = ⌈m/cap⌉``; the
      left side replicates each member once per target cell, the right
      side keeps its own cell, and the join key becomes
      (key_cols…, target_cell) — a pair (a, b) matches exactly once
      (at target_cell = c(b)), the hot bucket spreads over k shuffle
      keys, and each join group holds m left rows × ~cap right rows
      instead of m × m.

    ``bands``: one row per (member, bucket); bucket = ``key_cols``.
    ``select_cols``: builds the output projection from the join aliases
    ``l`` / ``r`` (e.g. ``lambda: [F.col("l.id").alias("id1"), …]``) —
    a callback so callers can compute pair expressions (cosine, …)
    inside the join, before any shuffle of the pair stream.
    ``cap``: max bucket size processed as a single join group; ``None``
    disables the guard (plain self-join, no bucket-size pass, zero
    overhead) — right for corpora known near-dup-light; crawl-scale
    pipelines should set it around the point where cap² candidate rows
    comfortably fit one task (10⁴–10⁵).  Exactness is pinned by
    ``tests/test_skew_guard.py`` on a planted all-near-dup corpus.
    """

    def _pairs(lf: DataFrame, rf: DataFrame, extra: Column | None) -> DataFrame:
        l, r = lf.alias("l"), rf.alias("r")
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"l.{c}") == F.col(f"r.{c}") for c in key_cols],
        )
        cond = cond & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        if extra is not None:
            cond = cond & extra
        return l.join(r, cond).select(*select_cols())

    if cap is None:
        return _pairs(bands, bands, None)

    sizes = bands.groupBy(*key_cols).agg(F.count("*").alias("_bsz"))
    # Over-cap buckets are by definition few (each holds > cap members
    # of a finite corpus) — broadcast the key list to both paths.
    big_keys = sizes.filter(F.col("_bsz") > cap)

    small = bands.join(
        F.broadcast(big_keys.select(*key_cols)), list(key_cols), "left_anti"
    )
    normal = _pairs(small, small, None)

    big = bands.join(F.broadcast(big_keys), list(key_cols)).withColumn(
        "_k", F.expr(f"CAST(ceil(CAST(_bsz AS DOUBLE) / {cap}) AS INT)")
    )
    big = big.withColumn(
        "_cell", F.expr(f"pmod(xxhash64(CAST({id_col} AS STRING)), _k)")
    )
    lrep = big.withColumn("_rt", F.explode(F.expr("sequence(0, _k - 1)")))
    skew = _pairs(lrep, big, F.col("l._rt") == F.col("r._cell"))
    return normal.unionByName(skew)
