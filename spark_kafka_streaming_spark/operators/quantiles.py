"""Mergeable bottom-k quantile sketch — rank queries at 100 TB
without a global sort.

Exact quantiles need a total order (a full-shuffle sort, the single
most expensive plan shape at scale); engine-native approximations
(``percentile_approx`` — Greenwald-Khanna with engine-internal state)
are not replayable by an external oracle.  This module's sketch is the
classical *hash-priority bottom-k sample* (the KMV construction of
Bar-Yossef et al. 2002 read as a uniform sample, priority-sampling à la
Duffield/Lund/Thorup): every row gets a deterministic 60-bit priority
``h = md5(key)`` (the portable hash family of
:mod:`..functions.texthash`), and the sketch is the k rows with the
smallest ``(h, key)``.

Why this is the right 100 TB shape:

* **mergeable** — bottom-k of a union is the bottom-k of the union of
  any per-partition bottom-k supersets, so partials combine
  associatively across partitions, micro-batches
  (:mod:`..streaming.incremental_quantiles`), and corpora;
* **no full shuffle** — the global form compiles to
  ``TakeOrderedAndProject`` (each task emits at most k rows); the
  grouped form reduces each task to ≤ k rows *per group seen* in a
  bounded-memory ``mapInPandas`` pass (the
  :func:`..operators.sketches.misra_gries_candidates` shape), so the
  shuffle is O(tasks · groups · k), never O(rows);
* **deterministic and engine-portable** — the md5 priority makes the
  sample (hence every estimate) a pure function of the data, replayed
  bit-for-bit by the generated DuckDB oracles — unlike a seeded RNG
  sample, the same rows are chosen on any engine, any partitioning,
  any execution order;
* **self-auditing** — rank error of a k-uniform sample concentrates at
  O(1/√k) (Hoeffding), and the estimate leg is joined with an exact
  rank-audit leg (one conditional-aggregation scan, no sort) emitting
  ``rank_err`` and ``ok = rank_err ≤ 5/√m`` *in-band*, so the driver's
  value-hash pins the quality claim, not just determinism.

Reference provenance: the reference repo (wgnet/spark-kafka-streaming)
has no quantile surface (its only aggregate is the windowed word
count, ``KafkaWordCount.scala:70-73``); this extends the §2c sketch
family per SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH

#: sketch size: rank error concentrates at ~1/√k (k=1024 → ~3% worst
#: quantile error at 5σ); production bumps k, the plans are unchanged.
K_GLOBAL = 1024
K_GROUP = 256

#: probed quantiles (estimate = sample value at rank ⌈q·m⌉)
QS = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)

#: audit acceptance: |rank(est)/n − q| ≤ 5/√m (5σ of the Hoeffding
#: bound √(q(1−q)/m) ≤ 1/(2√m), doubled for rounding slack)
ERR_BOUND_SQL = "5.0 / sqrt(CAST(m AS DOUBLE))"


def _prioritized(df: DataFrame, value_col: str, key_sql: str) -> DataFrame:
    """(v, ky, h): value, unique tie-break key, md5 priority."""
    return df.select(
        F.col(value_col).cast("double").alias("v"),
        F.expr(key_sql).cast("long").alias("ky"),
        F.expr(TH.spark_str_hash_raw(f"CAST({key_sql} AS STRING)")).alias("h"),
    )


def bottomk_sample(df: DataFrame, value_col: str, key_sql: str, k: int = K_GLOBAL) -> DataFrame:
    """The k rows with the smallest (h, ky) — a deterministic uniform
    sample.  ``orderBy().limit()`` compiles to TakeOrderedAndProject:
    every task emits ≤ k rows, no full shuffle, no sort of the data."""
    return _prioritized(df, value_col, key_sql).orderBy("h", "ky").limit(k)


def bottomk_sample_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_sql: str,
    k: int = K_GROUP,
) -> DataFrame:
    """Per-group bottom-k: a bounded-memory per-task reduction (each
    task keeps at most k rows per group it sees — any row in the global
    per-group bottom-k survives its own task's cut, so the union of
    task outputs is a guaranteed superset), then one window pass over
    the O(tasks·groups·k) survivors.  The full stream never shuffles.
    Deterministic: the final cut depends only on (h, ky)."""
    base = df.select(
        # cast: the mapInPandas schema declares g string, so a
        # non-string group column must be cast on the way in (Arrow
        # rejects a type mismatch) — same convention as
        # sketches.misra_gries_candidates_grouped.
        F.col(group_col).cast("string").alias("g"),
        F.col(value_col).cast("double").alias("v"),
        F.expr(key_sql).cast("long").alias("ky"),
        F.expr(TH.spark_str_hash_raw(f"CAST({key_sql} AS STRING)")).alias("h"),
    )

    def run(batches):
        import pandas as pd

        # Vectorized per-task cut: fold each Arrow batch into the
        # accumulated survivors with ONE sort + ONE groupby.head(k)
        # over (acc + batch) — semantically the per-group k smallest
        # by (h, ky), exactly what a per-group nsmallest loop computes
        # ((h, ky) is unique per row, so the selected SET is
        # identical), but without O(groups) pandas calls per batch —
        # the measured hot spot at thousands of window-groups (a
        # 100k-row/3.4k-group task spent ~5 s in ~34k nsmallest/concat
        # calls; the vectorized fold is ~100 ms).  dropna=False: a
        # NULL group key is a group like any other (SQL GROUP BY /
        # PARTITION BY semantics — the oracles keep it).  Memory stays
        # bounded at O(groups·k + batch) rows.
        acc = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat((acc, pdf))
            both = both.sort_values(["h", "ky"], kind="stable")
            acc = both.groupby("g", sort=False, dropna=False).head(k)
        if acc is not None and len(acc):
            yield acc

    survivors = base.mapInPandas(run, schema="g string, v double, ky bigint, h bigint")
    w = Window.partitionBy("g").orderBy("h", "ky")
    return (
        survivors.withColumn("prk", F.row_number().over(w))
        .filter(F.col("prk") <= k)
        .drop("prk")
    )


def _quantile_rows(spark) -> DataFrame:
    return spark.createDataFrame([(q,) for q in QS], "q double")


def quantile_estimates(sample: DataFrame, grouped: bool = False) -> DataFrame:
    """(g?, q, est, m): sample value at rank ⌈q·m⌉ per probed quantile,
    m = sample size (may be < k when the population is).  The sample is
    tiny (≤ k·groups rows), so the windows and the quantile cross join
    are driver-scale work distributed for free."""
    gcols = ["g"] if grouped else []
    w_rank = Window.partitionBy(*gcols).orderBy("v", "ky")
    w_all = Window.partitionBy(*gcols)
    ranked = sample.select(
        *gcols,
        "v",
        F.row_number().over(w_rank).alias("rk"),
        F.count("*").over(w_all).alias("m"),
    )
    qdf = _quantile_rows(sample.sparkSession)
    return (
        ranked.crossJoin(F.broadcast(qdf))
        .filter(F.col("rk") == F.ceil(F.col("q") * F.col("m")).cast("long"))
        .select(*gcols, "q", F.col("v").alias("est"), "m")
    )


def quantiles_with_audit(
    df: DataFrame,
    value_col: str,
    key_sql: str,
    k: int = K_GLOBAL,
    group_col: str | None = None,
) -> DataFrame:
    """Estimates + in-band exact rank audit.

    The audit is one conditional-aggregation scan (broadcast the ≤
    |QS|·groups estimates, count rows strictly below / at-or-below each
    — never a sort): ``rank_err`` is the distance from q to the
    estimate's true rank interval [frac_lt, frac_le], 0 when q lands
    inside it (ties make the interval wide), and ``ok`` asserts the
    O(1/√m) concentration bound.  Every output cell is a pure function
    of the data, so the DuckDB twin reproduces est AND rank_err AND ok
    bit-for-bit."""
    grouped = group_col is not None
    if grouped:
        sample = bottomk_sample_grouped(df, group_col, value_col, key_sql, k)
        base = df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("double").alias("v"),
        )
        join_keys = ["g"]
    else:
        sample = bottomk_sample(df, value_col, key_sql, k)
        base = df.select(F.col(value_col).cast("double").alias("v"))
        join_keys = []
    est = quantile_estimates(sample, grouped=grouped)
    gcols = ["g"] if grouped else []
    joined = (
        base.join(F.broadcast(est), on=join_keys)
        if grouped
        else base.crossJoin(F.broadcast(est))
    )
    aud = joined.groupBy(*gcols, "q", "est", "m").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("v") < F.col("est"), 1).otherwise(0)).alias("lt"),
        F.sum(F.when(F.col("v") <= F.col("est"), 1).otherwise(0)).alias("le"),
    )
    frac_lt = "CAST(lt AS DOUBLE) / CAST(n AS DOUBLE)"
    frac_le = "CAST(le AS DOUBLE) / CAST(n AS DOUBLE)"
    err = (
        f"CASE WHEN q < {frac_lt} THEN {frac_lt} - q "
        f"WHEN q > {frac_le} THEN q - {frac_le} ELSE 0.0 END"
    )
    return aud.select(
        *gcols,
        "q",
        "est",
        "m",
        F.expr(err).alias("rank_err"),
        F.expr(f"({err}) <= {ERR_BOUND_SQL}").alias("ok"),
    ).orderBy(*gcols, "q")


# ------------------------------------------------------ DuckDB twins


def _duck_values_qs() -> str:
    return ", ".join(f"(CAST({q} AS DOUBLE))" for q in QS)


def duck_quantiles_sql(
    table: str,
    value_col: str,
    key_sql: str,
    k: int = K_GLOBAL,
    group_col: str | None = None,
) -> str:
    """Generated-CTE replay of :func:`quantiles_with_audit`: same
    priorities, same bottom-k cut, same rank/ceil arithmetic, same
    audit CASE — grouped when ``group_col`` is given."""
    h = TH.duck_str_hash_raw(f"CAST({key_sql} AS VARCHAR)")
    frac_lt = "CAST(lt AS DOUBLE) / CAST(n AS DOUBLE)"
    frac_le = "CAST(le AS DOUBLE) / CAST(n AS DOUBLE)"
    err = (
        f"CASE WHEN q < {frac_lt} THEN {frac_lt} - q "
        f"WHEN q > {frac_le} THEN q - {frac_le} ELSE 0.0 END"
    )
    if group_col is None:
        return f"""
        WITH base AS (
          SELECT CAST({value_col} AS DOUBLE) AS v,
                 CAST({key_sql} AS BIGINT) AS ky, {h} AS h
          FROM {table}
        ),
        samp AS (SELECT v, ky FROM base ORDER BY h, ky LIMIT {k}),
        ranked AS (
          SELECT v, row_number() OVER (ORDER BY v, ky) AS rk,
                 COUNT(*) OVER () AS m
          FROM samp
        ),
        qs(q) AS (VALUES {_duck_values_qs()}),
        est AS (
          SELECT q, v AS est, m FROM qs JOIN ranked
          ON ranked.rk = CAST(ceil(q * m) AS BIGINT)
        ),
        aud AS (
          SELECT q, est, m, COUNT(*) AS n,
                 SUM(CASE WHEN b.v < est THEN 1 ELSE 0 END) AS lt,
                 SUM(CASE WHEN b.v <= est THEN 1 ELSE 0 END) AS le
          FROM est CROSS JOIN base b GROUP BY q, est, m
        )
        SELECT q, est, m, {err} AS rank_err,
               ({err}) <= {ERR_BOUND_SQL} AS ok
        FROM aud ORDER BY q
        """
    return f"""
    WITH base AS (
      SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS v,
             CAST({key_sql} AS BIGINT) AS ky, {h} AS h
      FROM {table}
    ),
    samp AS (
      SELECT g, v, ky FROM base
      QUALIFY row_number() OVER (PARTITION BY g ORDER BY h, ky) <= {k}
    ),
    ranked AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v, ky) AS rk,
             COUNT(*) OVER (PARTITION BY g) AS m
      FROM samp
    ),
    qs(q) AS (VALUES {_duck_values_qs()}),
    est AS (
      SELECT g, q, v AS est, m FROM qs JOIN ranked
      ON ranked.rk = CAST(ceil(q * m) AS BIGINT)
    ),
    aud AS (
      SELECT g, q, est, m, COUNT(*) AS n,
             SUM(CASE WHEN b.v < est THEN 1 ELSE 0 END) AS lt,
             SUM(CASE WHEN b.v <= est THEN 1 ELSE 0 END) AS le
      FROM est JOIN base b USING (g) GROUP BY g, q, est, m
    )
    SELECT g, q, est, m, {err} AS rank_err,
           ({err}) <= {ERR_BOUND_SQL} AS ok
    FROM aud ORDER BY g, q
    """
