"""Mergeable distributed sketches: Count-Min, HyperLogLog registers,
and Bloom-filter membership — engine-portable and exactly replayable.

Why sketches are a first-class 100 TB surface: each one compresses an
unbounded keyed stream into a **fixed-size, mergeable** summary —
per-partition partial sketches combine by element-wise `+` / `max` /
`|`, so Spark's map-side partial aggregation reduces the shuffle to
O(sketch size) regardless of input rows, and the same merge runs
across micro-batches in a stream (see ``tests/test_llm8.py``).  The
reference has no sketch surface at all (its only aggregate is the
windowed word count, ``KafkaWordCount.scala:70-73``).

Unlike the engine-native sketches (``approx_count_distinct`` — HLL++
with engine-specific internals, catalog entry ``q_agg_approx`` is
rows-only for that reason), everything here is built on the portable
md5-based hash family of :mod:`..functions.texthash`, so every
register / counter / bit is reproduced **bit-for-bit** by the DuckDB
oracles: the sketch *content* is driver-checkable, not just its
estimate's error bound.

Geometry here is test-sized (CMS 4×64, HLL m=64, Bloom 992 bits);
production sizing scales the same plans — the shuffle stays
O(sketch), e.g. CMS 4×2^16 or a 2^30-bit Bloom are still single
broadcast-able rows-per-bucket tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH

P = TH.P

# ------------------------------------------------------------ Count-Min

CMS_D = 4  #: hash rows
CMS_W = 64  #: buckets per row (production: 2^16+; error ~ 2N/W)

#: Per-row hash family g_i(h) = ((CA[i]*h + CB[i]) mod P) mod W —
#: pairwise-independent over the portable base hash h ∈ [0, P).
CMS_A = [TH._coeff(i, 7) for i in range(CMS_D)]
CMS_B = [TH._coeff(i, 8) for i in range(CMS_D)]


def _cms_bucket_sql(i: int, h: str) -> str:
    return f"(({CMS_A[i]} * {h} + {CMS_B[i]}) % {P}) % {CMS_W}"


def cms_build(keyed: DataFrame, key_col: str) -> DataFrame:
    """Count-Min sketch of ``key_col`` occurrences: ``(r, b, cnt)``.

    One map-only pass fans each row out to ``CMS_D`` (row, bucket)
    cells; the groupBy has only ``CMS_D × CMS_W`` groups, so map-side
    partial aggregation collapses the shuffle to O(sketch) per
    partition — the fan-out never hits the wire.  Sketches merge by
    summing ``cnt`` cell-wise (used by the streaming test).  The md5
    base hash is materialized once per row; the D bucket derivations
    are cheap integer folds over it.
    """
    base = keyed.select(
        F.expr(TH.spark_str_hash(f"CAST({key_col} AS STRING)")).alias("h")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                F.expr(_cms_bucket_sql(i, "h")).cast("int").alias("b"),
            )
            for i in range(CMS_D)
        ]
    )
    return (
        base.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.b").alias("b"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(keys: DataFrame, sketch: DataFrame, key_col: str) -> DataFrame:
    """Point-query the sketch for each distinct key in ``keys``:
    ``key_col, est_cnt`` with ``est = min_i sketch[i][g_i(h)]``.

    The sketch is broadcast (fixed size by construction); the probe is
    a map-side join however large the key list is.  The join is LEFT:
    a cell absent from the sketch table is an empty (zero) counter, so
    a never-inserted key correctly estimates 0 instead of being
    dropped (inner join) or min'd over its non-empty cells only.
    """
    base = keys.select(
        key_col,
        F.expr(TH.spark_str_hash(f"CAST({key_col} AS STRING)")).alias("h"),
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                F.expr(_cms_bucket_sql(i, "h")).cast("int").alias("b"),
            )
            for i in range(CMS_D)
        ]
    )
    probes = base.select(key_col, F.explode(cells).alias("c")).select(
        key_col, F.col("c.r").alias("r"), F.col("c.b").alias("b")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt"))
    )


def duck_cms_bucket_sql(h: str) -> str:
    """DuckDB: bucket for hash-row index column ``i`` (0..D-1)."""
    arms = " ".join(
        f"WHEN {i} THEN (({CMS_A[i]} * {h} + {CMS_B[i]}) % {P}) % {CMS_W}"
        for i in range(CMS_D)
    )
    return f"(CASE i {arms} END)"


# ------------------------------------------------------- HyperLogLog

HLL_B = 6  #: bucket-index bits
HLL_M = 1 << HLL_B  #: 64 registers (production: 2^12+)
HLL_WBITS = 60 - HLL_B  #: rank bits left of the 60-bit portable hash
#: alpha_m for m=64 (Flajolet et al. 2007, Fig. 3 constants).
HLL_ALPHA = 0.709
#: Scaled-integer harmonic sum: S = Σ 2^(SHIFT - r); empty register
#: (r=0) contributes 2^SHIFT.  m·2^SHIFT = 2^61 < 2^63 stays exact.
HLL_SHIFT = HLL_WBITS + 1


def hll_rank_sql(w: str) -> str:
    """Leading-zero rank of the ``HLL_WBITS``-bit suffix ``w`` — via
    ``length(bin(w))`` (binary repr has no leading zeros in both
    engines), so the register math is exact-integer everywhere."""
    return (
        f"CASE WHEN {w} = 0 THEN {HLL_WBITS + 1} "
        f"ELSE {HLL_WBITS} - length(bin({w})) + 1 END"
    )


def hll_registers(keyed: DataFrame, key_col: str) -> DataFrame:
    """HLL register table ``(bucket, r)`` — r=0 for untouched buckets.

    Map-only hash + a ``HLL_M``-group max-aggregation (map-side
    combinable: the shuffle is O(m) per partition).  Registers merge
    across sketches by bucket-wise ``max``.
    """
    spark = keyed.sparkSession
    base = keyed.select(
        F.expr(
            TH.spark_str_hash_raw(f"CAST({key_col} AS STRING)")
        ).alias("hr")
    )
    touched = (
        base.select(
            F.expr(f"CAST(hr DIV {1 << HLL_WBITS} AS INT)").alias("bucket"),
            F.expr(
                hll_rank_sql(f"(hr % {1 << HLL_WBITS})")
            ).cast("int").alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("r"))
    )
    spine = spark.range(HLL_M).select(F.col("id").cast("int").alias("bucket"))
    return (
        spine.join(touched, "bucket", "left")
        .select("bucket", F.coalesce("r", F.lit(0)).cast("int").alias("r"))
    )


def sketch_cells(keyed: DataFrame, key_col: str) -> DataFrame:
    """CMS cells AND touched HLL registers of a batch in ONE pass:
    ``(kind, k1, k2, v)`` — kind 0 rows are Count-Min cells
    (r = k1, b = k2, cnt = v), kind 1 rows are touched HyperLogLog
    registers (bucket = k1, k2 = 0, r = v).

    The streaming absorb loop previously ran :func:`cms_build` and
    :func:`hll_registers` as two jobs per micro-batch, each re-scanning
    the batch and re-hashing every key.  Both sketches derive from the
    same 60-bit md5 prefix (``spark_str_hash`` is that prefix mod P),
    so one scan computes the base hash once per row, fans out
    ``CMS_D + 1`` cells map-side, and ONE map-side-combinable
    aggregation (sum for counters, max for registers — selected per
    kind) returns both sketches: one job, one scan, one md5 per key.
    Untouched HLL buckets are simply absent (the absorber's running
    registers start at 0, and ``max(0, ·)`` of an absent bucket is a
    no-op) — equivalence with the two-job form is pinned in
    tests/test_opt_round12.py.
    """
    base = keyed.select(
        F.expr(
            TH.spark_str_hash_raw(f"CAST({key_col} AS STRING)")
        ).alias("hr")
    ).withColumn("h", F.expr(f"hr % {P}"))
    cells = F.array(
        *[
            F.struct(
                F.lit(0).alias("kind"),
                F.lit(i).alias("k1"),
                F.expr(_cms_bucket_sql(i, "h")).cast("int").alias("k2"),
                F.lit(1).cast("int").alias("v"),
            )
            for i in range(CMS_D)
        ],
        F.struct(
            F.lit(1).alias("kind"),
            F.expr(f"CAST(hr DIV {1 << HLL_WBITS} AS INT)").alias("k1"),
            F.lit(0).cast("int").alias("k2"),
            F.expr(hll_rank_sql(f"(hr % {1 << HLL_WBITS})"))
            .cast("int")
            .alias("v"),
        ),
    )
    return (
        base.select(F.explode(cells).alias("c"))
        .groupBy(
            F.col("c.kind").alias("kind"),
            F.col("c.k1").alias("k1"),
            F.col("c.k2").alias("k2"),
        )
        .agg(F.sum("c.v").alias("sv"), F.max("c.v").alias("mv"))
        .select(
            "kind",
            "k1",
            "k2",
            F.when(F.col("kind") == 0, F.col("sv"))
            .otherwise(F.col("mv"))
            .cast("bigint")
            .alias("v"),
        )
    )


#: The rank expression is engine-portable verbatim (bin() behaves the
#: same in Spark and DuckDB), so the oracle side is the SAME function —
#: an alias, not a copy, so the two engines cannot silently diverge.
duck_hll_rank_sql = hll_rank_sql


# ---------------------------------------------------------- Bloom

BLOOM_K = 3  #: hash functions
BLOOM_WORD_BITS = 62  #: bits used per int64 word (62 avoids signed
#: shift overflow in either engine: 1::BIGINT << 62 is the max safe)
BLOOM_WORDS = 16
BLOOM_M = BLOOM_WORDS * BLOOM_WORD_BITS  #: 992 bits (production: 2^30+)

BLOOM_A = [TH._coeff(j, 13) for j in range(BLOOM_K)]
BLOOM_B = [TH._coeff(j, 14) for j in range(BLOOM_K)]


def _bloom_bit_sql(j: int, h: str) -> str:
    return f"(({BLOOM_A[j]} * {h} + {BLOOM_B[j]}) % {P}) % {BLOOM_M}"


def bloom_build(hashes: DataFrame, h_col: str = "h") -> DataFrame:
    """Bloom bitmap of a hash set: ``(word, bm)`` — ``BLOOM_WORDS``
    rows of OR-ed bit masks.  Fixed size however large the input set;
    merges with other bitmaps by word-wise ``bit_or``."""
    bits = F.array(
        *[F.expr(_bloom_bit_sql(j, h_col)).alias(f"b{j}") for j in range(BLOOM_K)]
    )
    return (
        hashes.select(F.explode(bits).alias("bit"))
        .select(
            F.expr(f"CAST(bit DIV {BLOOM_WORD_BITS} AS INT)").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(bit % {BLOOM_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bm"))
    )


def bloom_probe(hashes: DataFrame, bitmap: DataFrame, h_col: str = "h",
                keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Rows of ``hashes`` whose ``h_col`` tests positive (all
    ``BLOOM_K`` bits set).

    The bitmap (``BLOOM_WORDS`` int64s by construction) is collected
    and inlined as an array *literal*, so the probe is a pure map-side
    filter inside whole-stage codegen — no join, no fan-out, no
    shuffle, whatever the probe side's size (the same literal-small-
    side pattern as the k-means centroid assign and the PCA
    projection).  False positives are inherent; callers wanting
    exactness verify the survivors against the real set, which is now
    candidate-sized, not corpus-sized."""
    words = {r["word"]: r["bm"] for r in bitmap.collect()}
    lit = (
        "array("
        + ", ".join(f"{words.get(i, 0)}L" for i in range(BLOOM_WORDS))
        + ")"
    )
    conds = []
    for j in range(BLOOM_K):
        bit = _bloom_bit_sql(j, h_col)
        word = f"CAST({bit} DIV {BLOOM_WORD_BITS} AS INT)"
        mask = (
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST({bit} % {BLOOM_WORD_BITS} AS INT))"
        )
        conds.append(f"(element_at({lit}, {word} + 1) & {mask}) <> 0")
    cols = [*keep_cols, h_col]
    return hashes.select(*cols).where(F.expr(" AND ".join(conds)))


def duck_bloom_bit_sql(h: str) -> str:
    """DuckDB: bit index for hash-function index column ``j``."""
    arms = " ".join(
        f"WHEN {j} THEN (({BLOOM_A[j]} * {h} + {BLOOM_B[j]}) % {P}) % {BLOOM_M}"
        for j in range(BLOOM_K)
    )
    return f"(CASE j {arms} END)"


# ------------------------------------------------- log2 histogram

#: Scale factor mapping event values to integer "cents" before
#: log2-bucketing (floor(v·100 + 0.5) — an unambiguous round shared by
#: both engines; ties in binary doubles resolve identically).
HIST_SCALE = 100


def log_histogram(df: DataFrame, value_col: str) -> DataFrame:
    """Log2-bucketed histogram sketch of a positive numeric column:
    ``(bucket, cnt)`` with ``bucket = floor(log2(round(v·100)))``.

    At most 64 buckets whatever the data range — mergeable by
    bucket-wise sum, map-side combinable, and exactly replayable
    cross-engine (the log2 is ``length(bin(int))`` — pure integer
    bit-length, no libm).  The quantile estimator over it interpolates
    linearly inside the selected bucket (see ``q_sketch_quantile_hist``);
    relative value error is bounded by the bucket width (2× per
    bucket; tighter geometries subdivide the mantissa the same way).
    """
    vc = (
        f"CAST(floor({value_col} * {HIST_SCALE} + 0.5D) AS BIGINT)"
    )
    # Clamp to >= 1 scaled cent: a positive value below 0.005 rounds to
    # 0 cents, but length(bin(0))-1 = 0 puts it in bucket 0 whose range
    # is [1,2) cents — the interpolating estimator would overestimate
    # it and the documented 2×-per-bucket bound would not hold.  Values
    # below half the scale resolution are excluded from the sketch (and
    # from its exact comparator) instead.
    return (
        df.where(F.expr(f"{value_col} IS NOT NULL AND {vc} >= 1"))
        .select(F.expr(f"CAST(length(bin({vc})) - 1 AS INT)").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def hist_filter_spark(value_col: str) -> str:
    """Predicate selecting exactly the rows :func:`log_histogram` keeps."""
    vc = f"CAST(floor({value_col} * {HIST_SCALE} + 0.5D) AS BIGINT)"
    return f"({value_col} IS NOT NULL AND {vc} >= 1)"


def hist_filter_duck(value_col: str) -> str:
    """DuckDB twin of :func:`hist_filter_spark`."""
    vc = f"CAST(floor({value_col} * {HIST_SCALE} + 0.5) AS BIGINT)"
    return f"({value_col} IS NOT NULL AND {vc} >= 1)"


def duck_log_bucket_sql(value_col: str) -> str:
    vc = f"CAST(floor({value_col} * {HIST_SCALE} + 0.5) AS BIGINT)"
    return f"CAST(length(bin({vc})) - 1 AS INT)"


# --------------------------------------------- Misra-Gries heavy hitters

def misra_gries_candidates(
    items: DataFrame,
    item_col: str = "token",
    capacity: int = 1000,
    with_task_totals: bool = False,
) -> DataFrame:
    """Bounded-memory per-task frequent-item candidates (Misra-Gries).

    Each task folds its item stream into at most ``capacity`` counters
    using the weighted Misra-Gries batch merge (Berinde et al. 2010,
    "Space-optimal heavy hitters with strong error bounds"): per Arrow
    batch, vectorized value counts are added to the summary; when it
    exceeds ``capacity`` the (capacity+1)-th largest count is
    subtracted from every counter and non-positive counters dropped —
    the standard k-of-(k+1) reduction, whose undercount per item is
    bounded by N_task/(capacity+1) regardless of arrival order.

    Guarantee (what makes the 2-pass output deterministic even though
    the summary itself is order-dependent): any item with task-local
    count > N_task/(capacity+1) survives its task's summary, so any
    item with GLOBAL count > N/(capacity+1) survives in at least one
    task (pigeonhole over tasks).  The emitted candidate set is
    therefore a guaranteed superset of the phi-heavy hitters whenever
    ``capacity + 1 >= 1/phi`` — false positives are allowed (the exact
    second pass removes them), false negatives are impossible.

    Output: distinct candidate items, at most ``capacity`` per task —
    O(tasks * capacity) rows total, NO shuffle of the full item stream.
    With ``with_task_totals`` each task also emits one sentinel row
    (``item NULL, cnt = task item count``) so the caller can derive
    the exact global N from the same scan instead of paying a second
    one; the per-item ``cnt`` values are the order-dependent MG
    residuals (diagnostic lower bounds — do not compare across runs).

    NULL items are excluded throughout: they are never candidates,
    never counted into the sentinel totals (so N = count of non-null
    items), and the exact second pass's equi-join drops them too —
    one convention at every stage.
    """
    schema = f"{item_col} string" + (
        ", cnt bigint" if with_task_totals else ""
    )

    def run(batches):
        import pandas as pd

        counters: dict = {}
        n_task = 0
        for pdf in batches:
            # count only non-null items: value_counts() silently drops
            # NaN/None, so including nulls in the sentinel total would
            # inflate N and with it the ceil(phi*N) cut downstream,
            # dropping true heavy hitters among the non-null items.
            n_task += int(pdf[item_col].notna().sum())
            for item, cnt in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > capacity:
                # subtract the (capacity+1)-th largest value from all
                offset = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - offset for k, v in counters.items() if v > offset
                }
        if with_task_totals:
            yield pd.DataFrame(
                {
                    item_col: list(counters) + [None],
                    "cnt": list(counters.values()) + [n_task],
                }
            )
        else:
            yield pd.DataFrame({item_col: list(counters)})

    return items.select(item_col).mapInPandas(run, schema=schema)


def heavy_hitters_exact(
    items: DataFrame,
    item_col: str = "token",
    phi: float = 0.002,
    capacity: int | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters in two bounded passes — the 100 TB
    alternative to ``GROUP BY`` over the full distinct-item space.

    Pass 1 (:func:`misra_gries_candidates`): map-only bounded-memory
    candidate generation; the only shuffled rows are the O(tasks *
    capacity) candidates.  Pass 2: exact counts for candidate items
    only, via a broadcast semi-join that never materializes counts for
    the (possibly billions of) non-candidate items, filtered to
    ``count >= ceil(phi * N)``.

    Because the candidate set is a guaranteed superset of the true
    phi-heavy hitters (see pass-1 guarantee) and pass 2 is exact, the
    result is deterministic and identical to the full-groupBy answer —
    which is exactly what the DuckDB oracle computes.
    """
    capacity = capacity or max(16, int(2.0 / phi))
    # one scan yields BOTH the candidates (non-null rows) and the exact
    # global N (sum of per-task sentinel totals) — 2 scans total, not 3
    from ..functions.caching import track_persist

    summary = track_persist(
        misra_gries_candidates(items, item_col, capacity, with_task_totals=True)
    )
    cands = summary.filter(F.col(item_col).isNotNull()).select(item_col).distinct()
    total = (
        summary.filter(F.col(item_col).isNull())
        .groupBy()
        .agg(F.sum("cnt").alias("n_total"))
    )
    return (
        items.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(phi) * F.col("n_total")))
        .select(
            item_col,
            "cnt",
            F.round(F.col("cnt") / F.col("n_total"), 6).alias("frac"),
        )
    )


def misra_gries_candidates_grouped(
    items: DataFrame,
    group_col: str,
    item_col: str = "token",
    capacity: int = 1000,
    with_task_totals: bool = False,
) -> DataFrame:
    """Per-group bounded-memory frequent-item candidates: an
    independent Misra-Gries summary per (task, group), ``capacity``
    counters each — the grouped twin of
    :func:`misra_gries_candidates`, with the same weighted batch merge
    and the same per-group guarantee: any item with group-task count
    > N_g_task/(capacity+1) survives its task's summary, so any item
    with GLOBAL group count > N_g/(capacity+1) survives in at least
    one task.  Output is O(tasks · groups · capacity) candidate rows —
    the full (group, item) stream never shuffles.

    With ``with_task_totals`` each (task, group) also emits one
    sentinel row (item NULL, cnt = that task's non-null item count for
    the group), so the exact per-group N reduces from the same scan.
    NULL items are excluded throughout, same convention as the global
    form.
    """
    schema = f"{group_col} string, {item_col} string" + (
        ", cnt bigint" if with_task_totals else ""
    )

    def run(batches):
        import pandas as pd

        counters: dict = {}
        totals: dict = {}
        for pdf in batches:
            # dropna=False: NULL group keys form a group of their own
            # (SQL GROUP BY semantics — the oracle keeps them); the
            # pandas NaN key normalizes to None so accumulation across
            # batches hits one dict slot (NaN != NaN).
            for g, sub in pdf.groupby(group_col, sort=False, dropna=False):
                g = None if pd.isna(g) else g
                c = counters.setdefault(g, {})
                totals[g] = totals.get(g, 0) + int(sub[item_col].notna().sum())
                for item, cnt in sub[item_col].value_counts().items():
                    c[item] = c.get(item, 0) + int(cnt)
                if len(c) > capacity:
                    offset = sorted(c.values(), reverse=True)[capacity]
                    counters[g] = {
                        k: v - offset for k, v in c.items() if v > offset
                    }
        gs, its, cnts = [], [], []
        for g, c in counters.items():
            for k, v in c.items():
                gs.append(g)
                its.append(k)
                cnts.append(v)
            if with_task_totals:
                gs.append(g)
                its.append(None)
                cnts.append(totals.get(g, 0))
        if with_task_totals:
            data = {group_col: gs, item_col: its, "cnt": cnts}
        else:
            data = {group_col: gs, item_col: its}
        yield pd.DataFrame(data)

    return items.select(
        F.col(group_col).cast("string").alias(group_col), item_col
    ).mapInPandas(run, schema=schema)


def heavy_hitters_exact_grouped(
    items: DataFrame,
    group_col: str,
    item_col: str = "token",
    phi: float = 0.02,
    capacity: int | None = None,
) -> DataFrame:
    """Exact per-group phi-heavy hitters in two bounded passes — the
    grouped form of :func:`heavy_hitters_exact` (per-domain vocabulary
    drift, per-language stopword panels, per-tenant hot keys).

    Pass 1: :func:`misra_gries_candidates_grouped` (map-only, no-
    false-negative superset per group + per-group sentinel totals from
    the same scan).  Pass 2: exact counts for candidate (group, item)
    pairs only via broadcast semi-join, filtered to
    ``count >= ceil(phi * N_group)``.  Deterministic and identical to
    the full groupBy answer, which is what the DuckDB oracle computes;
    the shuffle carries O(tasks · groups · capacity) candidates plus
    counts for candidate pairs only, never the full distinct
    (group, item) space.
    """
    capacity = capacity or max(16, int(2.0 / phi))
    from ..functions.caching import track_persist

    summary = track_persist(
        misra_gries_candidates_grouped(
            items, group_col, item_col, capacity, with_task_totals=True
        )
    )
    cands = (
        summary.filter(F.col(item_col).isNotNull())
        .select(group_col, item_col)
        .distinct()
    )
    totals = (
        summary.filter(F.col(item_col).isNull())
        .groupBy(group_col)
        .agg(F.sum("cnt").alias("n_group"))
    )
    # null-safe group joins: a NULL group key is a group of its own
    # under SQL GROUP BY (what the oracle computes), so the candidate
    # semi-join and the totals join must match it with <=> — a plain
    # equi-join would silently drop the NULL group's heavy hitters.
    it = items.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(item_col).alias("_it"),
    )
    cand2 = cands.select(
        F.col(group_col).alias("_cg"), F.col(item_col).alias("_cit")
    )
    tot2 = totals.select(F.col(group_col).alias("_tg"), "n_group")
    return (
        it.join(
            F.broadcast(cand2),
            F.col("_g").eqNullSafe(F.col("_cg"))
            & (F.col("_it") == F.col("_cit")),
        )
        .groupBy("_g", "_it")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(tot2), F.col("_g").eqNullSafe(F.col("_tg")))
        .filter(F.col("cnt") >= F.ceil(F.lit(phi) * F.col("n_group")))
        .select(
            F.col("_g").alias(group_col),
            F.col("_it").alias(item_col),
            "cnt",
            F.round(F.col("cnt") / F.col("n_group"), 6).alias("frac"),
        )
    )
