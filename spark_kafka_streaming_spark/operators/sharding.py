"""Training-shard assignment: deterministic global shuffle + token-budget
bin-packing over the corpus — the step that turns a deduped, filtered
document set into fixed-size training shards.

The core primitive is a *scale-safe global prefix sum*: Spark's naive
``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY collapses the whole
table into a single task, which is exactly the plan that dies at 100 TB.
Here the classic two-phase form is used instead:

1. range-partition by the (unique) ordering key;
2. local window cumsum inside each range partition;
3. add per-partition offsets, themselves a prefix sum over only
   ``num_parts`` rows (driver-scale metadata, like AQE statistics).

The result is bit-identical to the single-window form — integer
arithmetic over a strict total order is partitioning-independent — but
every task touches only its own range. The deterministic "shuffle"
order is an engine-portable hash of the document id, so the oracle
reproduces shard assignments exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..functions.caching import track_persist


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    cum_col: str = "cum",
    num_parts: int = 32,
) -> DataFrame:
    """Exact global running sum of ``value_col`` over ``order_cols``
    (which must form a strict total order) without a single-partition
    window. ``num_parts`` is the range-partition fan-out: on a cluster
    set it to O(cores), each task then scans ~rows/num_parts.
    """
    d = df.repartitionByRange(num_parts, *[F.col(c) for c in order_cols])
    d = d.withColumn("_pid", F.spark_partition_id())
    # PIN the partition tags: ``_pid`` is runtime-dependent, and this
    # frame feeds TWO plan legs (the offsets aggregate and the main
    # window). Un-persisted, Spark evaluates the range shuffle twice
    # and AQE may coalesce the two evaluations to different partition
    # counts — the legs then disagree on ``_pid`` and the inner join
    # below silently DROPS every row whose pid exists on one side only
    # (observed with a dedup-join upstream: 350 rows in, ~10 out, all
    # in shard 0). The persist materializes one partitioning that both
    # legs read; release via ``release_operator_caches``.
    d = track_persist(d)
    # Per-partition totals → exclusive running offsets. num_parts rows
    # total: the single-partition window here is over metadata, not data.
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        d.groupBy("_pid")
        .agg(F.sum(value_col).alias("_psum"))
        .withColumn("_off", F.coalesce(F.sum("_psum").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offs), "_pid")
        .withColumn(cum_col, F.sum(value_col).over(w_loc) + F.col("_off"))
        .drop("_pid", "_off")
    )


def exact_median_int(df: DataFrame, col: str) -> DataFrame:
    """Exact median of a bounded-integer column as a 1-row DataFrame
    (``med``), computed scale-safely via the value histogram.

    The classic order-statistic trap at 100 TB is collecting n/2 rows
    (TakeOrdered) or a global sort; instead ``groupBy(col)`` reduces the
    corpus to one row per *distinct value* — for token counts that is
    bounded by the max document length, metadata-scale — and the
    cumulative walk over that histogram runs in one tiny task.
    """
    hist = df.groupBy(col).agg(F.count("*").alias("_c"))
    w_cum = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        hist.withColumn("_cum", F.sum("_c").over(w_cum))
        .withColumn("_total", F.sum("_c").over(w_all))
        .where(F.expr("_cum >= (_total + 1) DIV 2"))
        .agg(F.min(col).alias("med"))
    )


def write_training_shards(
    sharded: DataFrame, out_dir: str, shard_col: str = "shard_id"
) -> None:
    """Materialize shard assignments as one parquet file per shard
    (``out_dir/shard_id=N/``): repartition by the shard key first so
    each Hive partition is written by exactly one task — without it,
    every task writes a sliver of every shard and a 100 TB write
    produces tasks × shards small files."""
    (
        sharded.repartition(F.col(shard_col))
        .write.partitionBy(shard_col)
        .mode("overwrite")
        .parquet(out_dir)
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 32,
) -> DataFrame:
    """Context-window packing plan: map each document onto the fixed
    ``seq_len``-token training sequences it occupies.

    Documents are laid head-to-tail in deterministic hash order (same
    global-shuffle convention as :func:`shard_by_token_budget`); a doc
    starting at token offset ``cum - n_tok`` occupies sequences
    ``first_seq = start div seq_len`` .. ``last_seq = (cum-1) div
    seq_len``. ``n_seqs > 1`` marks documents split across a sequence
    boundary — the quantity a packing-efficiency audit tracks (boundary
    crossings are where attention masks fragment).

    Zero-token documents are dropped (they occupy no sequence).
    Returns ``id_col, n_tok, first_seq, last_seq, n_seqs``.
    """
    d = df.withColumn(
        "n_tok", F.expr(f"CAST(size({TH.spark_tokens(text_col)}) AS BIGINT)")
    ).filter(F.col("n_tok") > 0)
    d = d.withColumn(
        "ord", F.expr(TH.spark_str_hash(f"CAST({id_col} AS STRING)"))
    )
    d = global_running_sum(
        d.select(id_col, "n_tok", "ord"), "n_tok", ["ord", id_col],
        num_parts=num_parts,
    )
    return (
        d.withColumn("first_seq", F.expr(f"(cum - n_tok) DIV {seq_len}"))
        .withColumn("last_seq", F.expr(f"(cum - 1) DIV {seq_len}"))
        .withColumn("n_seqs", F.col("last_seq") - F.col("first_seq") + 1)
        .select(id_col, "n_tok", "first_seq", "last_seq", "n_seqs")
    )


def shard_by_token_budget(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 32,
    n_tok_col: str | None = None,
) -> DataFrame:
    """Assign each document to a training shard of ~``budget`` tokens.

    Documents are ordered by a deterministic portable hash of their id
    (a seeded global shuffle — dedup/quality pipelines upstream leave
    source-ordered data, which trains badly), then packed greedily in
    that order: shard = starting-token-offset div budget.

    ``n_tok_col``: pre-computed token-count column to use instead of
    re-tokenizing ``text_col`` — pipelines whose upstream quality gate
    already tokenized every document pass it through rather than paying
    the split() pass twice.

    Returns ``id_col, n_tok, cum (inclusive), shard_id``.
    """
    n_tok = (
        F.col(n_tok_col).cast("bigint")
        if n_tok_col
        else F.expr(f"CAST(size({TH.spark_tokens(text_col)}) AS BIGINT)")
    )
    d = df.withColumn("n_tok", n_tok).withColumn(
        "ord", F.expr(TH.spark_str_hash(f"CAST({id_col} AS STRING)"))
    )
    d = global_running_sum(
        d.select(id_col, "n_tok", "ord"),
        "n_tok",
        ["ord", id_col],
        num_parts=num_parts,
    )
    return d.withColumn(
        "shard_id", F.expr(f"(cum - n_tok) DIV {budget}")
    ).select(id_col, "n_tok", "cum", "shard_id")
