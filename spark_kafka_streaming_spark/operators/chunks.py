"""Chunk-level (sub-document) exact dedup: split each document into
fixed-width token chunks, hash each chunk, and measure how much of a
document is duplicated elsewhere in the corpus.

Document-level dedup misses boilerplate: two distinct pages sharing a
navigation header are not near-dups, but the header should still not be
trained on twice. Chunk granularity catches it (the RefinedWeb/Dolma
"exact substring" tier, at token-chunk resolution, which — unlike
suffix-array substring matching — is expressible as pure shuffle-bounded
DataFrame ops).

Plan shape: one map-only pass explodes ~n_tokens/width chunk hashes per
doc; a window count over the chunk-hash partition marks duplicated
chunks (one shuffle, uniformly keyed by hash); a per-document partial
aggregation folds back to doc granularity (second shuffle, carries one
row per chunk). No raw chunk text ever shuffles — only 8-byte hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH

CHUNK_W = 16  # tokens per chunk


def chunk_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = CHUNK_W,
) -> DataFrame:
    """Explode each document into (id, chunk hash) rows over full
    ``width``-token chunks (a trailing partial chunk is dropped — it
    cannot match a full chunk elsewhere)."""
    toks = TH.spark_tokens(text_col)
    chunk = f"concat_ws(' ', slice(t, i * {width} + 1, {width}))"
    hashes = (
        f"transform(sequence(0, size(t) DIV {width} - 1), "
        f"i -> {TH.spark_str_hash(chunk)})"
    )
    return (
        df.withColumn("t", F.expr(toks))
        .where(F.expr(f"size(t) >= {width}"))
        .select(id_col, F.explode(F.expr(hashes)).alias("h"))
    )


def chunk_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = CHUNK_W,
) -> DataFrame:
    """Per-document duplicated-chunk statistics:
    ``id_col, n_chunks, n_dup_chunks, dup_frac`` where a chunk is
    duplicated iff its hash occurs under more than one (doc, position).
    """
    ch = chunk_hashes(df, id_col, text_col, width)
    occ = Window.partitionBy("h")
    return (
        ch.withColumn("occ", F.count("*").over(occ))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).alias(
                "n_dup_chunks"
            ),
        )
        .withColumn(
            "dup_frac",
            F.expr("CAST(n_dup_chunks AS DOUBLE) / n_chunks"),
        )
    )


def sliding_chunks(
    df: DataFrame,
    width: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style sliding-window chunking: overlapping ``width``-token
    windows every ``stride`` tokens (overlap = width − stride keeps
    passage boundaries from splitting answers).

    Emits (id, chunk_idx, chunk_text, n_tok, chunk_hash) — the
    retrieval-corpus prep step.  The final short window is KEPT here
    (unlike :func:`chunk_hashes`, whose fixed-width chunks exist only
    to be compared): a tail passage still embeds and retrieves.  A doc
    with ≤ width tokens yields exactly one chunk.

    Map-only: one row per window, no shuffle; chunk count per doc is
    ⌈max(n_tok − width, 0) / stride⌉ + 1.  At 100 TB the chunk table
    is written partitioned by a hash bucket of ``chunk_hash`` so the
    downstream chunk-dedup equi-join is co-located.
    """
    toks = TH.spark_tokens(text_col)
    n_win = f"(CAST(greatest(size(t) - {width}, 0) + {stride} - 1 AS INT) DIV {stride} + 1)"
    chunk = f"concat_ws(' ', slice(t, i * {stride} + 1, {width}))"
    return (
        df.withColumn("t", F.expr(toks))
        .where(F.expr("size(t) > 0"))
        .select(
            id_col,
            F.posexplode(
                F.expr(f"transform(sequence(0, {n_win} - 1), i -> {chunk})")
            ).alias("chunk_idx", "chunk_text"),
        )
        .withColumn(
            "n_tok", F.expr("size(filter(split(chunk_text, ' '), x -> x <> ''))")
        )
        .withColumn("chunk_hash", F.expr(TH.spark_str_hash("chunk_text")))
    )
