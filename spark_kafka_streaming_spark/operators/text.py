"""Text analysis operators (SURVEY.md §2c): token statistics, quality
scoring, language ID, document fingerprinting.

All pure column expressions (codegen, no UDFs); ratios are computed as
single int/int double divisions so the DuckDB oracle reproduces them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH

#: tiny English stopword list for the language-ID / quality heuristics
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _sw_list() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    toks = TH.spark_tokens(text_col)
    return (
        df.withColumn("n_tokens", F.expr(f"size({toks})"))
        .withColumn("n_distinct_tokens", F.expr(f"size(array_distinct({toks}))"))
        .withColumn(
            "n_stopwords",
            F.expr(f"size(filter({toks}, t -> t IN ({_sw_list()})))"),
        )
        .withColumn("text_len", F.length(text_col))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]:
    0.4·min(1, tokens/50) + 0.3·distinct-ratio + 0.3·(1−stopword-ratio).

    The components are the classic cheap quality signals (length,
    lexical diversity, function-word balance); identical arithmetic in
    the oracle.
    """
    d = with_token_stats(df, text_col)
    return d.withColumn(
        "quality",
        # nullif guards zero-token documents (ANSI mode raises on /0);
        # their quality is null — callers filter or coalesce explicitly.
        F.expr(
            "0.4 * least(1.0D, CAST(n_tokens AS DOUBLE) / 50) "
            "+ 0.3 * (CAST(n_distinct_tokens AS DOUBLE) / nullif(n_tokens, 0)) "
            "+ 0.3 * (1.0D - CAST(n_stopwords AS DOUBLE) / nullif(n_tokens, 0))"
        ),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit-ratio language heuristic: ≥ 4% English function
    words → 'en', else 'unknown'. (An n-gram model plugs into the same
    shape; the signal column is what matters for the pipeline.)"""
    d = with_token_stats(df, text_col)
    return d.withColumn(
        "lang_pred",
        F.expr(
            "CASE WHEN CAST(n_stopwords AS DOUBLE) / nullif(n_tokens, 0) >= 0.04 "
            "THEN 'en' ELSE 'unknown' END"
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling polynomial content fingerprint (engine-portable analog of
    a 64-bit rolling hash): char-fold over the whole document plus the
    shingle-set MinHash first component as a fuzzy fingerprint."""
    return df.withColumn(
        "fp_exact", F.expr(TH.spark_char_hash(text_col))
    ).withColumn(
        "fp_fuzzy",
        F.expr(
            f"array_min(transform({TH.spark_shingle_hashes(text_col)}, "
            f"h -> ({TH.A[0]}L * h + {TH.B[0]}L) % {TH.P}))"
        ),
    )


def token_count_bpe_ish(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token counting: whitespace tokens plus a regex split
    on non-alphanumerics (the cheap proxy for BPE token budgeting)."""
    return df.withColumn(
        "n_ws_tokens", F.expr(f"size({TH.spark_tokens(text_col)})")
    ).withColumn(
        "n_re_tokens",
        F.expr(f"size(filter(split({text_col}, '[^a-z0-9]+'), t -> t <> ''))"),
    )
