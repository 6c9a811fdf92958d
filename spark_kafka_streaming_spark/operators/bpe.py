"""Byte-pair-encoding merge TRAINING (Sennrich et al. 2016) — the
tokenizer-learning pass of a training-data pipeline, distinct from the
pair-RANKING table of ``q_text_collocations_lift`` (one-shot counts)
and the BPE-ish token COUNTING of ``operators/text.py``: this learns
the ordered merge list itself.

Spark-first shape: BPE trains on the word-frequency table, not the
corpus — the corpus collapses to (word, freq) in ONE shuffle, and all
n_merges iterations run over that vocab-sized table (30k rows on the
zipf corpus, ~10M on a web crawl — both trivially partitionable),
so training cost is independent of corpus size beyond the first
aggregation.  Per merge step:

1. pair counts: explode adjacent symbol pairs per word, weighted by
   word freq — one vocab-sized shuffle, map-side combinable;
2. best pair: top-1 by (count desc, left, right) — a bounded 1-row
   driver pull per step (the k×d-centroid / Bloom-words posture);
3. apply: every word's symbol string gets one leftmost-to-right
   non-overlapping pass of ``' L R ' → ' LR '`` over its
   space-joined, space-wrapped symbol string.

The merge application is DEFINED as that single replace-all pass:
Spark's ``replace`` and DuckDB's ``replace`` share the leftmost
non-overlapping scan, so engine and oracle agree bit-for-bit.  (For
odd same-symbol runs this differs from textbook leftmost-greedy
GROUPING — ``a a a a a`` under merge (a,a) becomes ``aa a aa`` rather
than ``aa aa a`` — but the multiset of merged symbols, hence every
count this operator reports, is identical; the deviation is
documented rather than papered over with a per-word fold neither
engine can express in built-ins.)

Returns the ordered merge table (rank, left_sym, right_sym, merged,
cnt) — the artifact a tokenizer ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH

#: default number of merge steps for the catalog query
N_MERGES = 12

_CHARS_SPARK = (
    "array_join(transform(sequence(1, length(word)), "
    "i -> substring(word, i, 1)), ' ')"
)


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the one corpus-sized aggregation of BPE training."""
    return (
        docs.select(F.explode(F.expr(TH.spark_tokens(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int = N_MERGES, text_col: str = "text"
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus (see module doc).

    The per-step best pair is collected to the driver (1 row/step,
    bounded by n_merges) so each iteration's plan stays flat; symbol
    tables are re-persisted per step and released with the session's
    operator caches.
    """
    from ..functions.caching import track_persist

    spark = docs.sparkSession
    syms = track_persist(
        word_freq(docs, text_col).select(
            "freq", F.expr(_CHARS_SPARK).alias("s")
        )
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        # size >= 2 guard: Spark's sequence(1, 0) counts BACKWARDS
        # (unlike DuckDB's empty list), so single-symbol words must
        # never reach the pair transform.
        pairs = (
            syms.filter(F.expr("size(split(s, ' ')) >= 2")).select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(s, ' ')) - 1), "
                        "j -> struct(element_at(split(s, ' '), j) AS a, "
                        "element_at(split(s, ' '), j + 1) AS b))"
                    )
                ).alias("p"),
            )
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, a + b, cnt))
        syms = track_persist(
            syms.select(
                "freq",
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                        F.lit(f" {a} {b} "),
                        F.lit(f" {a}{b} "),
                    )
                ).alias("s"),
            )
        )
    return spark.createDataFrame(
        merges,
        "rank INT, left_sym STRING, right_sym STRING, merged STRING, cnt BIGINT",
    )


def _duck_merge_chain(n_merges: int) -> list[str]:
    """Shared CTE chain replaying the training schedule (used by both
    the train and encode oracles; carries ``word`` through every step
    so the encode oracle can join the final symbol table back to the
    corpus).

    Every chain CTE is ``AS MATERIALIZED``: each ``s{i}`` is
    referenced twice (pair counts + next step), so DuckDB's default
    inlining would re-evaluate the prefix chain 2^n_merges times —
    materialization makes the oracle linear in n_merges like the
    engine loop."""
    chars = (
        "array_to_string(list_transform(generate_series(1, length(word)), "
        "i -> substr(word, i, 1)), ' ')"
    )
    parts = [
        f"""wf AS MATERIALIZED (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest({TH.duck_tokens('text')}) AS word FROM documents
      ) GROUP BY word
    )""",
        f"s0 AS MATERIALIZED (SELECT word, freq, {chars} AS s FROM wf)",
    ]
    for i in range(n_merges):
        parts.append(
            f"""p{i} AS MATERIALIZED (
      SELECT arr[j] AS a, arr[j + 1] AS b, SUM(freq) AS cnt FROM (
        SELECT freq, string_split(s, ' ') AS arr,
               unnest(generate_series(1, len(string_split(s, ' ')) - 1)) AS j
        FROM s{i}
      ) GROUP BY 1, 2
    )""",
        )
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        parts.append(
            f"""s{i + 1} AS MATERIALIZED (
      SELECT word, freq,
             trim(replace(' ' || s || ' ',
                          ' ' || b{i}.a || ' ' || b{i}.b || ' ',
                          ' ' || b{i}.a || b{i}.b || ' ')) AS s
      FROM s{i} CROSS JOIN b{i}
    )""",
        )
    return parts


def duck_bpe_train_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB oracle twin of :func:`bpe_train`: the same word-freq
    base, the same per-step (pair-count → top-1 → single replace-all
    pass) schedule replayed in generated CTEs (:func:`_duck_merge_chain`)."""
    parts = _duck_merge_chain(n_merges)
    union = "\n      UNION ALL ".join(
        f"SELECT {i} AS rank, a AS left_sym, b AS right_sym, a || b AS merged, "
        f"CAST(cnt AS BIGINT) AS cnt FROM b{i}"
        for i in range(n_merges)
    )
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT rank, left_sym, right_sym, merged, cnt
    FROM ({union}) ORDER BY rank
    """


def bpe_encode(
    docs: DataFrame,
    n_merges: int = N_MERGES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the learned merges to the corpus — the tokenizer
    APPLICATION pass that pairs with :func:`bpe_train`.

    Spark-first shape: merges are trained (bounded ``n_merges``-row
    driver pull), then the VOCAB is encoded — each distinct word's
    char string gets the same per-step wrap → replace-all → trim pass
    the trainer used, chained into one map-only expression — and the
    encoded vocab (word → symbol count) broadcast-joins back to the
    exploded corpus tokens.  Encoding cost is vocab-sized + one
    corpus-sized hash join; no per-document Python, no UDFs.  At
    crawl scale a 10M-word vocab is ~100 MB — still broadcastable;
    beyond that the join falls back to shuffle-on-word, which AQE
    picks automatically.

    Returns per-document: ``n_words`` (token occurrences), ``n_chars``
    (total token characters), ``n_bpe_tokens`` (symbols after merges),
    and ``compression`` = round(n_chars / n_bpe_tokens, 6) — the
    fertility metric tokenizer teams track.  Documents with no tokens
    report zeros.
    """
    merges = bpe_train(docs, n_merges, text_col).orderBy("rank").collect()
    expr = F.expr(_CHARS_SPARK)
    for m in merges:
        a, b, ab = m["left_sym"], m["right_sym"], m["merged"]
        expr = F.trim(
            F.replace(
                F.concat(F.lit(" "), expr, F.lit(" ")),
                F.lit(f" {a} {b} "),
                F.lit(f" {ab} "),
            )
        )
    vocab = (
        word_freq(docs, text_col)
        .select("word", expr.alias("s"))
        .select("word", F.size(F.split("s", " ")).alias("n_sym"))
    )
    toks = docs.select(
        F.col(id_col),
        F.explode(F.expr(TH.spark_tokens(text_col))).alias("word"),
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_sym").alias("n_bpe"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", F.lit(0)).cast("int").alias("n_words"),
            F.coalesce("n_chars", F.lit(0)).cast("int").alias("n_chars"),
            F.coalesce("n_bpe", F.lit(0)).cast("int").alias("n_bpe_tokens"),
            F.round(
                F.when(F.coalesce("n_bpe", F.lit(0)) == 0, F.lit(0.0)).otherwise(
                    F.coalesce("n_chars", F.lit(0)).cast("double")
                    / F.coalesce("n_bpe", F.lit(1))
                ),
                6,
            ).alias("compression"),
        )
    )


def duck_bpe_encode_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB oracle twin of :func:`bpe_encode`: the shared merge
    chain (:func:`_duck_merge_chain`), the final symbol table joined
    back to the exploded corpus tokens."""
    parts = _duck_merge_chain(n_merges)
    body = ",\n    ".join(parts)
    return f"""
    WITH {body},
    enc AS (
      SELECT word, len(string_split(s, ' ')) AS n_sym FROM s{n_merges}
    ),
    tok AS (
      SELECT doc_id, unnest({TH.duck_tokens('text')}) AS word FROM documents
    ),
    pd AS (
      SELECT doc_id, count(*) AS n_words,
             SUM(length(word)) AS n_chars, SUM(n_sym) AS n_bpe
      FROM tok JOIN enc USING (word) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(pd.n_words, 0) AS INT) AS n_words,
           CAST(COALESCE(pd.n_chars, 0) AS INT) AS n_chars,
           CAST(COALESCE(pd.n_bpe, 0) AS INT) AS n_bpe_tokens,
           round(CASE WHEN COALESCE(pd.n_bpe, 0) = 0 THEN 0.0
                 ELSE CAST(COALESCE(pd.n_chars, 0) AS DOUBLE)
                      / COALESCE(pd.n_bpe, 1) END, 6) AS compression
    FROM documents d LEFT JOIN pd USING (doc_id)
    ORDER BY d.doc_id
    """
