"""Deduplication operators for LLM-scale corpora (SURVEY.md §2c).

Five tiers, all shuffle-bounded (no O(n²) cross join anywhere):

* exact: hash-groupBy on the dedup key (or ``dropDuplicates``);
  streaming twin is ``dropDuplicatesWithinWatermark``.
* MinHash + LSH: shingle → signature → band → bucket equi-join.
  The only shuffle is by band key; candidate verification touches
  candidate pairs only. At 100 TB this is the canonical near-dup path
  (the band join keys are uniformly distributed by construction, so no
  skew; K/B/R tune recall vs. cost).
* SimHash: 32-bit signature, banded by 8-bit chunks, exact hamming
  check on candidates via xor+bit_count.
* n-gram Jaccard: exact inverted-index join on shingles (shuffle by
  shingle) — the verification oracle for the approximate tiers.
* embedding cosine: exact threshold pairs on integer-scaled dot
  products (see :mod:`..functions.vectors`); LSH-bucketed variant in
  :mod:`.similarity`.

All signatures are computed with the engine-portable hash family in
:mod:`..functions.texthash`, entirely in built-in higher-order
functions — zero Python in the hot path, and the DuckDB oracle can
reproduce every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per duplicate group (deterministic,
    unlike ``dropDuplicates``) and report the group size."""
    return (
        df.groupBy(*key_cols)
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dupes"))
    )


def with_shingle_hashes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add distinct word-``SHINGLE_W``-gram polynomial hashes."""
    return df.withColumn("hs", F.expr(TH.spark_shingle_hashes(text_col)))


def with_minhash_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the K-element MinHash signature column ``sig``."""
    return with_shingle_hashes(df, text_col).withColumn(
        "sig", F.expr(TH.spark_minhash_sig("hs"))
    ).filter(F.size("hs") > 0)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact verify.

    Returns (id1, id2, jaccard) with id1 < id2, jaccard ≥ threshold.
    """
    sigs = with_minhash_signature(df, text_col).select(
        F.col(id_col), "sig", F.expr(TH.spark_shingles(text_col)).alias("sh")
    )
    bands = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(TH.spark_band_key("sig", b)).alias("key"),
                    )
                    for b in range(TH.BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id1"), F.col(f"r.{id_col}").alias("id2")
        )
        .distinct()
    )
    s1 = sigs.select(F.col(id_col).alias("id1"), F.col("sh").alias("sh1"))
    s2 = sigs.select(F.col(id_col).alias("id2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id1", "id2", "jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via banded 32-bit SimHash.

    4 bands of 8 bits guarantee recall for hamming ≤ 3; exact distance
    via xor+bit_count on candidates. Returns (id1, id2, hamming, sim1,
    sim2).
    """
    sigs = (
        df.withColumn("sim", F.expr(TH.spark_simhash(text_col)))
        .select(id_col, "sim")
    )
    nbands = TH.SIMHASH_BITS // TH.SIMHASH_BAND_BITS
    bands = sigs.select(
        id_col,
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(shiftright(sim, {b * TH.SIMHASH_BAND_BITS}) & "
                            f"{(1 << TH.SIMHASH_BAND_BITS) - 1})"
                        ).alias("key"),
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "sim", "bk.band", "bk.key")
    left, right = bands.alias("l"), bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
            F.col("l.sim").alias("sim1"),
            F.col("r.sim").alias("sim2"),
        )
        .distinct()
        .withColumn(
            "hamming", F.expr("bit_count(sim1 ^ sim2)")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming", "sim1", "sim2")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
) -> DataFrame:
    """Exact Jaccard pairs via the shingle inverted index.

    Shuffles by shingle (explode → equi-join → per-pair count), so
    cost is Σ bucket² over shingles, not n² — hot shingles are the
    skew risk at scale; drop stop-shingles above a document-frequency
    cap before joining if needed.
    """
    sh = df.select(
        F.col(id_col), F.expr(TH.spark_shingles(text_col)).alias("sh")
    ).filter(F.size("sh") > 0)
    ex = sh.select(id_col, F.explode("sh").alias("s"))
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.s") == F.col("b.s"))
              & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.select(F.col(id_col), F.size("sh").alias("n"))
    return (
        pairs.join(sizes.withColumnsRenamed({id_col: "id1", "n": "n1"}), "id1")
        .join(sizes.withColumnsRenamed({id_col: "id2", "n": "n2"}), "id2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
