"""Shared per-corpus signature table for the text-dedup tier.

Every text-dedup operator (MinHash-LSH, SimHash, exact n-gram Jaccard)
starts from the same per-document derivation: tokenize → shingle →
hash → signature.  Computing it per operator triples the dominant cost
of the tier; at cluster scale you compute it **once per corpus
snapshot**, write it next to the corpus, and every dedup/similarity job
reads the materialized table (this is the standard shape for
web-corpus dedup — the signature table is the index, the jobs are
lookups/joins over it).

:func:`signature_table` is the read-through cache form of that: keyed
by the corpus file identity (path + mtime + size) and the hash-family
parameters, it computes and writes the parquet table on first use and
serves plain ``spark.read.parquet`` afterwards.  Values are produced by
the engine-portable hash family (:mod:`..functions.texthash`), so a
DuckDB oracle recomputing from raw text still hash-matches results
derived from the cached table.

Columns: ``doc_id``, ``hs`` (distinct shingle hashes, possibly empty),
``sig`` (MinHash signature, NULL when the doc has no shingles), ``sim``
(SimHash of the distinct-token set, defined for every doc).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH

#: Override the cache root (default: <tmp>/spark_graft_sig_cache).
SIG_CACHE_ENV = "SPARK_GRAFT_SIG_CACHE"


def signature_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The one-pass signature derivation (lazy; no caching).

    Map-only: one shuffle-free pass over the corpus computes shingle
    hashes, MinHash signature, and SimHash together.  ``repartition``
    spreads the CPU-heavy expressions across cores when the corpus
    arrives in few splits (a compact parquet file is one partition).
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col), F.col(text_col))
        .repartition(par, F.col(id_col))
        .withColumn("toks", F.expr(TH.spark_tokens(text_col)))
        .withColumn("sh", F.expr(TH.spark_shingles_from_tokens("toks")))
        .withColumn(
            "hs",
            F.expr(
                f"array_distinct(transform(sh, s -> {TH.spark_str_hash('s')}))"
            ),
        )
        .withColumn(
            "sig",
            F.when(F.size("hs") > 0, F.expr(TH.spark_minhash_sig("hs"))),
        )
        .withColumn("sim", F.expr(TH.spark_simhash_from_tokens("toks")))
        .select(id_col, "hs", "sig", "sim")
    )


def _corpus_key(sf_dir: str, table: str) -> str:
    path = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(path)
    tag = "|".join(
        str(x)
        for x in (
            os.path.abspath(path),
            st.st_mtime_ns,
            st.st_size,
            TH.P,
            TH.BASE,
            TH.K,
            TH.BANDS,
            TH.SHINGLE_W,
            TH.SIMHASH_BITS,
            "v2",  # bump when the derivation changes
        )
    )
    return hashlib.md5(tag.encode()).hexdigest()[:16]


def signature_table(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Read-through materialized signature table for a corpus snapshot.

    First call per (corpus identity, hash params) computes and writes
    the parquet table; later calls — across queries and sessions — are
    plain parquet scans.  This is what makes the dedup tier's cost
    *one* signature pass per corpus instead of one per operator.
    """
    root = os.environ.get(
        SIG_CACHE_ENV,
        os.path.join(tempfile.gettempdir(), "spark_graft_sig_cache"),
    )
    dest = os.path.join(root, _corpus_key(sf_dir, table))
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        from ..sources.batch import load_table

        docs = load_table(spark, sf_dir, table)
        signature_frame(docs, id_col, text_col).write.mode(
            "overwrite"
        ).parquet(dest)
    return spark.read.parquet(dest)
