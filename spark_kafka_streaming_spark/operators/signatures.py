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
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """The one-pass signature derivation (lazy; no caching).

    Map-only: one shuffle-free pass over the corpus computes shingle
    hashes, MinHash signature, and SimHash together.  ``repartition``
    spreads the CPU-heavy work across cores when the corpus arrives in
    few splits (a compact parquet file is one partition).

    ``impl="arrow"`` (default) computes the whole derivation in an
    Arrow-batched kernel: one ``hashlib.md5`` call per shingle/token
    plus vectorized numpy min-hash/bit-count — the interpreted
    higher-order expressions of the SQL form are the measured hot spot
    of the signature build (sf1: 16.9 s → ~4 s).  ``impl="sql"`` is
    the pure built-in-expression form; both produce bit-identical
    rows (pinned in tests — same tokenization, same md5-prefix hash,
    same first-occurrence dedup order, same null conventions).
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.select(F.col(id_col), F.col(text_col)).repartition(
        par, F.col(id_col)
    )
    if impl == "arrow":
        # capture plain values: the closure is pickled to executor
        # workers that may not have this package importable.
        P, A, B, W, BITS = TH.P, list(TH.A), list(TH.B), TH.SHINGLE_W, TH.SIMHASH_BITS

        def _batches(it):
            import hashlib

            import numpy as np
            import pandas as pd

            a_arr = np.array(A, dtype="int64")[:, None]
            b_arr = np.array(B, dtype="int64")[:, None]
            js = np.arange(BITS, dtype="int64")
            pw = 1 << (BITS - 1 - js)  # bit j → weight 2^(BITS-1-j)

            def h60(s):
                return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

            for pdf in it:
                ids, hss, sigs, sims = [], [], [], []
                for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                    if text is None or not isinstance(text, str):
                        # NULL text → NULL hs/sig but sim = 0, matching
                        # the SQL form's null propagation exactly (the
                        # outer bit-fold starts from acc=0L and the SQL
                        # aggregate keeps the non-null accumulator).
                        ids.append(doc_id)
                        hss.append(None)
                        sigs.append(None)
                        sims.append(0)
                        continue
                    toks = [t for t in text.split(" ") if t]
                    # distinct shingles, first-occurrence order
                    sh = list(
                        dict.fromkeys(
                            " ".join(toks[i : i + W])
                            for i in range(len(toks) - W + 1)
                        )
                    )
                    hs = list(dict.fromkeys(h60(s) % P for s in sh))
                    if hs:
                        h = np.array(hs, dtype="int64")[None, :]
                        sig = ((a_arr * h + b_arr) % P).min(axis=1).tolist()
                    else:
                        sig = None
                    th = np.array(
                        [h60(t) for t in dict.fromkeys(toks)], dtype="int64"
                    )
                    if len(th):
                        ones = ((th[:, None] >> js[None, :]) & 1).sum(axis=0)
                        bits = (2 * ones > len(th)).astype("int64")
                        sim = int((bits * pw).sum())
                    else:
                        sim = 0
                    ids.append(doc_id)
                    hss.append(hs)
                    sigs.append(sig)
                    sims.append(sim)
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "hs": hss,
                        "sig": sigs,
                        # nullable Int64, NOT a plain int column: one
                        # None in the batch would coerce to float64 and
                        # round 60-bit SimHash values (observed: low
                        # bits flipped only in batches containing a
                        # null-text row).
                        "sim": pd.array(sims, dtype="Int64"),
                    }
                )

        return base.mapInPandas(
            _batches,
            f"{id_col} bigint, hs array<bigint>, sig array<bigint>, sim bigint",
        )
    if impl != "sql":
        raise ValueError(f"unknown impl: {impl!r} (want 'arrow' or 'sql')")
    return (
        base.withColumn("toks", F.expr(TH.spark_tokens(text_col)))
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
