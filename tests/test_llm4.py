"""Semantic tests for the fourth LLM wave: mixture realization and
sequence packing (planted-case checks independent of the DuckDB gate),
plus the ε-tolerance bound for the approximate aggregation tier that
the oracle can't check (HLL/t-digest internals are engine-specific).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_kafka_streaming_spark.operators.mixing import (
    mixture_report,
    weighted_mixture,
)
from spark_kafka_streaming_spark.operators.sharding import pack_sequences
from spark_kafka_streaming_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def test_mixture_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 1_000_000, "zh": 0}
    kept = weighted_mixture(df, rates).select("doc_id", "lang")
    got = {(r.doc_id, r.lang) for r in kept.collect()}
    # rate 100% keeps every en doc, rate 0 drops every zh doc — exactly.
    assert got == {(i, "en") for i in range(0, 2000, 2)}
    # rerun is bit-identical (pure function of the data, no rand()).
    again = {(r.doc_id, r.lang) for r in weighted_mixture(df, rates).collect()}
    assert again == got


def test_mixture_report_partial_rate_bounds(spark):
    rows = [(i, "en") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string").withColumn(
        "n", F.lit(3)
    )
    rep = mixture_report(df, {"en": 500_000}, size_col="n").collect()[0]
    assert rep.docs_in == 5000 and rep.tok_in == 15000
    # hash-uniform keep at 50% ± a loose binomial bound.
    assert 2200 <= rep.docs_kept <= 2800
    assert rep.tok_kept == rep.docs_kept * 3


def test_pack_sequences_partitions_the_token_stream(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, 16).collect()
    assert len(out) == 300
    total = sum(r.n_tok for r in out)
    # every doc occupies [first_seq, last_seq] and spans ceil-consistent
    # counts; the union of spans covers sequences 0..(total-1)//16.
    for r in out:
        assert r.n_seqs == r.last_seq - r.first_seq + 1 >= 1
        # a doc of n_tok tokens crosses at most (n_tok-1)//16 boundaries
        # beyond the one it may already straddle at its start offset.
        assert r.n_seqs <= (r.n_tok - 1) // 16 + 2
    covered = set()
    for r in out:
        covered.update(range(r.first_seq, r.last_seq + 1))
    assert covered == set(range((total - 1) // 16 + 1))


def test_pack_sequences_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "d")], "doc_id long, text string"
    )
    got = {r.doc_id for r in pack_sequences(df, 4).collect()}
    assert got == {1, 3}


def test_approx_tier_within_tolerance(spark):
    """q_agg_approx has no oracle by design — bound it against the
    exact answers instead: HLL at default rsd 5% (allow 3σ), t-digest
    median within the 1e-4 accuracy band scaled to the value range."""
    approx = {
        r.l_returnflag: r for r in REGISTRY["q_agg_approx"].builder(
            spark, SF_DIR
        ).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a.approx_parts - e.parts) <= 0.15 * e.parts, flag
        band = 0.02 * (e.hi - e.lo)
        assert abs(a.approx_median - e.median) <= band, flag
