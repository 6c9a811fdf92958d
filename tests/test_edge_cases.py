"""Empty/degenerate-input robustness for the LLM-pipeline operators —
a 100 TB pipeline will hit empty partitions, empty batches, and
degenerate documents constantly; none of these may throw."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_kafka_streaming_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from spark_kafka_streaming_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from spark_kafka_streaming_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
)

EMPTY_DOCS = "doc_id long, text string"
EMPTY_VECS = "vec_id long, embedding array<float>"


def test_dedup_operators_on_empty_input(spark):
    empty = spark.createDataFrame([], EMPTY_DOCS)
    assert minhash_lsh_pairs(empty).count() == 0
    assert simhash_pairs(empty).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0
    assert exact_dedup(empty, ["text"], "doc_id").count() == 0


def test_similarity_on_empty_sides(spark):
    empty = spark.createDataFrame([], EMPTY_VECS)
    vecs = spark.createDataFrame(
        [(1, [0.1] * 64), (2, [0.2] * 64)], EMPTY_VECS
    )
    assert brute_force_topk(empty, vecs).count() == 0
    assert brute_force_topk(vecs, empty).count() == 0
    assert ivf_topk(empty, vecs).count() == 0


def test_text_ops_on_degenerate_documents(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, " "), (3, "x"), (4, "a b"), (5, None)], EMPTY_DOCS
    )
    q = quality_score(docs.filter(F.col("text").isNotNull()))
    rows = {r.doc_id: r.quality for r in q.collect()}
    # zero-token docs divide by zero → null quality, not an exception
    assert rows[1] is None and rows[2] is None
    assert rows[3] is not None
    lang = language_id(docs.filter(F.col("text").isNotNull()))
    assert lang.count() == 4
    fp = fingerprint(docs.filter(F.col("text").isNotNull()))
    got = {r.doc_id: (r.fp_exact, r.fp_fuzzy) for r in fp.collect()}
    assert got[1][0] == 0  # empty fold
    assert got[4][1] is None  # no shingles → no fuzzy fingerprint


def test_dedup_single_and_identical_docs(spark):
    one = spark.createDataFrame(
        [(1, "the quick brown fox jumps high")], EMPTY_DOCS
    )
    assert minhash_lsh_pairs(one).count() == 0
    twins = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"),
         (2, "the quick brown fox jumps high")],
        EMPTY_DOCS,
    )
    pairs = minhash_lsh_pairs(twins).collect()
    assert len(pairs) == 1 and pairs[0].jaccard == 1.0


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Landing-zone schema drift: a producer adds a column mid-stream.
    mergeSchema reads unify old+new snapshots (missing column
    NULL-filled), and the WRITE path is append-compatible — the
    ingestion contract a long-lived 100 TB landing zone needs (column
    adds are the one evolution parquet supports without rewrite;
    renames/type-changes need a migration pass, documented here by the
    failing-read assertion)."""
    p = str(tmp_path / "land")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}

    # without mergeSchema the footer picked is arbitrary — pinning the
    # read with an explicit superset schema is the production posture
    pinned = spark.read.schema(
        "id long, name string, score double"
    ).parquet(p)
    assert pinned.where("score IS NOT NULL").count() == 1


def test_bench_list_names_are_registered():
    """Every bench entry must resolve in the registry — a typo here
    would crash the per-round benchmark run, not a unit test."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from spark_kafka_streaming_spark.queries import REGISTRY

    missing = [n for n in bench.BENCH_QUERIES if n not in REGISTRY]
    assert not missing, f"bench names not in registry: {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_round4_queries_tolerate_empty_events(spark, tmp_path):
    """Moments / MAD / expectations on an EMPTY events table: no
    crashes, deterministic empty-or-zero outputs (the empty-partition
    case every 100 TB job hits on some date range)."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    from spark_kafka_streaming_spark.queries import REGISTRY

    sfd = str(tmp_path)
    assert REGISTRY["q_stats_moments_merge"].builder(spark, sfd).count() == 0
    assert REGISTRY["q_events_anomaly_mad"].builder(spark, sfd).count() == 0
    assert (
        REGISTRY["q_events_anomaly_mad_hist"].builder(spark, sfd).count()
        == 0
    )
    rows = {
        r["rule"]: r["n_violations"]
        for r in REGISTRY["q_quality_expectations_events"]
        .builder(spark, sfd)
        .collect()
    }
    # every rule reports 0 on an empty fact (COALESCE'd sums — the
    # same empty-table posture as q_audit_referential_integrity)
    assert set(rows.values()) == {0} and len(rows) == 6
