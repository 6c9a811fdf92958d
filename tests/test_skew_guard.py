"""Hot-band skew guard (operators/skew.py): an adversarial corpus where
every member collides into ONE (band, key) bucket must produce the
exact same pair set with the guard on, while no single join group sees
the whole bucket.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_kafka_streaming_spark.operators.dedup import minhash_lsh_pairs
from spark_kafka_streaming_spark.operators.similarity import cosine_dup_pairs
from spark_kafka_streaming_spark.operators.skew import bounded_self_pairs

N = 120  # planted cluster size
CAP = 10


@pytest.fixture(scope="module")
def hot_docs(spark):
    # Identical long text => one shingle set, one MinHash signature,
    # one bucket per band: the worst-case mega-bucket.
    body = " ".join(f"tok{i % 7}" for i in range(40))
    return spark.createDataFrame(
        [(i, body) for i in range(N)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def hot_vecs(spark):
    # Identical embeddings => identical sign keys in every band.
    vec = [float((j % 5) - 2) / 4.0 for j in range(64)]
    return spark.createDataFrame(
        [(i, vec) for i in range(N)], "vec_id long, embedding array<float>"
    )


def _pairset(df):
    return {(r.id1, r.id2) for r in df.collect()}


def test_minhash_pairs_unchanged_under_cap(spark, hot_docs):
    base = _pairset(minhash_lsh_pairs(hot_docs))
    capped = _pairset(minhash_lsh_pairs(hot_docs, max_bucket=CAP))
    assert len(base) == N * (N - 1) // 2  # all-pairs cluster, jaccard 1
    assert capped == base


def test_cosine_pairs_unchanged_under_cap(spark, hot_vecs):
    base = _pairset(cosine_dup_pairs(hot_vecs, threshold=0.9))
    capped = _pairset(cosine_dup_pairs(hot_vecs, threshold=0.9, max_bucket=CAP))
    assert len(base) == N * (N - 1) // 2
    assert capped == base


def test_join_groups_are_bounded(spark):
    """The decomposed side path's right-hand join groups hold ~cap
    members, not the whole bucket: recompute the (key, target_cell)
    group sizes the salted join produces and bound them."""
    rows = [(i, 0, 0) for i in range(N)]  # one bucket: (band=0, key=0)
    bands = spark.createDataFrame(rows, "id long, band int, key long")
    k = -(-N // CAP)  # ceil
    cells = (
        bands.withColumn("_cell", F.expr(f"pmod(xxhash64(CAST(id AS STRING)), {k})"))
        .groupBy("_cell")
        .count()
        .collect()
    )
    assert len(cells) == k
    # hash-balanced, not exact: allow 4x the ideal cell size
    assert max(r["count"] for r in cells) <= 4 * CAP

    # and the guard's output over this synthetic bucket is still exact
    got = {
        (r.id1, r.id2)
        for r in bounded_self_pairs(
            bands,
            key_cols=("band", "key"),
            id_col="id",
            select_cols=lambda: [
                F.col("l.id").alias("id1"),
                F.col("r.id").alias("id2"),
            ],
            cap=CAP,
        ).collect()
    }
    assert got == {(a, b) for a in range(N) for b in range(N) if a < b}


def test_semantic_dedup_giant_cluster_guarded(spark, hot_vecs):
    """SemDeDup's within-cluster pair generation routes through
    bounded_self_pairs keyed on ``cluster`` (VERDICT r3 #3): on a
    planted corpus where every vector lands in ONE k-means cluster
    (identical embeddings), the guarded form must keep the exact
    keep-lowest-id result while decomposing the giant cluster, and must
    agree with the unguarded (max_bucket=None) plan."""
    from spark_kafka_streaming_spark.operators.kmeans import semantic_dedup

    def kept(max_bucket):
        out = semantic_dedup(
            hot_vecs, k=4, tau=0.9, max_bucket=max_bucket
        ).collect()
        assert len(out) == N
        assert len({r.cluster for r in out}) == 1  # the planted skew
        return {r.vec_id for r in out if r.kept}

    assert kept(CAP) == {0}  # all-identical: only the lowest id survives
    assert kept(CAP) == kept(None)


def test_mixed_buckets_exact(spark):
    """Buckets straddling the cap: small buckets take the plain path,
    big ones the salted path; union must be the exact pair set with no
    duplicates or losses."""
    rows = []
    for i in range(50):  # big bucket (key 0)
        rows.append((i, 0, 0))
    for i in range(5):  # small bucket (key 1)
        rows.append((100 + i, 0, 1))
    bands = spark.createDataFrame(rows, "id long, band int, key long")
    out = bounded_self_pairs(
        bands,
        key_cols=("band", "key"),
        id_col="id",
        select_cols=lambda: [
            F.col("l.id").alias("id1"),
            F.col("r.id").alias("id2"),
        ],
        cap=CAP,
    ).collect()
    got = [(r.id1, r.id2) for r in out]
    want = {(a, b) for a in range(50) for b in range(50) if a < b} | {
        (100 + a, 100 + b) for a in range(5) for b in range(5) if a < b
    }
    assert len(got) == len(want)  # no duplicate emission
    assert set(got) == want
