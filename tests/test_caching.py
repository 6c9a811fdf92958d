"""Operator-internal persists are tracked and fully releasable.

The leak under test: library callers invoking dedup/similarity
operators repeatedly in one session must be able to drop the
operators' cached intermediates without ``clearCache()`` (which would
also clobber their own caches).
"""

from __future__ import annotations

from spark_kafka_streaming_spark.functions.caching import (
    release_operator_caches,
)
from spark_kafka_streaming_spark.operators.dedup import minhash_lsh_pairs
from spark_kafka_streaming_spark.sources.batch import load_table


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_release_operator_caches_drops_all_tracked(spark, sf_dir):
    release_operator_caches()  # clean slate from earlier tests
    before = _n_cached(spark)

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    pairs.count()  # materialize → signatures + band table now cached
    assert _n_cached(spark) > before

    # A caller's own cache must survive the release.
    own = docs.select("doc_id").persist()
    own.count()

    released = release_operator_caches()
    assert released >= 2  # signature frame + band frame
    assert _n_cached(spark) == before + 1  # only `own` remains
    own.unpersist()
    assert _n_cached(spark) == before

    # Idempotent.
    assert release_operator_caches() == 0
