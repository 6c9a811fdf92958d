"""Operator-internal persists are tracked and fully releasable.

The leak under test: library callers invoking dedup/similarity
operators repeatedly in one session must be able to drop the
operators' cached intermediates without ``clearCache()`` (which would
also clobber their own caches).

Accounting is done on persistent-RDD *id sets*, not global counts:
other tests' ``localCheckpoint`` leftovers are cleaned asynchronously
by the ContextCleaner, so absolute counts can shrink mid-test — but
ids newly created here can't disappear while still referenced.
"""

from __future__ import annotations

from spark_kafka_streaming_spark.functions.caching import (
    release_operator_caches,
)
from spark_kafka_streaming_spark.operators.dedup import minhash_lsh_pairs
from spark_kafka_streaming_spark.sources.batch import load_table


def _cached_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.keysIterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def test_release_operator_caches_drops_all_tracked(spark, sf_dir):
    release_operator_caches()  # clean slate from earlier tests
    ids0 = _cached_ids(spark)

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    pairs.count()  # materialize → signatures + band table now cached
    op_ids = _cached_ids(spark) - ids0
    assert len(op_ids) >= 2  # signature frame + band frame

    # A caller's own cache must survive the release.
    own = docs.select("doc_id").persist()
    own.count()
    own_ids = _cached_ids(spark) - ids0 - op_ids
    assert len(own_ids) == 1

    released = release_operator_caches()
    assert released >= 2
    after = _cached_ids(spark)
    assert after & op_ids == set()  # every operator cache is gone
    assert own_ids <= after  # the caller's cache survived

    own.unpersist(blocking=True)
    assert own_ids & _cached_ids(spark) == set()

    # Idempotent.
    assert release_operator_caches() == 0
