"""Round-10 verdict item #4: serving under ingestion.

A reader calling the stores' serving entries WHILE triggers land and
compaction swaps run must never see a half-swapped store or a torn
leaf.  The crash-safe rename-aside swap alone does not give this — a
Spark read lists files at plan time and opens them at task time, so a
swap in between leaves dangling paths — which is why serving reads now
go through hardlink-pinned snapshots under the store's in-process
lock (``streaming/swap.py::serve_read``/``pin_store``; writers hold
the same lock across leaf writes and swaps).

The probe: a writer thread drives N triggers through a store with
``compact_every`` small enough for several compactions, each trigger
adding one new monotonically-keyed row; a reader thread hammers the
serving entry concurrently and asserts every result it collects is a
CONTIGUOUS PREFIX of the ingested sequence (a torn read — half a leaf,
a half-swapped bucket set, a vanished base — shows up as a gap, an
exception, or a regression).  Run against both swap styles: the
whole-tree compact swap (quantile store) and the per-bucket swap
(MERGE store).
"""

from __future__ import annotations

import threading

import pytest

from spark_kafka_streaming_spark.streaming import swap as SW
from spark_kafka_streaming_spark.streaming.incremental_merge import (
    IncrementalMerger,
)
from spark_kafka_streaming_spark.streaming.incremental_quantiles import (
    IncrementalQuantileStore,
)

N_BATCHES = 10
COMPACT_EVERY = 2  # -> 4 compactions across the run


def _drive(writer, reader):
    """Run writer() to completion in a thread while reader() loops;
    re-raise the first failure from either side."""
    errors: list[BaseException] = []
    done = threading.Event()

    def w():
        try:
            writer()
        except BaseException as e:  # noqa: BLE001 — reported below
            errors.append(e)
        finally:
            done.set()

    t = threading.Thread(target=w, daemon=True)
    t.start()
    reads = 0
    try:
        while not done.is_set():
            reader()
            reads += 1
    finally:
        t.join(timeout=300)
    if errors:
        raise errors[0]
    assert t.is_alive() is False
    return reads


def test_quantile_store_serves_consistent_prefixes(spark, tmp_path):
    store = IncrementalQuantileStore(
        store_path=str(tmp_path / "qstore"),
        group_col="g",
        value_col="v",
        key_sql="ky",
        k=64,
        compact_every=COMPACT_EVERY,
    )
    seen = {"hi": -1}

    def writer():
        for i in range(N_BATCHES):
            batch = spark.createDataFrame(
                [("g", float(i), i)], "g string, v double, ky long"
            )
            store(batch, i)

    def reader():
        samp = store.sample(spark)
        if samp is None:
            return
        vals = sorted(int(r.v) for r in samp.collect())
        # contiguous prefix 0..j of the ingested sequence — a torn
        # read shows up as a gap or a missing-file exception
        assert vals == list(range(len(vals))), vals
        j = len(vals) - 1
        # reads are pinned under the store lock, so observed prefixes
        # never move backwards
        assert j >= seen["hi"], (j, seen["hi"])
        seen["hi"] = j

    reads = _drive(writer, reader)
    assert reads >= 3  # the race was actually exercised
    assert seen["hi"] == N_BATCHES - 1  # final state observed
    # the store still equals a batch rebuild after the run
    final = sorted(int(r.v) for r in store.sample(spark).collect())
    assert final == list(range(N_BATCHES))


def test_merge_store_serves_consistent_prefixes(spark, tmp_path):
    store = IncrementalMerger(
        store_path=str(tmp_path / "mstore"), key_col="k", n_key_buckets=8
    )
    seen = {"hi": -1}

    def writer():
        for i in range(N_BATCHES):
            changes = spark.createDataFrame(
                [(i, "U", float(i))], "k long, op string, value double"
            )
            store(changes, i)

    def reader():
        snap = store.snapshot(spark)
        if snap is None:
            return
        keys = sorted(int(r.k) for r in snap.collect())
        assert keys == list(range(len(keys))), keys
        j = len(keys) - 1
        assert j >= seen["hi"], (j, seen["hi"])
        seen["hi"] = j

    reads = _drive(writer, reader)
    assert reads >= 3
    assert seen["hi"] == N_BATCHES - 1
    final = sorted(int(r.k) for r in store.snapshot(spark).collect())
    assert final == list(range(N_BATCHES))


def test_pin_survives_swap_and_gc_reclaims(spark, tmp_path, monkeypatch):
    """A pinned read stays collectable after the tree it pinned is
    compacted away (inode retention), and aged pins are reclaimed on
    the next pin (TTL GC)."""
    import os

    store = IncrementalQuantileStore(
        store_path=str(tmp_path / "qstore"),
        group_col="g",
        value_col="v",
        key_sql="ky",
        k=64,
        compact_every=0,
    )
    for i in range(3):
        store(
            spark.createDataFrame(
                [("g", float(i), i)], "g string, v double, ky long"
            ),
            i,
        )
    lazy = store.sample(spark)  # pins the 3-leaf tree
    store.compact(spark)  # whole tree replaced underneath the pin
    assert sorted(int(r.v) for r in lazy.collect()) == [0, 1, 2]
    reads_dir = store.store_path + ".reads"
    assert len(os.listdir(reads_dir)) == 1
    # age the pin out: TTL 0 -> next pin reclaims it
    monkeypatch.setattr(SW, "PIN_TTL_SECONDS", 0.0)
    again = store.sample(spark)
    assert sorted(int(r.v) for r in again.collect()) == [0, 1, 2]
    pins = os.listdir(reads_dir)
    assert len(pins) == 1  # old pin GC'd, only the new one remains


def test_stale_pin_collect_after_gc_raises_not_partial(
    spark, tmp_path, monkeypatch
):
    """The pin-TTL boundary (round-11 verdict minor #3): a served
    DataFrame held lazy for longer than ``PIN_TTL_SECONDS`` can have
    its pin reclaimed by a LATER read's GC — the documented
    "abandoned lazy read" contract.  Pin the failure mode at the
    boundary: the stale collect RAISES (missing files); it never
    silently returns partial data.  Long-lived lazy holds must
    re-serve (re-pin) or consume an export_snapshot."""
    store = IncrementalQuantileStore(
        store_path=str(tmp_path / "qstore"),
        group_col="g",
        value_col="v",
        key_sql="ky",
        k=64,
        compact_every=0,
    )
    for i in range(3):
        store(
            spark.createDataFrame(
                [("g", float(i), i)], "g string, v double, ky long"
            ),
            i,
        )
    stale = store.sample(spark)  # pins, then goes idle past the TTL
    assert stale.count() > 0  # collectable within the TTL window
    monkeypatch.setattr(SW, "PIN_TTL_SECONDS", 0.0)
    fresh = store.sample(spark)  # GC reclaims the aged pin
    assert sorted(int(r.v) for r in fresh.collect()) == [0, 1, 2]
    with pytest.raises(Exception, match="(?i)not exist|notfound|no such"):
        stale.collect()
