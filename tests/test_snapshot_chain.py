"""Versioned snapshot chain (publish / latest / expire) — the
recurring form of the round-11 exported-snapshot API.

A serving deployment does not export once; it publishes on a cadence
and retires old versions under a retention promise — Iceberg's
snapshot chain + ``expire_snapshots``.  Pins here: version numbering
and completeness (a listed version is always whole), retention
semantics (never expires the only copy; sweeps crashed exports), and
the cross-filesystem incremental path (a re-publish hardlinks
unchanged files from the PREVIOUS version instead of copying — only
files new since the last publish pay bytes).
"""

from __future__ import annotations

import os

import pytest

from spark_kafka_streaming_spark.streaming.incremental_index import (
    IncrementalIndexer,
)
from spark_kafka_streaming_spark.streaming import swap
from spark_kafka_streaming_spark.streaming.swap import (
    expire_snapshots,
    latest_snapshot,
    publish_snapshot,
    snapshot_manifest,
    snapshot_versions,
)

DOCS_PER_BATCH = 8


def _batch(spark, i):
    lo = i * DOCS_PER_BATCH
    return spark.createDataFrame(
        [(d, f"alpha beta w{d}") for d in range(lo, lo + DOCS_PER_BATCH)],
        "doc_id bigint, text string",
    )


def _served_ids(spark, export_path):
    ix = IncrementalIndexer(export_path)
    tf = ix._merged_tf(spark)
    return sorted(r.doc_id for r in tf.select("doc_id").distinct().collect())


def test_publish_latest_expire(spark, tmp_path):
    store = str(tmp_path / "store")
    root = str(tmp_path / "chain")
    ix = IncrementalIndexer(store)

    ids_at = {}
    for i in range(3):
        ix(_batch(spark, i), i)
        publish_snapshot(store, root)
        ids_at[i + 1] = list(range((i + 1) * DOCS_PER_BATCH))

    assert snapshot_versions(root) == [1, 2, 3]
    latest = latest_snapshot(root)
    assert latest is not None and latest.endswith("v=3")
    # each retained version serves its own point-in-time state
    assert _served_ids(spark, os.path.join(root, "v=1")) == ids_at[1]
    assert _served_ids(spark, latest) == ids_at[3]
    m = snapshot_manifest(latest)
    assert m["files"] > 0 and m["bytes"] > 0 and m["source"] == os.path.abspath(store)

    # a crashed export leaves only an .exporting tree: invisible to
    # readers, swept by retention
    crashed = os.path.join(root, "v=9.exporting")
    os.makedirs(crashed)
    assert snapshot_versions(root) == [1, 2, 3]

    removed = expire_snapshots(root, keep=2)
    assert sorted(os.path.basename(p) for p in removed) == [
        "v=1",
        "v=9.exporting",
    ]
    assert snapshot_versions(root) == [2, 3]
    assert _served_ids(spark, latest_snapshot(root)) == ids_at[3]

    with pytest.raises(ValueError):
        expire_snapshots(root, keep=0)

    # publish after expiry continues the numbering past the retained tail
    ix(_batch(spark, 3), 3)
    publish_snapshot(store, root, keep=2)
    assert snapshot_versions(root) == [3, 4]


def test_cross_filesystem_publish_is_incremental(spark, tmp_path, monkeypatch):
    """Simulate EXDEV for store→chain links: the first publish copies,
    a re-publish hardlinks every unchanged file from the previous
    version (zero new copies), and after one more batch only that
    batch's files are copied."""
    store = str(tmp_path / "store")
    root = str(tmp_path / "chain")
    ix = IncrementalIndexer(store)
    ix(_batch(spark, 0), 0)

    real_link = os.link
    copies = []

    def exdev_from_store(src, dst, **kw):
        if os.path.abspath(src).startswith(os.path.abspath(store)):
            raise OSError(18, "Invalid cross-device link")
        return real_link(src, dst, **kw)

    monkeypatch.setattr(swap.os, "link", exdev_from_store)
    real_copy2 = swap.shutil.copy2
    monkeypatch.setattr(
        swap.shutil, "copy2", lambda s, d: (copies.append(s), real_copy2(s, d))[1]
    )

    publish_snapshot(store, root)
    n_first = len(copies)
    assert n_first > 0  # cross-fs first publish copies everything

    # unchanged store: the next version links every file from v=1
    copies.clear()
    publish_snapshot(store, root)
    assert copies == []
    v1, v2 = (os.path.join(root, v) for v in ("v=1", "v=2"))
    for dirpath, _dirs, files in os.walk(v2):
        rel = os.path.relpath(dirpath, v2)
        for f in files:
            if f == "_snapshot_manifest.json":
                continue
            a = os.stat(os.path.join(v1, rel, f))
            b = os.stat(os.path.join(dirpath, f))
            assert (a.st_ino, a.st_dev) == (b.st_ino, b.st_dev)

    # one more batch: only the new leaves pay a copy
    ix(_batch(spark, 1), 1)
    copies.clear()
    publish_snapshot(store, root)
    # batch=1 leaves are the only new data; Spark also rewrites the
    # store-root _SUCCESS marker every trigger (fresh mtime → copied)
    assert copies and all(
        "batch=1" in s or os.path.basename(s) == "_SUCCESS" for s in copies
    )
    assert any("batch=1" in s for s in copies)
    assert _served_ids(spark, latest_snapshot(root)) == list(
        range(2 * DOCS_PER_BATCH)
    )
