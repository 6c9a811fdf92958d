"""Crash-safe directory swap shared by the incremental stores'
compaction step.

The naive ``rmtree(store); rename(tmp, store)`` has a window where the
ONLY copy of the store is deleted (crash between the two calls loses
all compacted history; recovery then replays only uncompacted batches
— the round-7 ADVICE finding on the quantile store, shared by every
store that compacts).  :func:`commit_swap` renames the old store ASIDE
before the new base takes its path, so a complete copy exists at a
known location at every instant; :func:`recover_swap` (called at the
head of every read and write path) finishes an interrupted swap by
RESTORING that copy to the store path — restoring, not just reading,
so subsequent batch leaves append to full history.

A transactional table format (Delta/Iceberg) makes this one atomic
metadata commit; this is the same move expressed in plain
directories.
"""

from __future__ import annotations

import os
import shutil


def commit_swap(store_path: str) -> None:
    """``store_path + '.compact.tmp'`` (fully written) becomes
    ``store_path``: old aside → tmp in → drop aside."""
    tmp = store_path + ".compact.tmp"
    old = store_path + ".old"
    if os.path.exists(old):  # leftover from a prior crash
        shutil.rmtree(old)
    if os.path.exists(store_path):
        os.rename(store_path, old)
    os.rename(tmp, store_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def recover_swap(store_path: str) -> None:
    """Complete an interrupted :func:`commit_swap`: if the store path
    is missing, the complete copy sits at the tmp (new base fully
    written, swap unfinished) or .old (swap not yet started on tmp)
    location — restore it."""
    tmp = store_path + ".compact.tmp"
    old = store_path + ".old"
    if os.path.exists(store_path):
        # The store is whole, so any leftover aside/tmp copy is
        # provably stale (a crash landed between the final rename and
        # its cleanup, or before commit_swap started) — reclaim the
        # disk now instead of waiting for the next compact.
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        return
    if os.path.exists(tmp):
        os.rename(tmp, store_path)
        if os.path.exists(old):
            shutil.rmtree(old)
    elif os.path.exists(old):
        os.rename(old, store_path)
