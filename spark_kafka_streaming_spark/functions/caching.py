"""Session-scoped accounting for operator-internal ``persist()`` calls.

Several operators persist intermediates that multiple join legs of the
*same* returned plan consume (LSH band tables, prefix indexes, IVF
centroids).  The frames must stay cached until the caller executes the
returned plan, so the operator cannot unpersist them itself — but a
long-lived session issuing many operator calls would otherwise
accumulate cached blocks indefinitely.

Every internal persist goes through :func:`track_persist`; callers
release them all with :func:`release_operator_caches` once results are
materialized.  Unlike ``spark.catalog.clearCache()`` this only drops
the operators' own blocks, never the caller's caches.

At cluster scale the same intermediates would instead be written as
per-corpus-snapshot tables (:mod:`..operators.signatures`) — this
module is the transient, single-session form of that contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """``df.persist()`` registered for later bulk release."""
    df = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Call after materializing operator results (``collect``/write).
    Releasing is idempotent and safe while other queries run — it only
    drops cached blocks.  Blocking: when this returns, the blocks are
    gone (async unpersist would leave them briefly visible, which turns
    any cache accounting — including this module's own tests — into a
    race).
    """
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist(blocking=True)
        n += 1
    return n
