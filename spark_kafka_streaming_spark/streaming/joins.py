"""Stream-stream interval (range) joins.

The general form of the reference's consumer-lag zip
(``ProcessorMetrics.scala:86-89``, which pairs each progress sample
with the latest matching offset sample): enrich one event stream with
rows of another stream for the same key within a bounded event-time
interval.

Spark's stream-stream join buffers both sides in the state store; the
watermarks plus the time-range condition make that state *bounded* —
a left row can be dropped as soon as the right watermark passes
``left_ts - lower``, and a right row once the left watermark passes
``right_ts + upper``.  Without the range condition the state grows
without bound, which is the failure mode that separates a toy join
from one that survives a week of uptime on a real stream.

The batch twin (identical semantics on the static ``events`` table) is
``q_events_interval_join_click_purchase`` in :mod:`..queries.events`,
oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_sec: int = 0,
    upper_sec: int = 3600,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` that precede a ``left`` row by
    ``[lower_sec, upper_sec]`` seconds on the same key.

    Works on two streaming DataFrames (watermarks are applied here) or
    two batch DataFrames (watermark is a no-op on batch plans, so the
    same code path is its own batch twin).  Column names must already
    be disjoint apart from ``on`` — pre-rename with ``select``.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = (
        right.withWatermark(right_ts, watermark) if right.isStreaming else right
    )
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {upper_sec} SECONDS")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower_sec} SECONDS")
        )
    )
    joined = lw.alias("l").join(rw.alias("r"), cond, how)
    right_cols = [c for c in right.columns if c != on]
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right_cols],
    )
