"""Exact (order-independent) aggregation helpers.

Distributed FP summation is non-deterministic across partitionings and
engines. For every oracle-checked aggregate the engine sums in DECIMAL
(exact, associative) and casts the final value to DOUBLE. The data's
measures are 2-decimal money values, so DECIMAL(18,2) is lossless.

At 100 TB this costs nothing extra: decimal sums still combine
map-side (partial aggregation) and avoid a second pass; the cast
happens once per group on the reduced result.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec(col: Column | str, scale: int = 2) -> Column:
    """Cast a measure to exact decimal (default money scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact sum of a double measure, returned as DOUBLE."""
    return F.sum(dec(col, scale)).cast("double")


def dsum_expr(sql_expr: str, scale: int = 2) -> Column:
    """Exact sum of a decimal SQL expression, returned as DOUBLE."""
    return F.sum(F.expr(sql_expr)).cast("double")
