"""Registry of named queries with their DuckDB oracles.

Design rule for oracle-checked queries (the driver hashes values
order-insensitively, so results must match DuckDB *exactly*):

* Money/measure aggregation goes through DECIMAL — both Spark and
  DuckDB sum decimals exactly, so the result is independent of
  partitioning/order; the final cast DECIMAL→DOUBLE is deterministic
  and identical in both engines. Plain ``sum(double)`` would differ in
  low bits between engines (FP addition is order-dependent).
* Averages are written as ``CAST(sum_decimal AS DOUBLE) / count`` —
  identical operands → identical IEEE division result.
* Ordering columns always carry a unique tiebreaker before any LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One catalog entry.

    ``oracle`` is ANSI SQL runnable by DuckDB over views named like the
    parquet tables; ``None`` marks a non-SQL-expressible operator (the
    driver then records a rows-only check; pytest covers semantics).
    """

    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco
