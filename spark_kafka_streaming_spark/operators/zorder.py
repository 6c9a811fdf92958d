"""Z-order (Morton) data layout: multi-dimensional clustering for
file-skipping.

Linear sorting a fact table bounds per-file min/max on ONE column;
range predicates on any other column scan every file.  Interleaving
the bits of two (or more) key columns into a Morton z-value and
range-partitioning on it bounds per-file spans on ALL interleaved
dimensions — the same idea behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
built here from OSS Spark primitives: an exact integer bit-interleave
expression + ``repartitionByRange`` + ``sortWithinPartitions`` +
per-file parquet min/max statistics (which Spark's scan uses for row-
group skipping automatically).

The quantified comparison against a linear layout is the catalog query
``q_layout_zorder`` (queries/relational3.py); this module is the
write-side operator plus the shared expression generator.  No analog
in the reference (it has no file layout at all — Kafka in, DStream
out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS_DEFAULT = 12


def z_expr_spark(c: str, d: str, bits: int = ZBITS_DEFAULT) -> str:
    """Spark SQL expression interleaving the low ``bits`` of two
    non-negative integer columns (c → even bit positions, d → odd)."""
    terms = [
        f"shiftleft(shiftright({c}, {i}) & 1, {2 * i})" for i in range(bits)
    ] + [
        f"shiftleft(shiftright({d}, {i}) & 1, {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def z_expr_duck(c: str, d: str, bits: int = ZBITS_DEFAULT) -> str:
    """DuckDB twin of :func:`z_expr_spark` (same bit placement)."""
    terms = [
        f"((({c} >> {i}) & 1) << {2 * i})" for i in range(bits)
    ] + [
        f"((({d} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    c_col: str,
    d_col: str,
    n_files: int = 16,
    bits: int = ZBITS_DEFAULT,
) -> None:
    """Write ``df`` as a z-ordered parquet layout: ``n_files``
    range-partitions of the Morton value of (``c_col``, ``d_col``),
    sorted within each file so parquet row-group min/max stats are
    tight on BOTH columns.

    ``repartitionByRange`` samples the z distribution to pick range
    bounds — fully parallel (no global sort); the z column is dropped
    before writing, since the layout, not the value, is the product.
    At 100 TB this is the whole recipe: the interleave is map-only,
    the range exchange is the one shuffle, and every downstream range
    predicate on either column prunes files/row-groups via the
    footer statistics Spark already consults.
    """
    z = df.withColumn("_z", F.expr(z_expr_spark(c_col, d_col, bits)))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
