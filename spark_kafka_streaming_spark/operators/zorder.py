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

#: 27 bits per dimension: the interleaved value stays < 2^54 (exact in
#: int64 AND in the driver's double-based hashing), while covering key
#: domains up to 134M — key-shifted scale replicas reach ~99M custkeys
#: at factor 100. Bits ABOVE this are truncated by construction; raise
#: deliberately (or pre-hash the key down) for wider domains — a
#: too-small value silently destroys clustering on the wide dimension
#: (found at sf0.1 where 12 bits dropped custkey's high bits).
ZBITS_DEFAULT = 27


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

    Both columns are min/max-normalized onto the same ``2^bits`` grid
    (exact integer arithmetic; bounds collected as one driver-side
    aggregate and inlined as literals) BEFORE interleaving —
    interleaving raw unequal-width domains hands every high z-bit to
    the wider column, so the narrower one gets no top-level clustering
    (measured: raw interleave left the narrow dimension's per-file
    span at its full domain).

    ``repartitionByRange`` samples the z distribution to pick range
    bounds — fully parallel (no global sort); the z column is dropped
    before writing, since the layout, not the value, is the product.
    At 100 TB this is the whole recipe: one tiny bounds job, a
    map-only interleave, the range exchange as the one shuffle, and
    every downstream range predicate on either column prunes
    files/row-groups via the footer statistics Spark already consults.
    """
    lo_c, hi_c, lo_d, hi_d = df.agg(
        F.min(c_col), F.max(c_col), F.min(d_col), F.max(d_col)
    ).collect()[0]
    if lo_c is None or lo_d is None:
        raise ValueError(
            "write_zordered: empty input (or all-NULL key column) — "
            "no min/max bounds to normalize against"
        )
    cells = 1 << bits
    for name, lo, hi in ((c_col, lo_c, hi_c), (d_col, lo_d, hi_d)):
        # ((col-lo) * 2^bits) must stay in int64: domain width * cells
        # < 2^63, else the grid math silently overflows.
        if (int(hi) - int(lo) + 1) * cells >= 1 << 63:
            raise ValueError(
                f"write_zordered: domain of {name!r} "
                f"([{lo}, {hi}]) * 2^{bits} grid cells overflows int64 — "
                "pre-hash the key down or lower `bits`"
            )

    def cell(col: str, lo: int, hi: int) -> str:
        return f"((({col}) - {lo}) * {cells}) DIV ({hi} - {lo} + 1)"

    z = (
        df.withColumn("_cc", F.expr(cell(c_col, lo_c, hi_c)))
        .withColumn("_dc", F.expr(cell(d_col, lo_d, hi_d)))
        .withColumn("_z", F.expr(z_expr_spark("_cc", "_dc", bits)))
        .drop("_cc", "_dc")
    )
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
