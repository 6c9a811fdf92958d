"""Semantics tests for the data-quality + association wave
(queries/relational3.py): planted-orphan FK audit, fuzzy-match and
basket-pair recomputation."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from spark_kafka_streaming_spark.queries import REGISTRY
from spark_kafka_streaming_spark.sources.batch import TABLES, load_table


def test_audit_flags_planted_orphans(spark, sf_dir, tmp_path):
    """Copy the corpus, plant one lineitem with a bogus orderkey and
    one with a bogus partkey, and assert the audit reports exactly
    those orphans (everything else stays zero)."""
    dst = tmp_path / "corrupt"
    dst.mkdir()
    for t in TABLES:
        if t == "lineitem":
            li = load_table(spark, sf_dir, t)
            bad = li.limit(2).withColumn(
                "l_orderkey", F.lit(999_999_999)
            )
            bad2 = li.limit(1).withColumn("l_partkey", F.lit(888_888_888))
            li.unionByName(bad).unionByName(bad2).write.parquet(
                str(dst / f"{t}.parquet")
            )
        else:
            src = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(src):
                shutil.copytree(src, str(dst / f"{t}.parquet"))
            else:
                shutil.copy(src, str(dst / f"{t}.parquet"))
    rows = {
        r["fk"]: r["n_orphans"]
        for r in REGISTRY["q_audit_referential_integrity"]
        .builder(spark, str(dst))
        .collect()
    }
    assert rows["lineitem->orders"] == 2
    assert rows["lineitem->part"] == 1
    assert all(
        v == 0
        for k, v in rows.items()
        if k not in ("lineitem->orders", "lineitem->part")
    )


def test_fuzzy_match_distances_correct(spark, sf_dir):
    """Every returned pair really is within edit distance 2, every
    probe matches its own original at distance exactly 1 (one char
    deleted), and distances agree with a Python Levenshtein."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = REGISTRY["q_text_fuzzy_match"].builder(spark, sf_dir).collect()
    assert rows
    probes = {r["probe"] for r in rows}
    for r in rows:
        assert r["dist"] == lev(r["probe"], r["p_name"]) <= 2
    # each probe is its original minus the 3rd char -> distance 1 hit
    for p in probes:
        assert any(r["probe"] == p and r["dist"] == 1 for r in rows)


def test_basket_pairs_against_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, sf_dir, "part").collect()
    }
    baskets: dict = {}
    for r in li.collect():
        baskets.setdefault(r["l_orderkey"], set()).add(part[r["l_partkey"]])
    support: dict = {}
    for brands in baskets.values():
        bs = sorted(brands)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                support[(bs[i], bs[j])] = support.get((bs[i], bs[j]), 0) + 1
    expected = sorted(
        ((v, k) for k, v in support.items()),
        key=lambda x: (-x[0], x[1]),
    )[:15]
    got = [
        ((r["brand1"], r["brand2"]), r["n_orders"])
        for r in REGISTRY["q_basket_brand_pairs"]
        .builder(spark, sf_dir)
        .collect()
    ]
    assert got == [(k, v) for v, k in expected]


def test_zorder_bounds_both_dimensions(spark, sf_dir):
    """The pruning claim: linear custkey sort leaves every file
    spanning ~the full date range, z-order bounds both spans."""
    rows = {
        r["layout"]: r
        for r in REGISTRY["q_layout_zorder"].builder(spark, sf_dir).collect()
    }
    lin, zo = rows["linear"], rows["zorder"]
    n = lin["n_rows"]
    assert n == zo["n_rows"]
    # Weighted (per-row average) spans are the honest z-order statistic:
    # a couple of buckets straddle Morton-curve discontinuities and
    # carry full-domain MAX spans by construction; the average is what
    # file-skipping sees across the layout. These assertions catch both
    # failure modes found live: bit truncation of the wide dimension
    # and unbalanced raw-domain interleaving (each left the average
    # c-span at ~the full domain).
    dom = (
        load_table(spark, sf_dir, "orders")
        .agg(
            (F.max("o_custkey") - F.min("o_custkey") + 1).alias("dc"),
            F.expr(
                "CAST(datediff(max(o_orderdate), min(o_orderdate)) + 1 "
                "AS BIGINT)"
            ).alias("dd"),
        )
        .collect()[0]
    )
    assert zo["weighted_span_c"] * 2 <= dom["dc"] * n
    assert zo["weighted_span_d"] * 2 <= dom["dd"] * n
    # and the point of the exercise: far better date pruning than linear
    assert zo["weighted_span_d"] * 2 < lin["weighted_span_d"]


def test_write_zordered_files_bound_both_spans(spark, sf_dir, tmp_path):
    """The write-side layout: z-ordered parquet files have bounded
    min/max spans on BOTH columns, while a linear layout leaves every
    file spanning ~the full date range."""
    import glob

    from spark_kafka_streaming_spark.operators.zorder import write_zordered

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c"),
        F.expr(
            "CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01') AS BIGINT)"
        ).alias("d"),
    )
    zp = str(tmp_path / "z")
    lp = str(tmp_path / "lin")
    write_zordered(orders, zp, "c", "d", n_files=8)
    (
        orders.repartitionByRange(8, "c")
        .sortWithinPartitions("c")
        .write.mode("overwrite")
        .parquet(lp)
    )

    def spans(path):
        out = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            r = (
                spark.read.parquet(f)
                .agg(
                    F.min("c"), F.max("c"), F.min("d"), F.max("d"),
                    F.count("*"),
                )
                .collect()[0]
            )
            if r[4] == 0:
                continue
            out.append((r[1] - r[0] + 1, r[3] - r[2] + 1))
        return out

    zs, ls = spans(zp), spans(lp)
    assert len(zs) >= 4 and len(ls) >= 4
    # round trip preserved
    assert spark.read.parquet(zp).count() == orders.count()
    # linear: worst-file date span ~ full range; z-order: clearly bounded
    assert max(sd for _, sd in zs) * 2 < max(sd for _, sd in ls)


def test_write_zordered_3d_bounds_all_spans(spark, sf_dir, tmp_path):
    """k-dimensional generalization: a 3-col z-order layout (custkey,
    order-day, price-cents) bounds per-file spans on ALL THREE
    dimensions, while the linear custkey sort leaves the other two at
    ~their full domains. Per-dim resolution drops to 20 bits (3·20 <
    63) — the inherent multi-dim trade, still far tighter than no
    clustering."""
    import glob

    from spark_kafka_streaming_spark.operators.zorder import (
        write_zordered_n,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c"),
        F.expr(
            "CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01') AS BIGINT)"
        ).alias("d"),
        F.expr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        ).alias("p"),
    )
    zp = str(tmp_path / "z3")
    lp = str(tmp_path / "lin3")
    write_zordered_n(orders, zp, ["c", "d", "p"], n_files=8)
    (
        orders.repartitionByRange(8, "c")
        .sortWithinPartitions("c")
        .write.mode("overwrite")
        .parquet(lp)
    )

    def weighted_spans(path):
        tot = {"c": 0, "d": 0, "p": 0}
        n = 0
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            r = (
                spark.read.parquet(f)
                .agg(
                    F.min("c"), F.max("c"), F.min("d"), F.max("d"),
                    F.min("p"), F.max("p"), F.count("*"),
                )
                .collect()[0]
            )
            if r[6] == 0:
                continue
            n += r[6]
            tot["c"] += (r[1] - r[0] + 1) * r[6]
            tot["d"] += (r[3] - r[2] + 1) * r[6]
            tot["p"] += (r[5] - r[4] + 1) * r[6]
        return {k: v / n for k, v in tot.items()}, n

    zs, zn = weighted_spans(zp)
    ls, ln = weighted_spans(lp)
    assert zn == ln == orders.count()
    dom = orders.agg(
        (F.max("c") - F.min("c") + 1).alias("dc"),
        (F.max("d") - F.min("d") + 1).alias("dd"),
        (F.max("p") - F.min("p") + 1).alias("dp"),
    ).collect()[0]
    # z-order: every dimension's average span under its domain — with
    # 8 files = 3 top z-bits, each of 3 dims owns ONE top-level split,
    # so ~domain/2 per dim plus Morton-discontinuity buckets; 0.85 is
    # the honest bound at this file count (2-D at 16 files gets ~0.37).
    assert zs["c"] < 0.85 * dom["dc"]
    assert zs["d"] < 0.85 * dom["dd"]
    assert zs["p"] < 0.85 * dom["dp"]
    # and both non-sort dims prune far better than the linear layout
    assert zs["d"] < 0.8 * ls["d"]
    assert zs["p"] < 0.8 * ls["p"]
