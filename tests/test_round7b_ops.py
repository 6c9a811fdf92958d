"""Round-7 second-wave pins: the mergeable bottom-k quantile sketch
(operators/quantiles.py) and its streaming store
(streaming/incremental_quantiles.py).

What these pin beyond the differential oracle gate (which already
hash-checks both catalog queries against DuckDB):

* the MERGE property the whole design stands on — bottom-k of a union
  equals the bottom-k of unioned per-part bottom-k cuts — on real
  splits of real data, global and grouped;
* the per-task mapInPandas reduction is a true superset (never drops a
  global-bottom-k row) regardless of partitioning;
* estimation QUALITY: every audit row's ``ok`` is True at test scale
  (the O(1/√k) bound holds, not just deterministically replays);
* stream ≡ batch for the quantile store, including after compaction;
* the global sample compiles to TakeOrderedAndProject (no full-shuffle
  sort of the data).
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_kafka_streaming_spark.operators.quantiles import (
    bottomk_sample,
    bottomk_sample_grouped,
    quantile_estimates,
    quantiles_with_audit,
)


def _li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


KEY = "l_orderkey * 8 + l_linenumber"


def test_bottomk_merge_property_global(spark, sf_dir):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B))."""
    li = _li(spark, sf_dir)
    a = li.filter("l_orderkey % 2 = 0")
    b = li.filter("l_orderkey % 2 = 1")
    k = 64
    direct = bottomk_sample(li, "l_extendedprice", KEY, k)
    merged = bottomk_sample(
        bottomk_sample(a, "l_extendedprice", KEY, k).unionAll(
            bottomk_sample(b, "l_extendedprice", KEY, k)
        ),
        "v",
        "ky",
        k,
    )
    want = sorted(tuple(r) for r in direct.collect())
    got = sorted(tuple(r) for r in merged.collect())
    assert want == got and len(want) == k


def test_bottomk_grouped_matches_bruteforce(spark, sf_dir):
    """The mapInPandas per-task reduction + window cut equals the
    brute-force per-group smallest-(h, ky), on an adversarial
    partitioning (every group present in every partition)."""
    docs = _docs(spark, sf_dir).repartition(8)  # scatter groups
    k = 16
    got = {
        (r["g"], r["ky"]): r["v"]
        for r in bottomk_sample_grouped(docs, "lang", "n_chars", "doc_id", k).collect()
    }
    brute = docs.selectExpr(
        "lang AS g",
        "CAST(n_chars AS DOUBLE) AS v",
        "doc_id AS ky",
        "(CAST(CONV(SUBSTRING(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)) AS h",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("h", "ky")
    want = {
        (r["g"], r["ky"]): r["v"]
        for r in brute.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    }
    assert got == want and len(want) > 0


def test_quantile_audit_ok_everywhere(spark, sf_dir):
    """The in-band O(1/√k) rank bound actually holds on the test
    corpus — quality, not just determinism."""
    rows = quantiles_with_audit(_li(spark, sf_dir), "l_extendedprice", KEY).collect()
    assert len(rows) == 7
    assert all(r["ok"] for r in rows)
    # estimates are monotone in q (sample ranks are)
    ests = [r["est"] for r in sorted(rows, key=lambda r: r["q"])]
    assert ests == sorted(ests)

    grows = quantiles_with_audit(
        _docs(spark, sf_dir), "n_chars", "doc_id", k=256, group_col="lang"
    ).collect()
    assert all(r["ok"] for r in grows)
    langs = {r["g"] for r in grows}
    assert all(
        sum(1 for r in grows if r["g"] == g) == 7 for g in langs
    )


def test_global_sample_plan_is_take_ordered(spark, sf_dir):
    """No full-shuffle sort: orderBy().limit() must compile to
    TakeOrderedAndProject (each task emits ≤ k rows)."""
    plan = (
        bottomk_sample(_li(spark, sf_dir), "l_extendedprice", KEY, 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_incremental_quantile_store_equals_batch(spark, sf_dir, tmp_path):
    """Stream ≡ batch for the 6th maintenance loop: the per-batch
    bottom-k leaves, re-cut and run through the SAME
    quantile_estimates derivation, reproduce the one-shot batch
    answer — including after compaction."""
    from spark_kafka_streaming_spark.streaming.incremental_quantiles import (
        IncrementalQuantileStore,
    )

    docs = [
        {"doc_id": r["doc_id"], "lang": r["lang"], "n_chars": r["n_chars"]}
        for r in _docs(spark, sf_dir)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .collect()
    ]
    src = tmp_path / "docs"
    src.mkdir()
    third = max(1, len(docs) // 3)
    for i in range(3):
        chunk = docs[i * third :] if i == 2 else docs[i * third : (i + 1) * third]
        (src / f"b{i}.json").write_text("\n".join(json.dumps(r) for r in chunk))

    store = IncrementalQuantileStore(
        str(tmp_path / "q_store"), "lang", "n_chars", "doc_id", k=32
    )
    stream = (
        spark.readStream.schema("doc_id BIGINT, lang STRING, n_chars BIGINT")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(store)
        .option("checkpointLocation", str(tmp_path / "ck_q"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_df = spark.createDataFrame(
        docs, "doc_id BIGINT, lang STRING, n_chars BIGINT"
    )
    want = sorted(
        tuple(r)
        for r in quantile_estimates(
            bottomk_sample_grouped(batch_df, "lang", "n_chars", "doc_id", 32),
            grouped=True,
        ).collect()
    )
    got = sorted(tuple(r) for r in store.quantiles(spark).collect())
    assert got == want and len(want) > 0

    store.compact(spark)
    after = sorted(tuple(r) for r in store.quantiles(spark).collect())
    assert after == want


def test_quantile_store_empty(spark, tmp_path):
    from spark_kafka_streaming_spark.streaming.incremental_quantiles import (
        IncrementalQuantileStore,
    )

    store = IncrementalQuantileStore(
        str(tmp_path / "nope"), "lang", "n_chars", "doc_id"
    )
    assert store.quantiles(spark) is None
    assert store.sample(spark) is None


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=20),
)
def test_bottomk_matches_pure_python_model(spark, vals, k):
    """The sketch equals an INDEPENDENT pure-Python replay (hashlib
    md5 60-bit prefix, sort by (h, key), take k) on arbitrary values —
    pins both the hash portability and the cut semantics against a
    second implementation that shares no code with the engine."""
    import hashlib

    rows = [(float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "val double, rid bigint")
    got = sorted(
        (r["v"], r["ky"]) for r in bottomk_sample(df, "val", "rid", k).collect()
    )

    def prio(key: int) -> int:
        return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)

    want = sorted(
        (v, key)
        for v, key in sorted(rows, key=lambda r: (prio(r[1]), r[1]))[:k]
    )
    assert got == want


def test_bottomk_smaller_than_population_handled(spark, sf_dir):
    """k ≥ population: the sample is the whole group and estimates are
    exact order statistics (m = group size)."""
    docs = _docs(spark, sf_dir).limit(3)
    out = quantiles_with_audit(
        docs, "n_chars", "doc_id", k=1000, group_col="lang"
    ).collect()
    assert all(r["ok"] for r in out)
    assert all(r["rank_err"] <= 1.0 / max(1, r["m"]) + 1e-12 for r in out)


def test_grouped_mg_superset_guarantee(spark, sf_dir):
    """Per-group no-false-negative guarantee under adversarial
    partitioning and a tiny capacity: every true per-group phi-heavy
    hitter appears in the grouped candidate superset."""
    from spark_kafka_streaming_spark.functions import texthash as TH
    from spark_kafka_streaming_spark.operators.sketches import (
        misra_gries_candidates_grouped,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)
    toks = docs.selectExpr(
        "lang", f"explode({TH.spark_tokens('text')}) AS token"
    )
    capacity = 39  # phi = 1/(capacity+1) = 0.025 (fixture max ~0.039)
    cands = {
        (r["lang"], r["token"])
        for r in misra_gries_candidates_grouped(
            toks, "lang", "token", capacity
        ).collect()
    }
    exact = toks.groupBy("lang", "token").count()
    totals = toks.groupBy("lang").count().withColumnRenamed("count", "n_g")
    heavy = {
        (r["lang"], r["token"])
        for r in exact.join(totals, "lang")
        .filter(F.col("count") > F.col("n_g") / (capacity + 1))
        .collect()
    }
    assert heavy, "fixture should contain per-group heavy items"
    assert heavy <= cands


def test_grouped_heavy_hitters_equals_full_groupby(spark, sf_dir):
    """The two-pass grouped result is identical to the full groupBy
    answer at a capacity far below the distinct-token count."""
    from spark_kafka_streaming_spark.functions import texthash as TH
    from spark_kafka_streaming_spark.operators.sketches import (
        heavy_hitters_exact_grouped,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)
    toks = docs.selectExpr(
        "lang", f"explode({TH.spark_tokens('text')}) AS token"
    )
    phi = 0.03
    got = sorted(
        tuple(r)
        for r in heavy_hitters_exact_grouped(
            toks, "lang", "token", phi=phi, capacity=40
        ).collect()
    )
    exact = toks.groupBy("lang", "token").agg(F.count("*").alias("cnt"))
    totals = exact.groupBy("lang").agg(F.sum("cnt").alias("n_group"))
    want = sorted(
        tuple(r)
        for r in exact.join(totals, "lang")
        .filter(F.col("cnt") >= F.ceil(F.lit(phi) * F.col("n_group")))
        .select(
            "lang",
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("n_group"), 6).alias("frac"),
        )
        .collect()
    )
    assert got == want and len(want) > 0


def test_windowed_quantile_store_equals_batch_query(spark, sf_dir, tmp_path):
    """The q_quantile_windowed_hourly doc claims the same bottom-k
    state serves the streaming form with the window key as group_col —
    prove it: an IncrementalQuantileStore keyed on the (epoch-hour |
    type) composite, fed the events in three micro-batches, serves
    estimates identical to the batch windowed query's estimate leg."""
    import json as _json

    from spark_kafka_streaming_spark.streaming.incremental_quantiles import (
        IncrementalQuantileStore,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_id",
            "concat(CAST(CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / "
            "3600000000) AS BIGINT) AS STRING), '|', event_type) AS wg",
            "value",
        )
        .orderBy("event_id")
    )
    rows = [r.asDict() for r in ev.collect()]
    src = tmp_path / "ev"
    src.mkdir()
    third = max(1, len(rows) // 3)
    for i in range(3):
        chunk = rows[i * third :] if i == 2 else rows[i * third : (i + 1) * third]
        (src / f"b{i}.json").write_text(
            "\n".join(_json.dumps(r) for r in chunk)
        )

    store = IncrementalQuantileStore(
        str(tmp_path / "wq_store"), "wg", "value", "event_id", k=64
    )
    q = (
        spark.readStream.schema("event_id BIGINT, wg STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.foreachBatch(store)
        .option("checkpointLocation", str(tmp_path / "ck_wq"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_df = spark.createDataFrame(
        rows, "event_id BIGINT, wg STRING, value DOUBLE"
    )
    want = sorted(
        tuple(r)
        for r in quantile_estimates(
            bottomk_sample_grouped(batch_df, "wg", "value", "event_id", 64),
            grouped=True,
        ).collect()
    )
    got = sorted(tuple(r) for r in store.quantiles(spark).collect())
    assert got == want and len(want) > 0


def test_kmeans_arrow_assignment_parity(spark, sf_dir):
    """The Arrow int64-matmul assignment is bit-identical to the
    broadcast-join form (and transitively the literal form): same
    exact distances, same (dist, cid) tie-break — on a real corpus at
    a k in the arrow regime."""
    from spark_kafka_streaming_spark.operators.kmeans import (
        assign_clusters_arrow,
        assign_clusters_join,
        initial_centroids,
        scaled_vectors,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sv = scaled_vectors(emb)
    k = min(80, emb.count())
    cents = initial_centroids(sv, k)
    want = sorted(
        (r["vec_id"], r["cluster"], r["dist2"])
        for r in assign_clusters_join(sv, cents).collect()
    )
    got = sorted(
        (r["vec_id"], r["cluster"], r["dist2"])
        for r in assign_clusters_arrow(sv, cents).collect()
    )
    assert got == want and len(want) > 0


def test_semantic_drops_arrow_equals_sql(spark, sf_dir):
    """The per-cluster matmul drop stage equals the SQL
    bounded_self_pairs drop stage (same exact cosines, same greedy
    keep-lowest-id rule) — and the full semantic_dedup result is
    identical through either route at a k in the arrow regime."""
    from pyspark.sql import functions as SF

    from spark_kafka_streaming_spark.functions import vectors as V
    from spark_kafka_streaming_spark.functions.caching import track_persist
    from spark_kafka_streaming_spark.operators.kmeans import (
        _semantic_drops_arrow,
        kmeans_assignments,
    )
    from spark_kafka_streaming_spark.operators.skew import bounded_self_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = min(80, emb.count())
    tau = 0.45
    a = kmeans_assignments(emb, k=k, iters=1)
    a = track_persist(a.select(SF.col("vec_id").alias("id"), "cluster", "v", "n"))
    sim = SF.expr(V.spark_cosine(V.spark_dot("l.v", "r.v"), "l.n", "r.n"))
    want = sorted(
        r["id"]
        for r in bounded_self_pairs(
            a,
            key_cols=["cluster"],
            id_col="id",
            select_cols=lambda: [SF.col("r.id").alias("id"), sim.alias("_sim")],
            cap=256,
        )
        .where(SF.col("_sim") >= SF.lit(tau))
        .select("id")
        .distinct()
        .collect()
    )
    got = sorted(
        r["id"] for r in _semantic_drops_arrow(a, tau).distinct().collect()
    )
    assert got == want
