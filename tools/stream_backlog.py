#!/usr/bin/env python
"""Decade-scale backlog replay through the streaming maintenance
stores — the evidence the sf100 BATCH rows don't give: that the
incremental stores ingest a fourth-decade backlog as a real
Structured-Streaming file-stream in bounded triggers, with compactions
(and, for quantiles, watermark retention eviction) active, and come
out the other side with

* per-trigger wall FLAT across the run (non-compacting triggers),
* on-disk state BOUNDED (bytes + file counts recorded per trigger),
* the served snapshot still EQUAL to a batch rebuild over everything
  ingested (minus evicted groups, for the retention-policy store).

The replay is an actual ``readStream.parquet`` with
``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow`` over a staged
range-partitioned copy of the backlog (events ordered by ts so event
time advances monotonically and eviction is realistic; documents by
doc_id so arrival order is the id order the dedup greedy contract
assumes), driven through the stores' ``foreachBatch`` processors.

Snapshot-vs-batch checks per store:

* quantiles — ``IncrementalQuantileStore.quantiles()`` (after a final
  compact, eviction active) vs the batch
  ``bottomk_sample_grouped``/``quantile_estimates`` derivation over
  the rows inside the retention horizon: exact sorted-tuple equality.
* index — ``IncrementalIndexer.snapshot()`` vs a batch
  ``inverted_index(term_doc_tf(all_docs))``: row-count + order-free
  xxhash64 checksum equality.
* dedup — the accepted set vs an independent greedy replay of the
  batch :func:`minhash_lsh_pairs` pair list in arrival order (doc i
  rejected iff a verified pair (j < i) exists with j in the same
  trigger, or j accepted in an earlier trigger — the exact
  IncrementalDeduper contract).

Usage:
  python tools/stream_backlog.py --store quantiles --sf-dir /tmp/spark_graft_sf10 \
      --triggers 50 --compact-every 10
Prints one JSONL line per trigger to stderr and ONE summary JSON line
to stdout (per-trigger wall stats split compacting/non-compacting,
state size trajectory, snapshot equality verdict).
"""

from __future__ import annotations

import argparse
import bisect
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_kafka_streaming_spark import get_spark  # noqa: E402

HOUR_US = 3_600_000_000


def du(path: str) -> tuple[int, int]:
    total = files = 0
    for root, _, fs in os.walk(path):
        for f in fs:
            fp = os.path.join(root, f)
            try:
                total += os.path.getsize(fp)
            except OSError:
                continue
            files += 1
    return total, files


def stage(spark, sf_dir: str, store: str, triggers: int, work: str) -> str:
    """Range-partition the backlog into ``triggers`` parquet files and
    serialize their mtimes so the file stream replays them in order."""
    stage_dir = os.path.join(work, "staged")
    done = os.path.join(work, ".staged_ok")
    # The marker records WHAT was staged: a prior run with a different
    # trigger count or source dir must re-stage, or the file stream
    # silently replays the stale split (bit us live: a 50-trigger run
    # reused a 20-trigger staging and measured the wrong split).
    stamp = f"{sf_dir}\n{triggers}\n"
    if os.path.exists(done):
        try:
            if open(done).read() == stamp:
                return stage_dir
        except OSError:
            pass
    shutil.rmtree(stage_dir, ignore_errors=True)
    if os.path.exists(done):
        os.remove(done)
    if store == "quantiles":
        df = (
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            # the generator writes TIMESTAMP_NTZ; session TZ is UTC so
            # the cast is value-preserving and unix_micros applies
            .select(
                F.col("ts").cast("timestamp").alias("ts"),
                "event_id",
                "event_type",
                "value",
            )
            .repartitionByRange(triggers, "ts", "event_id")
        )
    elif store == "merge":
        # Absolute CDC feed derived from events: key = user_id, ~10 %
        # deletes, last-change-wins by a lexicographic (ts, event_id)
        # sequence string.  Staged in seq order so batch order is
        # consistent with the sequence — the global last-wins batch
        # twin is then exactly the stream's per-batch-last-wins fold.
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # Range guard (round-9 advice): Spark lpad TRUNCATES strings
        # longer than the pad width, and a '-' sign breaks zero-pad
        # lexicographic order — either would silently corrupt seq
        # uniqueness/ordering and with it the last-change-wins
        # equivalence argument.  Fail loudly instead.
        b = ev.agg(
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("mn"),
            F.max("event_id").alias("mx"),
        ).first()
        if b.mn is None or b.mn < 0 or b.mx is None or b.mx >= 10**12:
            raise ValueError(
                f"merge feed seq range violated: min(unix_micros)={b.mn} "
                f"(need >= 0), max(event_id)={b.mx} (need < 10^12) — "
                "lpad would truncate/misorder the lexicographic seq"
            )
        df = (
            ev
            .select(
                F.col("user_id").alias("k"),
                F.when(F.pmod("event_id", F.lit(10)) == 0, "D")
                .otherwise("U")
                .alias("op"),
                "event_type",
                "value",
                F.concat(
                    F.lpad(
                        F.unix_micros(F.col("ts").cast("timestamp"))
                        .cast("string"),
                        20,
                        "0",
                    ),
                    F.lpad(F.col("event_id").cast("string"), 12, "0"),
                ).alias("seq"),
            )
            .repartitionByRange(triggers, "seq")
        )
    elif store == "vectors":
        df = (
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .select("vec_id", "embedding")
            .repartitionByRange(triggers, "vec_id")
        )
    else:
        df = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text")
            .repartitionByRange(triggers, "doc_id")
        )
    df.write.mode("overwrite").parquet(stage_dir)
    parts = sorted(
        f for f in os.listdir(stage_dir) if f.startswith("part-")
    )
    t0 = time.time() - 10 * len(parts)
    for i, f in enumerate(parts):
        os.utime(os.path.join(stage_dir, f), (t0 + 10 * i, t0 + 10 * i))
    with open(done, "w") as fh:
        fh.write(stamp)
    return stage_dir


def make_processor(args, work: str):
    """(processor, store_obj, paths) for the chosen store."""
    if args.store == "quantiles":
        from spark_kafka_streaming_spark.streaming.incremental_quantiles import (
            IncrementalQuantileStore,
        )

        sp = os.path.join(work, "qstore")
        store = IncrementalQuantileStore(
            sp,
            "wg",
            "v",
            "ek",
            k=args.k,
            compact_every=args.compact_every,
            event_time_sql=(
                "CAST(CAST(split(g, '\\\\|')[0] AS BIGINT) * 3600 "
                "AS TIMESTAMP)"
            ),
            retention=args.retention,
        )

        def proc(batch, bid):
            keyed = batch.select(
                F.concat(
                    (F.floor(F.unix_micros("ts") / HOUR_US))
                    .cast("long")
                    .cast("string"),
                    F.lit("|"),
                    F.col("event_type"),
                ).alias("wg"),
                F.col("value").alias("v"),
                F.col("event_id").alias("ek"),
            )
            store(keyed, bid)

        return proc, store, {"store": sp}
    if args.store == "index":
        from spark_kafka_streaming_spark.streaming.incremental_index import (
            IncrementalIndexer,
        )

        sp = os.path.join(work, "ixstore")
        store = IncrementalIndexer(sp, compact_every=args.compact_every)
        return store, store, {"store": sp}
    if args.store == "dedup":
        from spark_kafka_streaming_spark.streaming.incremental_dedup import (
            IncrementalDeduper,
        )

        sp = os.path.join(work, "sigstore")
        ap = os.path.join(work, "accepted")
        store = IncrementalDeduper(
            sp, ap, jaccard_threshold=0.5, compact_every=args.compact_every
        )
        return store, store, {"store": sp, "accepted": ap}
    if args.store == "merge":
        from spark_kafka_streaming_spark.streaming.incremental_merge import (
            IncrementalMerger,
        )

        sp = os.path.join(work, "mstore")
        store = IncrementalMerger(
            sp,
            key_col="k",
            n_key_buckets=args.key_buckets,
            seq_col="seq",
        )
        return store, store, {"store": sp}
    if args.store == "spans":
        from spark_kafka_streaming_spark.streaming.incremental_spans import (
            IncrementalSpanDeduper,
        )

        sp = os.path.join(work, "spstore")
        store = IncrementalSpanDeduper(
            sp, w=5, compact_every=args.compact_every
        )
        return store, store, {"store": sp}
    if args.store == "vectors":
        from spark_kafka_streaming_spark.streaming.incremental_vectors import (
            IncrementalVectorIndexer,
        )

        sp = os.path.join(work, "vstore")
        store = IncrementalVectorIndexer(
            sp,
            n_cells=args.n_cells,
            n_assign=2,
            compact_every=args.compact_every,
        )
        return store, store, {"store": sp}
    raise SystemExit(f"unknown store {args.store!r}")


def check_quantiles(spark, store, stage_dir: str) -> dict:
    """Final compact (eviction active) then exact-tuple equality vs the
    batch derivation over the rows inside the retention horizon."""
    from spark_kafka_streaming_spark.operators.quantiles import (
        bottomk_sample_grouped,
        quantile_estimates,
    )

    store.compact(spark)
    got = sorted(tuple(r) for r in store.quantiles(spark).collect())
    keyed = spark.read.parquet(stage_dir).select(
        F.concat(
            (F.floor(F.unix_micros("ts") / HOUR_US)).cast("long").cast("string"),
            F.lit("|"),
            F.col("event_type"),
        ).alias("wg"),
        F.col("value").alias("v"),
        F.col("event_id").alias("ek"),
        (F.floor(F.unix_micros("ts") / HOUR_US)).cast("long").alias("hr"),
    )
    ret_hours = int(store.retention.split()[0])
    max_hr = keyed.agg(F.max("hr")).collect()[0][0]
    live = keyed.filter(F.col("hr") >= max_hr - ret_hours)
    want = sorted(
        tuple(r)
        for r in quantile_estimates(
            bottomk_sample_grouped(live, "wg", "v", "ek", store.k),
            grouped=True,
        ).collect()
    )
    return {
        "snapshot_rows": len(got),
        "match": got == want,
        "live_horizon_hr": int(max_hr - ret_hours),
    }


def _checksum(df) -> tuple[int, int]:
    cols = sorted(df.columns)
    row = (
        df.select(
            F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in cols])))
            .cast("decimal(38,0)")
            .alias("h")
        )
        .agg(F.count("*").alias("n"), F.sum("h").alias("s"))
        .collect()[0]
    )
    return int(row["n"]), int(row["s"] or 0)


def check_index(spark, store, stage_dir: str) -> dict:
    from spark_kafka_streaming_spark.operators import index as IX

    snap = store.snapshot(spark)
    docs = spark.read.parquet(stage_dir)
    want = IX.inverted_index(IX.term_doc_tf(docs))
    n1, s1 = _checksum(snap)
    n2, s2 = _checksum(want)
    return {"snapshot_rows": n1, "batch_rows": n2, "match": (n1, s1) == (n2, s2)}


def check_dedup(spark, store, stage_dir: str, accepted_path: str) -> dict:
    """Independent greedy replay of the batch pair list in arrival
    order — the exact IncrementalDeduper accept/reject contract."""
    from spark_kafka_streaming_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(stage_dir)
    pairs = (
        minhash_lsh_pairs(docs, jaccard_threshold=store.threshold)
        .select("id1", "id2")
        .collect()
    )
    # trigger boundaries: per staged file's (min, max) doc_id —
    # disjoint ranges by construction (repartitionByRange)
    bounds = sorted(
        (r["mn"], r["mx"])
        for r in docs.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .collect()
    )
    starts = [b[0] for b in bounds]

    def trig(doc: int) -> int:
        return bisect.bisect_right(starts, doc) - 1

    partners: dict[int, list[int]] = {}
    for p in pairs:
        partners.setdefault(int(p["id2"]), []).append(int(p["id1"]))
    all_ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    accepted: set[int] = set()
    for i in all_ids:
        ti = trig(i)
        dup = any(
            trig(j) == ti or j in accepted for j in partners.get(i, ())
        )
        if not dup:
            accepted.add(i)
    got = {
        r["doc_id"]
        for r in spark.read.parquet(accepted_path).select("doc_id").collect()
    }
    return {
        "accepted_stream": len(got),
        "accepted_greedy": len(accepted),
        "n_pairs": len(pairs),
        "match": got == accepted,
    }


def check_merge(spark, store, stage_dir: str) -> dict:
    """Global last-change-wins fold of the staged CDC feed (by the
    same (seq desc, op desc) order the store applies per batch; the
    staging ranges by seq, so batch order agrees with seq order and
    the global fold IS the stream contract)."""
    from pyspark.sql import Window

    feed = spark.read.parquet(stage_dir)
    last = (
        feed.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("k").orderBy(F.desc("seq"), F.desc("op"))
            ),
        )
        .filter(F.col("_rn") == 1)
    )
    want = last.filter(F.col("op") == "U").select("k", "event_type", "value")
    snap = store.snapshot(spark)
    if snap is None:  # empty/missing store: report, don't traceback
        return {"match": False, "empty_store": True}
    got = snap.select("k", "event_type", "value")
    n1, s1 = _checksum(got)
    n2, s2 = _checksum(want)
    return {
        "snapshot_rows": n1,
        "batch_rows": n2,
        "match": (n1, s1) == (n2, s2),
    }


def check_spans(spark, store, stage_dir: str) -> dict:
    """Served span accounting over everything ingested vs the one-shot
    batch operator (count + order-free checksum, like the index)."""
    from spark_kafka_streaming_spark.operators.dedup import (
        substring_span_stats,
    )

    docs = spark.read.parquet(stage_dir)
    got = store.span_stats(docs)
    if got is None:  # empty/missing store: report, don't traceback
        return {"match": False, "empty_store": True}
    want = substring_span_stats(docs, w=store.w)
    n1, s1 = _checksum(got)
    n2, s2 = _checksum(want)
    return {
        "snapshot_rows": n1,
        "batch_rows": n2,
        "match": (n1, s1) == (n2, s2),
    }


def check_vectors(spark, store, stage_dir: str) -> dict:
    """Store-served ANN vs batch ivf_topk over everything ingested,
    same pinned centroid snapshot — exact tuple equality on a bounded
    query sample."""
    from spark_kafka_streaming_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(stage_dir)
    queries = emb.filter(F.pmod(F.col("vec_id"), F.lit(997)) == 0)
    served = store.topk(queries, k=5, n_probe=4)
    cents = store.centroids(spark)
    if served is None or cents is None:  # empty/missing store
        return {"match": False, "empty_store": True}
    got = sorted(map(tuple, served.collect()))
    want = sorted(
        map(
            tuple,
            ivf_topk(
                queries,
                emb,
                k=5,
                n_probe=4,
                n_assign=2,
                centroids=cents,
            ).collect(),
        )
    )
    return {
        "query_rows": len(got),
        "batch_rows": len(want),
        "match": got == want,
    }


ALL_STORES = ("quantiles", "index", "dedup", "merge", "spans", "vectors")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True,
                    choices=ALL_STORES + ("all",))
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf10")
    ap.add_argument("--triggers", type=int, default=50)
    ap.add_argument("--compact-every", type=int, default=10)
    ap.add_argument("--retention", default="120 HOURS")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--key-buckets", type=int, default=32,
                    help="merge store: snapshot key buckets")
    ap.add_argument("--n-cells", type=int, default=448,
                    help="vectors store: IVF cell count (~sqrt(n))")
    ap.add_argument("--work", default=None)
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the snapshot-vs-batch equality stage")
    args = ap.parse_args()
    if args.store == "all":
        run_all(args)
        return
    spark = get_spark(app_name=f"stream_backlog_{args.store}")
    print(json.dumps(run_store(spark, args, args.store)))


def run_all(args) -> None:
    """Concurrent multi-store soak (round-11 verdict #5): production
    runs all six maintenance loops on shared resources; every
    fourth-decade replay ran one store in isolation.  Drive all six
    stores' backlog feeds CONCURRENTLY on one SparkSession (six
    streaming queries sharing the executor pool), assert each store's
    snapshot ≡ batch at the end, and report per-store wall stats for
    the interference profile (compare against the isolated runs'
    numbers in SCALE.md)."""
    import copy
    import threading

    spark = get_spark(app_name="stream_backlog_all")
    # stage every feed up front (idempotent) so staging I/O doesn't
    # pollute the interference window
    for name in ALL_STORES:
        ns = copy.copy(args)
        ns.store = name
        ns.work = os.path.join(args.work, name) if args.work else None
        stage(spark, args.sf_dir, name, args.triggers,
              _work_dir(ns, name, fresh=True))
    barrier = threading.Barrier(len(ALL_STORES))
    results: dict[str, dict] = {}
    errors: list[BaseException] = []

    def drive(name: str) -> None:
        ns = copy.copy(args)
        ns.store = name
        ns.work = os.path.join(args.work, name) if args.work else None
        try:
            results[name] = run_store(spark, ns, name, barrier=barrier)
        except BaseException as e:  # noqa: BLE001 — reported below
            errors.append(e)
            try:
                barrier.abort()
            except Exception:
                pass

    threads = [
        threading.Thread(target=drive, args=(n,), daemon=True)
        for n in ALL_STORES
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    print(json.dumps({
        "mode": "all",
        "sf_dir": args.sf_dir,
        "triggers": args.triggers,
        "total_wall_s": round(time.perf_counter() - t0, 1),
        "all_match": all(
            r["check"].get("match", r["check"].get("skipped", False))
            for r in results.values()
        ),
        "stores": results,
    }))


def _work_dir(args, store_name: str, fresh: bool = False) -> str:
    work = args.work or (
        f"/tmp/spark_graft_stream_{store_name}_"
        f"{os.path.basename(args.sf_dir.rstrip('/'))}"
    )
    if fresh:
        for sub in ("qstore", "ixstore", "sigstore", "accepted", "ck",
                    "mstore", "spstore", "vstore"):
            shutil.rmtree(os.path.join(work, sub), ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    return work


def run_store(spark, args, store_name: str, barrier=None) -> dict:
    """Stage, ingest, and verify one store; returns the summary dict.
    With ``barrier``, waits for the other soak threads between ingest
    and the equality check so checks never pollute another store's
    per-trigger walls."""
    work = _work_dir(args, store_name, fresh=barrier is None)
    stage_dir = stage(spark, args.sf_dir, store_name, args.triggers, work)
    proc, store, paths = make_processor(args, work)

    records: list[dict] = []

    from watchdog import StallWatchdog

    def timed(batch, bid):
        t0 = time.perf_counter()
        # stall guard (round-11, verdict minor #4): this is the
        # multi-hour replay harness where the round-9 read-ahead
        # deadlock class actually bites — a hung trigger dumps
        # jstack + py stacks every SPARK_GRAFT_STALL_TIMEOUT seconds
        # instead of parking the run silently.
        with StallWatchdog(f"{store_name}_trigger_{bid}"):
            proc(batch, bid)
        wall = time.perf_counter() - t0
        size, files = du(paths["store"])
        rec = {
            "trigger": int(bid),
            "wall_s": round(wall, 3),
            "compacted": bool(
                args.compact_every
                and bid > 0
                and bid % args.compact_every == 0
            ),
            "store_bytes": size,
            "store_files": files,
        }
        rec["store"] = store_name
        records.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)

    schema = spark.read.parquet(stage_dir).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
        .writeStream.foreachBatch(timed)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if barrier is not None:
        # soak mode: wait for the other stores' ingest to finish so
        # the equality checks never pollute another store's walls
        barrier.wait(timeout=7200)

    check: dict = {"skipped": True}
    if not args.skip_check:
        t0 = time.perf_counter()
        with StallWatchdog(f"{store_name}_final_check"):
            if store_name == "quantiles":
                check = check_quantiles(spark, store, stage_dir)
            elif store_name == "index":
                check = check_index(spark, store, stage_dir)
            elif store_name == "merge":
                check = check_merge(spark, store, stage_dir)
            elif store_name == "spans":
                check = check_spans(spark, store, stage_dir)
            elif store_name == "vectors":
                check = check_vectors(spark, store, stage_dir)
            else:
                check = check_dedup(
                    spark, store, stage_dir, paths["accepted"]
                )
        check["check_wall_s"] = round(time.perf_counter() - t0, 1)

    plain = sorted(r["wall_s"] for r in records if not r["compacted"])
    comp = sorted(r["wall_s"] for r in records if r["compacted"])

    def stats(xs):
        if not xs:
            return None
        return {
            "n": len(xs),
            "min": xs[0],
            "median": xs[len(xs) // 2],
            "p90": xs[int(len(xs) * 0.9)] if len(xs) > 1 else xs[-1],
            "max": xs[-1],
            "first5_mean": round(sum(xs[:5]) / min(5, len(xs)), 3),
        }

    # flatness: mean of the last 5 plain triggers over the first 5 (in
    # ARRIVAL order, not sorted)
    arr = [r["wall_s"] for r in records if not r["compacted"]]
    flat = (
        round(sum(arr[-5:]) / 5 / (sum(arr[:5]) / 5), 2)
        if len(arr) >= 10
        else None
    )
    return {
        "store": store_name,
        "sf_dir": args.sf_dir,
        "triggers": args.triggers,
        "compact_every": args.compact_every,
        "retention": args.retention if store_name == "quantiles" else None,
        "plain_wall": stats(plain),
        "compact_wall": stats(comp),
        "last5_over_first5": flat,
        "store_bytes_final": records[-1]["store_bytes"],
        "store_files_final": records[-1]["store_files"],
        "store_bytes_peak": max(r["store_bytes"] for r in records),
        "check": check,
    }


if __name__ == "__main__":
    main()
