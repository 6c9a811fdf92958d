#!/usr/bin/env python
"""Per-job decomposition of one bench entry (guide §1: measure first).

Runs one bench.py entry (a drain or a query) with the Spark event log
enabled, then parses the event log and prints every Spark job with its
wall time, description and stage shape — the evidence for cutting
per-trigger job counts in the streaming stores.

Usage: python tools/job_audit.py stream_dedup_store_drain [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    entry = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    evdir = tempfile.mkdtemp(prefix="job_audit_ev_")

    from spark_kafka_streaming_spark import get_spark

    spark = get_spark(
        app_name=f"job_audit_{entry}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    import bench

    drains = {
        "stream_events_windowed_drain": bench.bench_streaming_drain,
        "stream_stateful_dedup_drain": bench.bench_stateful_dedup_drain,
        "stream_sketch_drain": bench.bench_sketch_drain,
        "stream_quantile_store_drain": bench.bench_quantile_store_drain,
        "stream_index_store_drain": bench.bench_index_store_drain,
        "stream_dedup_store_drain": bench.bench_dedup_store_drain,
        "stream_vector_store_drain": bench.bench_vector_store_drain,
    }
    if entry in drains:
        fn = drains[entry]
        fn(spark, sf_dir)  # warm
        marker = time.time() * 1000.0
        wall = fn(spark, sf_dir)
    else:
        bench.run_query(spark, entry, sf_dir)
        marker = time.time() * 1000.0
        wall = bench.run_query(spark, entry, sf_dir)
    spark.stop()
    time.sleep(1.0)

    logs = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if not f.startswith(".") and "appstatus" not in f:
                logs.append(os.path.join(root, f))
    jobs: dict[int, dict] = {}
    plans: dict[str, str] = {}
    stage_times: dict[int, tuple] = {}
    lines: list[str] = []
    for p in sorted(logs):
        with open(p) as f:
            lines.extend(f)
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k and k.endswith("SQLExecutionStart"):
                plans[str(ev.get("executionId"))] = " ".join(
                    ev.get("physicalPlanDescription", "").split("\n")
                )[:200]
            if k == "SparkListenerStageCompleted":
                si = ev.get("Stage Info", {})
                t0, t1 = si.get("Submission Time"), si.get("Completion Time")
                if t0 and t1:
                    stage_times[si["Stage ID"]] = (
                        (t1 - t0) / 1000.0,
                        si.get("Stage Name", "")[:70],
                        si.get("Number of Tasks", 0),
                    )
            if k == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "exec_id": props.get("spark.sql.execution.id"),
                    "t0": ev["Submission Time"],
                    "desc": (
                        props.get("callSite.short", "")
                        + " :: "
                        + " | ".join(
                            props.get("spark.job.description", "").split("\n")
                        )
                    )[:110],
                    "n_stages": len(ev.get("Stage Infos", [])),
                    "n_tasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                    "stage_ids": [
                        s.get("Stage ID") for s in ev.get("Stage Infos", [])
                    ],
                }
            elif k == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["t1"] = ev["Completion Time"]

    timed = [
        (jid, j)
        for jid, j in sorted(jobs.items())
        if j.get("t1") and j["t0"] >= marker
    ]
    total_job = sum(j["t1"] - j["t0"] for _, j in timed) / 1000.0
    print(f"\nENTRY {entry}: wall={wall:.2f}s  jobs_in_timed_run={len(timed)}"
          f"  sum_job_time={total_job:.2f}s")
    prev_end = None
    for jid, j in timed:
        plan = plans.get(j.get("exec_id") or "", "")
        gap = (j["t0"] - prev_end) / 1000.0 if prev_end is not None else 0.0
        if gap > 0.15:
            print(f"       --- driver gap {gap:6.3f}s ---")
        prev_end = max(prev_end or 0, j["t1"])
        dur = (j["t1"] - j["t0"]) / 1000.0
        print(
            f"  job {jid:4d}  {dur:7.3f}s  "
            f"stages={j['n_stages']:2d} tasks={j['n_tasks']:4d}  "
            f"ex={j.get('exec_id')}  PLAN: {plan[:130]}"
        )
        if dur > 0.4:
            for sid in j["stage_ids"]:
                st = stage_times.get(sid)
                if st:
                    print(
                        f"        stage {sid:4d}  {st[0]:7.3f}s  "
                        f"tasks={st[2]:3d}  {st[1]}"
                    )


if __name__ == "__main__":
    main()
