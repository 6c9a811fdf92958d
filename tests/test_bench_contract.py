"""Pin bench.py's stdout contract.

The verification driver records a fixed-size (2000-char) tail of bench
stdout and parses the final JSON line.  Rounds 3 and 4 silently broke
that contract: the single all-queries JSON line outgrew the tail as the
catalog grew (~3.2 KB at 106 entries), so BENCH_r03/r04 both recorded
``parsed: null``.  These tests pin the fix — the summary line's byte
length is bounded for the FULL current catalog plus growth headroom, so
adding bench entries can never un-parse the artifact again.

No Spark session needed: the summary builder is a pure function.
"""

from __future__ import annotations

import json

import bench


def _fake_timings(names) -> dict[str, float]:
    # worst-case float widths: 4 decimal places, 4 integer digits
    return {n: 9999.1234 for n in names}


def _all_entry_names() -> list[str]:
    return bench.BENCH_QUERIES + [
        "sig_table_build",
        "stream_events_windowed_drain",
        "stream_stateful_dedup_drain",
        "stream_sketch_drain",
        "stream_quantile_store_drain",
    ]


def test_summary_line_fits_driver_tail():
    timings = _fake_timings(_all_entry_names())
    line = json.dumps(bench.summary_payload(timings, 0.1))
    assert len(line.encode()) < bench.MAX_SUMMARY_BYTES


def test_summary_line_fits_with_catalog_growth():
    # 3x the current catalog with adversarially long names: the bound
    # must hold because the summary carries only SLOWEST_N entries.
    names = _all_entry_names()
    names = names + [f"q_future_round_entry_with_a_long_name_{i:03d}" for i in range(2 * len(names))]
    line = json.dumps(bench.summary_payload(_fake_timings(names), 0.1))
    assert len(line.encode()) < bench.MAX_SUMMARY_BYTES


def test_summary_payload_shape():
    timings = {"q_a": 1.5, "q_b": 2.25, "q_c": 0.25}
    p = bench.summary_payload(timings, 0.01)
    assert p["metric"] == "total_sec"
    assert p["unit"] == "sec"
    assert p["value"] == 4.0
    assert p["n_queries"] == 3
    assert p["sf"] == 0.01
    # slowest-first subset, deterministic tie-break by name
    assert list(p["queries"]) == ["q_b", "q_a", "q_c"]


def test_summary_keeps_only_slowest_n():
    timings = {f"q_{i:03d}": float(i) for i in range(50)}
    p = bench.summary_payload(timings, 0.1)
    assert len(p["queries"]) == bench.SLOWEST_N
    assert p["n_queries"] == 50
    # the N slowest by value
    assert set(p["queries"]) == {f"q_{i:03d}" for i in range(40, 50)}
