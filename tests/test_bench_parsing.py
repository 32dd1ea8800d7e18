"""Bench-wrapper parsing: the driver records BENCH_r{N}.json with a
front-TRUNCATED stdout tail (every round so far), and the salvage that
recovers per-query timings from it has regressed twice — r4 advice
found it could harvest summary-line scalars as fake timings, and the
r5 fix for that initially rejected the genuine front-truncation case
(the '"queries": {' marker itself cut off).  These tests pin both
behaviors plus the fullest-record ranking --isolate-top relies on.
"""

from __future__ import annotations

import json

from bench import _extract_bench, _prev_bench, _slowest_from_history


def test_extract_prefers_bare_then_parsed():
    rec = {"queries": {"q1": 1.0}, "value": 1.0}
    assert _extract_bench(rec)["queries"] == {"q1": 1.0}
    assert _extract_bench({"parsed": rec})["queries"] == {"q1": 1.0}


def test_extract_full_json_line_in_tail():
    line = json.dumps({"queries": {"q1": 2.5}, "value": 2.5, "sf": 0.1})
    assert _extract_bench({"tail": f"noise\n{line}"})["queries"] == {"q1": 2.5}


def test_extract_salvages_front_truncated_detail_line():
    # The r04 shape: the tail starts mid-queries-dict (the marker and
    # everything before it truncated away) and ends with the compact
    # summary line.  Salvage must recover the pairs left of the
    # '}, "sf":' boundary and nothing right of it.
    tail = (
        '_forecast": 0.614, "g_pagerank": 3.664, "g_kcore": 2.5}, "sf": 0.1, '
        '"excluded": {"x": "reason 42"}, "prev_round": 3, "prev_total": 228.2, '
        '"delta_vs_prev": {"g_pagerank": 0.36}}\n'
        '{"summary": true, "value": 188.7, "sf": 0.1, "n_queries": 198, '
        '"n_excluded": 1}'
    )
    rec = _extract_bench({"tail": tail})
    assert rec["queries"] == {"g_pagerank": 3.664, "g_kcore": 2.5}


def test_extract_rejects_summary_only_tail():
    # A tail truncated past the queries-dict boundary (only the compact
    # summary line survived) has nothing safe to salvage — summary
    # scalars like n_queries must NOT become fake timings.
    tail = (
        '{"summary": true, "metric": "headline_queries_total_runtime", '
        '"value": 188.7, "unit": "sec", "sf": 0.1, "n_queries": 198, '
        '"n_excluded": 1}'
    )
    assert _extract_bench({"tail": tail}) is None


def test_prev_bench_skips_off_sf_records(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"queries": {"q1": 9.0}, "value": 9.0, "sf": 0.01})
    )
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({"queries": {"q1": 1.0}, "value": 1.0, "sf": 0.1}) + "\n"
    )
    # sf-filtered lookup must skip the off-sf r01 wrapper and fall back
    # to the same-sf history record.
    label, rec = _prev_bench(str(tmp_path), sf=0.1)
    assert label == "local" and rec["queries"] == {"q1": 1.0}
    # unfiltered keeps round priority
    label, rec = _prev_bench(str(tmp_path))
    assert label == 1


def test_slowest_ranks_from_fullest_same_sf_record(tmp_path, monkeypatch):
    # A partial wrapper salvage (2 queries) must lose to the complete
    # same-sf history record when ranking the slowest queries.
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"queries": {"a": 1.0, "b": 0.5}, "value": 1.5, "sf": 0.1})
    )
    full = {f"q{i}": float(i) for i in range(10)}
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps({"queries": full, "value": 45.0, "sf": 0.1}) + "\n"
    )
    top = _slowest_from_history(str(tmp_path), 3)
    assert top == ["q9", "q8", "q7"]
