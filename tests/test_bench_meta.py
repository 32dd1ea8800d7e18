"""The bench's eval-tier contract (VERDICT r8 ask #4): the only
queries the bench may skip are the declared EVAL_TIER truth baselines,
and each of those must delegate its perf tracking to benched registry
counterparts — so the exclusion is code, not a JSON note."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_eval_tier_contract():
    from bench import BENCH_QUERIES, EVAL_TIER
    from kp_crypto_market_analytics_spark.queries import ORACLES, QUERIES

    benched = set(BENCH_QUERIES)
    for name, spec in EVAL_TIER.items():
        # the eval-tier query exists, is correctness-gated, and is the
        # only thing its tier removes from the bench
        assert name in QUERIES and name in ORACLES, name
        assert name not in benched, name
        assert spec["reason"], name
        # every counterpart exists AND is actually benched
        counterparts = spec["benched_counterparts"]
        assert counterparts, name
        for c in counterparts:
            assert c in QUERIES and c in ORACLES, (name, c)
            assert c in benched, (name, c)


def test_bench_set_is_registry_minus_eval_tier():
    from bench import BENCH_QUERIES, EVAL_TIER
    from kp_crypto_market_analytics_spark.queries import QUERIES

    assert set(BENCH_QUERIES) == set(QUERIES) - set(EVAL_TIER)
    # no silent shrinkage: the tier stays a short, named list
    assert len(EVAL_TIER) <= 3


def test_sampled_jaccard_is_a_real_subsample():
    # the counterpart must run the SAME uncapped exact plan, only on
    # fewer docs — guard the subsample predicate's modulus so a future
    # edit can't quietly shrink the family's tracked number to nothing
    from kp_crypto_market_analytics_spark.queries_r9 import _JSAMP_MOD

    assert 2 <= _JSAMP_MOD <= 8


def test_budget_notes_cover_over_threshold_queries():
    """VERDICT r9 ask #7: every query whose min-of-N cost exceeds
    BUDGET_SEC in the newest min-of-2 sf0.1 sweep must carry an
    adjudicated build-cost note — bench weight is a decision, not an
    accretion.  Notes for queries no longer over budget are allowed
    (costs fluctuate) but must still name real registry queries."""
    import json
    import os

    from bench import BUDGET_SEC, BUILD_COST_NOTES
    from kp_crypto_market_analytics_spark.queries import QUERIES

    assert BUDGET_SEC >= 1.0
    for name, note in BUILD_COST_NOTES.items():
        assert name in QUERIES, name
        assert isinstance(note, str) and len(note) >= 20, name

    hist = os.path.join(os.path.dirname(__file__), "..", "BENCH_HISTORY.jsonl")
    newest = None
    with open(hist) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            if rec.get("repeat", 1) >= 2 and rec.get("sf") == 0.1:
                newest = rec
    assert newest is not None, "no min-of-2 sf0.1 sweep in history"
    over = {
        n for n, sec in newest["queries"].items() if sec > BUDGET_SEC
    }
    unnoted = over - set(BUILD_COST_NOTES)
    assert not unnoted, (
        f"over-budget queries without a build-cost note: {sorted(unnoted)}"
    )


def test_drift_canary_is_cheap_and_stable():
    """The canary must be a fixed set of benched, oracle-gated, CHEAP
    queries — an expensive canary would itself perturb the measurement
    it makes."""
    import json
    import os

    from bench import BENCH_QUERIES, DRIFT_CANARY, DRIFT_GATE, DRIFT_GATE_LOW
    from kp_crypto_market_analytics_spark.queries import ORACLES

    assert len(DRIFT_CANARY) == 10
    assert len(set(DRIFT_CANARY)) == 10
    assert 1.0 < DRIFT_GATE <= 1.25
    # Two-sided (VERDICT r10 ask #2): a ratio far below 1.0 is a
    # warmup measurement wearing a drift label, not a pass.
    assert 0.5 <= DRIFT_GATE_LOW < 1.0
    benched = set(BENCH_QUERIES)
    for name in DRIFT_CANARY:
        assert name in benched and name in ORACLES, name

    hist = os.path.join(os.path.dirname(__file__), "..", "BENCH_HISTORY.jsonl")
    newest = None
    with open(hist) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            if rec.get("repeat", 1) >= 2 and rec.get("sf") == 0.1:
                newest = rec
    if newest:
        canary_cost = sum(
            newest["queries"].get(n, 0.0) for n in DRIFT_CANARY
        )
        assert canary_cost < 10.0, canary_cost


def test_drift_gate_is_two_sided():
    """VERDICT r10 ask #2: the driver's r10 cold pass shipped ratio
    0.4514 with drift_ok true — a warmup measurement wearing a drift
    label.  The gate must fail BOTH sides with a named reason."""
    from bench import drift_verdict

    ok, reason = drift_verdict(0.4514)
    assert not ok and "warm" in reason
    ok, reason = drift_verdict(1.25)
    assert not ok and "aged" in reason
    ok, reason = drift_verdict(None)
    assert not ok and reason
    for ratio in (0.85, 0.93, 1.0, 1.09):
        ok, reason = drift_verdict(ratio)
        assert ok and reason is None, ratio


def test_median_canary_sample_rejects_single_spike():
    """VERDICT r11 ask #6: one sandbox throughput spike (or one
    anomalously fast pass) must not set the drift ratio — the endpoint
    estimator is the median-total pass of 3.  An actually-aged session
    moves EVERY pass, so the gate still trips (extended from the
    two-sided-gate test)."""
    from bench import drift_verdict, median_canary_sample

    quiet = {"q1": 1.0, "q2": 2.0}          # total 3.0
    spiked = {"q1": 4.0, "q2": 6.0}         # a 2-7x sandbox window
    fast = {"q1": 0.8, "q2": 1.6}
    # start endpoint: spike in one of three passes -> median is quiet
    sample, totals = median_canary_sample([quiet, spiked, quiet])
    assert sample == quiet and totals == [3.0, 10.0, 3.0]
    sample, _ = median_canary_sample([fast, quiet, spiked])
    assert sample == quiet
    # an aged session moves every pass: median reflects it, gate trips
    aged = [{"q1": 2.0, "q2": 3.0}] * 3
    end, _ = median_canary_sample(aged)
    ratio = sum(end.values()) / sum(quiet.values())
    ok, reason = drift_verdict(ratio)
    assert not ok and "aged" in reason


def test_extract_reads_compact_per_query_line():
    """VERDICT r11 ask #2: the driver's PERF parser got n_common=0 two
    rounds running because only the huge detail line carried timings.
    The compact {"per_query": {...}} line printed before the summary
    must be recognized as a timings source."""
    import json

    from bench import _extract_bench

    tail = (
        '{"per_query":{"q_a":1.25,"q_b":0.5}}\n'
        '{"summary": true, "value": 1.75, "sf": 0.1, "n_queries": 2, '
        '"n_excluded": 1}'
    )
    rec = _extract_bench({"tail": tail})
    assert rec["queries"] == {"q_a": 1.25, "q_b": 0.5}
