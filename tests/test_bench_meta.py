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
