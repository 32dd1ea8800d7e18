"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``kp_crypto_market_analytics_spark``; this
module only adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kp_crypto_market_analytics_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 / reference A1 shape) on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# Queries that already carry a green row in CORRECTNESS_r01.json.  The
# driver's per-round correctness run covers a registration-order prefix
# (50 entries in round 1), so we order the registry to put queries that
# still need a driver row FIRST: the 49 absent from r01 plus
# p_props_extract (r01's one hash FAIL, oracle type fixed this round).
# Across rounds this yields a driver-verified row for all 99.
_DRIVER_GREEN_R1 = frozenset({
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "a1_symbol_metrics", "a2_daily_summary",
    "a3_monthly_rollup", "a4_hourly_profile", "a5_dow_profile",
    "a6_weekday_hour_pivot", "a7_overall_stats", "a8_large_events",
    "a9_corr_matrix", "a11_coverage", "a12_best_spread", "a13_depth_topn",
    "a14_distinct_types", "a15_health_probe", "w1_lag_diff",
    "w2_rolling_std", "w3_forward_return", "w4_level_rank",
    "j1_minute_equijoin", "j_semi_customers", "j_anti_customers",
    "j4_union_sides", "set_intersect_parts", "set_except_parts",
    "f2_heuristic_time_parse", "stream_candles_1m", "t_token_stats",
    "t_quality_score", "t_lang_id", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_sig", "sim_bruteforce_topk", "sim_neardup_pairs",
    "dedup_minhash_lsh", "dedup_clusters", "dedup_ngram_capped",
    "dedup_simhash", "dedup_simhash_pairs", "t_fingerprint_winnow",
    "sim_lsh_topk", "sim_ivf_topk", "sim_neardup_lsh",
    "stream_candles_5m", "mm_binary_meta",
})


# Queries registered or semantically CHANGED after round 1 closed.
# They need (fresh) driver rows too, but never at the cost of
# displacing a round-1 query from the driver's ~50-entry prefix —
# round-1 pending first, new/changed next, green last.
_NEW_SINCE_R1 = frozenset({
    "sim_ivf_trained",
    "t_decontaminate",
    "t_repetition",
    "t_source_overlap",
    "t_corpus_filter",
    "e_quantize_int8",
    "a_grouped_quantiles",
    "a_rollup_cascade",
    "t_stratified_sample",
    "mm_frame_sample",
    "mm_resize_geometry",
    "p_zorder_stats",
    "t_weighted_sample",
    "a_skew_profile",
    "sim_pq_topk",
    "sim_pq_rerank",
    "w_resample_ffill",
    "a_incremental_rollup",
    "w_rolling_corr",
    "dedup_canonical",
    # r01-green but re-windowed in round 2 (vacuous-gate fix):
    "j_anti_customers",
})


def _ordered(names: list[str]) -> list[str]:
    def tier(n: str) -> int:
        if n in _NEW_SINCE_R1:
            return 1  # takes precedence: a changed query's old green row is stale
        return 2 if n in _DRIVER_GREEN_R1 else 0

    return sorted(names, key=lambda n: (tier(n), names.index(n)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column names)."""
    return {n: ORACLES[n] for n in _ordered(list(QUERIES)) if n in ORACLES}
