"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}.

Query selection = the scale-stressing subset: full-scan aggregations,
multi-joins, window sweeps, pivot, correlation self-join, quantile
threshold + broadcast join, candle construction, dedup/minhash/ANN.
(dedup_ngram_jaccard is correctness-gated but excluded here: with the
synthetic small-vocab corpus its inverted index degenerates to
near-all-pairs at sf0.1 — the freq-capped variant is the scale path.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "a1_symbol_metrics",
    "a2_daily_summary",
    "a6_weekday_hour_pivot",
    "a7_overall_stats",
    "a8_large_events",
    "a9_corr_matrix",
    "w1_lag_diff",
    "w2_rolling_std",
    "w4_level_rank",
    "j1_minute_equijoin",
    "stream_candles_1m",
    "dedup_exact",
    "dedup_minhash_sig",
    "t_quality_score",
    "t_lang_id",
    "sim_bruteforce_topk",
    "q9_product_profit",
    "q16_supplier_cnt",
    "q18_large_orders",
    "t_fingerprint_winnow",
    "sim_ivf_topk",
    "e3_anomaly_pipeline",
    "j2_asof_enrich",
    "w_sessionize",
    "t_tfidf_topk",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "w_ewma_trunc",
    "t_pack_sequences",
    "t_bigram_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kp_crypto_market_analytics_spark.queries import QUERIES
    from kp_crypto_market_analytics_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/code paths once on the smallest sf so per-query times
    # measure the plan, not first-call classloading.
    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
