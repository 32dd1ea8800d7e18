"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...} plus round-over-round
comparison keys ("prev_round", "prev_total", "delta_vs_prev") computed
against the newest BENCH_r{N}.json in the repo root.

Query selection = the scale-stressing subset: full-scan aggregations,
multi-joins, window sweeps, pivot, correlation self-join, quantile
threshold + broadcast join, candle construction, dedup/minhash/LSH/
clustering/ANN.  (dedup_ngram_jaccard is correctness-gated but excluded
here: with the synthetic small-vocab corpus its inverted index
degenerates to near-all-pairs at sf0.1 — the freq-capped variant is the
scale path.)

Bench runs the PRODUCTION quantile path (approx_percentile sketches via
APPROX_QUANTILES_CONF) — the oracle gate keeps exact percentile; the
sketch path is what a 100 TB deployment runs, so it is what we time.
"""

from __future__ import annotations

import glob
import json
import os
import re
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
    "dedup_minhash_lsh",
    "dedup_clusters",
    "t_quality_score",
    "t_lang_id",
    "sim_bruteforce_topk",
    "q9_product_profit",
    "q16_supplier_cnt",
    "q18_large_orders",
    "t_fingerprint_winnow",
    "sim_ivf_topk",
    "sim_ivf_trained",
    "e3_anomaly_pipeline",
    "j2_asof_enrich",
    "w_sessionize",
    "t_tfidf_topk",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "w_ewma_trunc",
    "t_pack_sequences",
    "t_bigram_topk",
    "t_corpus_filter",
    "t_decontaminate",
    "sim_pq_rerank",
    "p_zorder_stats",
    "t_weighted_sample",
    "w_resample_ffill",
    "a_incremental_rollup",
    "w_rolling_corr",
    "dedup_canonical",
    "t_textrank",
    "a_funnel_steps",
    "a_retention_cohorts",
    "ti_bollinger",
    "ti_macd",
    "cdc_snapshot_diff",
    "t_paragraph_dedup",
    "dedup_substring",
    "t_word_entropy",
    "t_bigram_logprob",
    "t_quality_deciles",
    "dedup_incremental",
    "t_vocab_table",
    "t_bpe_merges",
    "j_asof_tolerance",
    "t_oov_rate",
    "t_countmin_hh",
    "e_pca_power",
    "mm_shard_manifest",
    "w_streaks",
]


def _prev_bench(root: str) -> tuple[int | None, dict]:
    """Newest BENCH_r{N}.json in the repo root (None if first round)."""
    best_n, best = None, {}
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        if best_n is None or n > best_n:
            try:
                with open(path) as f:
                    data = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            # The driver wraps the bench line under "parsed".
            if "queries" not in data and isinstance(data.get("parsed"), dict):
                data = data["parsed"]
            best_n, best = n, data
    return best_n, best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        APPROX_DISTINCT_CONF,
        APPROX_QUANTILES_CONF,
    )
    from kp_crypto_market_analytics_spark.queries import QUERIES
    from kp_crypto_market_analytics_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(APPROX_QUANTILES_CONF, "true")
    spark.conf.set(APPROX_DISTINCT_CONF, "true")

    # Warm the JVM/code paths once on the smallest sf so per-query times
    # measure the plan, not first-call classloading.
    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()

    import gc

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        # Per-query isolation: drop cached frames and release Python
        # references so the ContextCleaner frees persisted/checkpointed
        # blocks — otherwise storage from persist()/localCheckpoint()
        # pipelines (minhash, CC rounds) accumulates across the session
        # and adds multi-second noise to late queries.
        df = None
        spark.catalog.clearCache()
        gc.collect()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    prev_n, prev = _prev_bench(os.path.dirname(os.path.abspath(__file__)))
    if prev_n is not None and isinstance(prev.get("queries"), dict):
        prev_q = prev["queries"]
        out["prev_round"] = prev_n
        out["prev_total"] = prev.get("value")
        out["delta_vs_prev"] = {
            name: round(t - prev_q[name], 3)
            for name, t in timings.items()
            if name in prev_q
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
