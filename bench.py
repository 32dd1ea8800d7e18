"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints the detail JSON line: {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {name: sec}, "sf": ...} plus round-over-round
comparison keys ("prev_round", "prev_total", "delta_vs_prev") computed
against the newest BENCH_r{N}.json in the repo root — followed by a
COMPACT summary line ({"summary": true, "value", "sf", "n_queries"}).
The detail line can exceed the driver's stdout tail and get
front-truncated (r01–r03 all recorded parsed=null); the compact line
is short enough to always survive, so round totals land in the
driver's own artifact.

Modes:
  python bench.py                         # full registry sweep
  python bench.py --isolate q1 q2 ...     # each query in its OWN fresh
                                          # subprocess/JVM (measures the
                                          # plan without session-state
                                          # drift; the answer to "did
                                          # this round regress?")
  python bench.py --isolate-top N         # isolate the N slowest
                                          # queries per the last sweep
  python bench.py --one NAME              # internal: child of --isolate
  python bench.py --repeat N              # full sweep N passes, report
                                          # per-query MIN (stable warm
                                          # round-over-round statistic)

Query selection = the FULL registry minus the documented exclusions in
BENCH_EXCLUDED (each names its reason) — every family carries a tracked
number with a per-round delta, so a perf regression anywhere in the
engine shows up in delta_vs_prev instead of hiding in an un-benched
query.

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

# EVAL-TIER queries (r9, formalizing the r6-r8 JSON-note exclusion):
# correctness-gated every round but NOT timed, because they are truth
# baselines whose cost is quadratic in corpus density by construction
# — running them in the bench would time the eval harness, not the
# engine.  The contract is machine-checked
# (tests/test_bench_meta.py): every eval-tier query MUST name benched
# registry counterparts that track the same family's perf number, and
# the bench set is derived as registry − eval-tier — no other query
# may be silently skipped.  Each run's artifact reports the tier.
EVAL_TIER = {
    "dedup_ngram_jaccard": {
        "reason": (
            "exact all-pairs truth baseline: the r3 prefix+bitmap plan "
            "cut it 160s -> ~20s at sf0.1, but the synthetic corpus's "
            "tiny vocabulary still makes ~every pair a genuine "
            "candidate (11.9M verifications), 4x the next-slowest "
            "query"
        ),
        "benched_counterparts": [
            # the df-capped scale path
            "dedup_ngram_capped",
            # the IDENTICAL uncapped plan on a deterministic 1/4 doc
            # subsample (~1/16 verifications) — the family's tracked
            # per-round number (r9)
            "dedup_ngram_jaccard_sampled",
        ],
    },
}

# Back-compat alias: name -> reason (artifact key, parsing helpers).
BENCH_EXCLUDED = {n: spec["reason"] for n, spec in EVAL_TIER.items()}

# Session-drift canary (VERDICT r9 ask #1): the common-query sweep
# total crept ~10% in r8 AND r9 while fresh-JVM isolated runs stayed
# flat — i.e. the headline number was aging-JVM noise (codegen cache /
# GC / catalog pressure over 340 sequential queries), never measured
# directly.  These 10 cheap, plan-stable queries run at sweep START
# and again at sweep END; end/start total ratio IS the session-drift
# component, reported in the artifact as drift_canary and flagged
# when >= DRIFT_GATE.  A ratio near 1.0 with a higher sweep total
# means the ENGINE got slower; a high ratio says the HARNESS aged —
# the disambiguation r8/r9 lacked.
DRIFT_CANARY = [
    "q1_pricing_summary", "a2_daily_summary", "a4_hourly_profile",
    "j1_minute_equijoin", "w2_rolling_std", "q6_forecast_revenue",
    "a12_best_spread", "t_token_stats", "g_degree_stats", "dedup_exact",
]
DRIFT_GATE = 1.10
# Two-sided bound (VERDICT r10 ask #2): a ratio well BELOW 1.0 means
# the start sample was not actually warm (JVM warmup wearing a drift
# label — the driver's r10 cold pass recorded 0.4514 with drift_ok
# true).  bench.py enforces the warm pre-pass itself (run_canary
# "warmup" below), so an in-band run must land in
# [DRIFT_GATE_LOW, DRIFT_GATE); anything outside fails the gate and
# the artifact says WHY (drift_reason).
DRIFT_GATE_LOW = 0.85


def median_canary_sample(
    samples: list[dict[str, float]],
) -> tuple[dict[str, float], list[float]]:
    """(median-total sample, all totals) — the noise-aware endpoint
    estimator (VERDICT r11 ask #6).  Taking the MEDIAN-total pass of
    an odd number of canary passes makes one sandbox throughput spike
    (or one anomalously fast pass) unable to set the drift ratio,
    while an actually-aged session still moves every pass and trips
    the gate."""
    totals = [round(sum(c.values()), 3) for c in samples]
    mid = sorted(totals)[len(totals) // 2]
    return samples[totals.index(mid)], totals


def drift_verdict(ratio: float | None) -> tuple[bool, str | None]:
    """(drift_ok, reason) for a canary end/start ratio — the two-sided
    gate decision, factored out so the boundary logic is unit-testable
    without running a sweep."""
    if ratio is None:
        return False, "no canary ratio"
    if ratio >= DRIFT_GATE:
        return False, "session aged during sweep (ratio >= gate)"
    if ratio < DRIFT_GATE_LOW:
        return False, (
            "start sample not warm (ratio < gate_low: measured warmup,"
            " not drift)"
        )
    return True, None

# Per-query bench-budget notes (VERDICT r9 ask #7): the registry grows
# ~40 queries/round; any query whose min-of-N exceeds BUDGET_SEC must
# carry an adjudicated build-cost note here, so bench weight is a
# decision, not an accretion.  tests/test_bench_meta.py enforces
# coverage against the newest min-of-2 history record; the artifact
# emits the budget table every run.
BUDGET_SEC = 3.0
BUILD_COST_NOTES = {
    "dedup_clusters": (
        "bounded-iteration connected components over the near-dup "
        "graph: 5 localCheckpointed skinny-join rounds — the honest "
        "price of an iterative algorithm, linear per round"
    ),
    "dedup_ngram_jaccard_sampled": (
        "deterministic quarter-corpus EXACT Jaccard truth — the "
        "eval-tier counterpart that keeps the uncapped plan's perf "
        "tracked per-round (bench.py EVAL_TIER contract)"
    ),
    "a_bootstrap_ci": (
        "100 bootstrap resamples as scalar-broadcast BNLJs over a "
        "100-row frame — floor reached, shuffle-free by design"
    ),
    "sim_pq_rerank": (
        "PQ codebook TRAINING (k-means rounds) + encode + rerank in "
        "one plan; the build cost is the product being priced"
    ),
    "t_corpus_pipeline": (
        "the 8-stage end-to-end funnel on ONE localCheckpointed scan "
        "(plan-test-pinned); stages are the workload, not overhead"
    ),
    "dedup_semantic": (
        "embedding-cosine near-dup: LSH prefilter + exact cosine "
        "verify over 384-dim arrays — arithmetic-dense by nature"
    ),
    "p_pruning_sim": (
        "partition-pruning simulation scans per-file stats for EVERY "
        "candidate layout (the lever census is the point)"
    ),
    "t_naive_bayes": (
        "per-class token likelihood tables + full-corpus scoring join "
        "— vocabulary-bounded but two corpus passes by definition"
    ),
    "q_abc_pareto": (
        "|lineitem| exact-decimal revenue aggregate + range-partitioned "
        "global cumsum: warm history sits 2.4-2.7s; the r12-baseline "
        "3.016s reading is threshold noise on the one full-fact-table "
        "decimal aggregate the classification is defined over"
    ),
    "dedup_minhash_sig": (
        "64-hash df-capped signature build (r9 recall fix: 8->64 "
        "hashes measured recall 0.107 -> 1.0); priced by the "
        "isolated A/B in BENCH_ISOLATED_r09.json"
    ),
    "t_mg_stream_parity": (
        "3-batch unrolled Misra-Gries parity fold: each emission "
        "replays the sketch over its full token prefix (the "
        "sequential-replay contract the stream is pinned to), so the "
        "corpus is scanned three times by design; hovers at the 3s "
        "line (3.07s min-of-2 this round, 2.9s in r10)"
    ),
    "a_hurst_exponent": (
        "R/S analysis: per-(type,size,block) rescaled-range windows "
        "with exact integer folds — multi-window by construction"
    ),
    "t_rrf_fusion": (
        "reciprocal-rank fusion over three retrievers: BM25 + TF-IDF "
        "+ embedding ranks, each a ranked top-k subplan"
    ),
    "dedup_lsh_stream_parity": (
        "3-batch unrolled incremental-LSH ingest fold (r10 streaming "
        "near-dup gate): three as-of-batch bucket tables over the "
        "shared signature store — ~3x dedup_incremental by design"
    ),
    "t_countmin_hh": (
        "count-min heavy hitters with the conservative-update sketch "
        "unrolled across width*depth cells — sketch build dominates"
    ),
    "dedup_incremental": (
        "incremental LSH ingest vs standing corpus on the 64-hash "
        "signature table (r9 recall fix pricing; isolated A/B flat)"
    ),
    "dedup_lsh_recall": (
        "recall AUDIT joining LSH candidates against the exact "
        "df-capped truth pairs — runs the detector AND the truth"
    ),
    "t_bpe_merges": (
        "BPE merge TRAINING: 3 unrolled explode->count->broadcast "
        "re-segmentation rounds over the vocabulary"
    ),
    "t_ndcg_eval": (
        "retrieval eval over three ranked retrievers (BM25/TF-IDF/"
        "embedding) with per-query ideal-DCG renormalization — three "
        "top-k subplans by definition"
    ),
    "a_hll_stream_parity": (
        "3-batch unrolled HLL register-merge fold: per-batch register "
        "maxima recomputed under the parity contract (the r9 trim "
        "already cut 4->3 batches; the remaining cost is the fold)"
    ),
    "g_wcc": (
        "connected components to CONVERGENCE (min-label rounds with a "
        "per-round convergence action) — the dedup_clusters iterative "
        "cost class on the co-purchase graph; isolated fresh-JVM "
        "pricing in BENCH_ISOLATED_r11.json third_wave_budget_crossers"
    ),
    "ti_cci": (
        "20-day mean-absolute-deviation self-join on the daily bars — "
        "bounded by the calendar; isolated cost IMPROVED r10→r11 "
        "(6.41s → 4.27s fresh-JVM, BENCH_ISOLATED_r11.json); in-sweep "
        "crossings track registry growth position, not plan changes"
    ),
    "a_info_gain_split": (
        "information-gain split search: entropy fold over EVERY "
        "candidate split point of the feature grid — the split scan "
        "is the product being priced (~3.5s fresh-JVM, "
        "BENCH_ISOLATED_r11.json)"
    ),
    "ti_vortex": (
        "paired VI+/VI- true-range window chains; 2.93s fresh-JVM "
        "(under budget — BENCH_ISOLATED_r11.json): the in-sweep "
        "3.3s reading is session position, kept noted for the trend"
    ),
    "a_cliffs_delta": (
        "midrank-identity dominance statistic: two range-partitioned "
        "global ranks; hovers at the line (2.74s in-sweep, 3.67s "
        "fresh-JVM incl. session floor — BENCH_ISOLATED_r11.json)"
    ),
    "mm_scene_cut": (
        "Arrow mapInPandas frame-luma extraction + per-video cut "
        "census; the r11 baseline's 13.8s in-sweep reading (3.7s "
        "fresh-JVM) flagged the row-loop batch body — vectorized "
        "with NumPy this round (r11 optimization target)"
    ),
    "dedup_minhash_lsh": (
        "64-hash/16-band LSH candidate generation over the shared "
        "signature table: band explode + bucket self-join is the "
        "detector being priced; hovers at the line as the session "
        "grows (3.60s in-sweep r11 baseline)"
    ),
    "dedup_simhash": (
        "64-bit SimHash build (per-token sign folds across 64 bit "
        "positions) + banded Hamming candidate join — the bit-fold "
        "width is the workload; hovers at the line in-session"
    ),
    "dq_k_anonymity": (
        "k-anonymity census: quasi-identifier groupBy at full corpus "
        "grain plus per-k cumulative census — the QI cardinality is "
        "the workload (3.09s in-sweep r11 baseline)"
    ),
    "g_bipartite_projection": (
        "customer-part bipartite projection: co-purchase pair "
        "generation bounded by per-order caps, then pair-weight agg — "
        "the projection explode is the priced product (3.53s in-sweep "
        "r11 baseline)"
    ),
    "sim_neardup_pairs": (
        "EXACT all-pairs cosine verification baseline (|V|² 64-dim "
        "dot products by definition) — the truth twin of the "
        "LSH/IVF-prefiltered production paths (dedup_semantic, "
        "sim_ivf_*); r11 wave 7 moved the quadratic stage to blocked "
        "NumPy (bit-exact, 1.5s -> 0.75s warm); earlier in-sweep "
        "spikes were sandbox throughput swings (fresh-JVM 3.18s with "
        "an 8.3s outlier, BENCH_ISOLATED_r11.json)"
    ),
    "sim_pq_topk": (
        "PQ codebook TRAINING (exact-gated Lloyd step) + corpus "
        "encode + ADC search in ONE plan — the train+encode build is "
        "the product being priced (same contract as sim_pq_rerank); "
        "serving amortizes via pq_adc_topk over persisted artifacts "
        "(build-index CLI); 6.17s fresh-JVM, hovers at the line "
        "in-sweep (3.27s)"
    ),
}


def _bench_queries() -> list[str]:
    from kp_crypto_market_analytics_spark.queries import QUERIES

    return [q for q in QUERIES if q not in BENCH_EXCLUDED]


BENCH_QUERIES = _bench_queries()


def _extract_bench(data: dict) -> dict | None:
    """Pull the {"queries": {...}, "value": ...} record out of a driver
    BENCH_r{N}.json wrapper.  The driver sometimes records parsed=null
    with only a front-TRUNCATED stdout tail (r02 did), so fall through:
    bare record → parsed dict → full JSON line inside tail → salvage
    the "name": seconds pairs from the truncated queries fragment."""
    if isinstance(data.get("queries"), dict):
        return data
    parsed = data.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed
    tail = data.get("tail")
    if not isinstance(tail, str):
        return None
    for line in reversed(tail.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(cand, dict) and isinstance(cand.get("queries"), dict):
                return cand
            # The compact per-query line (r12, VERDICT r11 ask #2):
            # {"per_query": {name: sec}} printed right before the
            # summary — short enough to survive front-truncation, and
            # carries exactly the timings dict.
            if isinstance(cand, dict) and isinstance(
                cand.get("per_query"), dict
            ):
                return {"queries": cand["per_query"], "value": None}
    # Truncated single line: keep only the part before the queries
    # dict closes (delta_vs_prev entries further right would otherwise
    # shadow real timings), then regex the per-query pairs.  The
    # queries dict is the ONLY one in the detail line that closes at
    # '}, "sf":', so that boundary being present means everything left
    # of it is genuine per-query pairs — even when the front (including
    # the '"queries": {' marker itself) was truncated away, the normal
    # case for a front-truncated driver tail.  Without the boundary
    # (e.g. only the compact summary line survived, or only
    # delta_vs_prev entries), there is nothing safe to salvage.
    if '}, "sf":' not in tail:
        return None
    frag = tail.split('}, "sf":')[0]
    # $-alternative: the split consumed the dict's closing brace, so
    # the LAST pair in the fragment ends the string.
    pairs = re.findall(r'"([A-Za-z0-9_]+)": (-?\d+(?:\.\d+)?)(?=[,}]|$)', frag)
    queries = {
        k: float(v)
        for k, v in pairs
        if k
        not in (
            "value", "sf", "prev_round", "prev_total", "n", "rc", "cpus",
            "n_queries", "n_excluded", "repeat",
        )
    }
    return {"queries": queries, "value": None} if queries else None


def _prev_bench(root: str, sf=None) -> tuple[int | str | None, dict]:
    """Most recent usable bench record: newest usable BENCH_r{N}.json
    (skipping rounds whose record is unrecoverable), else the last
    locally-written BENCH_HISTORY.jsonl entry at the SAME scale factor
    (deltas across SFs would be meaningless).  Returns (label, record)
    or (None, {})."""
    rounds = []
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    for n, path in sorted(rounds, reverse=True):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        rec = _extract_bench(data)
        # A record that declares a DIFFERENT sf than requested is not a
        # usable delta baseline (salvaged records without an "sf" key
        # pass through — driver rounds all run the default sf0.1).
        if rec and (sf is None or rec.get("sf") in (None, sf)):
            return n, rec
    hist = os.path.join(root, "BENCH_HISTORY.jsonl")
    if os.path.exists(hist):
        try:
            with open(hist) as f:
                lines = [ln for ln in f.read().splitlines() if ln.strip()]
            for line in reversed(lines):
                rec = json.loads(line)
                if isinstance(rec.get("queries"), dict) and (
                    sf is None or rec.get("sf") == sf
                ):
                    return "local", rec
        except (OSError, json.JSONDecodeError):
            pass
    return None, {}


def _time_query(spark, name: str, sf_dir: str) -> tuple[float, int]:
    from kp_crypto_market_analytics_spark.queries import QUERIES

    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    return round(time.time() - t0, 3), n


def _bench_session():
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
    return spark


def run_one(name: str) -> None:
    """Child of --isolate: one query, one fresh JVM, one JSON line."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _bench_session()
    sec, n = _time_query(spark, name, sf_dir)
    print(json.dumps({"name": name, "sec": sec, "rows": n}))


def run_isolated(names: list[str], runs: int = 2) -> None:
    """Each named query in its own subprocess (fresh JVM, fresh session
    state): the per-query cost with zero cross-query contamination.
    ``runs`` repeats per query; min is reported (best-of filters
    machine-state noise, which is the point of isolating)."""
    import subprocess

    here = os.path.abspath(__file__)
    results: dict[str, dict] = {}
    failed: dict[str, dict] = {}
    for name in names:
        secs = []
        for _ in range(runs):
            proc = subprocess.run(
                [sys.executable, here, "--one", name],
                capture_output=True,
                text=True,
                env=os.environ,
            )
            rec = None
            for line in reversed(proc.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        rec = json.loads(line)
                        break
                    except json.JSONDecodeError:
                        continue
            if rec is None:
                # A crashed child must leave a record in the artifact,
                # not just on stderr — an isolated sweep that silently
                # drops queries reads as "all clean".
                failed[name] = {
                    "rc": proc.returncode,
                    "stderr_tail": proc.stderr[-500:],
                }
                print(
                    f"# isolate {name}: child failed rc={proc.returncode}\n"
                    + proc.stderr[-2000:],
                    file=sys.stderr,
                )
                break
            secs.append(rec["sec"])
            print(f"# isolate {name}: {rec['sec']:.3f}s", file=sys.stderr)
        if secs:
            results[name] = {"min": min(secs), "runs": secs}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = {
        "metric": "isolated_query_runtime",
        "unit": "sec",
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "isolated": results,
        "failed": failed,
    }
    print(json.dumps(out))


def _slowest_from_history(root: str, n: int) -> list[str]:
    # Rank by a baseline recorded at the SAME scale factor as the run
    # we're about to do — a sweep at another SF orders queries by the
    # wrong costs (mirrors main()'s sf-filtered delta baseline).  A
    # driver BENCH_r wrapper salvage can be PARTIAL (front-truncated
    # tail keeps ~20% of the pairs); the local BENCH_HISTORY record of
    # the same sweep is complete, so rank from whichever same-sf record
    # covers more queries.
    sf = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ).rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    _, rec = _prev_bench(root, sf=sf_val)
    q = rec.get("queries") or {}
    hist = os.path.join(root, "BENCH_HISTORY.jsonl")
    if os.path.exists(hist):
        try:
            with open(hist) as f:
                lines = [ln for ln in f.read().splitlines() if ln.strip()]
            for line in reversed(lines):
                hrec = json.loads(line)
                hq = hrec.get("queries")
                if isinstance(hq, dict) and hrec.get("sf") == sf_val:
                    if len(hq) > len(q):
                        q = hq
                    break
        except (OSError, json.JSONDecodeError):
            pass
    return [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[:n]]


def main(repeat: int = 1) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _bench_session()

    import gc

    # min-of-N over full sweep passes (--repeat N): warm totals drift
    # ±20% with machine state, so a single-pass round-over-round
    # comparison needs the isolated artifact to settle disputes — the
    # per-query min across passes is the stable same-JVM statistic.
    # Between passes the session-materialization memo is CLEARED so
    # every pass pays each query's shared-build cost — without the
    # clear, pass 2 reads pass 1's parquet and the min records only
    # post-build time (r7's 2.59s → 0.10s dedup_minhash_sig trap),
    # which understates a cold sweep.  Pass-1 totals ride in the
    # artifact so cold-vs-warm is always reconstructible.
    from kp_crypto_market_analytics_spark.operators.materialize import (
        clear_session_materializations,
    )

    def run_canary(tag: str) -> dict[str, float]:
        c: dict[str, float] = {}
        for name in DRIFT_CANARY:
            sec, _ = _time_query(spark, name, sf_dir)
            c[name] = sec
        print(
            f"# drift canary ({tag}): {round(sum(c.values()), 3)}s",
            file=sys.stderr,
        )
        return c

    # Warm the canary itself first and measure from the SECOND pass:
    # the start sample must not carry first-call codegen/classloading
    # cost, or the end/start ratio reads cold-start as "negative
    # drift" and the aging gate goes vacuous (r10 first run measured
    # 0.30 for exactly this reason).  ONE warmup pass is not always
    # enough — JVM tiered compilation keeps shaving the canary for the
    # first minutes of a session (an r11 min-of-2 run measured 6.07s →
    # 3.02s AFTER a warmup pass, ratio 0.50), so keep warming until
    # the canary PLATEAUS (successive passes within the gate band) and
    # take the last pass as the start sample, bounded at 5 extra
    # passes (~3s each).
    prev = run_canary("warmup")
    canary_start = run_canary("start")
    for _ in range(5):
        r = sum(canary_start.values()) / max(sum(prev.values()), 1e-9)
        if r >= DRIFT_GATE_LOW:
            break
        prev, canary_start = canary_start, run_canary("start")
    # Noise-aware sampling (VERDICT r11 ask #6): a SINGLE start/end
    # pass conflates this sandbox's documented 2-7x external
    # throughput spikes with session aging — every r11 sweep failed
    # the gate low on honest methodology.  Take THREE samples per
    # endpoint and use the median-total pass, so one spiked (or one
    # anomalously fast) pass cannot set the ratio.  ~4 extra canary
    # passes ≈ 12 s per sweep, paid outside the timed queries.
    start_samples = [canary_start, run_canary("start"), run_canary("start")]
    canary_start, start_totals = median_canary_sample(start_samples)

    timings: dict[str, float] = {}
    pass_totals: list[float] = []
    for pass_i in range(max(1, repeat)):
        if pass_i > 0:
            cleared = clear_session_materializations(spark)
            if cleared:
                print(
                    f"# cleared {cleared} session materializations "
                    f"before pass {pass_i + 1}",
                    file=sys.stderr,
                )
        pass_total = 0.0
        for name in BENCH_QUERIES:
            sec, n = _time_query(spark, name, sf_dir)
            pass_total += sec
            if name not in timings or sec < timings[name]:
                timings[name] = sec
            print(
                f"# {name}: {sec:.3f}s ({n} rows)"
                + (f" [pass {pass_i + 1}/{repeat}]" if repeat > 1 else ""),
                file=sys.stderr,
            )
            # Per-query hygiene: drop cached frames and release Python
            # references so the ContextCleaner frees persisted/
            # checkpointed blocks — otherwise storage from persist()/
            # localCheckpoint() pipelines (minhash, CC rounds)
            # accumulates across the session and adds multi-second
            # noise to late queries.
            spark.catalog.clearCache()
            gc.collect()
        pass_totals.append(round(pass_total, 3))

    end_samples = [run_canary("end") for _ in range(3)]
    canary_end, end_totals = median_canary_sample(end_samples)
    c_start = round(sum(canary_start.values()), 3)
    c_end = round(sum(canary_end.values()), 3)
    drift_ratio = round(c_end / c_start, 4) if c_start else None

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
        "repeat": max(1, repeat),
        # Per-pass totals (pass 1 = cold builds): min-of-N totals are
        # build-inclusive since the memo clear, but the cold/warm split
        # stays reconstructible from the artifact alone.
        "pass_totals": pass_totals,
        # Session-drift component, measured (r9 ask #1): the same 10
        # cheap queries timed before and after the sweep; ratio >> 1
        # = harness aging, not engine regression.  drift_ok gates it.
        "drift_canary": {
            "start": canary_start,
            "end": canary_end,
            "start_total": c_start,
            "end_total": c_end,
            "ratio": drift_ratio,
            "gate": DRIFT_GATE,
            "gate_low": DRIFT_GATE_LOW,
            # Methodology marker (ADVICE r10): the canary queries run
            # extra passes before the sweep (warmup + start + end), so
            # their sweep timings are warm — cross-round total
            # comparisons against pre-r10 records must account for it.
            "canary_warmed": True,
            # Noise-aware sampling (VERDICT r11 ask #6): start/end are
            # each the MEDIAN-total pass of 3; all totals recorded so
            # the spread (sandbox noise) is visible in the artifact.
            "median_of": 3,
            "start_totals": start_totals,
            "end_totals": end_totals,
            # Two-sided gate (VERDICT r10 ask #2): ratio >= gate means
            # the session AGED during the sweep; ratio < gate_low means
            # the start sample was still absorbing warmup, i.e. the
            # run measured warmup, not drift — both are gate failures.
            "drift_ok": drift_verdict(drift_ratio)[0],
            "drift_reason": drift_verdict(drift_ratio)[1],
        },
        # Bench-budget table (r9 ask #7): every over-threshold query
        # with its adjudicated build-cost note; unnoted overages are a
        # test failure, so bench weight stays a decision.
        "budget": {
            "threshold_sec": BUDGET_SEC,
            "over": {
                name: {
                    "sec": sec,
                    "note": BUILD_COST_NOTES.get(name),
                }
                for name, sec in sorted(
                    timings.items(), key=lambda kv: -kv[1]
                )
                if sec > BUDGET_SEC
            },
        },
        # Documented exclusions ride in the artifact so "which queries
        # aren't benched, and why" is answerable from the JSON alone.
        "excluded": dict(BENCH_EXCLUDED),
        # the code-enforced tier contract (reason + benched
        # counterparts per eval-tier query; see EVAL_TIER)
        "eval_tier": dict(EVAL_TIER),
    }
    root = os.path.dirname(os.path.abspath(__file__))
    prev_n, prev = _prev_bench(root, sf=sf_val)
    if prev_n is not None and isinstance(prev.get("queries"), dict):
        prev_q = prev["queries"]
        out["prev_round"] = prev_n
        out["prev_total"] = prev.get("value")
        out["delta_vs_prev"] = {
            name: round(t - prev_q[name], 3)
            for name, t in timings.items()
            if name in prev_q
        }
    # Local history: the delta baseline that survives even when the
    # driver's artifact records parsed=null with a truncated tail.
    try:
        with open(os.path.join(root, "BENCH_HISTORY.jsonl"), "a") as f:
            f.write(json.dumps(out) + "\n")
    except OSError:
        pass
    print(json.dumps(out))
    # Compact per-query line (VERDICT r11 ask #2): the driver's PERF
    # parser recovered NO per-query timings from either r10's or r11's
    # stdout (prev_bench_ok/now_bench_ok false, n_common 0) because
    # the detail record above is one huge line that front-truncates in
    # the driver's tail window.  This line carries ONLY the timings
    # dict, compact separators, placed second-to-last so it survives
    # front-truncation whenever the summary line does (~14 KB for 470
    # queries vs ~60 KB for the detail record).
    print(
        json.dumps(
            {"per_query": {n: t for n, t in sorted(timings.items())}},
            separators=(",", ":"),
        )
    )
    # Compact summary LAST: the detail line above can exceed the
    # driver's stdout-tail window and get front-truncated (r01–r03 all
    # landed parsed=null); this line always survives, so the round
    # total comes from the driver's own artifact.  No "queries" key on
    # purpose — _extract_bench must not mistake it for the detail
    # record when computing next round's deltas.
    print(
        json.dumps(
            {
                "summary": True,
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "n_excluded": len(BENCH_EXCLUDED),
                # session-drift component (end/start canary ratio):
                # >= gate means the total is contaminated by harness
                # aging — read drift_canary in the detail record.
                "drift": drift_ratio,
            }
        )
    )


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv[:1] == ["--one"] and len(argv) == 2:
        run_one(argv[1])
    elif argv[:1] == ["--isolate"] and len(argv) > 1:
        run_isolated(argv[1:])
    elif argv[:1] == ["--isolate-top"] and len(argv) == 2:
        root = os.path.dirname(os.path.abspath(__file__))
        names = _slowest_from_history(root, int(argv[1]))
        if not names:
            print("no bench history to rank by", file=sys.stderr)
            sys.exit(1)
        run_isolated(names)
    elif argv[:1] == ["--repeat"] and len(argv) == 2:
        main(repeat=int(argv[1]))
    else:
        main()
