"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...} plus round-over-round
comparison keys ("prev_round", "prev_total", "delta_vs_prev") computed
against the newest BENCH_r{N}.json in the repo root.

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

# Excluded from the bench (still correctness-gated); each entry names
# the reason — everything else in the registry is timed every round.
BENCH_EXCLUDED = {
    "dedup_ngram_jaccard": (
        "exact all-pairs truth baseline: the r3 prefix+bitmap plan cut "
        "it 160s -> ~20s at sf0.1, but the synthetic corpus's tiny "
        "vocabulary still makes ~every pair a genuine candidate "
        "(11.9M verifications), 4x the next-slowest query; "
        "dedup_ngram_capped is the scale path and IS benched"
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
    # Truncated single line: keep only the part before the queries
    # dict closes (delta_vs_prev entries further right would otherwise
    # shadow real timings), then regex the per-query pairs.
    frag = tail.split('}, "sf":')[0]
    pairs = re.findall(r'"([A-Za-z0-9_]+)": (-?\d+(?:\.\d+)?)(?=[,}])', frag)
    queries = {
        k: float(v)
        for k, v in pairs
        if k not in ("value", "sf", "prev_round", "prev_total", "n", "rc", "cpus")
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
        if rec:
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


if __name__ == "__main__":
    main()
