"""Round-9 registry queries.

Headline: the two remaining pytest-only streaming operators gain
oracle-gated parity rows (VERDICT r8 ask #2), completing "every
streaming operator has an oracle-shaped witness" for SURVEY §2.9:

- ``w_rollstd_stream_parity`` — the keyed-state rolling-volatility
  stream (streaming/stateful.py) replayed as a SQL fold: per
  micro-batch digest of the emission stream, where the emissions are
  the 60-row/min-30 trailing stddev the operator carries across
  batches.  tests/test_sinks_streaming.py pins the real
  applyInPandasWithState operator to the fold emission-for-emission.
- ``j_stream_enrich_parity`` — the watermarked stream-stream
  time-range join (streaming/joins.py) replayed batch-side: the same
  bounded-lookback enrich on static frames, digested per key.  The
  batch twin IS the operator (enrich_with_recent runs both modes);
  tests pin streamed output == this digest.

Every query carries an exact DuckDB oracle (same column names,
exact-integer or micro-rounded arithmetic) and follows the repo's
determinism recipes (decimal moment sums, round(x,6) on IEEE outputs,
integer batch-slicing arithmetic, no row-at-a-time UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.operators.aggregates import DEC
from kp_crypto_market_analytics_spark.session import (
    ensure_parallelism,
    load_tables,
)

R9_QUERIES: dict = {}
_R9_ORACLES: dict = {}


def r9_oracles() -> dict[str, str]:
    return {name: fn() for name, fn in _R9_ORACLES.items()}


# ---------------------------------------------- w_rollstd_stream_parity

_ROLL_BATCHES = 4
_ROLL_WINDOW = 60
_ROLL_MIN_PERIODS = 30


def w_rollstd_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming rolling volatility, gated batch-side: slice the event
    stream into 4 time-contiguous micro-batches (equal spans of the
    observed [min ts, max ts] — integer arithmetic, data-derived) and
    digest the emission stream per (batch, event_type).  The emissions
    are the trailing 60-row sample stddev with min_periods=30 in
    (ts, event_id) order — exactly what the keyed-state operator
    (streaming/stateful.py rolling_std_stream, reference
    binance_analysis.py:233-239 parity) emits per row, INDEPENDENT of
    where the batch boundaries fall because its state carries the tail
    across triggers.  That boundary-independence is the parity
    property; tests/test_sinks_streaming.py::
    test_rollstd_stream_matches_gated_fold streams the same rows as 4
    time-split files through the real operator and pins emissions and
    digest to this fold.

    Determinism: window moments are exact DECIMAL(18,6) sums inside
    one frame (the W2 recipe); each emission is the identical IEEE
    chain on both engines; the digest sums ROUND(std, 6) values as
    exact decimals.  Scale shape: one window sort per event_type +
    one map-side-combined 20-row agg — no join, no second pass."""
    t = load_tables(spark, sf_dir, ["events"])
    e = ensure_parallelism(t["events"])
    ms = F.unix_millis("ts")
    span = e.agg(F.min(ms).alias("__lo"), F.max(ms).alias("__hi"))
    base = e.crossJoin(F.broadcast(span))
    bidx = F.least(
        F.lit(_ROLL_BATCHES).cast("long"),
        F.lit(1)
        + F.call_function(
            "div",
            (ms - F.col("__lo")) * F.lit(_ROLL_BATCHES),
            F.col("__hi") - F.col("__lo") + F.lit(1),
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL_WINDOW - 1), 0)
    )
    v = F.col("value")
    n = F.count("value").over(w)
    sx = F.sum(v.cast(DEC)).over(w).cast("double")
    sx2 = F.sum(v.cast(DEC) * v.cast(DEC)).over(w).cast("double")
    std = F.when(
        n >= _ROLL_MIN_PERIODS,
        F.sqrt(F.greatest((sx2 - sx * sx / n) / (n - F.lit(1)), F.lit(0.0))),
    )
    em = base.select(
        "event_type", bidx.alias("batch_idx"), F.round(std, 6).alias("std6")
    )
    return (
        em.groupBy("batch_idx", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_emissions"),
            F.count("std6").cast("long").alias("n_scored"),
            F.sum(F.col("std6").cast(DEC)).cast("double").alias("sum_std"),
            F.max("std6").alias("max_std"),
        )
        .orderBy("batch_idx", "event_type")
    )


def _w_rollstd_stream_parity_sql() -> str:
    return f"""
WITH span AS (
  SELECT epoch_ms(MIN(ts)) AS lo, epoch_ms(MAX(ts)) AS hi FROM events
), win AS (
  SELECT event_type, ts,
    COUNT(value) OVER w AS n,
    CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
    CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
         OVER w AS DOUBLE) AS sx2
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {_ROLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
), em AS (
  SELECT event_type,
    least({_ROLL_BATCHES},
          1 + (epoch_ms(ts) - lo) * {_ROLL_BATCHES} // (hi - lo + 1))
      AS batch_idx,
    CASE WHEN n >= {_ROLL_MIN_PERIODS} THEN
      round(sqrt(greatest((sx2 - sx * sx / n) / (n - 1), 0)), 6)
    END AS std6
  FROM win, span
)
SELECT batch_idx, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_emissions,
  CAST(COUNT(std6) AS BIGINT) AS n_scored,
  CAST(SUM(CAST(std6 AS DECIMAL(18,6))) AS DOUBLE) AS sum_std,
  MAX(std6) AS max_std
FROM em GROUP BY 1, 2 ORDER BY 1, 2
"""


R9_QUERIES["w_rollstd_stream_parity"] = w_rollstd_stream_parity
_R9_ORACLES["w_rollstd_stream_parity"] = _w_rollstd_stream_parity_sql


# ---------------------------------------------- j_stream_enrich_parity

_ENRICH_LOOKBACK = "5 minutes"


def j_stream_enrich_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream time-range join, gated batch-side:
    the SAME enrich_with_recent operator (streaming/joins.py) run in
    its batch mode — each event joined to every same-type event in
    (ts - 5 min, ts] (self-match at lag 0 included) — digested per
    event_type: pair count, matched-fact count, exact lag-ms sum and
    max.  The operator's contract is that the streaming mode (both
    sides watermarked, state bounded to |keys| × (watermark +
    lookback)) emits exactly these pairs once all data has arrived;
    tests/test_sinks_streaming.py::
    test_stream_enrich_matches_gated_digest pins the streamed pair
    digest to this row set, and
    test_stream_stream_join_matches_batch pins pair-for-pair
    equality.

    Determinism: all-integer digest (counts, epoch-ms lags).  Scale
    shape: one range self-join shuffled on the type key — the
    time-range predicate bounds per-fact fan-out by the 5-minute
    lookback (what bounds streaming state also bounds the batch
    blowup), then one map-side-combined agg to |types| rows."""
    from kp_crypto_market_analytics_spark.streaming.joins import (
        enrich_with_recent,
    )

    t = load_tables(spark, sf_dir, ["events"])
    e = ensure_parallelism(t["events"])
    facts = e.select(
        "event_type",
        F.col("event_id").alias("fact_id"),
        F.col("ts").alias("fact_ts"),
    )
    ctx = e.select(
        "event_type",
        F.col("event_id").alias("ctx_id"),
        F.col("ts").alias("ctx_ts"),
    )
    joined = enrich_with_recent(
        facts, ctx, key="event_type", fact_ts="fact_ts", ctx_ts="ctx_ts",
        lookback=_ENRICH_LOOKBACK,
    )
    lag_ms = F.unix_millis(F.col("f.fact_ts")) - F.unix_millis(
        F.col("c.ctx_ts")
    )
    return (
        joined.select(
            F.col("f.event_type").alias("event_type"),
            F.col("f.fact_id").alias("fact_id"),
            lag_ms.alias("lag_ms"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.count_distinct("fact_id").cast("long").alias("n_facts_matched"),
            F.sum("lag_ms").cast("long").alias("sum_lag_ms"),
            F.max("lag_ms").cast("long").alias("max_lag_ms"),
        )
        .orderBy("event_type")
    )


def _j_stream_enrich_parity_sql() -> str:
    return """
WITH f AS (
  SELECT event_type, event_id AS fact_id, ts AS fact_ts FROM events
), c AS (
  SELECT event_type, event_id AS ctx_id, ts AS ctx_ts FROM events
), j AS (
  SELECT f.event_type, f.fact_id,
    epoch_ms(f.fact_ts) - epoch_ms(c.ctx_ts) AS lag_ms
  FROM f JOIN c ON f.event_type = c.event_type
   AND c.ctx_ts <= f.fact_ts
   AND c.ctx_ts > f.fact_ts - INTERVAL 5 MINUTE
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(COUNT(DISTINCT fact_id) AS BIGINT) AS n_facts_matched,
  CAST(SUM(lag_ms) AS BIGINT) AS sum_lag_ms,
  CAST(MAX(lag_ms) AS BIGINT) AS max_lag_ms
FROM j GROUP BY 1 ORDER BY 1
"""


R9_QUERIES["j_stream_enrich_parity"] = j_stream_enrich_parity
_R9_ORACLES["j_stream_enrich_parity"] = _j_stream_enrich_parity_sql


# ------------------------------------------ dedup_ngram_jaccard_sampled

_JSAMP_MOD = 4  # deterministic 1/4 doc subsample => ~1/16 verifications


def dedup_ngram_jaccard_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact all-pairs Jaccard truth baseline, BENCHED (VERDICT r8
    ask #4): ``dedup_ngram_jaccard`` runs the uncapped
    AllPairs/PPJoin prefix+bitmap plan whose verification count is
    quadratic in corpus density, so the full-corpus variant is
    eval-tier (bench.py EVAL_TIER, enforced by
    tests/test_bench_meta.py).  This query runs the IDENTICAL plan on
    a deterministic md5 quarter-subsample of docs (hash64('jsamp:' ||
    doc_id) % 4 == 0 — content-keyed, repartition-stable, same rule at
    every SF) — ~1/16 the verifications — so the exact-Jaccard
    family's perf number is tracked every round with a per-round
    delta like everything else.

    Determinism: the subsample predicate is pure integer md5
    arithmetic; pair output inherits dedup_ngram_jaccard's exact
    integer intersections and round(jaccard, 6)."""
    from kp_crypto_market_analytics_spark.functions.text import hash64
    from kp_crypto_market_analytics_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    t = load_tables(spark, sf_dir, ["documents"])
    samp = t["documents"].where(
        hash64(F.concat(F.lit("jsamp:"), F.col("doc_id").cast("string")))
        % _JSAMP_MOD
        == 0
    )
    pairs = ngram_jaccard_pairs(
        samp, "text", "doc_id", k=4, threshold=0.6, use_words=False
    )
    return pairs.select(
        "doc_a", "doc_b", "inter_size", "size_a", "size_b",
        F.round("jaccard", 6).alias("jaccard"),
    ).orderBy("doc_a", "doc_b")


def _dedup_ngram_jaccard_sampled_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r8 import (
        H60,
        NORM_TEXT_SQL,
    )

    pred = H60.format(x="'jsamp:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH norm AS (
  SELECT doc_id, {NORM_TEXT_SQL} AS t FROM documents
  WHERE {pred} % {_JSAMP_MOD} = 0
), idx AS (
  SELECT doc_id, t, unnest(generate_series(1, greatest(length(t) - 3, 1))) AS i
  FROM norm
), sets AS (
  SELECT DISTINCT doc_id, substr(t, i, 4) AS shingle FROM idx
), sizes AS (
  SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
  FROM sets a JOIN sets b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter_size, sa.set_size AS size_a, sb.set_size AS size_b,
  round(CAST(inter_size AS DOUBLE) / (sa.set_size + sb.set_size - inter_size), 6) AS jaccard
FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter_size AS DOUBLE) / (sa.set_size + sb.set_size - inter_size) >= 0.6
ORDER BY doc_a, doc_b
"""


R9_QUERIES["dedup_ngram_jaccard_sampled"] = dedup_ngram_jaccard_sampled
_R9_ORACLES["dedup_ngram_jaccard_sampled"] = _dedup_ngram_jaccard_sampled_sql
