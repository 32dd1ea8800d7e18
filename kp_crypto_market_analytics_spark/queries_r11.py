"""Round-11 registry queries.

Headline: streaming ANN index maintenance (VERDICT r10 ask #4) —
``sim_ivf_stream_parity`` gates the incremental IVF assignment loop
(streaming/ann_ivf.py) as an unrolled batch fold: the embedding
corpus arrives in 3 batches (vec_id mod 3), each batch is assigned to
the FROZEN k-means-trained centroids by the SAME core the stream's
``foreachBatch`` runs (ivf_assign_batch → operators.similarity.
ivf_assign), and the union of the per-batch assignments is the gated
table.  tests/test_sinks_streaming.py pins the real streaming query
emission-for-emission to this fold and pins serving from the
incrementally-built index to the batch ``sim_ivf_trained`` results.

Plus ``t_pii_redact`` (ask #5): the redaction TRANSFORM the t_pii_scan
census was missing, gated by a per-document redaction census with an
in-query rescan proving zero residual hits.

Every query carries an exact DuckDB oracle (same column names, exact
integer arithmetic or 6dp-rounded cosines) per the repo determinism
recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.session import load_tables

R11_QUERIES: dict = {}
_R11_ORACLES: dict = {}


def r11_oracles() -> dict[str, str]:
    return {name: fn() for name, fn in _R11_ORACLES.items()}


# ----------------------------------------------- sim_ivf_stream_parity

_SIVF_BATCHES = 3


def sim_ivf_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF index maintenance, gated batch-side: embeddings
    arrive as 3 micro-batches (vec_id mod 3 — deterministic integer
    arithmetic), each batch is assigned to the FROZEN trained centroid
    table (the session-materialized k-means artifact sim_ivf_trained
    searches — trained once at deployment, never moved by ingest), and
    the per-batch assignments are emitted with the arrival batch id.
    The assignment core is the streaming loop's own
    (streaming/ann_ivf.py ivf_assign_batch → ivf_assign: argmax of the
    6dp-rounded cosine with centroid-id tiebreak).

    Union-over-batches property: with the centroids frozen, assignment
    is per-vector against a constant broadcast table, so the union of
    per-batch emissions equals the batch-built index row-for-row —
    THE invariant that lets a serving read mix incrementally-ingested
    and batch-built partitions.  Scale shape per batch: |batch| × C
    broadcast nested-loop into one skinny max_by agg; no corpus-side
    shuffle, ever."""
    from kp_crypto_market_analytics_spark.queries_ext import _kmeans_cents37
    from kp_crypto_market_analytics_spark.streaming.ann_ivf import (
        ivf_assign_batch,
    )

    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t["embeddings"]
    cents = _kmeans_cents37(spark, sf_dir)
    folds = []
    for b in range(_SIVF_BATCHES):
        batch = emb.where(F.col("vec_id") % _SIVF_BATCHES == b)
        folds.append(
            ivf_assign_batch(batch, cents).select(
                F.lit(b).cast("long").alias("batch"),
                "vec_id",
                "centroid_id",
            )
        )
    out = folds[0]
    for f in folds[1:]:
        out = out.unionByName(f)
    return out.orderBy("batch", "vec_id")


def _sim_ivf_stream_parity_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_ext import _lloyd_cte

    prefix, prev = _lloyd_cte()
    nb = _SIVF_BATCHES
    return f"""{prefix}, cassign AS (
  SELECT nid, centroid_id FROM (
    SELECT c.nid, kc.cluster AS centroid_id,
      row_number() OVER (PARTITION BY c.nid
        ORDER BY round(list_cosine_similarity(c.cvec, kc.cent), 6) DESC, kc.cluster) AS rn
    FROM c, {prev} AS kc
  ) WHERE rn = 1
)
SELECT CAST(nid % {nb} AS BIGINT) AS batch, nid AS vec_id, centroid_id
FROM cassign
ORDER BY batch, vec_id"""


R11_QUERIES["sim_ivf_stream_parity"] = sim_ivf_stream_parity
_R11_ORACLES["sim_ivf_stream_parity"] = _sim_ivf_stream_parity_sql


# ------------------------------------------------------- t_pii_redact


def _pii_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The t_pii_scan planted-PII corpus (doc_id % 97 gets a contact
    line appended in-query on BOTH engines) — the redactor is
    exercised on real text with known-position matches instead of
    passing vacuously on a PII-free synthetic corpus."""
    t = load_tables(spark, sf_dir, ["documents"])
    return t["documents"].withColumn(
        "text",
        F.when(
            F.col("doc_id") % 97 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com via https://ex.org/u/"),
                F.col("doc_id").cast("string"),
                F.lit(" ref 9876543210"),
            ),
        ).otherwise(F.col("text")),
    )


def t_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII REDACTION census (VERDICT r10 ask #5): t_pii_scan detected;
    this transforms — the regexp_replace chain (operators/redact.py:
    email -> URL -> long-digit-run, inert replacement tokens) over the
    same planted corpus, gated on the per-document audit a scrub pass
    publishes: per-class hit counts, the redacted-character delta, and
    the RESCAN residual, which the inert-token construction forces to
    zero for every document (tests pin the invariant corpus-wide plus
    byte-identity of untouched text).

    Determinism: hit counts and character deltas are exact integers;
    the delta subtracts out the untouched text, so it is
    engine-independent even where absolute length semantics could
    differ.  Scale: one narrow codegen'd projection per doc — the
    transform maps over 100 TB with no shuffle; this census adds one
    (filter + sort) on the touched slice."""
    from kp_crypto_market_analytics_spark.operators.redact import pii_redact

    red = pii_redact(_pii_augmented(spark, sf_dir))
    return (
        red.where(
            (F.col("n_emails") + F.col("n_urls") + F.col("n_digit_runs")) > 0
        )
        .select(
            "doc_id",
            "n_emails",
            "n_urls",
            "n_digit_runs",
            "chars_redacted",
            "residual_hits",
        )
        .orderBy("doc_id")
    )


def _t_pii_redact_sql() -> str:
    from kp_crypto_market_analytics_spark.operators.redact import PII_PATTERNS

    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    red = "text"
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    rescan = " + ".join(
        f"len(regexp_extract_all(red, '{pat}'))" for _, pat, _ in PII_PATTERNS
    )
    return f"""
WITH aug AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0
         THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
              || '@example.com via https://ex.org/u/' || CAST(doc_id AS VARCHAR)
              || ' ref 9876543210'
         ELSE text END AS text
  FROM documents
), r AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '{pats["email"]}')) AS n_emails,
    len(regexp_extract_all(text, '{pats["url"]}')) AS n_urls,
    len(regexp_extract_all(text, '{pats["digits"]}')) AS n_digit_runs,
    text, {red} AS red
  FROM aug
)
SELECT doc_id, n_emails, n_urls, n_digit_runs,
  len(text) - len(red) AS chars_redacted,
  {rescan} AS residual_hits
FROM r
WHERE n_emails + n_urls + n_digit_runs > 0
ORDER BY doc_id
"""


R11_QUERIES["t_pii_redact"] = t_pii_redact
_R11_ORACLES["t_pii_redact"] = _t_pii_redact_sql


# ----------------------------------------------------------- ti_dpo
#
# Daily-bar indicators continue the r9/r10 exact-integer contract:
# micro-price BIGINT bars (queries_r9._daily_bars_df / its SQL CTE),
# integer window folds, ONE final IEEE division per output, masked
# where the window is incomplete.

_DPO_N = 10
_DPO_SHIFT = _DPO_N // 2 + 1


def ti_dpo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended Price Oscillator: close[t − (n/2 + 1)] − SMA_n(close)
    — the cycle-isolation detrender (price relative to a displaced
    moving average).  n = 10 daily bars per event type.

    Determinism: dpo = (n·cm_lag − Σcm_window) / (n·10⁶) — pure BIGINT
    numerator, one final IEEE division, masked until both the full
    window and the displaced close exist."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )
    from pyspark.sql import Window as W

    bars = _daily_bars_df(spark, sf_dir)
    w = _wd().rowsBetween(-(_DPO_N - 1), W.currentRow)
    d = "decimal(38,0)"
    s = F.sum(F.col("cm").cast(d)).over(w)
    nw = F.count(F.lit(1)).over(w)
    lagc = F.lag("cm", _DPO_SHIFT).over(_wd())
    ok = (nw == _DPO_N) & lagc.isNotNull()
    dpo = (
        lagc.cast(d) * F.lit(_DPO_N).cast(d) - s
    ).cast("double") / F.lit(_DPO_N * 1_000_000.0)
    return (
        bars.select(
            "event_type",
            "day",
            F.when(ok, F.round(dpo, 6) + F.lit(0.0)).alias("dpo"),
        )
        .orderBy("event_type", "day")
    )


def _ti_dpo_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    n, sh = _DPO_N, _DPO_SHIFT
    return f"""
WITH {DAILY_BARS_CTE}
SELECT event_type, day,
  CASE WHEN COUNT(*) OVER w = {n} AND lag(cm, {sh}) OVER d IS NOT NULL
  THEN round(CAST(lag(cm, {sh}) OVER d * CAST({n} AS HUGEINT)
             - SUM(CAST(cm AS HUGEINT)) OVER w AS DOUBLE)
             / {n * 1_000_000.0}, 6) + 0.0
  END AS dpo
FROM bars
WINDOW d AS ({_WD_SQL}),
  w AS ({_WD_SQL} ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


R11_QUERIES["ti_dpo"] = ti_dpo
_R11_ORACLES["ti_dpo"] = _ti_dpo_sql


# ----------------------------------------------------------- ti_vpt
#
# Shared exact-ratio device for the cumulative indicators below: the
# per-day term is a RATIO (micro units cancel), quantized to micro
# BIGINT by half-away-from-zero integer division (the
# round_mean_micro rule, inline because the result must feed an
# exact integer cumsum), then the running sum of exact integers is
# divided once at the end.


def _half_away(num_dec, den_dec):
    """sign(num)·((2|num| + den) div (2 den)) on decimals — exact
    half-away-from-zero rounding of num/den, the round_mean_micro
    integer path inline (both args DECIMAL(38,0), den > 0)."""
    q = F.call_function(
        "div",
        F.lit(2).cast("decimal(38,0)") * F.abs(num_dec) + den_dec,
        F.lit(2).cast("decimal(38,0)") * den_dec,
    )
    return (
        F.when(num_dec < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
        * q.cast("long")
    )


def _sql_half_away(num: str, den: str) -> str:
    return (
        f"(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
        f" * CAST((2 * abs(CAST(({num}) AS HUGEINT)) + ({den}))"
        f" // (2 * CAST(({den}) AS HUGEINT)) AS BIGINT))"
    )


def ti_vpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-Price Trend: VPT_t = Σ_{d<=t} vol_d · (c_d − c_{d−1}) /
    c_{d−1} — OBV's magnitude-aware sibling (volume scaled by the
    day's relative move) per event type.

    Determinism: the daily term is vol·Δcm/cm_prev (micro units
    cancel), quantized to micro BIGINT by exact half-away division,
    cumsum'd as integers; ONE final division by 10⁶.  First day
    contributes 0 (no previous close)."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )
    from pyspark.sql import Window as W

    bars = _daily_bars_df(spark, sf_dir)
    d = "decimal(38,0)"
    prev = F.lag("cm").over(_wd())
    num = (
        F.col("vol").cast(d)
        * (F.col("cm").cast(d) - prev.cast(d))
        * F.lit(1_000_000).cast(d)
    )
    term = F.when(
        prev.isNotNull() & (prev > 0), _half_away(num, prev.cast(d))
    ).otherwise(F.lit(0).cast("long"))
    wc = _wd().rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        bars.select("event_type", "day", term.alias("tm"))
        .select(
            "event_type",
            "day",
            (
                F.round(
                    F.sum("tm").over(wc).cast("double")
                    / F.lit(1_000_000.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("vpt"),
        )
        .orderBy("event_type", "day")
    )


def _ti_vpt_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    num = (
        "CAST(vol AS HUGEINT) * (cm - lag(cm) OVER d) * 1000000"
    )
    term = _sql_half_away(num, "lag(cm) OVER d")
    return f"""
WITH {DAILY_BARS_CTE}, t AS (
  SELECT event_type, day,
    CASE WHEN lag(cm) OVER d IS NOT NULL AND lag(cm) OVER d > 0
         THEN {term} ELSE 0 END AS tm
  FROM bars
  WINDOW d AS ({_WD_SQL})
)
SELECT event_type, day,
  round(CAST(CAST(SUM(tm) OVER c AS BIGINT) AS DOUBLE) / 1000000.0, 6)
    + 0.0 AS vpt
FROM t
WINDOW c AS ({_WD_SQL} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


R11_QUERIES["ti_vpt"] = ti_vpt
_R11_ORACLES["ti_vpt"] = _ti_vpt_sql


# ----------------------------------------------------------- ti_nvi


def ti_nvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative Volume Index in LOG space: logNVI_t = Σ_{d<=t}
    ln(c_d/c_{d−1}) · 1[vol_d < vol_{d−1}] — the smart-money tracker
    (price moves on falling volume accumulate; rising-volume days
    contribute nothing).  The classic multiplicative recursion is a
    product, so its log is a SUM — expressible as one window cumsum
    instead of a sequential scan, and exact cross-engine once each
    term is micro-quantized to BIGINT.

    Determinism: per-day term = round(ln(cm/prev)·10⁶) BIGINT (ln of
    a ratio of positive micro ints — identical IEEE in both engines),
    masked to 0 on non-NVI days and on non-positive closes (zero
    prices exist at sf0.1); integer cumsum; ONE final division."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )
    from pyspark.sql import Window as W

    bars = _daily_bars_df(spark, sf_dir)
    prevc = F.lag("cm").over(_wd())
    prevv = F.lag("vol").over(_wd())
    lr = F.round(
        F.log(F.col("cm").cast("double") / prevc.cast("double"))
        * F.lit(1_000_000.0),
        0,
    ).cast("long")
    term = F.when(
        prevc.isNotNull()
        & (prevc > 0)
        & (F.col("cm") > 0)
        & prevv.isNotNull()
        & (F.col("vol") < prevv),
        lr,
    ).otherwise(F.lit(0).cast("long"))
    wc = _wd().rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        bars.select("event_type", "day", term.alias("tm"))
        .select(
            "event_type",
            "day",
            (
                F.round(
                    F.sum("tm").over(wc).cast("double")
                    / F.lit(1_000_000.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("log_nvi"),
        )
        .orderBy("event_type", "day")
    )


def _ti_nvi_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    return f"""
WITH {DAILY_BARS_CTE}, t AS (
  SELECT event_type, day,
    CASE WHEN lag(cm) OVER d IS NOT NULL AND lag(cm) OVER d > 0
          AND cm > 0 AND lag(vol) OVER d IS NOT NULL
          AND vol < lag(vol) OVER d
         THEN CAST(round(ln(CAST(cm AS DOUBLE) / lag(cm) OVER d)
                         * 1000000.0) AS BIGINT)
         ELSE 0 END AS tm
  FROM bars
  WINDOW d AS ({_WD_SQL})
)
SELECT event_type, day,
  round(CAST(CAST(SUM(tm) OVER c AS BIGINT) AS DOUBLE) / 1000000.0, 6)
    + 0.0 AS log_nvi
FROM t
WINDOW c AS ({_WD_SQL} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


R11_QUERIES["ti_nvi"] = ti_nvi
_R11_ORACLES["ti_nvi"] = _ti_nvi_sql


# -------------------------------------------------------- ti_coppock

_COPP_ROC_A = 14
_COPP_ROC_B = 11
_COPP_WMA = 10


def ti_coppock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coppock Curve: WMA_10(ROC_14 + ROC_11) of the daily close per
    event type — the long-horizon momentum bottom-finder (Coppock
    1962, daily-bar adaptation).

    Determinism: each ROC_k = (cm − cm_lag_k)/cm_lag_k is quantized to
    micro BIGINT by exact half-away division (micro units cancel in
    the ratio); the WMA is a pure integer fold Σ(w−i)·s_{t−i} over
    doubled... over weights 10..1 with denominator 55; ONE final IEEE
    division by 55·10⁶.  Masked until every lag in every term exists
    and every lagged close is positive."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    bars = _daily_bars_df(spark, sf_dir)
    d = "decimal(38,0)"

    def roc_micro(k: int):
        lagc = F.lag("cm", k).over(_wd())
        return F.when(
            lagc.isNotNull() & (lagc > 0),
            _half_away(
                (F.col("cm").cast(d) - lagc.cast(d))
                * F.lit(1_000_000).cast(d),
                lagc.cast(d),
            ),
        )

    s = bars.select(
        "event_type",
        "day",
        (roc_micro(_COPP_ROC_A) + roc_micro(_COPP_ROC_B)).alias("sm"),
    )
    wsum = None
    present = None
    for i in range(_COPP_WMA):
        w_i = _COPP_WMA - i
        lag_s = F.lag("sm", i).over(_wd()) if i else F.col("sm")
        t = lag_s * F.lit(w_i)
        wsum = t if wsum is None else wsum + t
        p = lag_s.isNotNull()
        present = p if present is None else present & p
    den = _COPP_WMA * (_COPP_WMA + 1) // 2
    return (
        s.select(
            "event_type",
            "day",
            F.when(
                present,
                F.round(
                    wsum.cast("double") / F.lit(den * 1_000_000.0), 6
                )
                + F.lit(0.0),
            ).alias("coppock"),
        )
        .orderBy("event_type", "day")
    )


def _ti_coppock_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    def roc(k: int) -> str:
        t = _sql_half_away(
            f"(CAST(cm AS HUGEINT) - lag(cm, {k}) OVER d) * 1000000",
            f"lag(cm, {k}) OVER d",
        )
        return (
            f"CASE WHEN lag(cm, {k}) OVER d IS NOT NULL"
            f" AND lag(cm, {k}) OVER d > 0 THEN {t} END"
        )

    lag_s = lambda i: "sm" if i == 0 else f"lag(sm, {i}) OVER d"
    wsum = " + ".join(
        f"{lag_s(i)} * {_COPP_WMA - i}" for i in range(_COPP_WMA)
    )
    present = " AND ".join(
        f"{lag_s(i)} IS NOT NULL" for i in range(_COPP_WMA)
    )
    den = _COPP_WMA * (_COPP_WMA + 1) // 2
    return f"""
WITH {DAILY_BARS_CTE}, s AS (
  SELECT event_type, day,
    ({roc(_COPP_ROC_A)}) + ({roc(_COPP_ROC_B)}) AS sm
  FROM bars
  WINDOW d AS ({_WD_SQL})
)
SELECT event_type, day,
  CASE WHEN {present}
  THEN round(CAST(({wsum}) AS DOUBLE) / {den * 1_000_000.0}, 6) + 0.0
  END AS coppock
FROM s
WINDOW d AS ({_WD_SQL})
ORDER BY event_type, day
"""


R11_QUERIES["ti_coppock"] = ti_coppock
_R11_ORACLES["ti_coppock"] = _ti_coppock_sql
