"""Round-11 registry queries.

Headline: streaming ANN index maintenance (VERDICT r10 ask #4) —
``sim_ivf_stream_parity`` gates the incremental IVF assignment loop
(streaming/ann_ivf.py): the embedding corpus arrives in 3 batches
(vec_id mod 3), each batch is assigned to the FROZEN k-means-trained
centroids by the SAME core the stream's ``foreachBatch`` runs
(ivf_assign_batch → operators.similarity.ivf_assign).  Because
frozen-centroid assignment is per-vector independent, the gated fold
is computed as ONE shared-assignment pass with batch = vec_id mod B
(r11 optimization) — row-identical to the original unrolled 3-batch
union.  tests/test_sinks_streaming.py pins the real streaming query
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
    and batch-built partitions.  Because of exactly that invariant,
    the parity FOLD is computed as one pass (r11 optimization, guide
    §2.4): the session-materialized full-corpus assignment
    (queries_ext._ivf_assign37 — the same ivf_assign argmax core the
    streaming loop's ivf_assign_batch calls) with batch = vec_id mod
    B selected per row, replacing three per-batch corpus×C assignment
    subplans with one table read — identical rows by the per-vector
    independence the docstring proves.  The REAL foreachBatch loop
    (streaming/ann_ivf.py) still runs the incremental per-trigger
    path and stays pinned to this fold emission-for-emission
    (tests/test_sinks_streaming.py::
    test_ivf_index_stream_matches_gated_fold)."""
    from kp_crypto_market_analytics_spark.queries_ext import _ivf_assign37

    assign = _ivf_assign37(spark, sf_dir)
    return assign.select(
        (F.col("vec_id") % _SIVF_BATCHES).cast("long").alias("batch"),
        "vec_id",
        "centroid_id",
    ).orderBy("batch", "vec_id")


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


# ------------------------------------------- paired rank statistics
#
# Shared fixture: the a_friedman_test daily-cell design — cell(day,
# type) = the day's exact micro value sum (BIGINT).  The paired
# two-sample tests compare the 'click' and 'view' series day-by-day;
# the block tests use all types on complete days.  Everything folds
# as exact integers (midranks doubled to stay integral) with one IEEE
# expression per emitted statistic.

_PAIR_A = "click"
_PAIR_B = "view"


def _daily_cells_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, event_type, cell) daily micro-value sums — session-
    materialized (r11 optimization): 14 paired-test queries each
    re-aggregated raw events into this |days|x|types| frame; exact
    BIGINT cells round-trip parquet bit-for-bit."""
    from kp_crypto_market_analytics_spark.operators.materialize import (
        session_materialized,
    )

    def build() -> DataFrame:
        t = load_tables(spark, sf_dir, ["events"])
        e = t["events"].select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * F.lit(1_000_000.0), 0)
            .cast("long")
            .alias("vm"),
        )
        return e.groupBy("day", "event_type").agg(F.sum("vm").alias("cell"))

    return session_materialized(spark, f"daily_cells:{sf_dir}", build)


_CELLS_CTE = """cells AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
    CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS cell
  FROM events GROUP BY 1, 2
)"""


def _paired_diffs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, xa, xb, d) for days where BOTH paired types traded."""
    cells = _daily_cells_df(spark, sf_dir)
    a = cells.where(F.col("event_type") == _PAIR_A).select(
        "day", F.col("cell").alias("xa")
    )
    b = cells.where(F.col("event_type") == _PAIR_B).select(
        "day", F.col("cell").alias("xb")
    )
    return a.join(b, "day").withColumn("d", F.col("xa") - F.col("xb"))


_PAIRS_CTE = f"""{_CELLS_CTE}, pairs AS (
  SELECT a.day AS day, a.cell AS xa, b.cell AS xb, a.cell - b.cell AS d
  FROM (SELECT day, cell FROM cells WHERE event_type = '{_PAIR_A}') a
  JOIN (SELECT day, cell FROM cells WHERE event_type = '{_PAIR_B}') b
  USING (day)
)"""


def a_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test on the click-vs-view daily micro value sums:
    counts of positive / negative / tied daily differences and the
    normal-approximation z = (2·n_pos − n_eff)/√n_eff over the
    non-tied pairs — the distribution-free 'which series runs higher'
    test (the median-difference-zero null).

    Determinism: differences are exact BIGINTs; counts are integers;
    ONE IEEE sqrt+division at the end, masked when no untied pair
    exists."""
    p = _paired_diffs_df(spark, sf_dir)
    g = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_tie"),
    )
    neff = F.col("n_pos") + F.col("n_neg")
    z = (
        F.lit(2.0) * F.col("n_pos") - neff.cast("double")
    ) / F.sqrt(neff.cast("double"))
    return g.select(
        "n_pairs",
        "n_pos",
        "n_neg",
        "n_tie",
        F.when(neff > 0, F.round(z, 6) + F.lit(0.0)).alias("sign_z"),
    )


def _a_sign_test_sql() -> str:
    return f"""
WITH {_PAIRS_CTE}, g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
    CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
    CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie
  FROM pairs
)
SELECT n_pairs, n_pos, n_neg, n_tie,
  CASE WHEN n_pos + n_neg > 0 THEN
    round((2.0 * n_pos - CAST(n_pos + n_neg AS DOUBLE))
          / sqrt(CAST(n_pos + n_neg AS DOUBLE)), 6) + 0.0
  END AS sign_z
FROM g
"""


R11_QUERIES["a_sign_test"] = a_sign_test
_R11_ORACLES["a_sign_test"] = _a_sign_test_sql


def a_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on the same paired daily design: rank
    the non-zero |differences| (midranks for ties), sum ranks of the
    positive side, and z-approximate with the tie-corrected variance
    — the magnitude-aware upgrade of the sign test.

    Determinism: |d| are exact BIGINTs; midranks are DOUBLED
    (min+max row_number) so ties stay integral; W⁺ = Σr2/2 is an
    exact half-integer; the tie term Σ(t³−t) folds as exact integers;
    ONE IEEE chain for z."""
    from pyspark.sql import Window as W

    p = _paired_diffs_df(spark, sf_dir).where(F.col("d") != 0)
    ad = F.abs(F.col("d"))
    wr = W.orderBy(ad, "day")  # day tiebreak only orders WITHIN ties
    wt = W.partitionBy(ad)
    r2 = (
        F.min(F.row_number().over(wr)).over(wt)
        + F.max(F.row_number().over(wr)).over(wt)
    )
    ranked = p.select("d", ad.alias("adv"), r2.alias("r2"))
    ties = (
        ranked.groupBy("adv")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            )
            .cast("long")
            .alias("tie3")
        )
    )
    g = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("w2_plus"),
        F.sum(F.when(F.col("d") < 0, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("w2_minus"),
    ).crossJoin(F.broadcast(ties))
    n = F.col("n").cast("double")
    wplus = F.col("w2_plus").cast("double") / F.lit(2.0)
    mean = n * (n + 1.0) / F.lit(4.0)
    var = n * (n + 1.0) * (2.0 * n + 1.0) / F.lit(24.0) - F.col(
        "tie3"
    ).cast("double") / F.lit(48.0)
    z = (wplus - mean) / F.sqrt(var)
    ok = (F.col("n") > 0) & (var > 0)
    return g.select(
        "n",
        (F.col("w2_plus").cast("double") / F.lit(2.0)).alias("w_plus"),
        (F.col("w2_minus").cast("double") / F.lit(2.0)).alias("w_minus"),
        F.when(ok, F.round(z, 6) + F.lit(0.0)).alias("wilcoxon_z"),
    )


def _a_wilcoxon_signed_rank_sql() -> str:
    return f"""
WITH {_PAIRS_CTE}, nz AS (
  SELECT day, d, abs(d) AS adv FROM pairs WHERE d <> 0
), rr AS (
  SELECT d, adv,
    row_number() OVER (ORDER BY adv, day) AS rn
  FROM nz
), ranked AS (
  SELECT d, adv,
    MIN(rn) OVER (PARTITION BY adv) + MAX(rn) OVER (PARTITION BY adv) AS r2
  FROM rr
), ties AS (
  SELECT CAST(coalesce(SUM(t * t * t - t), 0) AS BIGINT) AS tie3
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM ranked GROUP BY adv)
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2_plus,
    CAST(SUM(CASE WHEN d < 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2_minus
  FROM ranked
)
SELECT n,
  CAST(w2_plus AS DOUBLE) / 2.0 AS w_plus,
  CAST(w2_minus AS DOUBLE) / 2.0 AS w_minus,
  CASE WHEN n > 0 AND
    (n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - tie3 / 48.0) > 0
  THEN round((CAST(w2_plus AS DOUBLE) / 2.0 - n * (n + 1.0) / 4.0)
    / sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0
           - CAST(tie3 AS DOUBLE) / 48.0), 6) + 0.0
  END AS wilcoxon_z
FROM g, ties
"""


R11_QUERIES["a_wilcoxon_signed_rank"] = a_wilcoxon_signed_rank
_R11_ORACLES["a_wilcoxon_signed_rank"] = _a_wilcoxon_signed_rank_sql


def a_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test (1963) for a MONOTONE ordering of the event
    types' daily levels: blocks = complete days, treatments = event
    types in name order (the hypothesized ordering — the fixture's
    deterministic stand-in for a real dose/time ordering), L = Σ j·Rⱼ
    over per-day midranks, z-approximated against the no-trend null.
    Complements a_friedman_test (ANY ordering) with the ordered
    alternative, which has far more power against monotone drift.

    Determinism: midranks doubled (integral under ties), treatment
    indices from a deterministic name sort, L2 = Σ j·R2ⱼ exact BIGINT;
    ONE IEEE chain for z."""
    from pyspark.sql import Window as W

    cells = _daily_cells_df(spark, sf_dir)
    ktot = cells.agg(F.count_distinct("event_type").alias("kt"))
    complete = (
        cells.groupBy("day")
        .agg(F.count(F.lit(1)).alias("kk"))
        .crossJoin(F.broadcast(ktot))
        .where(F.col("kk") == F.col("kt"))
        .select("day")
    )
    c = cells.join(complete, "day")
    wd = W.partitionBy("day").orderBy("cell", "event_type")
    wb = W.partitionBy("day", "cell")
    r2 = (
        F.min(F.row_number().over(wd)).over(wb)
        + F.max(F.row_number().over(wd)).over(wb)
    )
    ranked = c.select("day", "event_type", r2.alias("r2"))
    byt = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("rj2")
    )
    j = F.row_number().over(W.orderBy("event_type"))
    g = (
        byt.select("event_type", "rj2", j.alias("j"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(F.col("j") * F.col("rj2")).cast("long").alias("l2"),
        )
        .crossJoin(
            F.broadcast(
                ranked.select("day")
                .distinct()
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
            )
        )
    )
    nn = F.col("n").cast("double")
    kk = F.col("k").cast("double")
    ell = F.col("l2").cast("double") / F.lit(2.0)
    mean = nn * kk * (kk + 1.0) * (kk + 1.0) / F.lit(4.0)
    var = nn * kk * kk * (kk + 1.0) * (kk * kk - 1.0) / F.lit(144.0)
    ok = (F.col("n") > 0) & (F.col("k") > 1)
    return g.select(
        F.col("n").alias("n_days"),
        F.col("k").alias("n_types"),
        F.when(ok, ell + F.lit(0.0)).alias("page_l"),
        F.when(ok & (var > 0), F.round((ell - mean) / F.sqrt(var), 6) + F.lit(0.0)).alias(
            "page_z"
        ),
    )


def _a_page_trend_sql() -> str:
    return f"""
WITH {_CELLS_CTE}, ktot AS (
  SELECT COUNT(DISTINCT event_type) AS kt FROM cells
), complete AS (
  SELECT day FROM cells GROUP BY day
  HAVING COUNT(*) = (SELECT kt FROM ktot)
), c AS (
  SELECT cells.* FROM cells JOIN complete USING (day)
), rr AS (
  SELECT day, event_type, cell,
    row_number() OVER (PARTITION BY day ORDER BY cell, event_type) AS rn
  FROM c
), ranked AS (
  SELECT day, event_type,
    MIN(rn) OVER (PARTITION BY day, cell)
      + MAX(rn) OVER (PARTITION BY day, cell) AS r2
  FROM rr
), byt AS (
  SELECT event_type, CAST(SUM(r2) AS BIGINT) AS rj2,
    row_number() OVER (ORDER BY event_type) AS j
  FROM ranked GROUP BY event_type
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
    CAST(SUM(j * rj2) AS BIGINT) AS l2,
    (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) FROM ranked) AS n
  FROM byt
)
SELECT n AS n_days, k AS n_types,
  CASE WHEN n > 0 AND k > 1 THEN CAST(l2 AS DOUBLE) / 2.0 + 0.0
  END AS page_l,
  CASE WHEN n > 0 AND k > 1
    AND n * k * k * (k + 1.0) * (k * k - 1.0) / 144.0 > 0
  THEN round((CAST(l2 AS DOUBLE) / 2.0
      - n * k * (k + 1.0) * (k + 1.0) / 4.0)
    / sqrt(n * k * k * (k + 1.0) * (k * k - 1.0) / 144.0), 6) + 0.0
  END AS page_z
FROM g
"""


R11_QUERIES["a_page_trend"] = a_page_trend
_R11_ORACLES["a_page_trend"] = _a_page_trend_sql


def a_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test on the click-vs-view daily values: count
    each group's days above/below the pooled median (equal-to-median
    days excluded, the standard treatment) and the 2×2 chi-square —
    the robust are-the-medians-equal screen.

    Determinism: cells are exact BIGINTs; the pooled median of an
    even-count BIGINT list is an exact half-integer in double; counts
    are integers; ONE IEEE expression for chi-square."""
    p = _paired_diffs_df(spark, sf_dir)
    pooled = p.select(F.col("xa").alias("v")).unionByName(
        p.select(F.col("xb").alias("v"))
    )
    med = pooled.agg(F.expr("percentile(v, 0.5)").alias("med"))
    counts = p.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when(F.col("xa") > F.col("med"), 1).otherwise(0))
        .cast("long")
        .alias("a_above"),
        F.sum(F.when(F.col("xa") < F.col("med"), 1).otherwise(0))
        .cast("long")
        .alias("a_below"),
        F.sum(F.when(F.col("xb") > F.col("med"), 1).otherwise(0))
        .cast("long")
        .alias("b_above"),
        F.sum(F.when(F.col("xb") < F.col("med"), 1).otherwise(0))
        .cast("long")
        .alias("b_below"),
    )
    a, b = F.col("a_above").cast("double"), F.col("a_below").cast("double")
    c, d = F.col("b_above").cast("double"), F.col("b_below").cast("double")
    n = a + b + c + d
    det = a * d - b * c
    den = (a + b) * (c + d) * (a + c) * (b + d)
    return counts.select(
        "a_above",
        "a_below",
        "b_above",
        "b_below",
        F.when(den > 0, F.round(n * det * det / den, 6) + F.lit(0.0)).alias(
            "mood_chi2"
        ),
    )


def _a_mood_median_sql() -> str:
    return f"""
WITH {_PAIRS_CTE}, pooled AS (
  SELECT xa AS v FROM pairs UNION ALL SELECT xb FROM pairs
), m AS (SELECT median(v) AS med FROM pooled),
counts AS (
  SELECT
    CAST(SUM(CASE WHEN xa > med THEN 1 ELSE 0 END) AS BIGINT) AS a_above,
    CAST(SUM(CASE WHEN xa < med THEN 1 ELSE 0 END) AS BIGINT) AS a_below,
    CAST(SUM(CASE WHEN xb > med THEN 1 ELSE 0 END) AS BIGINT) AS b_above,
    CAST(SUM(CASE WHEN xb < med THEN 1 ELSE 0 END) AS BIGINT) AS b_below
  FROM pairs, m
)
SELECT a_above, a_below, b_above, b_below,
  CASE WHEN (a_above + a_below) * (b_above + b_below)
            * (a_above + b_above) * (a_below + b_below) > 0
  THEN round(
    (a_above + a_below + b_above + b_below)
    * (CAST(a_above AS DOUBLE) * b_below
       - CAST(a_below AS DOUBLE) * b_above)
    * (CAST(a_above AS DOUBLE) * b_below
       - CAST(a_below AS DOUBLE) * b_above)
    / (CAST(a_above + a_below AS DOUBLE) * (b_above + b_below)
       * (a_above + b_above) * (a_below + b_below)), 6) + 0.0
  END AS mood_chi2
FROM counts
"""


R11_QUERIES["a_mood_median"] = a_mood_median
_R11_ORACLES["a_mood_median"] = _a_mood_median_sql


def a_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal association between the two paired daily series
    (click value as X, view value as Y): concordant / discordant /
    tied day-pair counts, Goodman-Kruskal gamma = (C−D)/(C+D), and
    Somers' d_yx = (C−D)/(C+D+T_y) (ties on Y only in the
    denominator — the asymmetric 'Y depends on X' version).

    Determinism: the day-pair self-join is bounded (n(n−1)/2 pairs of
    the tiny daily frame); all counts exact integers; one IEEE ratio
    per statistic."""
    p = _paired_diffs_df(spark, sf_dir).select("day", "xa", "xb")
    j = (
        p.alias("i")
        .join(p.alias("j"), F.col("i.day") < F.col("j.day"))
        .select(
            (F.col("i.xa") - F.col("j.xa")).alias("dx"),
            (F.col("i.xb") - F.col("j.xb")).alias("dy"),
        )
    )
    sgn = lambda c: F.when(c > 0, 1).when(c < 0, -1).otherwise(0)
    g = j.agg(
        F.sum(
            F.when(sgn(F.col("dx")) * sgn(F.col("dy")) == 1, 1).otherwise(0)
        )
        .cast("long")
        .alias("c_pairs"),
        F.sum(
            F.when(sgn(F.col("dx")) * sgn(F.col("dy")) == -1, 1).otherwise(0)
        )
        .cast("long")
        .alias("d_pairs"),
        F.sum(
            F.when((F.col("dx") == 0) & (F.col("dy") != 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("t_x"),
        F.sum(
            F.when((F.col("dy") == 0) & (F.col("dx") != 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("t_y"),
        F.sum(
            F.when((F.col("dx") == 0) & (F.col("dy") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("t_xy"),
    )
    cd = (F.col("c_pairs") - F.col("d_pairs")).cast("double")
    return g.select(
        "c_pairs",
        "d_pairs",
        "t_x",
        "t_y",
        "t_xy",
        F.when(
            F.col("c_pairs") + F.col("d_pairs") > 0,
            F.round(
                cd / (F.col("c_pairs") + F.col("d_pairs")).cast("double"), 6
            )
            + F.lit(0.0),
        ).alias("gamma"),
        F.when(
            F.col("c_pairs") + F.col("d_pairs") + F.col("t_y") > 0,
            F.round(
                cd
                / (
                    F.col("c_pairs") + F.col("d_pairs") + F.col("t_y")
                ).cast("double"),
                6,
            )
            + F.lit(0.0),
        ).alias("somers_dyx"),
    )


def _a_somers_d_sql() -> str:
    return f"""
WITH {_PAIRS_CTE}, pp AS (
  SELECT i.xa - j.xa AS dx, i.xb - j.xb AS dy
  FROM pairs i JOIN pairs j ON i.day < j.day
), g AS (
  SELECT
    CAST(SUM(CASE WHEN sign(dx) * sign(dy) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_pairs,
    CAST(SUM(CASE WHEN sign(dx) * sign(dy) = -1 THEN 1 ELSE 0 END) AS BIGINT) AS d_pairs,
    CAST(SUM(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_x,
    CAST(SUM(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_y,
    CAST(SUM(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_xy
  FROM pp
)
SELECT c_pairs, d_pairs, t_x, t_y, t_xy,
  CASE WHEN c_pairs + d_pairs > 0 THEN
    round(CAST(c_pairs - d_pairs AS DOUBLE) / (c_pairs + d_pairs), 6) + 0.0
  END AS gamma,
  CASE WHEN c_pairs + d_pairs + t_y > 0 THEN
    round(CAST(c_pairs - d_pairs AS DOUBLE)
          / (c_pairs + d_pairs + t_y), 6) + 0.0
  END AS somers_dyx
FROM g
"""


R11_QUERIES["a_somers_d"] = a_somers_d
_R11_ORACLES["a_somers_d"] = _a_somers_d_sql


# ----------------------------------------------------------- t_yule_k


def t_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K lexical-repetitiveness characteristic per source:
    K = 10⁴·(Σ m²·V(m) − N)/N² = 10⁴·(Σf² − N)/N² over the source's
    token frequency spectrum — the classic vocabulary-richness
    constant (low K = rich vocabulary), scale-invariant in corpus
    size, the repetitiveness axis the dup-ratio gates don't measure.

    Determinism: frequencies are exact BIGINTs, Σf² folds in
    DECIMAL(38,0); ONE IEEE expression per source."""
    t = load_tables(spark, sf_dir, ["documents"])
    from kp_crypto_market_analytics_spark.session import ensure_parallelism

    toks = (
        ensure_parallelism(t["documents"])
        .select(
            "source",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    freq = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    d = "decimal(38,0)"
    g = freq.groupBy("source").agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("f").cast(d) * F.col("f").cast(d)).alias("s2"),
    )
    k = (
        F.lit(10_000.0)
        * (F.col("s2").cast("double") - F.col("n_tokens").cast("double"))
        / (F.col("n_tokens").cast("double") * F.col("n_tokens"))
    )
    return (
        g.select(
            "source",
            "n_tokens",
            "n_types",
            F.when(
                F.col("n_tokens") > 0, F.round(k, 6) + F.lit(0.0)
            ).alias("yule_k"),
        )
        .orderBy("source")
    )


def _t_yule_k_sql() -> str:
    return r"""
WITH toks AS (
  SELECT source, tok
  FROM documents,
    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS u(tok)
  WHERE tok <> ''
), freq AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks GROUP BY 1, 2
), g AS (
  SELECT source, CAST(SUM(f) AS BIGINT) AS n_tokens,
    CAST(COUNT(*) AS BIGINT) AS n_types,
    SUM(CAST(f AS HUGEINT) * f) AS s2
  FROM freq GROUP BY 1
)
SELECT source, n_tokens, n_types,
  CASE WHEN n_tokens > 0 THEN
    round(10000.0 * (CAST(s2 AS DOUBLE) - n_tokens)
          / (CAST(n_tokens AS DOUBLE) * n_tokens), 6) + 0.0
  END AS yule_k
FROM g ORDER BY source
"""


R11_QUERIES["t_yule_k"] = t_yule_k
_R11_ORACLES["t_yule_k"] = _t_yule_k_sql


# ------------------------------------------------------ t_readability


def t_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability triple per source: ARI, Flesch-Kincaid grade, and
    Gunning fog, averaged over per-document scores — t_coleman_liau's
    syllable-aware siblings (FK/fog need the vowel-group syllable
    heuristic CLI deliberately avoids; together the four span the
    standard readability feature set a quality classifier consumes).
    The synthetic corpus has no sentence punctuation, so the sentence
    count degenerates to 1/doc — operator is the deliverable, corpus
    is the fixture (the t_coleman_liau precedent).

    Determinism: letters/words/sentences/syllable-groups/complex-word
    counts are exact integers (syllable groups = [aeiouy]+ runs;
    complex = tokens with >= 3 runs); per-doc scores round to 6dp,
    per-source means via round_mean_micro."""
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        DEC,
        round_mean_micro,
    )
    from kp_crypto_market_analytics_spark.session import ensure_parallelism

    t = load_tables(spark, sf_dir, ["documents"])
    d = ensure_parallelism(t["documents"]).select("doc_id", "source", "text")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "tok"
        ),
    ).where(F.col("tok") != "")
    syl = F.size(F.regexp_extract_all(F.col("tok"), F.lit("[aeiouy]+"), 0))
    per_tok = toks.select("doc_id", syl.alias("syl"))
    agg = per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum("syl").cast("long").alias("y"),
        F.sum(F.when(F.col("syl") >= 3, 1).otherwise(0))
        .cast("long")
        .alias("cx"),
    )
    chars = F.length(
        F.regexp_replace(F.col("text"), "[^A-Za-z0-9]", "")
    ).cast("long")
    sents = F.greatest(
        F.lit(1).cast("long"),
        F.length(F.regexp_replace(F.col("text"), "[^.!?]", "")).cast(
            "long"
        ),
    )
    j = d.select("doc_id", "source", chars.alias("c"), sents.alias("s")).join(
        agg, "doc_id"
    )
    w, s, c, y, cx = (
        F.col("w").cast("double"),
        F.col("s").cast("double"),
        F.col("c").cast("double"),
        F.col("y").cast("double"),
        F.col("cx").cast("double"),
    )
    ari = F.lit(4.71) * c / w + F.lit(0.5) * w / s - F.lit(21.43)
    fk = F.lit(0.39) * w / s + F.lit(11.8) * y / w - F.lit(15.59)
    fog = F.lit(0.4) * (w / s + F.lit(100.0) * cx / w)
    scored = j.where(F.col("w") > 0).select(
        "source",
        (F.round(ari, 6) + F.lit(0.0)).alias("ari6"),
        (F.round(fk, 6) + F.lit(0.0)).alias("fk6"),
        (F.round(fog, 6) + F.lit(0.0)).alias("fog6"),
    )
    n = F.count(F.lit(1))
    return (
        scored.groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            round_mean_micro(F.sum(F.col("ari6").cast(DEC)), n).alias(
                "avg_ari"
            ),
            round_mean_micro(F.sum(F.col("fk6").cast(DEC)), n).alias(
                "avg_fk"
            ),
            round_mean_micro(F.sum(F.col("fog6").cast(DEC)), n).alias(
                "avg_fog"
            ),
        )
        .orderBy("source")
    )


def _t_readability_sql() -> str:
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        sql_round_mean_micro,
    )

    mean = lambda col: sql_round_mean_micro(
        f"SUM(CAST({col} AS DECIMAL(18,6)))", "COUNT(*)"
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
    len(regexp_extract_all(tok, '[aeiouy]+')) AS syl
  FROM documents,
    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS u(tok)
  WHERE tok <> ''
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS w,
    CAST(SUM(syl) AS BIGINT) AS y,
    CAST(SUM(CASE WHEN syl >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS cx
  FROM toks GROUP BY 1
), perdoc AS (
  SELECT source,
    round(4.71 * (CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE) / w)
        + 0.5 * (CAST(w AS DOUBLE)
                 / greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g'))))
        - 21.43, 6) + 0.0 AS ari6,
    round(0.39 * (CAST(w AS DOUBLE)
                  / greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g'))))
        + 11.8 * (CAST(y AS DOUBLE) / w) - 15.59, 6) + 0.0 AS fk6,
    round(0.4 * (CAST(w AS DOUBLE)
                 / greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g')))
                 + 100.0 * CAST(cx AS DOUBLE) / w), 6) + 0.0 AS fog6
  FROM documents JOIN agg USING (doc_id)
  WHERE w > 0
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  {mean('ari6')} AS avg_ari,
  {mean('fk6')} AS avg_fk,
  {mean('fog6')} AS avg_fog
FROM perdoc GROUP BY source ORDER BY source
"""


R11_QUERIES["t_readability"] = t_readability
_R11_ORACLES["t_readability"] = _t_readability_sql


# --------------------------------------------------- t_code_detection

_CODE_SYMBOLS = r"[{}();=<>\[\]#|\\]"
_CODE_THRESH_MICRO = 10_000  # symbol density >= 1%


def t_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose screen per source: per-document code-symbol
    density ({};()=<>[]#|\\ characters per non-space character),
    flagged code-like at >= 1% — the corpus-composition census a
    mixture designer reads before setting code/prose weights (and a
    quality gate reads to EXEMPT code from prose heuristics like
    stopword ratios).

    Determinism: symbol and character counts are exact integers; the
    density is micro-quantized by exact half-away division, so the
    threshold compare and the per-source mean are integer
    arithmetic."""
    from kp_crypto_market_analytics_spark.session import ensure_parallelism

    t = load_tables(spark, sf_dir, ["documents"])
    dd = "decimal(38,0)"
    chars = F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast(
        "long"
    )
    syms = (
        F.length(F.col("text"))
        - F.length(F.regexp_replace(F.col("text"), _CODE_SYMBOLS, ""))
    ).cast("long")
    d = (
        ensure_parallelism(t["documents"])
        .select("source", chars.alias("c"), syms.alias("sy"))
        .where(F.col("c") > 0)
        .select(
            "source",
            _half_away(
                F.col("sy").cast(dd) * F.lit(1_000_000).cast(dd),
                F.col("c").cast(dd),
            ).alias("dens_micro"),
        )
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("dens_micro") >= _CODE_THRESH_MICRO, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_code_like"),
        F.sum("dens_micro").cast(dd).alias("dsum"),
    )
    avg_micro = _half_away(F.col("dsum"), F.col("n_docs").cast(dd))
    return (
        g.select(
            "source",
            "n_docs",
            "n_code_like",
            (avg_micro.cast("double") / F.lit(1_000_000.0)).alias(
                "avg_symbol_density"
            ),
        )
        .orderBy("source")
    )


def _t_code_detection_sql() -> str:
    sym = (
        f"(length(text) - length(regexp_replace(text, '{_CODE_SYMBOLS}',"
        " '', 'g')))"
    )
    chars = r"length(regexp_replace(text, '\s', '', 'g'))"
    dens = _sql_half_away(f"CAST({sym} AS HUGEINT) * 1000000", chars)
    avg = _sql_half_away("SUM(dens_micro)", "COUNT(*)")
    return f"""
WITH d AS (
  SELECT source, {dens} AS dens_micro
  FROM documents WHERE {chars} > 0
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN dens_micro >= {_CODE_THRESH_MICRO} THEN 1 ELSE 0 END)
       AS BIGINT) AS n_code_like,
  CAST({avg} AS DOUBLE) / 1000000.0 AS avg_symbol_density
FROM d GROUP BY source ORDER BY source
"""


# Whitespace token count, SQL twin of functions.text.token_count (the
# queries_r10 ntok convention).
_NTOK_SQL = (
    "(CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0"
    " THEN 0 ELSE CAST(length(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    " - length(replace(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ', ''))"
    " AS BIGINT) + 1 END)"
)


# ------------------------------------------------ t_importance_sample

_IMP_CAP = 512  # tokens at/above the cap are always kept


def t_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional importance sampling with Horvitz-Thompson
    accounting, per source: each document is kept with probability
    p = min(1, ntok/512) decided by a stable hash bucket (membership
    survives repartitioning and incremental re-runs — the
    t_split_assign rule), and kept docs carry inverse-probability
    weights 1/p.  The census reports the effective sample size
    ESS = (Σ 1/p)²/Σ(1/p)² — the number an unbiased downstream
    estimator actually has to work with, and THE honesty metric of any
    weighted sample (ESS ≪ n_kept means the weights are doing all the
    work).

    Determinism: acceptance compares the 60-bit md5 bucket against an
    integer threshold; 1/p is micro-quantized by exact half-away
    division; the ESS folds Σ and Σ² in DECIMAL(38,0) with ONE final
    IEEE ratio."""
    from kp_crypto_market_analytics_spark.functions.text import (
        hash64,
        token_count,
    )
    from kp_crypto_market_analytics_spark.session import ensure_parallelism

    t = load_tables(spark, sf_dir, ["documents"])
    dd = "decimal(38,0)"
    d = ensure_parallelism(t["documents"]).select(
        "doc_id",
        "source",
        token_count("text").cast("long").alias("ntok"),
    )
    cap = F.least(F.lit(_IMP_CAP).cast("long"), F.col("ntok"))
    bucket = hash64(
        F.concat(F.lit("imp:"), F.col("doc_id").cast("string"))
    ) % _IMP_CAP
    kept = d.where((F.col("ntok") > 0) & (bucket < cap)).select(
        "source",
        "ntok",
        # 1/p = cap_max / min(cap_max, ntok), micro-quantized
        _half_away(
            F.lit(_IMP_CAP * 1_000_000).cast(dd), cap.cast(dd)
        ).alias("invp_micro"),
    )
    g = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("ntok").cast("long").alias("kept_tokens"),
        F.sum(F.col("invp_micro").cast(dd)).alias("s1"),
        F.sum(F.col("invp_micro").cast(dd) * F.col("invp_micro").cast(dd)).alias(
            "s2"
        ),
    )
    ess = (
        F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / F.col("s2").cast("double")
    return (
        g.select(
            "source",
            "n_kept",
            "kept_tokens",
            F.when(F.col("n_kept") > 0, F.round(ess, 6) + F.lit(0.0)).alias(
                "ess"
            ),
        )
        .orderBy("source")
    )


def _t_importance_sample_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r7 import H60

    h = H60.format(x="'imp:' || CAST(doc_id AS VARCHAR)")
    invp = _sql_half_away(
        f"CAST({_IMP_CAP * 1_000_000} AS HUGEINT)",
        f"least({_IMP_CAP}, ntok)",
    )
    return f"""
WITH d AS (
  SELECT doc_id, source, {_NTOK_SQL} AS ntok
  FROM documents
), kept AS (
  SELECT source, ntok, {invp} AS invp_micro
  FROM d
  WHERE ntok > 0 AND {h} % {_IMP_CAP} < least({_IMP_CAP}, ntok)
), g AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
    CAST(SUM(ntok) AS BIGINT) AS kept_tokens,
    SUM(CAST(invp_micro AS HUGEINT)) AS s1,
    SUM(CAST(invp_micro AS HUGEINT) * invp_micro) AS s2
  FROM kept GROUP BY source
)
SELECT source, n_kept, kept_tokens,
  CASE WHEN n_kept > 0 THEN
    round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
          / CAST(s2 AS DOUBLE), 6) + 0.0
  END AS ess
FROM g ORDER BY source
"""


R11_QUERIES["t_importance_sample"] = t_importance_sample
_R11_ORACLES["t_importance_sample"] = _t_importance_sample_sql


# --------------------------------------------- t_curriculum_schedule

_CURR_STAGES = 3


def t_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule census: each source's corpus dealt into 3
    length-ordered stages (per-source ntile over (ntok, doc_id) —
    shortest docs first, the classic easy-to-hard curriculum axis),
    reporting per (source, stage) the doc/token counts and token range
    a training scheduler consumes.  Scoped PER SOURCE so the window
    partitions by a bounded key — a corpus-global ntile would
    single-partition at 100 TB; the per-source deal is also what a
    mixture-aware curriculum actually schedules.

    Determinism: ntile over a total order (ntok, doc_id tiebreak) is
    reproducible in both engines; every output is an exact integer."""
    from kp_crypto_market_analytics_spark.functions.text import token_count
    from kp_crypto_market_analytics_spark.session import ensure_parallelism
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["documents"])
    d = ensure_parallelism(t["documents"]).select(
        "doc_id",
        "source",
        token_count("text").cast("long").alias("ntok"),
    )
    stage = F.ntile(_CURR_STAGES).over(
        W.partitionBy("source").orderBy("ntok", "doc_id")
    )
    return (
        d.select("doc_id", "source", "ntok", stage.alias("stage"))
        .groupBy("source", "stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("stage_tokens"),
            F.min("ntok").alias("min_tokens"),
            F.max("ntok").alias("max_tokens"),
        )
        .orderBy("source", "stage")
    )


def _t_curriculum_schedule_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source, {_NTOK_SQL} AS ntok
  FROM documents
), staged AS (
  SELECT doc_id, source, ntok,
    ntile({_CURR_STAGES}) OVER (PARTITION BY source ORDER BY ntok, doc_id) AS stage
  FROM d
)
SELECT source, stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(ntok) AS BIGINT) AS stage_tokens,
  MIN(ntok) AS min_tokens, MAX(ntok) AS max_tokens
FROM staged GROUP BY source, stage ORDER BY source, stage
"""


R11_QUERIES["t_curriculum_schedule"] = t_curriculum_schedule
_R11_ORACLES["t_curriculum_schedule"] = _t_curriculum_schedule_sql


# ------------------------------------------- g_degree_assortativity


def g_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of endpoint degrees over all edges (both
    orientations, the Newman 2002 definition) — positive means hubs
    link to hubs (social-network shape), negative means hubs fan out
    to leaves (catalog/dependency shape).  The one scalar that says
    which skew mitigations the graph family needs.

    Determinism: degrees are exact BIGINTs; all five moments fold in
    DECIMAL(38,0); ONE IEEE chain (Pearson over exact sums)."""
    from kp_crypto_market_analytics_spark.operators.copurchase import (
        copurchase_pairs,
    )

    pairs = copurchase_pairs(spark, sf_dir).select("u", "v")
    deg = (
        pairs.select(F.col("u").alias("n"))
        .unionAll(pairs.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("dx"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dy"))
    both = pairs.join(du, "u").join(dv, "v")
    # both orientations: (dx, dy) and (dy, dx)
    pts = both.select("dx", "dy").unionAll(
        both.select(F.col("dy").alias("dx"), F.col("dx").alias("dy"))
    )
    d = "decimal(38,0)"
    g = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_pts"),
        F.sum(F.col("dx").cast(d)).alias("sx"),
        F.sum(F.col("dy").cast(d)).alias("sy"),
        F.sum(F.col("dx").cast(d) * F.col("dy").cast(d)).alias("sxy"),
        F.sum(F.col("dx").cast(d) * F.col("dx").cast(d)).alias("sxx"),
        F.sum(F.col("dy").cast(d) * F.col("dy").cast(d)).alias("syy"),
    )
    n = F.col("n_pts").cast("double")
    cov = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    vy = n * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    return g.select(
        "n_pts",
        F.when(
            (F.col("n_pts") > 1) & (vx > 0) & (vy > 0),
            F.round(cov / F.sqrt(vx * vy), 6) + F.lit(0.0),
        ).alias("assortativity"),
    )


def _g_degree_assortativity_sql() -> str:
    from kp_crypto_market_analytics_spark.operators.copurchase import (
        PAIRS_SQL,
    )

    return f"""
WITH {PAIRS_SQL}, deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs
  ) GROUP BY n
), both_e AS (
  SELECT du.deg AS dx, dv.deg AS dy
  FROM pairs JOIN deg du ON du.n = pairs.u JOIN deg dv ON dv.n = pairs.v
), pts AS (
  SELECT dx, dy FROM both_e UNION ALL SELECT dy, dx FROM both_e
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pts,
    SUM(CAST(dx AS HUGEINT)) AS sx, SUM(CAST(dy AS HUGEINT)) AS sy,
    SUM(CAST(dx AS HUGEINT) * dy) AS sxy,
    SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
    SUM(CAST(dy AS HUGEINT) * dy) AS syy
  FROM pts
)
SELECT n_pts,
  CASE WHEN n_pts > 1
    AND n_pts * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
    AND n_pts * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
  THEN round(
    (n_pts * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / sqrt((n_pts * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         * (n_pts * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
    + 0.0
  END AS assortativity
FROM g
"""


R11_QUERIES["g_degree_assortativity"] = g_degree_assortativity
_R11_ORACLES["g_degree_assortativity"] = _g_degree_assortativity_sql


# ------------------------------------------------------- g_rich_club

_RICH_KS = (2, 4, 8, 16)


def g_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficients of the co-purchase graph: for each
    degree threshold k, the edge density among nodes of degree > k —
    φ(k) = 2·E_k / (N_k·(N_k−1)).  Rising φ(k) means the hubs form a
    densely-wired core (the rich club); the scale diagnosis that
    decides whether hub-local algorithms (triangle counting, LPA) hit
    a dense kernel.

    Determinism: node/edge counts per threshold are exact integers
    from one broadcast threshold join; one IEEE ratio per row."""
    from kp_crypto_market_analytics_spark.operators.copurchase import (
        copurchase_pairs,
    )

    pairs = copurchase_pairs(spark, sf_dir).select("u", "v")
    deg = (
        pairs.select(F.col("u").alias("n"))
        .unionAll(pairs.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    ks = F.explode(
        F.array(*[F.lit(k) for k in _RICH_KS])
    ).alias("k")
    nodes_k = (
        deg.select("deg", ks)
        .where(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    edges_k = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select("du", "dv", ks)
        .where((F.col("du") > F.col("k")) & (F.col("dv") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
    )
    g = nodes_k.join(edges_k, "k", "left").select(
        "k",
        "n_k",
        F.coalesce("e_k", F.lit(0)).cast("long").alias("e_k"),
    )
    phi = (
        F.lit(2.0)
        * F.col("e_k").cast("double")
        / (F.col("n_k").cast("double") * (F.col("n_k") - F.lit(1.0)))
    )
    return (
        g.select(
            "k",
            "n_k",
            "e_k",
            F.when(F.col("n_k") > 1, F.round(phi, 6) + F.lit(0.0)).alias(
                "phi"
            ),
        )
        .orderBy("k")
    )


def _g_rich_club_sql() -> str:
    from kp_crypto_market_analytics_spark.operators.copurchase import (
        PAIRS_SQL,
    )

    ks = ", ".join(str(k) for k in _RICH_KS)
    return f"""
WITH {PAIRS_SQL}, deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs
  ) GROUP BY n
), ks AS (SELECT unnest([{ks}]) AS k),
nodes_k AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k
  FROM deg, ks WHERE deg > k GROUP BY k
), edges_k AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS e_k
  FROM pairs
  JOIN deg du ON du.n = pairs.u
  JOIN deg dv ON dv.n = pairs.v, ks
  WHERE du.deg > k AND dv.deg > k
  GROUP BY k
)
SELECT k, n_k, coalesce(e_k, 0) AS e_k,
  CASE WHEN n_k > 1 THEN
    round(2.0 * coalesce(e_k, 0) / (CAST(n_k AS DOUBLE) * (n_k - 1.0)), 6)
    + 0.0
  END AS phi
FROM nodes_k LEFT JOIN edges_k USING (k)
ORDER BY k
"""


R11_QUERIES["g_rich_club"] = g_rich_club
_R11_ORACLES["g_rich_club"] = _g_rich_club_sql


# --------------------------------------------------------- e_hubness

_HUB_PROBES = 200
_HUB_K = 5


def e_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness census of the embedding space: in-degree distribution
    of the k-NN graph (k = 5, probe set = vec_id < 200 — the bounded
    deterministic probe convention of the sim family).  Hubness is
    THE high-dimensional ANN pathology: a few vectors appear in
    everyone's neighbor lists, dragging down recall and skewing IVF
    cells; the histogram (in_degree → n_vectors) is the metric the
    index designer watches.

    Determinism: neighbors ranked by the 6dp-rounded cosine with id
    tiebreak (the sim_bruteforce contract); counts exact."""
    from kp_crypto_market_analytics_spark.operators.similarity import (
        brute_force_topk,
    )

    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t["embeddings"]
    probes = emb.where(F.col("vec_id") < _HUB_PROBES)
    nn = brute_force_topk(emb, probes, "embedding", "vec_id", k=_HUB_K)
    indeg = nn.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("long").alias("in_degree")
    )
    return (
        indeg.groupBy("in_degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("in_degree")
    )


def _e_hubness_sql() -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < {_HUB_PROBES}
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    round(list_cosine_similarity(q.qvec, CAST(c.embedding AS DOUBLE[])), 6) AS cos
  FROM q, embeddings c
  WHERE c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
), indeg AS (
  SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS in_degree
  FROM ranked WHERE rank <= {_HUB_K} GROUP BY neighbor_id
)
SELECT in_degree, CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM indeg GROUP BY in_degree ORDER BY in_degree
"""


R11_QUERIES["e_hubness"] = e_hubness
_R11_ORACLES["e_hubness"] = _e_hubness_sql


# ----------------------------------------------------- a_fleiss_kappa


def a_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement of three deterministic document-quality
    heuristics (length >= 50 tokens; mean word length <= 8 chars;
    digit density < 5%), treated as 3 raters making a binary keep/drop
    call per document: Fleiss' kappa (chance correction from the
    marginal category rates) and Gwet's AC1 (the paradox-resistant
    alternative that stays informative when one category dominates) —
    the agreement audit a labeling pipeline publishes before trusting
    ensemble-of-heuristics labels.

    Determinism: all rater votes are integer comparisons (the digit
    test as 20·digits < chars, exact ints); the agreement sums fold as
    exact integers; ONE IEEE chain per statistic."""
    from kp_crypto_market_analytics_spark.functions.text import token_count
    from kp_crypto_market_analytics_spark.session import ensure_parallelism

    t = load_tables(spark, sf_dir, ["documents"])
    d = ensure_parallelism(t["documents"])
    ntok = token_count("text").cast("long")
    chars = F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast("long")
    digits = F.length(
        F.regexp_replace(F.col("text"), "[^0-9]", "")
    ).cast("long")
    r1 = F.when(ntok >= 50, 1).otherwise(0)
    r2 = F.when((ntok > 0) & (chars <= F.lit(8) * ntok), 1).otherwise(0)
    r3 = F.when(F.lit(20) * digits < chars, 1).otherwise(0)
    votes = d.select((r1 + r2 + r3).cast("long").alias("pos"))
    # per-doc agreement numerator: n_pos(n_pos-1) + n_neg(n_neg-1),
    # raters n = 3
    pos = F.col("pos")
    neg = F.lit(3) - pos
    agree_i = pos * (pos - 1) + neg * (neg - 1)
    g = votes.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(agree_i).cast("long").alias("s_agree"),
        F.sum(pos).cast("long").alias("s_pos"),
    )
    nd = F.col("n_docs").cast("double")
    pbar = F.col("s_agree").cast("double") / (nd * F.lit(6.0))  # n(n-1)=6
    pi = F.col("s_pos").cast("double") / (nd * F.lit(3.0))
    pe = pi * pi + (F.lit(1.0) - pi) * (F.lit(1.0) - pi)
    pe_g = F.lit(2.0) * pi * (F.lit(1.0) - pi)
    return g.select(
        "n_docs",
        F.round(pbar, 6).alias("p_bar"),
        F.round(pe, 6).alias("p_e"),
        F.when(
            pe < 1.0, F.round((pbar - pe) / (F.lit(1.0) - pe), 6) + F.lit(0.0)
        ).alias("fleiss_kappa"),
        F.when(
            pe_g < 1.0,
            F.round((pbar - pe_g) / (F.lit(1.0) - pe_g), 6) + F.lit(0.0),
        ).alias("gwet_ac1"),
    )


def _a_fleiss_kappa_sql() -> str:
    ntok = _NTOK_SQL
    chars = r"length(regexp_replace(text, '\s', '', 'g'))"
    digits = "length(regexp_replace(text, '[^0-9]', '', 'g'))"
    return f"""
WITH votes AS (
  SELECT
    (CASE WHEN {ntok} >= 50 THEN 1 ELSE 0 END
     + CASE WHEN {ntok} > 0 AND {chars} <= 8 * {ntok} THEN 1 ELSE 0 END
     + CASE WHEN 20 * {digits} < {chars} THEN 1 ELSE 0 END) AS pos
  FROM documents
), g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(pos * (pos - 1) + (3 - pos) * (2 - pos)) AS BIGINT) AS s_agree,
    CAST(SUM(pos) AS BIGINT) AS s_pos
  FROM votes
)
SELECT n_docs,
  round(CAST(s_agree AS DOUBLE) / (n_docs * 6.0), 6) AS p_bar,
  round((CAST(s_pos AS DOUBLE) / (n_docs * 3.0)) * (CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
        + (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
          * (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0)), 6) AS p_e,
  CASE WHEN (CAST(s_pos AS DOUBLE) / (n_docs * 3.0)) * (CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
            + (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
              * (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0)) < 1.0
  THEN round((CAST(s_agree AS DOUBLE) / (n_docs * 6.0)
      - ((CAST(s_pos AS DOUBLE) / (n_docs * 3.0)) * (CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
         + (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
           * (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0))))
    / (1.0 - ((CAST(s_pos AS DOUBLE) / (n_docs * 3.0)) * (CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
         + (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
           * (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0)))), 6) + 0.0
  END AS fleiss_kappa,
  CASE WHEN 2.0 * (CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
            * (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0)) < 1.0
  THEN round((CAST(s_agree AS DOUBLE) / (n_docs * 6.0)
      - 2.0 * (CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
            * (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0)))
    / (1.0 - 2.0 * (CAST(s_pos AS DOUBLE) / (n_docs * 3.0))
            * (1.0 - CAST(s_pos AS DOUBLE) / (n_docs * 3.0))), 6) + 0.0
  END AS gwet_ac1
FROM g
"""


R11_QUERIES["a_fleiss_kappa"] = a_fleiss_kappa
_R11_ORACLES["a_fleiss_kappa"] = _a_fleiss_kappa_sql


# ----------------------------------------------------------- ti_trix

_TRIX_ALPHA = 0.25
_TRIX_LAGS = 8


def ti_trix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIX: 1-day rate of change of the triple-smoothed daily close
    (three chained EMAs) per event type — the momentum oscillator
    whose triple smoothing filters noise cycles shorter than the EMA
    period.

    Determinism: each EMA stage is the ti_macd truncated closed form
    (shared Python double weight literals, no libm pow) and rounds to
    6 dp BEFORE feeding the next stage, so all three chains consume
    identical inputs on both engines; the final ROC is one IEEE
    division, masked on a missing or zero previous value."""
    from kp_crypto_market_analytics_spark.operators.indicators import (
        truncated_ema,
    )
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    bars = _daily_bars_df(spark, sf_dir).withColumn(
        "cd", F.col("cm").cast("double") / F.lit(1_000_000.0)
    )
    s1 = F.round(
        truncated_ema(F.col("cd"), _wd(), _TRIX_ALPHA, _TRIX_LAGS), 6
    )
    b1 = bars.select("event_type", "day", "cd", s1.alias("s1"))
    s2 = F.round(
        truncated_ema(F.col("s1"), _wd(), _TRIX_ALPHA, _TRIX_LAGS), 6
    )
    b2 = b1.select("event_type", "day", "s1", s2.alias("s2"))
    s3 = F.round(
        truncated_ema(F.col("s2"), _wd(), _TRIX_ALPHA, _TRIX_LAGS), 6
    )
    b3 = b2.select("event_type", "day", s3.alias("s3"))
    prev = F.lag("s3").over(_wd())
    trix = (F.col("s3") - prev) / prev
    return (
        b3.select(
            "event_type",
            "day",
            "s3",
            F.when(
                prev.isNotNull() & (prev != 0.0),
                F.round(trix, 6) + F.lit(0.0),
            ).alias("trix"),
        )
        .orderBy("event_type", "day")
    )


def _ti_trix_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_indicators import (
        _des_ema_sql,
    )
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    a, lg = _TRIX_ALPHA, _TRIX_LAGS
    return f"""
WITH {DAILY_BARS_CTE}, b0 AS (
  SELECT event_type, day, CAST(cm AS DOUBLE) / 1000000.0 AS cd FROM bars
), b1 AS (
  SELECT event_type, day, round({_des_ema_sql("cd", a, lg)}, 6) AS s1
  FROM b0 WINDOW w AS ({_WD_SQL})
), b2 AS (
  SELECT event_type, day, round({_des_ema_sql("s1", a, lg)}, 6) AS s2
  FROM b1 WINDOW w AS ({_WD_SQL})
), b3 AS (
  SELECT event_type, day, round({_des_ema_sql("s2", a, lg)}, 6) AS s3
  FROM b2 WINDOW w AS ({_WD_SQL})
)
SELECT event_type, day, s3,
  CASE WHEN lag(s3) OVER d IS NOT NULL AND lag(s3) OVER d <> 0.0
  THEN round((s3 - lag(s3) OVER d) / lag(s3) OVER d, 6) + 0.0
  END AS trix
FROM b3
WINDOW d AS ({_WD_SQL})
ORDER BY event_type, day
"""


R11_QUERIES["ti_trix"] = ti_trix
_R11_ORACLES["ti_trix"] = _ti_trix_sql


# -------------------------------------------------------- a_quade_test


def a_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade test (1979) on the daily-cell block design: like
    a_friedman_test but blocks are WEIGHTED by their observed range
    (doubled midrank of max−min across days), so high-information
    days count more — the more powerful k-treatment test when block
    scales differ.  F = (n−1)·B/(A−B) with S_ij = Q_i·(r_ij −
    (k+1)/2), A = ΣS², B = ΣSⱼ²/n.

    Determinism: cells and ranges exact BIGINTs; within-day ranks and
    range-ranks both doubled (integral under ties); S4 = Q2·(r2−(k+1))
    is exact, so A and B fold as exact HUGEINT/DECIMAL sums; ONE IEEE
    ratio, masked when A = B (all-tied degenerate)."""
    from pyspark.sql import Window as W

    cells = _daily_cells_df(spark, sf_dir)
    ktot = cells.agg(F.count_distinct("event_type").alias("kt"))
    complete = (
        cells.groupBy("day")
        .agg(F.count(F.lit(1)).alias("kk"))
        .crossJoin(F.broadcast(ktot))
        .where(F.col("kk") == F.col("kt"))
        .select("day")
    )
    c = cells.join(complete, "day")
    wd = W.partitionBy("day").orderBy("cell", "event_type")
    wb = W.partitionBy("day", "cell")
    r2 = (
        F.min(F.row_number().over(wd)).over(wb)
        + F.max(F.row_number().over(wd)).over(wb)
    )
    ranked = c.select("day", "event_type", r2.alias("r2"))
    rng = c.groupBy("day").agg(
        (F.max("cell") - F.min("cell")).alias("rng")
    )
    wq = W.orderBy("rng", "day")
    wqt = W.partitionBy("rng")
    q2 = (
        F.min(F.row_number().over(wq)).over(wqt)
        + F.max(F.row_number().over(wq)).over(wqt)
    )
    blocks = rng.select("day", q2.alias("q2"))
    k1 = cells.agg((F.count_distinct("event_type") + 1).alias("k1"))
    s4 = (
        ranked.join(blocks, "day")
        .crossJoin(F.broadcast(k1))
        .select(
            "event_type",
            (F.col("q2") * (F.col("r2") - F.col("k1")))
            .cast("long")
            .alias("s4"),
        )
    )
    d = "decimal(38,0)"
    byt = s4.groupBy("event_type").agg(
        F.sum(F.col("s4").cast(d)).alias("sj4")
    )
    g = (
        s4.agg(
            F.sum(F.col("s4").cast(d) * F.col("s4").cast(d)).alias("a4"),
        )
        .crossJoin(
            F.broadcast(
                byt.agg(
                    F.count(F.lit(1)).cast("long").alias("k"),
                    F.sum(F.col("sj4") * F.col("sj4")).alias("b4"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                blocks.agg(F.count(F.lit(1)).cast("long").alias("n"))
            )
        )
    )
    num = (F.col("n").cast("double") - 1.0) * F.col("b4").cast("double")
    den = F.col("n").cast("double") * F.col("a4").cast("double") - F.col(
        "b4"
    ).cast("double")
    ok = (F.col("n") > 1) & (F.col("k") > 1) & (den > 0)
    return g.select(
        F.col("n").alias("n_days"),
        F.col("k").alias("n_types"),
        F.when(ok, F.round(num / den, 6) + F.lit(0.0)).alias("quade_f"),
    )


def _a_quade_test_sql() -> str:
    return f"""
WITH {_CELLS_CTE}, ktot AS (
  SELECT COUNT(DISTINCT event_type) AS kt FROM cells
), complete AS (
  SELECT day FROM cells GROUP BY day
  HAVING COUNT(*) = (SELECT kt FROM ktot)
), c AS (
  SELECT cells.* FROM cells JOIN complete USING (day)
), rr AS (
  SELECT day, event_type, cell,
    row_number() OVER (PARTITION BY day ORDER BY cell, event_type) AS rn
  FROM c
), ranked AS (
  SELECT day, event_type,
    MIN(rn) OVER (PARTITION BY day, cell)
      + MAX(rn) OVER (PARTITION BY day, cell) AS r2
  FROM rr
), rng AS (
  SELECT day, MAX(cell) - MIN(cell) AS rng FROM c GROUP BY day
), qq AS (
  SELECT day, rng,
    row_number() OVER (ORDER BY rng, day) AS qn
  FROM rng
), blocks AS (
  SELECT day,
    MIN(qn) OVER (PARTITION BY rng) + MAX(qn) OVER (PARTITION BY rng) AS q2
  FROM qq
), s4t AS (
  SELECT event_type,
    CAST(q2 * (r2 - (SELECT kt + 1 FROM ktot)) AS BIGINT) AS s4
  FROM ranked JOIN blocks USING (day)
), byt AS (
  SELECT event_type, SUM(CAST(s4 AS HUGEINT)) AS sj4
  FROM s4t GROUP BY event_type
), g AS (
  SELECT
    (SELECT SUM(CAST(s4 AS HUGEINT) * s4) FROM s4t) AS a4,
    CAST(COUNT(*) AS BIGINT) AS k,
    SUM(sj4 * sj4) AS b4,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM blocks) AS n
  FROM byt
)
SELECT n AS n_days, k AS n_types,
  CASE WHEN n > 1 AND k > 1
    AND n * CAST(a4 AS DOUBLE) - CAST(b4 AS DOUBLE) > 0
  THEN round((n - 1.0) * CAST(b4 AS DOUBLE)
    / (n * CAST(a4 AS DOUBLE) - CAST(b4 AS DOUBLE)), 6) + 0.0
  END AS quade_f
FROM g
"""


R11_QUERIES["a_quade_test"] = a_quade_test
_R11_ORACLES["a_quade_test"] = _a_quade_test_sql


# --------------------------------------------------------- a_log_rank


def a_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing the a_survival_km repeat-purchase
    survival curves between customer segments (BUILDING vs the rest):
    at each event day, the observed group-1 events are compared
    against expectation under the shared-hazard null, Σ(O−E) is
    normalized by the hypergeometric variance, and χ² = (O−E)²/V —
    the standard two-group censored-survival comparison, the
    inferential companion the KM curve lacks.

    Determinism: durations, death/censor histograms, and at-risk
    prefix counts are exact integers; each day's E and V terms are
    micro-quantized by exact half-away division (denominators n and
    n²(n−1)) and fold as exact integer sums; ONE final IEEE chain."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    o = t["orders"].select("o_custkey", F.to_date("o_orderdate").alias("d"))
    first = o.groupBy("o_custkey").agg(F.min("d").alias("d1"))
    second = (
        o.join(first, "o_custkey")
        .where(F.col("d") > F.col("d1"))
        .groupBy("o_custkey")
        .agg(F.min("d").alias("d2"))
    )
    end = o.agg(F.max("d").alias("d_end"))
    seg = t["customer"].select(
        F.col("c_custkey").alias("o_custkey"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("g1"),
    )
    subj = (
        first.join(second, "o_custkey", "left")
        .crossJoin(F.broadcast(end))
        .join(seg, "o_custkey")
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d1")
            )
            .otherwise(F.datediff("d_end", "d1"))
            .cast("long")
            .alias("dur"),
            F.col("d2").isNotNull().cast("int").alias("event"),
            "g1",
        )
    )
    hist = subj.groupBy("g1", "dur").agg(
        F.sum("event").cast("long").alias("deaths"),
        F.sum(F.lit(1) - F.col("event")).cast("long").alias("cens"),
    )
    totals = subj.groupBy("g1").agg(
        F.count(F.lit(1)).cast("long").alias("total")
    )
    wcum = (
        W.partitionBy("g1")
        .orderBy("dur")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    atrisk = (
        hist.join(totals, "g1")
        .select(
            "g1",
            "dur",
            "deaths",
            (
                F.col("total")
                - F.coalesce(
                    F.sum(F.col("deaths") + F.col("cens")).over(wcum),
                    F.lit(0),
                )
            ).alias("at_risk"),
        )
    )
    # at-risk counts exist only at a group's own (death|censor) days;
    # the pooled test needs BOTH groups' at-risk at every pooled event
    # day, so recompute each group's at-risk at every event day via a
    # bounded range join on the per-group removal histogram (event
    # days are calendar-bounded, the a_survival_km scale argument).
    days = (
        atrisk.groupBy("dur")
        .agg(F.sum("deaths").alias("dd"))
        .where(F.col("dd") > 0)
        .select("dur")
    )
    rem = hist.select(
        "g1", "dur", (F.col("deaths") + F.col("cens")).alias("rem")
    )
    risk_at = (
        days.crossJoin(F.broadcast(totals))
        .join(
            rem.withColumnRenamed("g1", "rg1").withColumnRenamed(
                "dur", "rdur"
            ),
            (F.col("rg1") == F.col("g1")) & (F.col("rdur") < F.col("dur")),
            "left",
        )
        .groupBy("dur", "g1", "total")
        .agg(F.coalesce(F.sum("rem"), F.lit(0)).alias("removed"))
        .select(
            "dur", "g1", (F.col("total") - F.col("removed")).alias("n")
        )
    )
    dth = hist.select("g1", "dur", "deaths")
    terms = (
        risk_at.groupBy("dur")
        .pivot("g1", [0, 1])
        .sum("n")
        .withColumnRenamed("0", "n0")
        .withColumnRenamed("1", "n1")
        .join(
            dth.where(F.col("g1") == 1).select(
                "dur", F.col("deaths").alias("dth1")
            ),
            "dur",
            "left",
        )
        .join(
            dth.where(F.col("g1") == 0).select(
                "dur", F.col("deaths").alias("dth0")
            ),
            "dur",
            "left",
        )
        .select(
            "dur",
            F.coalesce("n0", F.lit(0)).cast("long").alias("n0"),
            F.coalesce("n1", F.lit(0)).cast("long").alias("n1"),
            F.coalesce("dth0", F.lit(0)).cast("long").alias("dth0"),
            F.coalesce("dth1", F.lit(0)).cast("long").alias("dth1"),
        )
    )
    dd = "decimal(38,0)"
    n = (F.col("n0") + F.col("n1")).cast(dd)
    dt = (F.col("dth0") + F.col("dth1")).cast(dd)
    e1 = F.when(
        n > 0,
        _half_away(dt * F.col("n1").cast(dd) * F.lit(1_000_000).cast(dd), n),
    ).otherwise(F.lit(0).cast("long"))
    v = F.when(
        n > 1,
        _half_away(
            dt
            * F.col("n1").cast(dd)
            * (n - F.col("n1").cast(dd))
            * (n - dt)
            * F.lit(1_000_000).cast(dd),
            n * n * (n - F.lit(1).cast(dd)),
        ),
    ).otherwise(F.lit(0).cast("long"))
    g = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_event_days"),
        F.sum("dth1").cast("long").alias("o1"),
        F.sum(e1).cast("long").alias("e1_micro"),
        F.sum(v).cast("long").alias("v_micro"),
    )
    o1 = F.col("o1").cast("double")
    e1d = F.col("e1_micro").cast("double") / F.lit(1_000_000.0)
    vd = F.col("v_micro").cast("double") / F.lit(1_000_000.0)
    return g.select(
        "n_event_days",
        "o1",
        F.round(e1d, 6).alias("e1"),
        F.when(
            F.col("v_micro") > 0,
            F.round((o1 - e1d) * (o1 - e1d) / vd, 6) + F.lit(0.0),
        ).alias("logrank_chi2"),
    )


def _a_log_rank_sql() -> str:
    e1 = _sql_half_away(
        "CAST(dth0 + dth1 AS HUGEINT) * n1 * 1000000", "n0 + n1"
    )
    v = _sql_half_away(
        "CAST(dth0 + dth1 AS HUGEINT) * n1 * (n0 + n1 - n1)"
        " * (n0 + n1 - dth0 - dth1) * 1000000",
        "CAST(n0 + n1 AS HUGEINT) * (n0 + n1) * (n0 + n1 - 1)",
    )
    return f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
), first_o AS (
  SELECT o_custkey, MIN(d) AS d1 FROM o GROUP BY 1
), second_o AS (
  SELECT o.o_custkey, MIN(d) AS d2
  FROM o JOIN first_o USING (o_custkey) WHERE d > d1 GROUP BY 1
), subj AS (
  SELECT
    CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
         ELSE date_diff('day', d1, (SELECT MAX(d) FROM o)) END AS dur,
    CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS event,
    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
  FROM first_o
  LEFT JOIN second_o USING (o_custkey)
  JOIN customer ON c_custkey = o_custkey
), hist AS (
  SELECT g1, dur, CAST(SUM(event) AS BIGINT) AS deaths,
    CAST(SUM(1 - event) AS BIGINT) AS cens
  FROM subj GROUP BY 1, 2
), totals AS (
  SELECT g1, CAST(COUNT(*) AS BIGINT) AS total FROM subj GROUP BY 1
), days AS (
  SELECT dur FROM hist GROUP BY dur HAVING SUM(deaths) > 0
), risk_at AS (
  SELECT days.dur, totals.g1,
    totals.total - coalesce((
      SELECT SUM(h.deaths + h.cens) FROM hist h
      WHERE h.g1 = totals.g1 AND h.dur < days.dur), 0) AS n
  FROM days, totals
), terms AS (
  SELECT days.dur,
    CAST((SELECT n FROM risk_at r WHERE r.dur = days.dur AND r.g1 = 0) AS BIGINT) AS n0,
    CAST((SELECT n FROM risk_at r WHERE r.dur = days.dur AND r.g1 = 1) AS BIGINT) AS n1,
    CAST(coalesce((SELECT deaths FROM hist h WHERE h.dur = days.dur AND h.g1 = 0), 0) AS BIGINT) AS dth0,
    CAST(coalesce((SELECT deaths FROM hist h WHERE h.dur = days.dur AND h.g1 = 1), 0) AS BIGINT) AS dth1
  FROM days
), folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_event_days,
    CAST(SUM(dth1) AS BIGINT) AS o1,
    CAST(SUM(CASE WHEN n0 + n1 > 0 THEN {e1} ELSE 0 END) AS BIGINT) AS e1_micro,
    CAST(SUM(CASE WHEN n0 + n1 > 1 THEN {v} ELSE 0 END) AS BIGINT) AS v_micro
  FROM terms
)
SELECT n_event_days, o1,
  round(CAST(e1_micro AS DOUBLE) / 1000000.0, 6) AS e1,
  CASE WHEN v_micro > 0 THEN
    round((o1 - CAST(e1_micro AS DOUBLE) / 1000000.0)
        * (o1 - CAST(e1_micro AS DOUBLE) / 1000000.0)
        / (CAST(v_micro AS DOUBLE) / 1000000.0), 6) + 0.0
  END AS logrank_chi2
FROM folded
"""


R11_QUERIES["a_log_rank"] = a_log_rank
_R11_ORACLES["a_log_rank"] = _a_log_rank_sql


# --------------------------------------------------- t_lexical_density


def t_lexical_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical density per source: the share of tokens that are NOT
    stopwords (content words / all words) — the information-density
    axis of the quality family (a doc of pure function words reads
    fluently but trains nothing; stopword_hits alone measures fluency,
    this measures substance).

    Determinism: token and stopword counts are exact integers over
    the whitespace-normalized text (both engines run the identical
    replace-length trick); per-doc density is micro-quantized by
    exact half-away division; the per-source mean is exact integer
    division of the micro sum."""
    from kp_crypto_market_analytics_spark.functions.text import (
        stopword_hits,
        token_count,
    )
    from kp_crypto_market_analytics_spark.session import ensure_parallelism

    t = load_tables(spark, sf_dir, ["documents"])
    dd = "decimal(38,0)"
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    d = (
        ensure_parallelism(t["documents"])
        .select(
            "source",
            token_count("text").cast("long").alias("ntok"),
            stopword_hits(norm).cast("long").alias("sw"),
        )
        .where(F.col("ntok") > 0)
        .select(
            "source",
            "ntok",
            _half_away(
                (F.col("ntok") - F.col("sw")).cast(dd)
                * F.lit(1_000_000).cast(dd),
                F.col("ntok").cast(dd),
            ).alias("dens_micro"),
        )
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dens_micro").cast(dd).alias("dsum"),
        F.min("dens_micro").alias("min_micro"),
    )
    avg_micro = _half_away(F.col("dsum"), F.col("n_docs").cast(dd))
    return (
        g.select(
            "source",
            "n_docs",
            (avg_micro.cast("double") / F.lit(1_000_000.0)).alias(
                "avg_density"
            ),
            (F.col("min_micro").cast("double") / F.lit(1_000_000.0)).alias(
                "min_density"
            ),
        )
        .orderBy("source")
    )


def _t_lexical_density_sql() -> str:
    from kp_crypto_market_analytics_spark.functions.text import STOPWORDS

    hits = " + ".join(
        f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2}"
        " AS BIGINT)"
        for w in STOPWORDS
    )
    dens = _sql_half_away("CAST(ntok - sw AS HUGEINT) * 1000000", "ntok")
    avg = _sql_half_away("SUM(dens_micro)", "COUNT(*)")
    return rf"""
WITH base AS (
  SELECT source, {_NTOK_SQL} AS ntok,
    ' ' || lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) || ' ' AS p
  FROM documents
), counted AS (
  SELECT source, ntok, {hits} AS sw FROM base WHERE ntok > 0
), d AS (
  SELECT source, ntok, {dens} AS dens_micro FROM counted
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST({avg} AS DOUBLE) / 1000000.0 AS avg_density,
  CAST(MIN(dens_micro) AS DOUBLE) / 1000000.0 AS min_density
FROM d GROUP BY source ORDER BY source
"""


R11_QUERIES["t_lexical_density"] = t_lexical_density
_R11_ORACLES["t_lexical_density"] = _t_lexical_density_sql


# --------------------------------------------------- t_term_dispersion

_DISP_TOP = 20


def t_term_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness census: index of dispersion D = var/mean of the
    per-document count (zeros included) for the corpus's top-20 terms
    by total frequency — D ≈ 1 is Poisson (topic-neutral function
    words), D ≫ 1 is bursty (topical content words).  The statistic
    that separates keyword candidates from glue words without any
    stopword list.

    Determinism: with N docs, tf = Σc and s2 = Σc², D = (N·s2 − tf²)/
    (N·tf) — pure exact integers from one token aggregation, one IEEE
    ratio per term; top-20 by (tf DESC, term ASC) is a total order."""
    from kp_crypto_market_analytics_spark.session import ensure_parallelism

    t = load_tables(spark, sf_dir, ["documents"])
    toks = (
        ensure_parallelism(t["documents"])
        .select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    percount = toks.groupBy("tok", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    d = "decimal(38,0)"
    byterm = percount.groupBy("tok").agg(
        F.sum("c").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum(F.col("c").cast(d) * F.col("c").cast(d)).alias("s2"),
    )
    ndocs = t["documents"].agg(F.count(F.lit(1)).cast("long").alias("nd"))
    disp = (
        F.col("nd").cast("double") * F.col("s2").cast("double")
        - F.col("tf").cast("double") * F.col("tf").cast("double")
    ) / (F.col("nd").cast("double") * F.col("tf").cast("double"))
    return (
        byterm.crossJoin(F.broadcast(ndocs))
        .select(
            "tok",
            "tf",
            "df",
            F.when(F.col("tf") > 0, F.round(disp, 6) + F.lit(0.0)).alias(
                "dispersion"
            ),
        )
        .orderBy(F.col("tf").desc(), F.col("tok").asc())
        .limit(_DISP_TOP)
    )


def _t_term_dispersion_sql() -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, tok
  FROM documents,
    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS u(tok)
  WHERE tok <> ''
), percount AS (
  SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2
), byterm AS (
  SELECT tok, CAST(SUM(c) AS BIGINT) AS tf,
    CAST(COUNT(*) AS BIGINT) AS df,
    SUM(CAST(c AS HUGEINT) * c) AS s2
  FROM percount GROUP BY 1
), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents)
SELECT tok, tf, df,
  CASE WHEN tf > 0 THEN
    round((nd * CAST(s2 AS DOUBLE) - CAST(tf AS DOUBLE) * tf)
          / (CAST(nd AS DOUBLE) * tf), 6) + 0.0
  END AS dispersion
FROM byterm, nd
ORDER BY tf DESC, tok ASC LIMIT {_DISP_TOP}
"""


R11_QUERIES["t_term_dispersion"] = t_term_dispersion
_R11_ORACLES["t_term_dispersion"] = _t_term_dispersion_sql


# ------------------------------------------------- ti_fisher_transform

_FISH_N = 10


def ti_fisher_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher transform of the range-normalized daily close (Ehlers
    2002): x = 2·(c − min)/(max − min) − 1 over the trailing 10 bars,
    clamped to ±0.999, fisher = ½·ln((1+x)/(1−x)) — reshapes the
    bounded oscillator into ~Gaussian tails so turning points stand
    out as extreme values.

    Determinism: x is carried as the exact integer pair (num, den) =
    (2(c−min)−(max−min), max−min) in micro units; the clamp compares
    1000·num against 999·den in exact integers; the unclamped branch
    computes ln((den+num)/(den−num)) — ONE IEEE division + ln; the
    clamped branches are the shared constant ±½·ln(1999)."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )
    from pyspark.sql import Window as W

    bars = _daily_bars_df(spark, sf_dir)
    w = _wd().rowsBetween(-(_FISH_N - 1), W.currentRow)
    lo = F.min("cm").over(w)
    hi = F.max("cm").over(w)
    nw = F.count(F.lit(1)).over(w)
    num = F.lit(2) * (F.col("cm") - lo) - (hi - lo)
    den = hi - lo
    base = bars.select(
        "event_type", "day", num.alias("num"), den.alias("den"),
        nw.alias("nw"),
    )
    ok = (F.col("nw") == _FISH_N) & (F.col("den") > 0)
    clamp_hi = F.lit(1000) * F.col("num") >= F.lit(999) * F.col("den")
    clamp_lo = F.lit(1000) * F.col("num") <= F.lit(-999) * F.col("den")
    const = F.lit(0.5) * F.log(F.lit(1999.0))
    fisher = (
        F.when(clamp_hi, const)
        .when(clamp_lo, -const)
        .otherwise(
            F.lit(0.5)
            * F.log(
                (F.col("den") + F.col("num")).cast("double")
                / (F.col("den") - F.col("num")).cast("double")
            )
        )
    )
    return (
        base.select(
            "event_type",
            "day",
            F.when(ok, F.round(fisher, 6) + F.lit(0.0)).alias("fisher"),
        )
        .orderBy("event_type", "day")
    )


def _ti_fisher_transform_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    n = _FISH_N
    return f"""
WITH {DAILY_BARS_CTE}, base AS (
  SELECT event_type, day,
    2 * (cm - MIN(cm) OVER w) - (MAX(cm) OVER w - MIN(cm) OVER w) AS num,
    MAX(cm) OVER w - MIN(cm) OVER w AS den,
    COUNT(*) OVER w AS nw
  FROM bars
  WINDOW w AS ({_WD_SQL} ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
  CASE WHEN nw = {n} AND den > 0 THEN
    round(CASE
      WHEN 1000 * num >= 999 * den THEN 0.5 * ln(1999.0)
      WHEN 1000 * num <= -999 * den THEN -(0.5 * ln(1999.0))
      ELSE 0.5 * ln(CAST(den + num AS DOUBLE) / CAST(den - num AS DOUBLE))
    END, 6) + 0.0
  END AS fisher
FROM base
ORDER BY event_type, day
"""


R11_QUERIES["ti_fisher_transform"] = ti_fisher_transform
_R11_ORACLES["ti_fisher_transform"] = _ti_fisher_transform_sql


# ----------------------------------------------------- w_tes_forecast

_TES_ALPHA = 0.3
_TES_LAGS = 8
_TES_EPOCH = "2024-01-01"


def w_tes_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (triple-component) exponential-smoothing forecast of
    the daily close per event type: additive decomposition — the
    day-of-week seasonal index (exact mean of the micro closes per
    (type, weekday)) is subtracted, Brown's DES (w_des_forecast's
    truncated chains) smooths the deseasonalized series into level +
    trend, and the one-step forecast re-adds the NEXT day's seasonal
    index.  The Holt-Winters-shaped forecaster between w_des_forecast
    (no seasonality) and w_seasonal_naive_forecast (only seasonality).

    Determinism: the seasonal index is exact integer division of
    micro sums (half-away); weekday = days-since-epoch mod 7 (no
    engine dow-numbering dependence); both EMA chains are the shared
    truncated closed form with 6dp inter-stage rounding."""
    from kp_crypto_market_analytics_spark.operators.indicators import (
        truncated_ema,
    )
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    dd = "decimal(38,0)"
    bars = _daily_bars_df(spark, sf_dir).withColumn(
        "dow",
        F.pmod(F.datediff(F.col("day"), F.lit(_TES_EPOCH).cast("date")), F.lit(7)),
    )
    seas = bars.groupBy("event_type", "dow").agg(
        _half_away(
            F.sum(F.col("cm").cast(dd)), F.count(F.lit(1)).cast(dd)
        ).alias("seas_micro")
    )
    b = bars.join(seas, ["event_type", "dow"]).withColumn(
        "ds",
        (F.col("cm") - F.col("seas_micro")).cast("double")
        / F.lit(1_000_000.0),
    )
    s1 = F.round(truncated_ema(F.col("ds"), _wd(), _TES_ALPHA, _TES_LAGS), 6)
    b1 = b.select("event_type", "day", "dow", "ds", s1.alias("s1"))
    s2 = F.round(truncated_ema(F.col("s1"), _wd(), _TES_ALPHA, _TES_LAGS), 6)
    b2 = b1.select("event_type", "day", "dow", "s1", s2.alias("s2"))
    nxt = seas.select(
        "event_type",
        F.col("dow").alias("dow_next"),
        F.col("seas_micro").alias("seas_next"),
    )
    b3 = b2.withColumn(
        "dow_next", F.pmod(F.col("dow") + F.lit(1), F.lit(7))
    ).join(nxt, ["event_type", "dow_next"])
    a = _TES_ALPHA
    level = F.lit(2.0) * F.col("s1") - F.col("s2")
    trend = F.lit(a / (1.0 - a)) * (F.col("s1") - F.col("s2"))
    fc = (
        level
        + trend
        + F.col("seas_next").cast("double") / F.lit(1_000_000.0)
    )
    return (
        b3.select(
            "event_type",
            "day",
            "s1",
            "s2",
            (F.round(fc, 6) + F.lit(0.0)).alias("forecast"),
        )
        .orderBy("event_type", "day")
    )


def _w_tes_forecast_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_indicators import (
        _des_ema_sql,
    )
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    a, lg = _TES_ALPHA, _TES_LAGS
    seas_avg = _sql_half_away("SUM(CAST(cm AS HUGEINT))", "COUNT(*)")
    return f"""
WITH {DAILY_BARS_CTE}, bd AS (
  SELECT event_type, day, cm,
    ((date_diff('day', DATE '{_TES_EPOCH}', day) % 7) + 7) % 7 AS dow
  FROM bars
), seas AS (
  SELECT event_type, dow, {seas_avg} AS seas_micro
  FROM bd GROUP BY 1, 2
), b AS (
  SELECT bd.event_type AS event_type, day, bd.dow AS dow,
    CAST(cm - seas_micro AS DOUBLE) / 1000000.0 AS ds
  FROM bd JOIN seas ON seas.event_type = bd.event_type AND seas.dow = bd.dow
), b1 AS (
  SELECT event_type, day, dow,
    round({_des_ema_sql("ds", a, lg)}, 6) AS s1
  FROM b WINDOW w AS ({_WD_SQL})
), b2 AS (
  SELECT event_type, day, dow,
    s1, round({_des_ema_sql("s1", a, lg)}, 6) AS s2
  FROM b1 WINDOW w AS ({_WD_SQL})
)
SELECT b2.event_type AS event_type, day, s1, s2,
  round((2.0 * s1 - s2)
    + CAST({a / (1.0 - a)!r} AS DOUBLE) * (s1 - s2)
    + CAST(seas_micro AS DOUBLE) / 1000000.0, 6) + 0.0 AS forecast
FROM b2 JOIN seas
  ON seas.event_type = b2.event_type AND seas.dow = (b2.dow + 1) % 7
ORDER BY event_type, day
"""


R11_QUERIES["w_tes_forecast"] = w_tes_forecast
_R11_ORACLES["w_tes_forecast"] = _w_tes_forecast_sql


R11_QUERIES["t_code_detection"] = t_code_detection
_R11_ORACLES["t_code_detection"] = _t_code_detection_sql
