"""Round-10 registry queries.

Headline: streaming near-dup dedup (VERDICT r9 ask #3) —
``dedup_lsh_stream_parity`` gates the incremental MinHash-LSH ingest
loop (streaming/dedup_lsh.py) as an unrolled batch fold: the corpus
arrives in 3 batches (doc_id mod 3), each batch is deduped against
the accumulated signature store by the SAME generator the stream's
``foreachBatch`` runs (lsh_ingest_pairs → operators.dedup.
incremental_lsh_pairs, 64 df-capped hashes / 16 bands / star-routed
bucket cap 64), and the union of the per-batch emissions is the
gated table.  tests/test_sinks_streaming.py::
test_lsh_dedup_stream_matches_gated_fold pins the real streaming
query emission-for-emission to this fold.

Every query carries an exact DuckDB oracle (same column names, exact
integer or n/64-exact arithmetic) per the repo determinism recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.operators.aggregates import DEC
from kp_crypto_market_analytics_spark.session import (
    ensure_parallelism,
    load_tables,
)

R10_QUERIES: dict = {}
_R10_ORACLES: dict = {}


def r10_oracles() -> dict[str, str]:
    return {name: fn() for name, fn in _R10_ORACLES.items()}


# --------------------------------------------- dedup_lsh_stream_parity

_SLSH_BATCHES = 3


def dedup_lsh_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental-LSH near-dup ingest, gated batch-side:
    the corpus arrives as 3 micro-batches (doc_id mod 3 — deterministic
    integer arithmetic), and each batch's near-dup pairs against the
    accumulated signature store are emitted with the arrival batch id.
    The pair generator is the streaming loop's own core
    (streaming/dedup_lsh.py lsh_ingest_pairs): production 64-hash
    df-capped signatures from the frozen store (queries_ext.
    _minhash_sigs), 16 threshold-derived bands, star-routed bucket cap
    — bucket sizes (and hence pair/star tiers) are computed over the
    corpus AS OF each batch, exactly what the stream sees.

    Union-over-batches property: every near-dup pair is emitted at the
    batch where its LATER side arrives, exactly once; old×old pairs
    never re-form.  Determinism: doc ids are exact BIGINTs, tiers are
    min-folded strings, est_jaccard = matches/64 is binary-exact.
    Scale shape per batch: |batch| signature rows probe the band
    buckets — O(batch × bucket-mates), the same plan the gated
    dedup_incremental runs."""
    from kp_crypto_market_analytics_spark.queries_ext import (
        _LSH_BANDS,
        _LSH_BUCKET_CAP,
        _LSH_NUM_HASHES,
        _minhash_sigs,
    )
    from kp_crypto_market_analytics_spark.streaming.dedup_lsh import (
        lsh_ingest_pairs,
    )

    sigs = _minhash_sigs(spark, sf_dir)
    folds = []
    for b in range(_SLSH_BATCHES):
        new_sigs = sigs.where(F.col("doc_id") % _SLSH_BATCHES == b)
        old_sigs = sigs.where(F.col("doc_id") % _SLSH_BATCHES < b)
        folds.append(
            lsh_ingest_pairs(
                new_sigs,
                old_sigs,
                id_col="doc_id",
                num_hashes=_LSH_NUM_HASHES,
                bands=_LSH_BANDS,
                max_bucket_size=_LSH_BUCKET_CAP,
            ).select(
                F.lit(b).cast("long").alias("batch"),
                "doc_a",
                "doc_b",
                "new_a",
                "new_b",
                "tier",
                "est_jaccard",
            )
        )
    out = folds[0]
    for f in folds[1:]:
        out = out.unionByName(f)
    return out.orderBy("batch", "doc_a", "doc_b")


def _dedup_lsh_stream_parity_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_ext import (
        _BJOIN,
        _BKEY,
        _EST_SQL,
        _LSH_BUCKET_CAP,
        CAPPED_HSETS_CTE,
        _bands_select_sql,
    )

    cap = _LSH_BUCKET_CAP
    nb = _SLSH_BATCHES
    # Materialize the shared signature/band tables: 3 folds × (cand +
    # sa + sb) references would otherwise re-inline the minhash
    # aggregation ~12× (the g_kcore DuckDB-CTE lesson).
    hsets = CAPPED_HSETS_CTE.replace(
        "sigs AS (", "sigs AS MATERIALIZED ("
    )
    fold_ctes = []
    fold_sel = []
    for b in range(nb):
        pair_new = (
            f"AND (a.doc_id % {nb} = {b} OR b.doc_id % {nb} = {b})"
        )
        star_new = f"AND (doc_id % {nb} = {b} OR rep % {nb} = {b})"
        fold_ctes.append(
            f""", sized_{b} AS MATERIALIZED (
  SELECT *, COUNT(*) OVER (PARTITION BY {_BKEY}) AS bn,
         MIN(doc_id) OVER (PARTITION BY {_BKEY}) AS rep
  FROM bands WHERE doc_id % {nb} <= {b}
), cand_{b} AS (
  SELECT doc_a, doc_b, MIN(tier) AS tier FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 'pair' AS tier
    FROM sized_{b} a JOIN sized_{b} b ON {_BJOIN} AND a.doc_id < b.doc_id
    WHERE a.bn <= {cap} AND b.bn <= {cap} {pair_new}
    UNION ALL
    SELECT rep AS doc_a, doc_id AS doc_b, 'star' AS tier
    FROM sized_{b} WHERE bn > {cap} AND doc_id <> rep {star_new}
  ) GROUP BY 1, 2
)"""
        )
        fold_sel.append(
            f"""SELECT CAST({b} AS BIGINT) AS batch, doc_a, doc_b,
    doc_a % {nb} = {b} AS new_a, doc_b % {nb} = {b} AS new_b,
    tier, {_EST_SQL} AS est_jaccard
  FROM cand_{b}
  JOIN sigs sa ON sa.doc_id = doc_a JOIN sigs sb ON sb.doc_id = doc_b"""
        )
    return f"""
WITH {hsets}, bands AS MATERIALIZED (
  {_bands_select_sql()}
){''.join(fold_ctes)}
SELECT * FROM (
  {" UNION ALL ".join(fold_sel)}
)
ORDER BY batch, doc_a, doc_b
"""


R10_QUERIES["dedup_lsh_stream_parity"] = dedup_lsh_stream_parity
_R10_ORACLES["dedup_lsh_stream_parity"] = _dedup_lsh_stream_parity_sql


# ------------------------------------------- daily OHLC bars with open
#
# The r9 daily-bar toolkit (queries_r9._daily_bars_df) carries H/L/C;
# the r10 range-volatility estimators also need the OPEN (first tick
# by (ts, event_id)).  Same determinism contract: micro-price BIGINTs,
# one (type, day) agg over the events scan, windows over the tiny bar
# frame.


def _daily_bars_oc_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, om, hm, lm, cm, vol) daily candles in
    micro-price integers; open/close = first/last tick."""
    from kp_crypto_market_analytics_spark.queries_r9 import _daily_bars_df

    t = load_tables(spark, sf_dir, ["events"])
    e = ensure_parallelism(t["events"]).select(
        "event_type",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * F.lit(1_000_000.0), 0)
        .cast("long")
        .alias("vm"),
    )
    wo = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    opn = (
        e.withColumn("__rn", F.row_number().over(wo))
        .where(F.col("__rn") == 1)
        .select("event_type", "day", F.col("vm").alias("om"))
    )
    return _daily_bars_df(spark, sf_dir).join(opn, ["event_type", "day"])


def _bars_oc_cte() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import DAILY_BARS_CTE

    return (
        DAILY_BARS_CTE
        + """, op AS (
  SELECT event_type, day, vm AS om FROM (
    SELECT event_type, day, vm,
      row_number() OVER (PARTITION BY event_type, day
                         ORDER BY ts, event_id) AS rn
    FROM ev) WHERE rn = 1
), barso AS (
  SELECT b.event_type, b.day, om, hm, lm, cm, vol
  FROM bars b JOIN op USING (event_type, day)
)"""
    )


# ---------------------------------------------------- ti_garman_klass


def ti_garman_klass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garman-Klass (1980) range-based daily variance estimator per
    symbol: mean over days of 0.5·ln²(H/L) − (2ln2−1)·ln²(C/O), with
    the daily volatility as its square root.  Reference parity: the
    reference ships close-to-close realized vol only
    (src/analytics/binance_analysis.py rolling std); GK is the
    published higher-efficiency range estimator a market-analytics
    engine adds on the same bars.

    Determinism: micro-price ratios cancel the scale; each day's term
    is ONE identical IEEE chain rounded to nano (1e-9) BIGINT, summed
    exactly; the mean/sqrt run once on the exact sum.  Scale: one
    (type, day) agg + a |types|-row fold."""
    bars = _daily_bars_oc_df(spark, sf_dir)
    lhl = F.log(F.col("hm").cast("double") / F.col("lm"))
    lco = F.log(F.col("cm").cast("double") / F.col("om"))
    term = (
        F.lit(0.5) * lhl * lhl
        - (F.lit(2.0) * F.log(F.lit(2.0)) - F.lit(1.0)) * lco * lco
    )
    tn = F.round(term * F.lit(1e9), 0).cast("long")
    g = bars.where((F.col("lm") > 0) & (F.col("om") > 0)).select(
        "event_type", tn.alias("tn")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("tn").alias("sn"),
    )
    var = F.col("sn") / F.lit(1e9) / F.col("n_days")
    return g.select(
        "event_type",
        "n_days",
        (F.round(var, 6) + F.lit(0.0)).alias("gk_daily_var"),
        F.when(var >= 0, F.round(F.sqrt(var), 6)).alias("gk_daily_vol"),
    ).orderBy("event_type")


def _ti_garman_klass_sql() -> str:
    return f"""
WITH {_bars_oc_cte()}, terms AS (
  SELECT event_type,
    CAST(round((0.5 * ln(CAST(hm AS DOUBLE) / lm) * ln(CAST(hm AS DOUBLE) / lm)
      - (2.0 * ln(2.0) - 1.0) * ln(CAST(cm AS DOUBLE) / om)
        * ln(CAST(cm AS DOUBLE) / om)) * 1e9) AS BIGINT) AS tn
  FROM barso WHERE lm > 0 AND om > 0
), g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(tn) AS BIGINT) AS sn
  FROM terms GROUP BY 1
)
SELECT event_type, n_days,
  round(sn / 1e9 / n_days, 6) + 0.0 AS gk_daily_var,
  CASE WHEN sn / 1e9 / n_days >= 0
    THEN round(sqrt(sn / 1e9 / n_days), 6) END AS gk_daily_vol
FROM g ORDER BY event_type
"""


R10_QUERIES["ti_garman_klass"] = ti_garman_klass
_R10_ORACLES["ti_garman_klass"] = _ti_garman_klass_sql


# ------------------------------------------------- ti_rogers_satchell


def ti_rogers_satchell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rogers-Satchell (1991) drift-independent range variance per
    symbol: mean of ln(H/C)ln(H/O) + ln(L/C)ln(L/O) — the estimator
    that stays unbiased under nonzero drift, the published companion
    of Garman-Klass.  Same nano-fold determinism recipe."""
    bars = _daily_bars_oc_df(spark, sf_dir)
    lhc = F.log(F.col("hm").cast("double") / F.col("cm"))
    lho = F.log(F.col("hm").cast("double") / F.col("om"))
    llc = F.log(F.col("lm").cast("double") / F.col("cm"))
    llo = F.log(F.col("lm").cast("double") / F.col("om"))
    term = lhc * lho + llc * llo
    tn = F.round(term * F.lit(1e9), 0).cast("long")
    g = bars.where(
        (F.col("lm") > 0) & (F.col("om") > 0) & (F.col("cm") > 0)
    ).select("event_type", tn.alias("tn")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("tn").alias("sn"),
    )
    var = F.col("sn") / F.lit(1e9) / F.col("n_days")
    return g.select(
        "event_type",
        "n_days",
        (F.round(var, 6) + F.lit(0.0)).alias("rs_daily_var"),
        F.when(var >= 0, F.round(F.sqrt(var), 6)).alias("rs_daily_vol"),
    ).orderBy("event_type")


def _ti_rogers_satchell_sql() -> str:
    t = (
        "ln(CAST(hm AS DOUBLE) / cm) * ln(CAST(hm AS DOUBLE) / om)"
        " + ln(CAST(lm AS DOUBLE) / cm) * ln(CAST(lm AS DOUBLE) / om)"
    )
    return f"""
WITH {_bars_oc_cte()}, terms AS (
  SELECT event_type, CAST(round(({t}) * 1e9) AS BIGINT) AS tn
  FROM barso WHERE lm > 0 AND om > 0 AND cm > 0
), g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(tn) AS BIGINT) AS sn
  FROM terms GROUP BY 1
)
SELECT event_type, n_days,
  round(sn / 1e9 / n_days, 6) + 0.0 AS rs_daily_var,
  CASE WHEN sn / 1e9 / n_days >= 0
    THEN round(sqrt(sn / 1e9 / n_days), 6) END AS rs_daily_vol
FROM g ORDER BY event_type
"""


R10_QUERIES["ti_rogers_satchell"] = ti_rogers_satchell
_R10_ORACLES["ti_rogers_satchell"] = _ti_rogers_satchell_sql


# ----------------------------------------------------- ti_yang_zhang


def ti_yang_zhang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yang-Zhang (2000) minimum-variance range estimator per symbol:
    σ²_YZ = σ²_overnight + k·σ²_open-to-close + (1−k)·σ²_RS with
    k = 0.34/(1.34 + (n+1)/(n−1)) — the published combination that is
    both drift-independent and jump-(overnight-)aware.

    Determinism: the three component series are nano-rounded BIGINTs
    (overnight = ln(O_t/C_{t−1}) needs the bar lag — first bar drops);
    sample variances fold as exact integer/decimal moments, and the
    k-blend is one identical IEEE chain over those exact sums."""
    # positivity filter BEFORE the lag (zero prices exist at sf0.1):
    # prev close refers to the previous POSITIVE bar in both engines.
    bars = _daily_bars_oc_df(spark, sf_dir).where(
        (F.col("lm") > 0) & (F.col("om") > 0)
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev_c = F.lag("cm").over(w)
    on = F.round(
        F.log(F.col("om").cast("double") / prev_c) * F.lit(1e9), 0
    ).cast("long")
    oc = F.round(
        F.log(F.col("cm").cast("double") / F.col("om")) * F.lit(1e9), 0
    ).cast("long")
    lhc = F.log(F.col("hm").cast("double") / F.col("cm"))
    lho = F.log(F.col("hm").cast("double") / F.col("om"))
    llc = F.log(F.col("lm").cast("double") / F.col("cm"))
    llo = F.log(F.col("lm").cast("double") / F.col("om"))
    rs = F.round((lhc * lho + llc * llo) * F.lit(1e9), 0).cast("long")
    d = "decimal(38,0)"
    s = bars.select(
        "event_type", on.alias("on"), oc.alias("oc"), rs.alias("rs")
    )
    g = s.groupBy("event_type").agg(
        F.count("oc").cast("long").alias("n"),
        F.count("on").cast("long").alias("no"),
        F.sum("on").alias("s_on"),
        F.sum(F.col("on").cast(d) * F.col("on").cast(d)).alias("s_on2"),
        F.sum("oc").alias("s_oc"),
        F.sum(F.col("oc").cast(d) * F.col("oc").cast(d)).alias("s_oc2"),
        F.sum("rs").alias("s_rs"),
    )

    def svar(s2, s1, n):  # sample variance of nano ints, in nat units
        return (
            (s2.cast("double") - s1.cast("double") * s1 / n) / (n - F.lit(1.0))
        ) / F.lit(1e18)

    v_on = svar(F.col("s_on2"), F.col("s_on"), F.col("no"))
    v_oc = svar(F.col("s_oc2"), F.col("s_oc"), F.col("n"))
    v_rs = F.col("s_rs") / F.lit(1e9) / F.col("n")
    k = F.lit(0.34) / (
        F.lit(1.34) + (F.col("n") + 1) / (F.col("n") - F.lit(1.0))
    )
    yz = v_on + k * v_oc + (F.lit(1.0) - k) * v_rs
    ok = (F.col("no") > 1) & (F.col("n") > 1)
    return g.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.when(ok, F.round(v_on, 6) + F.lit(0.0)).alias("overnight_var"),
        F.when(ok, F.round(v_oc, 6) + F.lit(0.0)).alias("open_close_var"),
        F.when(ok, F.round(v_rs, 6) + F.lit(0.0)).alias("rs_var"),
        F.when(ok, F.round(k, 6)).alias("k"),
        F.when(ok, F.round(yz, 6) + F.lit(0.0)).alias("yz_daily_var"),
        F.when(ok & (yz >= 0), F.round(F.sqrt(yz), 6)).alias(
            "yz_daily_vol"
        ),
    ).orderBy("event_type")


def _ti_yang_zhang_sql() -> str:
    rs_t = (
        "ln(CAST(hm AS DOUBLE) / cm) * ln(CAST(hm AS DOUBLE) / om)"
        " + ln(CAST(lm AS DOUBLE) / cm) * ln(CAST(lm AS DOUBLE) / om)"
    )
    v_on = "((CAST(s_on2 AS DOUBLE) - CAST(s_on AS DOUBLE) * s_on / no) / (no - 1.0)) / 1e18"
    v_oc = "((CAST(s_oc2 AS DOUBLE) - CAST(s_oc AS DOUBLE) * s_oc / n) / (n - 1.0)) / 1e18"
    v_rs = "s_rs / 1e9 / n"
    k = "0.34 / (1.34 + (n + 1) / (n - 1.0))"
    yz = f"({v_on}) + ({k}) * ({v_oc}) + (1.0 - ({k})) * ({v_rs})"
    return f"""
WITH {_bars_oc_cte()}, series AS (
  SELECT event_type,
    CAST(round(ln(CAST(om AS DOUBLE)
      / lag(cm) OVER (PARTITION BY event_type ORDER BY day)) * 1e9)
      AS BIGINT) AS onr,
    CAST(round(ln(CAST(cm AS DOUBLE) / om) * 1e9) AS BIGINT) AS oc,
    CAST(round(({rs_t}) * 1e9) AS BIGINT) AS rs
  FROM (SELECT * FROM barso WHERE lm > 0 AND om > 0)
), g AS (
  SELECT event_type,
    CAST(COUNT(oc) AS BIGINT) AS n, CAST(COUNT(onr) AS BIGINT) AS no,
    CAST(SUM(onr) AS BIGINT) AS s_on,
    SUM(CAST(onr AS DECIMAL(38,0)) * CAST(onr AS DECIMAL(38,0))) AS s_on2,
    CAST(SUM(oc) AS BIGINT) AS s_oc,
    SUM(CAST(oc AS DECIMAL(38,0)) * CAST(oc AS DECIMAL(38,0))) AS s_oc2,
    CAST(SUM(rs) AS BIGINT) AS s_rs
  FROM series GROUP BY 1
)
SELECT event_type, n AS n_days,
  CASE WHEN no > 1 AND n > 1 THEN round({v_on}, 6) + 0.0 END AS overnight_var,
  CASE WHEN no > 1 AND n > 1 THEN round({v_oc}, 6) + 0.0 END AS open_close_var,
  CASE WHEN no > 1 AND n > 1 THEN round({v_rs}, 6) + 0.0 END AS rs_var,
  CASE WHEN no > 1 AND n > 1 THEN round({k}, 6) END AS k,
  CASE WHEN no > 1 AND n > 1 THEN round({yz}, 6) + 0.0 END AS yz_daily_var,
  CASE WHEN no > 1 AND n > 1 AND ({yz}) >= 0
    THEN round(sqrt({yz}), 6) END AS yz_daily_vol
FROM g ORDER BY event_type
"""


R10_QUERIES["ti_yang_zhang"] = ti_yang_zhang
_R10_ORACLES["ti_yang_zhang"] = _ti_yang_zhang_sql


# --------------------------------------------------------- ti_vortex

_VTX_N = 14


def ti_vortex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vortex indicator (Botes & Siepman 2010): VI+ = ΣVM+/ΣTR and
    VI− = ΣVM−/ΣTR over the trailing 14 bars, where VM+ = |H_t −
    L_{t−1}|, VM− = |L_t − H_{t−1}|, TR the daily true range.  All
    sums are exact micro-price integers; two final IEEE divisions,
    masked until 14 full (lagged) bars and a nonzero TR sum."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _true_range,
        _wd,
    )

    bars = _daily_bars_df(spark, sf_dir).withColumn("trm", _true_range())
    w = _wd()
    vmp = F.abs(F.col("hm") - F.lag("lm").over(w))
    vmm = F.abs(F.col("lm") - F.lag("hm").over(w))
    b = bars.select(
        "event_type", "day", "trm", vmp.alias("vmp"), vmm.alias("vmm")
    )
    wn = _wd().rowsBetween(-(_VTX_N - 1), 0)
    n_vm = F.count("vmp").over(wn)
    s_tr = F.sum("trm").over(wn)
    s_vp = F.sum("vmp").over(wn)
    s_vm = F.sum("vmm").over(wn)
    ok = (n_vm >= _VTX_N) & (s_tr > 0)
    return b.select(
        "event_type",
        "day",
        F.when(ok, F.round(s_vp / s_tr, 6)).alias("vi_plus"),
        F.when(ok, F.round(s_vm / s_tr, 6)).alias("vi_minus"),
        F.when(ok, F.round((s_vp - s_vm) / s_tr, 6) + F.lit(0.0)).alias(
            "vi_diff"
        ),
    ).orderBy("event_type", "day")


def _ti_vortex_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _TR_SQL,
        _WD_SQL,
        DAILY_BARS_CTE,
    )

    return f"""
WITH {DAILY_BARS_CTE}, b AS (
  SELECT event_type, day, {_TR_SQL} AS trm,
    abs(hm - lag(lm) OVER ({_WD_SQL})) AS vmp,
    abs(lm - lag(hm) OVER ({_WD_SQL})) AS vmm
  FROM bars
)
SELECT event_type, day,
  CASE WHEN COUNT(vmp) OVER w >= {_VTX_N} AND SUM(trm) OVER w > 0
    THEN round(SUM(vmp) OVER w / CAST(SUM(trm) OVER w AS DOUBLE), 6)
  END AS vi_plus,
  CASE WHEN COUNT(vmp) OVER w >= {_VTX_N} AND SUM(trm) OVER w > 0
    THEN round(SUM(vmm) OVER w / CAST(SUM(trm) OVER w AS DOUBLE), 6)
  END AS vi_minus,
  CASE WHEN COUNT(vmp) OVER w >= {_VTX_N} AND SUM(trm) OVER w > 0
    THEN round((SUM(vmp) OVER w - SUM(vmm) OVER w)
               / CAST(SUM(trm) OVER w AS DOUBLE), 6) + 0.0
  END AS vi_diff
FROM b
WINDOW w AS ({_WD_SQL} ROWS BETWEEN {_VTX_N - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


R10_QUERIES["ti_vortex"] = ti_vortex
_R10_ORACLES["ti_vortex"] = _ti_vortex_sql


# ------------------------------------------------- ti_chande_momentum

_CMO_N = 14


def ti_chande_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chande Momentum Oscillator (1994): 100·(Σgains − Σlosses)/
    (Σgains + Σlosses) over the trailing 14 close-to-close moves —
    the unsmoothed RSI relative.  Gains/losses are exact micro
    integers; one final IEEE division, masked below 14 moves or a
    flat window."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    bars = _daily_bars_df(spark, sf_dir)
    d = F.col("cm") - F.lag("cm").over(_wd())
    b = bars.select("event_type", "day", d.alias("d"))
    wn = _wd().rowsBetween(-(_CMO_N - 1), 0)
    su = F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0)).over(wn)
    sd = F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(0)).over(wn)
    n = F.count("d").over(wn)
    ok = (n >= _CMO_N) & (su + sd > 0)
    return b.select(
        "event_type",
        "day",
        F.when(ok, F.round(F.lit(100.0) * (su - sd) / (su + sd), 6)
               + F.lit(0.0)).alias("cmo"),
    ).orderBy("event_type", "day")


def _ti_chande_momentum_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _WD_SQL,
        DAILY_BARS_CTE,
    )

    return f"""
WITH {DAILY_BARS_CTE}, b AS (
  SELECT event_type, day, cm - lag(cm) OVER ({_WD_SQL}) AS d FROM bars
), s AS (
  SELECT event_type, day,
    SUM(CASE WHEN d > 0 THEN d ELSE 0 END) OVER w AS su,
    SUM(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER w AS sd,
    COUNT(d) OVER w AS n
  FROM b
  WINDOW w AS ({_WD_SQL} ROWS BETWEEN {_CMO_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
  CASE WHEN n >= {_CMO_N} AND su + sd > 0
    THEN round(100.0 * (su - sd) / (su + sd), 6) + 0.0
  END AS cmo
FROM s ORDER BY event_type, day
"""


R10_QUERIES["ti_chande_momentum"] = ti_chande_momentum
_R10_ORACLES["ti_chande_momentum"] = _ti_chande_momentum_sql


# ------------------------------------------------------------ ti_cci

_CCI_N = 20


def ti_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commodity Channel Index (Lambert 1980): (TP − SMA20(TP)) /
    (0.015 · mean deviation) over the trailing 20 daily typical
    prices.  The mean deviation depends on TODAY's SMA (not each
    row's), so the window is expressed as a bounded self-join on the
    per-type day index — 20 candidate rows per bar on the tiny daily
    frame, the range-join shape both engines evaluate identically.

    Determinism: work in 3×micro units (tpm3 = H+L+C) so nothing
    fractional appears until the end: CCI = 1000·n·(n·tpm3 − S) /
    (15·Σᵢ|n·tpm3ᵢ − S|) — pure int64/decimal integers, ONE final
    IEEE division, masked below 20 bars or a flat window."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    bars = _daily_bars_df(spark, sf_dir).withColumn(
        "tpm3", F.col("hm") + F.col("lm") + F.col("cm")
    )
    b = bars.withColumn("rn", F.row_number().over(_wd())).select(
        "event_type", "day", "rn", "tpm3"
    )
    d = "decimal(38,0)"
    j = (
        b.alias("a")
        .join(
            b.alias("w"),
            (F.col("a.event_type") == F.col("w.event_type"))
            & (F.col("w.rn") >= F.col("a.rn") - F.lit(_CCI_N - 1))
            & (F.col("w.rn") <= F.col("a.rn")),
        )
        .groupBy("a.event_type", "a.day", "a.tpm3")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("w.tpm3").cast(d).alias("s"),
            F.collect_list(F.struct("w.rn", "w.tpm3")).alias("win"),
        )
    )
    # mean deviation numerator Σ|n·tpmᵢ − S| without a second join:
    # re-aggregate the window list with exact decimal arithmetic.
    dev = F.aggregate(
        "win",
        F.lit(0).cast(d),
        lambda acc, x: acc
        + F.abs(
            x["tpm3"].cast(d) * F.col("n").cast(d) - F.col("s")
        ),
    )
    num = (
        F.col("tpm3").cast(d) * F.col("n").cast(d) - F.col("s")
    ) * F.col("n").cast(d) * F.lit(1000).cast(d)
    ok = (F.col("n") >= _CCI_N) & (dev > 0)
    return j.select(
        "event_type",
        "day",
        F.when(
            ok,
            F.round(
                num.cast("double") / (F.lit(15.0) * dev.cast("double")), 6
            )
            + F.lit(0.0),
        ).alias("cci"),
    ).orderBy("event_type", "day")


def _ti_cci_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _WD_SQL,
        DAILY_BARS_CTE,
    )

    return f"""
WITH {DAILY_BARS_CTE}, b AS (
  SELECT event_type, day, hm + lm + cm AS tpm3,
    row_number() OVER ({_WD_SQL}) AS rn
  FROM bars
), agg AS (
  SELECT a.event_type, a.day, a.tpm3,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(w.tpm3) AS DECIMAL(38,0)) AS s
  FROM b a JOIN b w ON a.event_type = w.event_type
    AND w.rn BETWEEN a.rn - {_CCI_N - 1} AND a.rn
  GROUP BY 1, 2, 3
), dev AS (
  SELECT a.event_type, a.day,
    CAST(SUM(abs(CAST(w.tpm3 AS DECIMAL(38,0)) * g.n - g.s))
         AS DECIMAL(38,0)) AS sdev
  FROM b a JOIN b w ON a.event_type = w.event_type
    AND w.rn BETWEEN a.rn - {_CCI_N - 1} AND a.rn
  JOIN agg g ON g.event_type = a.event_type AND g.day = a.day
  GROUP BY 1, 2
)
SELECT g.event_type, g.day,
  CASE WHEN g.n >= {_CCI_N} AND d.sdev > 0 THEN
    round(CAST((CAST(g.tpm3 AS DECIMAL(38,0)) * g.n - g.s) * g.n * 1000
               AS DOUBLE) / (15.0 * CAST(d.sdev AS DOUBLE)), 6) + 0.0
  END AS cci
FROM agg g JOIN dev d ON g.event_type = d.event_type AND g.day = d.day
ORDER BY g.event_type, g.day
"""


R10_QUERIES["ti_cci"] = ti_cci
_R10_ORACLES["ti_cci"] = _ti_cci_sql


# ---------------------------------------------------- ti_force_index

_FI_N = 13


def ti_force_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Force Index (Elder 1993), SMA-13 variant: volume · close-to-
    close move per bar, smoothed by a 13-bar simple average (the
    window-expressible published smoothing, same choice as ti_atr's
    Cutler form).  fi folds as exact DECIMAL micro·volume integers;
    the SMA is the half-away integer division of the exact sum."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    d = "decimal(38,0)"
    bars = _daily_bars_df(spark, sf_dir)
    dm = F.col("cm") - F.lag("cm").over(_wd())
    b = bars.withColumn("fim", dm.cast(d) * F.col("vol").cast(d)).select(
        "event_type", "day", "fim"
    )
    wn = _wd().rowsBetween(-(_FI_N - 1), 0)
    n = F.count("fim").over(wn)
    s = F.sum("fim").over(wn)
    # half-away-from-zero integer division of the micro sum by n
    sma_micro = F.when(s < 0, -F.lit(1).cast(d)).otherwise(
        F.lit(1).cast(d)
    ) * F.call_function(
        "div", F.lit(2).cast(d) * F.abs(s) + n.cast(d), F.lit(2).cast(d) * n.cast(d)
    )
    return b.select(
        "event_type",
        "day",
        (F.col("fim").cast("double") / F.lit(1e6) + F.lit(0.0)).alias(
            "force_index"
        ),
        F.when(
            n >= _FI_N, sma_micro.cast("double") / F.lit(1e6) + F.lit(0.0)
        ).alias("force_index_sma13"),
    ).orderBy("event_type", "day")


def _ti_force_index_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _WD_SQL,
        DAILY_BARS_CTE,
    )

    return f"""
WITH {DAILY_BARS_CTE}, b AS (
  SELECT event_type, day,
    CAST(cm - lag(cm) OVER ({_WD_SQL}) AS DECIMAL(38,0))
      * CAST(vol AS DECIMAL(38,0)) AS fim
  FROM bars
), s AS (
  SELECT event_type, day, fim,
    COUNT(fim) OVER w AS n, SUM(fim) OVER w AS sfim
  FROM b
  WINDOW w AS ({_WD_SQL} ROWS BETWEEN {_FI_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
  CAST(fim AS DOUBLE) / 1e6 + 0.0 AS force_index,
  CASE WHEN n >= {_FI_N} THEN
    CAST((CASE WHEN sfim < 0 THEN -1 ELSE 1 END)
         * ((2 * abs(CAST(sfim AS HUGEINT)) + n) // (2 * n)) AS DOUBLE)
      / 1e6 + 0.0
  END AS force_index_sma13
FROM s ORDER BY event_type, day
"""


R10_QUERIES["ti_force_index"] = ti_force_index
_R10_ORACLES["ti_force_index"] = _ti_force_index_sql


# ------------------------------------------------------------ ti_eom

_EOM_N = 14


def ti_eom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ease of Movement (Arms 1989): midpoint move divided by the box
    ratio — emv = (mid_t − mid_{t−1}) · (H − L) / volume — with a
    14-bar simple average.  The per-bar emv is (move2·range)/(2e12·
    vol) with an exact DECIMAL numerator (move2 = 2×micro midpoint
    move, range = micro H−L); each emv rounds to 6 dp and the SMA is
    the exact decimal-mean division (round_mean_micro)."""
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        round_mean_micro,
    )
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    d = "decimal(38,0)"
    bars = _daily_bars_df(spark, sf_dir)
    mid2 = F.col("hm") + F.col("lm")
    move2 = mid2 - F.lag(mid2).over(_wd())
    emv = F.when(
        (F.col("vol") > 0) & (F.col("hm") > F.col("lm")),
        F.round(
            (move2.cast(d) * (F.col("hm") - F.col("lm")).cast(d)).cast(
                "double"
            )
            / (F.lit(2e12) * F.col("vol")),
            6,
        )
        + F.lit(0.0),
    )
    b = bars.select("event_type", "day", emv.alias("emv"))
    wn = _wd().rowsBetween(-(_EOM_N - 1), 0)
    n = F.count("emv").over(wn)
    sm = F.sum(F.col("emv").cast(DEC)).over(wn)
    return b.select(
        "event_type",
        "day",
        "emv",
        F.when(n >= _EOM_N, round_mean_micro(sm, n) + F.lit(0.0)).alias(
            "emv_sma14"
        ),
    ).orderBy("event_type", "day")


def _ti_eom_sql() -> str:
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        sql_round_mean_micro,
    )
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _WD_SQL,
        DAILY_BARS_CTE,
    )

    mean = sql_round_mean_micro("SUM(CAST(emv AS DECIMAL(18,6))) OVER w", "COUNT(emv) OVER w")
    return f"""
WITH {DAILY_BARS_CTE}, b AS (
  SELECT event_type, day,
    CASE WHEN vol > 0 AND hm > lm THEN
      round(CAST(CAST(hm + lm - lag(hm + lm) OVER ({_WD_SQL})
                      AS DECIMAL(38,0)) * (hm - lm) AS DOUBLE)
            / (2e12 * vol), 6) + 0.0
    END AS emv
  FROM bars
)
SELECT event_type, day, emv,
  CASE WHEN COUNT(emv) OVER w >= {_EOM_N} THEN {mean} + 0.0 END AS emv_sma14
FROM b
WINDOW w AS ({_WD_SQL} ROWS BETWEEN {_EOM_N - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


R10_QUERIES["ti_eom"] = ti_eom
_R10_ORACLES["ti_eom"] = _ti_eom_sql
