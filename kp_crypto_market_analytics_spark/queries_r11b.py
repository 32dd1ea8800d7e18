"""Round-11 second-wave registry queries.

Widens the daily-bar indicator toolkit (Ultimate/Awesome oscillators,
KST, pivot points, choppiness, balance-of-power+Qstick), the classical
statistics battery (Bartlett, Jonckheere-Terpstra, Cochran-Armitage,
odds ratio, Chow, Breusch-Pagan, D'Agostino K², Cramér-von Mises),
adds complexity measures (permutation entropy, sample entropy), text
richness (hapax/Honoré/Sichel, distinct-n diversity), embedding
geometry (participation ratio, linear CKA), the co-purchase bipartite
projection, and a functional-dependency audit.

Every query follows the repo determinism recipes (SCALING.md):
integer/decimal folds end-to-end, per-term micro-quantization via the
``_half_away`` exact division or the ``round(ln(x)*1e6)`` BIGINT rule
where a transcendental must enter a sum, and ONE final IEEE expression
per emitted float — written token-identically in the Spark and DuckDB
dialects.

Reference parity: extends the indicator/stat families surveyed from
the reference's analysis pass (SURVEY.md §2 A-block; reference
binance_analysis.py rolling-stat loops) with the standard daily-bar
and hypothesis-test catalogue a switching user would expect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.session import load_tables

R11B_QUERIES: dict = {}
_R11B_ORACLES: dict = {}


def r11b_oracles() -> dict[str, str]:
    return {name: fn() for name, fn in _R11B_ORACLES.items()}


# ------------------------------------------- ti_ultimate_oscillator

_UO_WINDOWS = (7, 14, 28)


def ti_ultimate_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Williams' Ultimate Oscillator on the daily bars: buying
    pressure BP = C − min(L, prevC) and true-range TR = max(H, prevC)
    − min(L, prevC) summed over 7/14/28 days, blended 4:2:1 —
    UO = 100·(4·S7 + 2·S14 + S28)/7 with S_k = ΣBP_k/ΣTR_k.

    Determinism: BP and TR are exact micro BIGINTs (defined from the
    second bar), the six window sums fold as integers, and the blend
    is ONE IEEE expression per row, masked until 28 BP/TR terms exist
    and every TR sum is positive.

    Scale shape: one shuffle to the (event_type, day) bars, then
    narrow window passes per event_type — no joins, no extra
    exchange."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    bars = _daily_bars_df(spark, sf_dir)
    prev = F.lag("cm").over(_wd())
    bp = F.when(prev.isNotNull(), F.col("cm") - F.least(F.col("lm"), prev))
    tr = F.when(
        prev.isNotNull(),
        F.greatest(F.col("hm"), prev) - F.least(F.col("lm"), prev),
    )
    b = bars.select(
        "event_type", "day", bp.alias("bp"), tr.alias("tr")
    )
    sums = {}
    for k in _UO_WINDOWS:
        w = _wd().rowsBetween(-(k - 1), 0)
        sums[k] = (
            F.sum("bp").over(w).alias(f"bp{k}"),
            F.sum("tr").over(w).alias(f"tr{k}"),
            F.count("bp").over(w).alias(f"n{k}"),
        )
    b = b.select(
        "event_type",
        "day",
        *[c for k in _UO_WINDOWS for c in sums[k]],
    )
    ok = None
    for k in _UO_WINDOWS:
        cond = (F.col(f"n{k}") == k) & (F.col(f"tr{k}") > 0)
        ok = cond if ok is None else ok & cond
    uo = (
        F.lit(100.0)
        * (
            F.lit(4.0) * (F.col("bp7").cast("double") / F.col("tr7"))
            + F.lit(2.0) * (F.col("bp14").cast("double") / F.col("tr14"))
            + (F.col("bp28").cast("double") / F.col("tr28"))
        )
        / F.lit(7.0)
    )
    return (
        b.select(
            "event_type",
            "day",
            F.when(ok, F.round(uo, 6) + F.lit(0.0)).alias("ultimate_osc"),
        )
        .orderBy("event_type", "day")
    )


def _ti_ultimate_oscillator_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    win = {
        k: f"({_WD_SQL} ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)"
        for k in _UO_WINDOWS
    }
    sums = ",\n    ".join(
        f"SUM(bp) OVER {win[k]} AS bp{k}, SUM(tr) OVER {win[k]} AS tr{k},"
        f" COUNT(bp) OVER {win[k]} AS n{k}"
        for k in _UO_WINDOWS
    )
    ok = " AND ".join(f"n{k} = {k} AND tr{k} > 0" for k in _UO_WINDOWS)
    return f"""
WITH {DAILY_BARS_CTE}, b AS (
  SELECT event_type, day,
    CASE WHEN lag(cm) OVER d IS NOT NULL
         THEN cm - least(lm, lag(cm) OVER d) END AS bp,
    CASE WHEN lag(cm) OVER d IS NOT NULL
         THEN greatest(hm, lag(cm) OVER d) - least(lm, lag(cm) OVER d)
         END AS tr
  FROM bars
  WINDOW d AS ({_WD_SQL})
), s AS (
  SELECT event_type, day,
    {sums}
  FROM b
)
SELECT event_type, day,
  CASE WHEN {ok} THEN
    round(100.0 * (4.0 * (CAST(bp7 AS DOUBLE) / tr7)
                   + 2.0 * (CAST(bp14 AS DOUBLE) / tr14)
                   + (CAST(bp28 AS DOUBLE) / tr28)) / 7.0, 6) + 0.0
  END AS ultimate_osc
FROM s
ORDER BY event_type, day
"""


R11B_QUERIES["ti_ultimate_oscillator"] = ti_ultimate_oscillator
_R11B_ORACLES["ti_ultimate_oscillator"] = _ti_ultimate_oscillator_sql


# ------------------------------------------- ti_awesome_oscillator

_AO_FAST = 5
_AO_SLOW = 34


def ti_awesome_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill Williams' Awesome Oscillator: SMA5(midprice) −
    SMA34(midprice) with mid = (H+L)/2, plus the bar color (sign of
    the AO change) — the momentum histogram driving the saucer/zero-
    cross entries.

    Determinism: mid stays doubled-integer (hm+lm), the two SMAs
    share the exact common denominator 2·5·34 = 340, so the AO
    numerator 34·Σ₅ − 5·Σ₃₄ is an exact BIGINT; ONE IEEE division by
    340·10⁶ per row; the color compares the exact integer numerators,
    never the floats."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    bars = _daily_bars_df(spark, sf_dir).withColumn(
        "mid2", F.col("hm") + F.col("lm")
    )
    wf = _wd().rowsBetween(-(_AO_FAST - 1), 0)
    ws = _wd().rowsBetween(-(_AO_SLOW - 1), 0)
    b = bars.select(
        "event_type",
        "day",
        (
            F.lit(_AO_SLOW) * F.sum("mid2").over(wf)
            - F.lit(_AO_FAST) * F.sum("mid2").over(ws)
        ).alias("ao_num"),
        F.count("mid2").over(ws).alias("n_s"),
    )
    den = 2 * _AO_FAST * _AO_SLOW
    ao_num = F.when(F.col("n_s") == _AO_SLOW, F.col("ao_num"))
    b = b.select(
        "event_type", "day", ao_num.alias("ao_num")
    ).withColumn("ao_prev", F.lag("ao_num").over(_wd()))
    color = F.when(
        F.col("ao_num").isNotNull() & F.col("ao_prev").isNotNull(),
        F.signum((F.col("ao_num") - F.col("ao_prev")).cast("double")).cast(
            "long"
        ),
    )
    return (
        b.select(
            "event_type",
            "day",
            (
                F.round(F.col("ao_num").cast("double") / F.lit(den * 1e6), 6)
                + F.lit(0.0)
            ).alias("awesome_osc"),
            color.alias("ao_color"),
        )
        .orderBy("event_type", "day")
    )


def _ti_awesome_oscillator_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    den = 2 * _AO_FAST * _AO_SLOW
    wf = f"({_WD_SQL} ROWS BETWEEN {_AO_FAST - 1} PRECEDING AND CURRENT ROW)"
    ws = f"({_WD_SQL} ROWS BETWEEN {_AO_SLOW - 1} PRECEDING AND CURRENT ROW)"
    return f"""
WITH {DAILY_BARS_CTE}, m AS (
  SELECT event_type, day, hm + lm AS mid2 FROM bars
), s AS (
  SELECT event_type, day,
    CASE WHEN COUNT(mid2) OVER {ws} = {_AO_SLOW} THEN
      {_AO_SLOW} * SUM(mid2) OVER {wf} - {_AO_FAST} * SUM(mid2) OVER {ws}
    END AS ao_num
  FROM m
), p AS (
  SELECT event_type, day, ao_num,
    lag(ao_num) OVER ({_WD_SQL}) AS ao_prev
  FROM s
)
SELECT event_type, day,
  round(CAST(ao_num AS DOUBLE) / {den * 1e6}, 6) + 0.0 AS awesome_osc,
  CASE WHEN ao_num IS NOT NULL AND ao_prev IS NOT NULL THEN
    CAST(sign(CAST(ao_num - ao_prev AS DOUBLE)) AS BIGINT)
  END AS ao_color
FROM p
ORDER BY event_type, day
"""


R11B_QUERIES["ti_awesome_oscillator"] = ti_awesome_oscillator
_R11B_ORACLES["ti_awesome_oscillator"] = _ti_awesome_oscillator_sql


# ------------------------------------------------------------ ti_kst

# (ROC lag, SMA length, weight) per Pring's daily KST.
_KST_LEGS = ((10, 10, 1), (15, 10, 2), (20, 10, 3), (30, 15, 4))
_KST_DEN = 30  # lcm of 10/10/10/15 folded with the 1..4 weights
_KST_SIG = 9


def ti_kst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pring's Know-Sure-Thing: weighted sum of four SMA-smoothed
    rate-of-change legs, KST = Σ w_j·SMA_{m_j}(ROC_{k_j}), plus its
    9-day SMA signal line.

    Determinism: each ROC is quantized to micro BIGINT by exact
    half-away division (the ti_coppock recipe); the four SMAs share
    the common denominator 30 (= lcm(10,15) folded with weights
    3/30 + 6/30 + 9/30 + 8/30), so the KST numerator is one exact
    integer window fold; the signal line is the 9-sum of that
    integer.  ONE IEEE division per emitted column, masked until
    every leg's SMA window is fully populated."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )
    from kp_crypto_market_analytics_spark.queries_r11 import _half_away

    bars = _daily_bars_df(spark, sf_dir)
    d = "decimal(38,0)"

    cols = []
    for k, _, _ in _KST_LEGS:
        lagc = F.lag("cm", k).over(_wd())
        cols.append(
            F.when(
                lagc.isNotNull() & (lagc > 0),
                _half_away(
                    (F.col("cm").cast(d) - lagc.cast(d))
                    * F.lit(1_000_000).cast(d),
                    lagc.cast(d),
                ),
            ).alias(f"roc{k}")
        )
    b = bars.select("event_type", "day", *cols)
    num = None
    present = None
    for k, m, w in _KST_LEGS:
        wm = _wd().rowsBetween(-(m - 1), 0)
        term = F.lit(w * _KST_DEN // m) * F.sum(f"roc{k}").over(wm)
        num = term if num is None else num + term
        p = F.count(f"roc{k}").over(wm) == m
        present = p if present is None else present & p
    b = b.select(
        "event_type",
        "day",
        F.when(present, num).alias("kst_num"),
    )
    wsig = _wd().rowsBetween(-(_KST_SIG - 1), 0)
    b = b.select(
        "event_type",
        "day",
        "kst_num",
        F.when(
            F.count("kst_num").over(wsig) == _KST_SIG,
            F.sum("kst_num").over(wsig),
        ).alias("sig_num"),
    )
    return (
        b.select(
            "event_type",
            "day",
            (
                F.round(
                    F.col("kst_num").cast("double")
                    / F.lit(_KST_DEN * 1e6),
                    6,
                )
                + F.lit(0.0)
            ).alias("kst"),
            (
                F.round(
                    F.col("sig_num").cast("double")
                    / F.lit(_KST_SIG * _KST_DEN * 1e6),
                    6,
                )
                + F.lit(0.0)
            ).alias("kst_signal"),
        )
        .orderBy("event_type", "day")
    )


def _ti_kst_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )
    from kp_crypto_market_analytics_spark.queries_r11 import _sql_half_away

    rocs = ",\n    ".join(
        "CASE WHEN lag(cm, {k}) OVER d IS NOT NULL"
        " AND lag(cm, {k}) OVER d > 0 THEN {t} END AS roc{k}".format(
            k=k,
            t=_sql_half_away(
                f"(CAST(cm AS HUGEINT) - lag(cm, {k}) OVER d) * 1000000",
                f"lag(cm, {k}) OVER d",
            ),
        )
        for k, _, _ in _KST_LEGS
    )
    terms = []
    present = []
    for k, m, w in _KST_LEGS:
        wm = f"({_WD_SQL} ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW)"
        terms.append(f"{w * _KST_DEN // m} * SUM(roc{k}) OVER {wm}")
        present.append(f"COUNT(roc{k}) OVER {wm} = {m}")
    wsig = f"({_WD_SQL} ROWS BETWEEN {_KST_SIG - 1} PRECEDING AND CURRENT ROW)"
    return f"""
WITH {DAILY_BARS_CTE}, r AS (
  SELECT event_type, day,
    {rocs}
  FROM bars
  WINDOW d AS ({_WD_SQL})
), n AS (
  SELECT event_type, day,
    CASE WHEN {" AND ".join(present)}
         THEN {" + ".join(terms)} END AS kst_num
  FROM r
), s AS (
  SELECT event_type, day, kst_num,
    CASE WHEN COUNT(kst_num) OVER {wsig} = {_KST_SIG}
         THEN SUM(kst_num) OVER {wsig} END AS sig_num
  FROM n
)
SELECT event_type, day,
  round(CAST(kst_num AS DOUBLE) / {_KST_DEN * 1e6}, 6) + 0.0 AS kst,
  round(CAST(sig_num AS DOUBLE) / {_KST_SIG * _KST_DEN * 1e6}, 6) + 0.0
    AS kst_signal
FROM s
ORDER BY event_type, day
"""


R11B_QUERIES["ti_kst"] = ti_kst
_R11B_ORACLES["ti_kst"] = _ti_kst_sql


# --------------------------------------------------- ti_pivot_points


def ti_pivot_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic floor-trader pivot points from the PRIOR day's bar:
    P = (H+L+C)/3, R1 = 2P−L, S1 = 2P−H, R2 = P+(H−L), S2 = P−(H−L)
    — the daily support/resistance scaffold.

    Determinism: every level is an exact integer numerator over the
    common denominator 3 (p_num = prevH+prevL+prevC micro); ONE IEEE
    division by 3·10⁶ per column; first bar masked."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _wd,
    )

    bars = _daily_bars_df(spark, sf_dir)
    ph = F.lag("hm").over(_wd())
    pl = F.lag("lm").over(_wd())
    pc = F.lag("cm").over(_wd())
    b = bars.select(
        "event_type",
        "day",
        (ph + pl + pc).alias("p_num"),
        ph.alias("ph"),
        pl.alias("pl"),
    )

    def lvl(num, name):
        return (
            F.round(num.cast("double") / F.lit(3e6), 6) + F.lit(0.0)
        ).alias(name)

    p = F.col("p_num")
    return (
        b.select(
            "event_type",
            "day",
            lvl(p, "pivot"),
            lvl(F.lit(2) * p - F.lit(3) * F.col("pl"), "r1"),
            lvl(F.lit(2) * p - F.lit(3) * F.col("ph"), "s1"),
            lvl(p + F.lit(3) * (F.col("ph") - F.col("pl")), "r2"),
            lvl(p - F.lit(3) * (F.col("ph") - F.col("pl")), "s2"),
        )
        .orderBy("event_type", "day")
    )


def _ti_pivot_points_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _WD_SQL,
    )

    return f"""
WITH {DAILY_BARS_CTE}, p AS (
  SELECT event_type, day,
    lag(hm) OVER d + lag(lm) OVER d + lag(cm) OVER d AS p_num,
    lag(hm) OVER d AS ph, lag(lm) OVER d AS pl
  FROM bars
  WINDOW d AS ({_WD_SQL})
)
SELECT event_type, day,
  round(CAST(p_num AS DOUBLE) / 3000000.0, 6) + 0.0 AS pivot,
  round(CAST(2 * p_num - 3 * pl AS DOUBLE) / 3000000.0, 6) + 0.0 AS r1,
  round(CAST(2 * p_num - 3 * ph AS DOUBLE) / 3000000.0, 6) + 0.0 AS s1,
  round(CAST(p_num + 3 * (ph - pl) AS DOUBLE) / 3000000.0, 6) + 0.0 AS r2,
  round(CAST(p_num - 3 * (ph - pl) AS DOUBLE) / 3000000.0, 6) + 0.0 AS s2
FROM p
ORDER BY event_type, day
"""


R11B_QUERIES["ti_pivot_points"] = ti_pivot_points
_R11B_ORACLES["ti_pivot_points"] = _ti_pivot_points_sql


# ---------------------------------------------------- ti_choppiness

_CHOP_N = 14


def ti_choppiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Choppiness Index: 100·ln(ΣTR₁₄ / (HH₁₄ − LL₁₄)) / ln(14) — the
    trend-vs-range regime gauge (≈100 = sideways chop, ≈0 = straight
    trend).

    Determinism: the TR sum and the channel width are exact micro
    BIGINT window folds (the repo _true_range); the log ratio is ONE
    IEEE expression (natural-log quotient form so both engines hit
    the same libm path), masked until 14 bars exist and the channel
    is non-degenerate."""
    from kp_crypto_market_analytics_spark.queries_r9 import (
        _daily_bars_df,
        _true_range,
        _wd,
    )

    bars = _daily_bars_df(spark, sf_dir).withColumn("trm", _true_range())
    w = _wd().rowsBetween(-(_CHOP_N - 1), 0)
    b = bars.select(
        "event_type",
        "day",
        F.sum("trm").over(w).alias("atr_sum"),
        F.max("hm").over(w).alias("hh"),
        F.min("lm").over(w).alias("ll"),
        F.count("trm").over(w).alias("n"),
    )
    ok = (
        (F.col("n") == _CHOP_N)
        & (F.col("hh") > F.col("ll"))
        & (F.col("atr_sum") > 0)
    )
    chop = (
        F.lit(100.0)
        * F.log(F.col("atr_sum").cast("double") / (F.col("hh") - F.col("ll")))
        / F.log(F.lit(float(_CHOP_N)))
    )
    return (
        b.select(
            "event_type",
            "day",
            F.when(ok, F.round(chop, 6) + F.lit(0.0)).alias("choppiness"),
        )
        .orderBy("event_type", "day")
    )


def _ti_choppiness_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r9 import (
        DAILY_BARS_CTE,
        _TR_SQL,
        _WD_SQL,
    )

    w = f"({_WD_SQL} ROWS BETWEEN {_CHOP_N - 1} PRECEDING AND CURRENT ROW)"
    return f"""
WITH {DAILY_BARS_CTE}, t AS (
  SELECT event_type, day, {_TR_SQL} AS trm, hm, lm FROM bars
), s AS (
  SELECT event_type, day,
    SUM(trm) OVER {w} AS atr_sum,
    MAX(hm) OVER {w} AS hh,
    MIN(lm) OVER {w} AS ll,
    COUNT(trm) OVER {w} AS n
  FROM t
)
SELECT event_type, day,
  CASE WHEN n = {_CHOP_N} AND hh > ll AND atr_sum > 0 THEN
    round(100.0 * ln(CAST(atr_sum AS DOUBLE) / (hh - ll))
          / ln({float(_CHOP_N)}), 6) + 0.0
  END AS choppiness
FROM s
ORDER BY event_type, day
"""


R11B_QUERIES["ti_choppiness"] = ti_choppiness
_R11B_ORACLES["ti_choppiness"] = _ti_choppiness_sql


# ------------------------------------------------------------ ti_bop

_QSTICK_N = 8
_BOP_SMA = 14


def ti_bop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance of Power BOP = (C−O)/(H−L) with its 14-day SMA, plus
    Qstick (8-day SMA of C−O) — the candle-body pressure pair over
    the open/close daily bars.

    Determinism: per-day BOP is quantized to micro BIGINT by exact
    half-away division (H>L mask); the SMA folds those integers; the
    Qstick numerator is a pure integer window sum.  ONE IEEE division
    per emitted column."""
    from kp_crypto_market_analytics_spark.queries_r10 import (
        _daily_bars_oc_df,
    )
    from kp_crypto_market_analytics_spark.queries_r11 import _half_away
    from kp_crypto_market_analytics_spark.queries_r9 import _wd

    bars = _daily_bars_oc_df(spark, sf_dir)
    d = "decimal(38,0)"
    bop_m = F.when(
        F.col("hm") > F.col("lm"),
        _half_away(
            (F.col("cm").cast(d) - F.col("om").cast(d))
            * F.lit(1_000_000).cast(d),
            (F.col("hm") - F.col("lm")).cast(d),
        ),
    )
    b = bars.select(
        "event_type",
        "day",
        bop_m.alias("bop_m"),
        (F.col("cm") - F.col("om")).alias("co"),
    )
    wb = _wd().rowsBetween(-(_BOP_SMA - 1), 0)
    wq = _wd().rowsBetween(-(_QSTICK_N - 1), 0)
    b = b.select(
        "event_type",
        "day",
        "bop_m",
        F.when(
            F.count("bop_m").over(wb) == _BOP_SMA, F.sum("bop_m").over(wb)
        ).alias("bop_sum"),
        F.when(
            F.count("co").over(wq) == _QSTICK_N, F.sum("co").over(wq)
        ).alias("q_sum"),
    )
    return (
        b.select(
            "event_type",
            "day",
            (
                F.round(F.col("bop_m").cast("double") / F.lit(1e6), 6)
                + F.lit(0.0)
            ).alias("bop"),
            (
                F.round(
                    F.col("bop_sum").cast("double") / F.lit(_BOP_SMA * 1e6),
                    6,
                )
                + F.lit(0.0)
            ).alias("bop_sma"),
            (
                F.round(
                    F.col("q_sum").cast("double") / F.lit(_QSTICK_N * 1e6), 6
                )
                + F.lit(0.0)
            ).alias("qstick"),
        )
        .orderBy("event_type", "day")
    )


def _ti_bop_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_r10 import _bars_oc_cte
    from kp_crypto_market_analytics_spark.queries_r11 import _sql_half_away
    from kp_crypto_market_analytics_spark.queries_r9 import _WD_SQL

    wb = f"({_WD_SQL} ROWS BETWEEN {_BOP_SMA - 1} PRECEDING AND CURRENT ROW)"
    wq = f"({_WD_SQL} ROWS BETWEEN {_QSTICK_N - 1} PRECEDING AND CURRENT ROW)"
    bop = _sql_half_away(
        "(CAST(cm AS HUGEINT) - om) * 1000000", "hm - lm"
    )
    return f"""
WITH {_bars_oc_cte()}, b AS (
  SELECT event_type, day,
    CASE WHEN hm > lm THEN {bop} END AS bop_m,
    cm - om AS co
  FROM barso
), s AS (
  SELECT event_type, day, bop_m,
    CASE WHEN COUNT(bop_m) OVER {wb} = {_BOP_SMA}
         THEN SUM(bop_m) OVER {wb} END AS bop_sum,
    CASE WHEN COUNT(co) OVER {wq} = {_QSTICK_N}
         THEN SUM(co) OVER {wq} END AS q_sum
  FROM b
)
SELECT event_type, day,
  round(CAST(bop_m AS DOUBLE) / 1000000.0, 6) + 0.0 AS bop,
  round(CAST(bop_sum AS DOUBLE) / {_BOP_SMA * 1e6}, 6) + 0.0 AS bop_sma,
  round(CAST(q_sum AS DOUBLE) / {_QSTICK_N * 1e6}, 6) + 0.0 AS qstick
FROM s
ORDER BY event_type, day
"""


R11B_QUERIES["ti_bop"] = ti_bop
_R11B_ORACLES["ti_bop"] = _ti_bop_sql
