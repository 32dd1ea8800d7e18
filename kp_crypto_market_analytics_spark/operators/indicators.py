"""Technical-indicator window builders (beyond-reference family).

The reference computes one indicator — rolling volatility of log
returns (`src/analytics/binance_analysis.py:232-239`, covered by
`w2_rolling_std`) — but any user of a crypto-market analytics engine
reaches next for the classic price-series indicators.  This module
supplies them as composable window expressions that stay entirely
inside whole-stage codegen: one sort pass per (symbol, time) window
serves every indicator stacked on it, and nothing leaves the JVM.

Determinism rules (so each indicator can carry an exact SQL oracle):

- Moving moments accumulate in DECIMAL(18,6) (order-independent —
  both engines may regroup window-frame additions; decimal addition
  is exactly associative where IEEE addition is not).
- Derived doubles are rounded to a fixed scale BEFORE any decimal
  re-accumulation (a 2- or 6-dp double casts to DECIMAL exactly;
  an arbitrary double risks half-up-vs-half-even tie divergence).
- Rolling min/max/counts are exact as-is.
- Recursive smoothings (Wilder RSI, true EMA) are replaced by their
  published window-expressible variants: Cutler's RSI (SMA of gains)
  and the truncated adjust=True EWMA (shared weight literals, the
  ``w_ewma_trunc`` pattern) — closed forms, not recurrences.

Scale: every indicator here is a projection over ONE window sort per
(partition key, time) ordering — a single shuffle on the symbol key,
then O(rows · frame) work with no Python and no extra exchange.  At
100 TB the shuffle is the whole cost, and stacking all indicators on
the same window spec amortizes it across the family.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.operators.aggregates import DEC


def rolling_moments(col: Column, w: WindowSpec) -> tuple[Column, Column, Column]:
    """(n, Σx, Σx²) over a window frame, decimal-accumulated and
    presented as doubles — the shared base of SMA/Bollinger/zscore."""
    n = F.count(col).over(w)
    sx = F.sum(col.cast(DEC)).over(w).cast("double")
    sx2 = F.sum(col.cast(DEC) * col.cast(DEC)).over(w).cast("double")
    return n, sx, sx2


def bollinger(
    col: Column, w: WindowSpec, min_periods: int, k: float = 2.0
) -> tuple[Column, Column, Column]:
    """(middle, upper, lower) Bollinger bands: SMA ± k·sample-stddev
    over the frame, masked below ``min_periods`` observations."""
    n, sx, sx2 = rolling_moments(col, w)
    mean = sx / n
    std = F.sqrt(F.greatest((sx2 - sx * sx / n) / (n - F.lit(1)), F.lit(0.0)))
    ok = n >= min_periods
    return (
        F.when(ok, F.round(mean, 6)),
        F.when(ok, F.round(mean + F.lit(k) * std, 6)),
        F.when(ok, F.round(mean - F.lit(k) * std, 6)),
    )


def price_diff(col: Column, w: WindowSpec, scale: int = 2) -> Column:
    """One-step price change rounded back to the input's decimal scale.

    The true difference of two ``scale``-dp prices is exactly a
    ``scale``-dp number, so rounding the IEEE result recovers it
    exactly on both engines — and the rounded double then casts to
    DECIMAL with no tie ambiguity (the re-accumulation precondition).
    """
    return F.round(col - F.lag(col, 1).over(w), scale)


def cutler_rsi(diff: Column, frame: WindowSpec, periods: int) -> Column:
    """Cutler's RSI (SMA-based, the window-expressible published
    variant of Wilder's recursive smoothing): 100·ΣG/(ΣG+ΣL) over the
    trailing ``periods`` diffs.  NULL until ``periods`` diffs exist and
    on flat windows (ΣG+ΣL = 0)."""
    gain = F.greatest(diff, F.lit(0.0)).cast(DEC)
    loss = F.greatest(-diff, F.lit(0.0)).cast(DEC)
    sg = F.sum(gain).over(frame).cast("double")
    sl = F.sum(loss).over(frame).cast("double")
    n = F.count(diff).over(frame)
    return F.when(
        (n >= periods) & (sg + sl > 0), F.round(F.lit(100.0) * sg / (sg + sl), 6)
    )


def ewma_weights(alpha: float, lags: int) -> list[float]:
    """adjust=True EWMA weights (1-α)^j, j∈[0,lags) — emitted as the
    SAME Python double literals into both engines' expressions so the
    weighted sums are identical IEEE arithmetic (no libm pow)."""
    return [(1.0 - alpha) ** j for j in range(lags)]


def truncated_ema(col: Column, w: WindowSpec, alpha: float, lags: int) -> Column:
    """Truncated adjust=True EWMA: Σ wⱼ·x_{t-j} / Σ wⱼ over available
    lags — the closed-form cousin of the exact-recurrence
    ``windows.ewma_grouped`` (pandas-parity-tested); this one is
    window-expressible and SQL-oracle-gated.  The lag chain evaluates
    in ONE frame pass of the shared window sort."""
    weights = ewma_weights(alpha, lags)
    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for j, wt in enumerate(weights):
        lg = col if j == 0 else F.lag(col, j).over(w)
        num = num + F.coalesce(lg, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return num / den


def stochastic_k(col: Column, frame: WindowSpec, periods: int) -> Column:
    """%K = 100·(x − min)/(max − min) over the trailing frame; NULL
    until ``periods`` rows and when the range is degenerate."""
    lo = F.min(col).over(frame)
    hi = F.max(col).over(frame)
    n = F.count(col).over(frame)
    return F.when(
        (n >= periods) & (hi > lo),
        F.round(F.lit(100.0) * (col - lo) / (hi - lo), 6),
    )


def smoothed(col6: Column, frame: WindowSpec) -> Column:
    """Short SMA of an already-6-dp-rounded double (e.g. %D over %K,
    the MACD signal line): the 6-dp input casts to DECIMAL exactly,
    so the re-accumulation stays order-independent."""
    s = F.sum(col6.cast(DEC)).over(frame).cast("double")
    n = F.count(col6).over(frame)
    return F.when(n > 0, F.round(s / n, 6))


def drawdown(col: Column, w_cum: WindowSpec) -> tuple[Column, Column]:
    """(running peak, drawdown fraction ≤ 0) against the
    unbounded-preceding running max — exact (max is order-free)."""
    peak = F.max(col).over(w_cum)
    return peak, F.round((col - peak) / peak, 6)


def obv_step(diff: Column, volume: Column) -> Column:
    """On-balance-volume increment: +vol on up-tick, −vol on down-tick,
    0 on flat/first — integer, so the cumulative sum is exact."""
    return (
        F.when(diff > 0, volume)
        .when(diff < 0, -volume)
        .otherwise(F.lit(0))
        .cast("long")
    )
