"""Pandas-parity tests for the technical-indicator family and CDC
snapshot diff: each indicator is recomputed independently with
pandas/numpy on the same sf0.001 events and compared at the rounded
output scale (the oracle gate proves Spark≡DuckDB; these prove both
match the textbook definition)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def events_pd() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    return df.sort_values(["event_type", "ts", "event_id"]).reset_index(drop=True)


def _k(props: pd.Series) -> pd.Series:
    return props.map(lambda s: json.loads(s).get("k"))


def test_bollinger_matches_pandas(spark, events_pd):
    from kp_crypto_market_analytics_spark.queries_indicators import ti_bollinger

    got = ti_bollinger(spark, SF_DIR).toPandas().set_index("event_id")
    g = events_pd.groupby("event_type")["value"]
    mid = g.transform(lambda s: s.rolling(20, min_periods=20).mean())
    std = g.transform(lambda s: s.rolling(20, min_periods=20).std(ddof=1))
    exp = pd.DataFrame(
        {
            "event_id": events_pd["event_id"],
            "bb_mid": (mid).round(6),
            "bb_upper": (mid + 2 * std).round(6),
            "bb_lower": (mid - 2 * std).round(6),
        }
    ).set_index("event_id")
    for c in ["bb_mid", "bb_upper", "bb_lower"]:
        pd.testing.assert_series_equal(
            got[c].dropna().sort_index(),
            exp[c].dropna().sort_index(),
            check_names=False,
            rtol=0,
            atol=2e-6,
        )
        assert got[c].isna().sum() == exp[c].isna().sum()


def test_rsi_matches_cutler_definition(spark, events_pd):
    from kp_crypto_market_analytics_spark.queries_indicators import ti_rsi

    got = ti_rsi(spark, SF_DIR).toPandas().set_index("event_id")["rsi14"]
    d = events_pd.groupby("event_type")["value"].diff().round(2)
    gain = d.clip(lower=0)
    loss = (-d).clip(lower=0)
    grp = events_pd["event_type"]
    sg = gain.groupby(grp).transform(lambda s: s.rolling(14, min_periods=14).sum())
    sl = loss.groupby(grp).transform(lambda s: s.rolling(14, min_periods=14).sum())
    exp = (100.0 * sg / (sg + sl)).where((sg + sl) > 0).round(6)
    exp.index = events_pd["event_id"]
    pd.testing.assert_series_equal(
        got.dropna().sort_index(),
        exp.dropna().sort_index(),
        check_names=False,
        rtol=0,
        atol=2e-6,
    )
    assert (got.dropna() >= 0).all() and (got.dropna() <= 100).all()


def test_macd_matches_truncated_ewma(spark, events_pd):
    from kp_crypto_market_analytics_spark.queries_indicators import (
        _MACD_FAST,
        _MACD_LAGS,
        _MACD_SLOW,
        ti_macd,
    )
    from kp_crypto_market_analytics_spark.operators.indicators import ewma_weights

    got = ti_macd(spark, SF_DIR).toPandas().set_index("event_id")

    def trunc_ema(s: pd.Series, alpha: float) -> pd.Series:
        w = ewma_weights(alpha, _MACD_LAGS)
        num = pd.Series(0.0, index=s.index)
        den = pd.Series(0.0, index=s.index)
        for j, wt in enumerate(w):
            lagged = s.shift(j)
            num = num + lagged.fillna(0.0) * wt
            den = den + lagged.notna() * wt
        return num / den

    grp = events_pd.groupby("event_type")["value"]
    fast = grp.transform(lambda s: trunc_ema(s, _MACD_FAST))
    slow = grp.transform(lambda s: trunc_ema(s, _MACD_SLOW))
    macd = (fast - slow).round(6)
    macd.index = events_pd["event_id"]
    pd.testing.assert_series_equal(
        got["macd"].sort_index(), macd.sort_index(), check_names=False, rtol=0, atol=2e-6
    )
    # signal = SMA-9 of the rounded macd; histogram = macd - signal
    sig = (
        macd.groupby(events_pd.set_index("event_id")["event_type"])
        .transform(lambda s: s.rolling(9, min_periods=1).mean())
        .round(6)
    )
    pd.testing.assert_series_equal(
        got["signal"].sort_index(), sig.sort_index(), check_names=False, rtol=0, atol=2e-6
    )
    hist = got["macd"] - got["signal"]
    pd.testing.assert_series_equal(
        got["histogram"].sort_index(),
        hist.round(6).sort_index(),
        check_names=False,
        rtol=0,
        atol=2e-6,
    )


def test_drawdown_matches_cummax(spark, events_pd):
    from kp_crypto_market_analytics_spark.queries_indicators import ti_drawdown

    got = ti_drawdown(spark, SF_DIR).toPandas().set_index("event_id")
    peak = events_pd.groupby("event_type")["value"].cummax()
    dd = ((events_pd["value"] - peak) / peak).round(6)
    peak.index = dd.index = events_pd["event_id"]
    pd.testing.assert_series_equal(
        got["peak"].sort_index(), peak.sort_index(), check_names=False
    )
    pd.testing.assert_series_equal(
        got["drawdown"].sort_index(), dd.sort_index(), check_names=False, rtol=0, atol=2e-6
    )
    assert (got["drawdown"] <= 0).all(), "drawdown is never positive"


def test_stochastic_bounds_and_pandas_parity(spark, events_pd):
    from kp_crypto_market_analytics_spark.queries_indicators import ti_stochastic

    got = ti_stochastic(spark, SF_DIR).toPandas().set_index("event_id")
    g = events_pd.groupby("event_type")["value"]
    lo = g.transform(lambda s: s.rolling(14, min_periods=14).min())
    hi = g.transform(lambda s: s.rolling(14, min_periods=14).max())
    k = (100.0 * (events_pd["value"] - lo) / (hi - lo)).where(hi > lo).round(6)
    k.index = events_pd["event_id"]
    pd.testing.assert_series_equal(
        got["pct_k"].dropna().sort_index(),
        k.dropna().sort_index(),
        check_names=False,
        rtol=0,
        atol=2e-6,
    )
    ok = got["pct_k"].dropna()
    assert (ok >= 0).all() and (ok <= 100).all()
    # %D is a 3-SMA of %K, so it inherits the bounds
    okd = got["pct_d"].dropna()
    assert (okd >= 0).all() and (okd <= 100).all()


def test_vwap_and_obv_cumulative_semantics(spark, events_pd):
    from kp_crypto_market_analytics_spark.queries_indicators import ti_obv, ti_vwap

    vol = _k(events_pd["props"]).astype("float")
    df = events_pd.assign(vol=vol, d=events_pd["ts"].dt.date)

    vwap = ti_vwap(spark, SF_DIR).toPandas().set_index("event_id")["vwap"]
    cum_not = (df["value"] * df["vol"]).groupby([df["event_type"], df["d"]]).cumsum()
    cum_vol = df["vol"].groupby([df["event_type"], df["d"]]).cumsum()
    exp_vwap = (cum_not / cum_vol).where(cum_vol > 0).round(6)
    exp_vwap.index = df["event_id"]
    pd.testing.assert_series_equal(
        vwap.dropna().sort_index(),
        exp_vwap.dropna().sort_index(),
        check_names=False,
        rtol=0,
        atol=2e-6,
    )

    obv = ti_obv(spark, SF_DIR).toPandas().set_index("event_id")["obv"]
    diff = df.groupby("event_type")["value"].diff().round(2)
    step = np.sign(diff).fillna(0.0) * df["vol"].fillna(0)
    exp_obv = step.groupby(df["event_type"]).cumsum().astype("int64")
    exp_obv.index = df["event_id"]
    pd.testing.assert_series_equal(
        obv.sort_index(), exp_obv.sort_index(), check_names=False
    )


def test_cdc_snapshot_diff_semantics(spark, events_pd):
    from kp_crypto_market_analytics_spark.queries_indicators import (
        _CDC_CUTOFF,
        cdc_snapshot_diff,
    )

    got = cdc_snapshot_diff(spark, SF_DIR).toPandas()
    # one row per user ever seen; closed change-type vocabulary
    assert got["user_id"].is_unique
    assert set(got["user_id"]) == set(events_pd["user_id"])
    assert set(got["change_type"]) <= {"insert", "delete", "update", "unchanged"}
    # inserts carry no old state; deletes no new state
    assert got.loc[got["change_type"] == "insert", "old_value"].isna().all()
    assert got.loc[got["change_type"] == "delete", "new_value"].isna().all()

    # independent pandas recompute of the full diff
    cutoff = pd.Timestamp(_CDC_CUTOFF)

    def snap(df: pd.DataFrame) -> pd.DataFrame:
        last = df.sort_values(["ts", "event_id"]).groupby("user_id").tail(1)
        return last.assign(deleted=last["event_type"] == "error").set_index("user_id")

    a = snap(events_pd[events_pd["ts"] < cutoff])
    b = snap(events_pd)
    for uid in got["user_id"]:
        row = got[got["user_id"] == uid].iloc[0]
        a_live = uid in a.index and not a.loc[uid, "deleted"]
        b_live = uid in b.index and not b.loc[uid, "deleted"]
        if not a_live and b_live:
            exp = "insert"
        elif a_live and not b_live:
            exp = "delete"
        elif a_live and b_live and a.loc[uid, "value"] != b.loc[uid, "value"]:
            exp = "update"
        else:
            exp = "unchanged"
        assert row["change_type"] == exp, f"user {uid}: {row['change_type']} != {exp}"
    # the diff is non-vacuous in every class that the data can express
    counts = got["change_type"].value_counts()
    assert counts.get("update", 0) > 0
    assert counts.get("insert", 0) + counts.get("delete", 0) > 0
