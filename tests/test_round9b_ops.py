"""Invariant + python-recompute tests for the round-9 second-batch
queries (microstructure estimators, econometrics, readability,
l-diversity).  The DuckDB oracles prove engine agreement; these pin
the statistics to independent NumPy/pandas recomputations and the
semantic floors the oracles can't express."""

import json

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ticks_pd():
    """Tick frame recomputed with pandas only: (type, ts, event_id,
    vm micro price, k volume) in engine order."""
    df = pd.read_parquet(SF_DIR + "/events.parquet")
    df["vm"] = (df["value"] * 1_000_000).round().astype("int64")
    df["k"] = df["props"].map(lambda p: json.loads(p)["k"])
    return df.sort_values(["event_type", "ts", "event_id"]).reset_index(
        drop=True
    )


def test_kyle_lambda_matches_numpy_ols(spark, ticks_pd):
    from kp_crypto_market_analytics_spark.queries_r9b import ti_kyle_lambda

    rows = {r["event_type"]: r for r in ti_kyle_lambda(spark, SF_DIR).collect()}
    assert set(rows) == set(ticks_pd["event_type"].unique())
    for et, g in ticks_pd.groupby("event_type"):
        d = g["vm"].diff().dropna()
        k = g["k"].iloc[1:]
        sv = np.sign(d).astype("int64") * k.to_numpy()
        lam = np.polyfit(sv.astype(float), d.to_numpy(float), 1)[0]
        assert rows[et]["n_pairs"] == len(d)
        assert rows[et]["kyle_lambda"] == pytest.approx(
            lam / 1e6, abs=2e-6
        )


def test_roll_spread_cov_sign_contract(spark, ticks_pd):
    from kp_crypto_market_analytics_spark.queries_r9b import ti_roll_spread

    rows = {r["event_type"]: r for r in ti_roll_spread(spark, SF_DIR).collect()}
    for et, g in ticks_pd.groupby("event_type"):
        d = g["vm"].diff()
        pair = pd.DataFrame({"d": d, "dp": d.shift(1)}).dropna()
        cov = float(
            (pair["d"] * pair["dp"]).sum() / len(pair)
            - pair["d"].sum() * pair["dp"].sum() / len(pair) ** 2
        )
        r = rows[et]
        assert r["serial_cov_p2"] == pytest.approx(cov / 1e12, abs=2e-6)
        if cov < 0:
            assert r["roll_spread"] == pytest.approx(
                2 * np.sqrt(-cov) / 1e6, abs=2e-6
            )
        else:
            assert r["roll_spread"] is None


def test_corwin_schultz_shape(spark):
    from kp_crypto_market_analytics_spark.queries_r9b import (
        ti_corwin_schultz,
    )

    rows = ti_corwin_schultz(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_pairs"] > 0
        assert 0 <= r["n_negative"] <= r["n_pairs"]
        assert r["max_cs_spread"] >= r["avg_cs_spread"]
        # spread is a fraction of price: sane envelope
        assert abs(r["avg_cs_spread"]) < 2.0


def test_vpin_matches_pandas_volume_clock(spark, ticks_pd):
    from kp_crypto_market_analytics_spark.queries_r9b import (
        _VPIN_BUCKETS,
        a_vpin,
    )

    rows = {r["event_type"]: r for r in a_vpin(spark, SF_DIR).collect()}
    for et, g in ticks_pd.groupby("event_type"):
        d = g["vm"].diff()
        s = np.sign(d).replace(0, np.nan).ffill()
        c = g.assign(s=s).dropna(subset=["s"])
        tot = int(c["k"].sum())
        v = max(1, -(-tot // _VPIN_BUCKETS))
        cumb = c["k"].cumsum().shift(1).fillna(0).astype("int64")
        c = c.assign(bucket=cumb // v)
        bv = c.groupby("bucket").apply(
            lambda b: abs(
                int(b.loc[b["s"] > 0, "k"].sum())
                - int(b.loc[b["s"] < 0, "k"].sum())
            ),
            include_groups=False,
        )
        vol = c.groupby("bucket")["k"].sum()
        r = rows[et]
        assert r["n_buckets"] == len(vol)
        assert r["bucket_volume"] == v
        assert r["vpin"] == pytest.approx(
            float(bv.sum()) / float(vol.sum()), abs=2e-6
        )
        assert 0.0 <= r["vpin"] <= 1.0


def test_yule_walker_satisfies_first_equation(spark):
    """YW system: r1 = phi1 + phi2*r1 and r2 = phi1*r1 + phi2 must
    hold for the fitted coefficients (up to the 1e-6 rounding)."""
    from kp_crypto_market_analytics_spark.queries_r9b import (
        a_yule_walker_ar2,
    )

    rows = a_yule_walker_ar2(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r["r1"]) <= 1 and abs(r["r2"]) <= 1
        assert r["r1"] == pytest.approx(
            r["phi1"] + r["phi2"] * r["r1"], abs=1e-4
        )
        assert r["r2"] == pytest.approx(
            r["phi1"] * r["r1"] + r["phi2"], abs=1e-4
        )


def test_durbin_watson_range(spark):
    from kp_crypto_market_analytics_spark.queries_r9b import a_durbin_watson

    rows = a_durbin_watson(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["dw"] < 4.0
        assert r["n"] > 0


def test_newey_west_reduces_to_gamma0_under_zero_weights(spark, ticks_pd):
    """gamma0 must equal the population variance of the diffs
    (pandas recompute); the Bartlett combination keeps lrv within
    the [0, 4x gamma0] envelope for weakly dependent data."""
    from kp_crypto_market_analytics_spark.queries_r9b import a_newey_west

    rows = {r["event_type"]: r for r in a_newey_west(spark, SF_DIR).collect()}
    for et, g in ticks_pd.groupby("event_type"):
        d = g["vm"].diff().dropna().to_numpy(float)
        g0 = float(d.var(ddof=0))  # population variance
        r = rows[et]
        assert r["gamma0_p2"] == pytest.approx(g0 / 1e12, abs=2e-6)
        assert r["nw_ratio"] > 0
        # both factors carry 1e-6 rounding, scaled by gamma0 ~ 1e3
        assert r["lrv_p2"] == pytest.approx(
            r["gamma0_p2"] * r["nw_ratio"], rel=1e-5, abs=1e-5
        )


def test_engle_granger_hedge_ratio_matches_numpy(spark, ticks_pd):
    from kp_crypto_market_analytics_spark.queries_r9b import (
        _EG_X,
        _EG_Y,
        a_engle_granger,
    )

    r = a_engle_granger(spark, SF_DIR).collect()[0]
    m = (
        ticks_pd.assign(minute=ticks_pd["ts"].dt.floor("min"))
        .groupby(["event_type", "minute"])["vm"]
        .apply(lambda s: np.int64(round(float(s.sum()) / len(s))))
        .unstack(0)
    )
    j = m[[_EG_Y, _EG_X]].dropna()
    b = np.polyfit(j[_EG_X].to_numpy(float), j[_EG_Y].to_numpy(float), 1)[0]
    assert r["n_minutes"] == len(j)
    assert r["hedge_ratio"] == pytest.approx(b, abs=1e-4)
    # DF regression on stationary-ish residuals: rho must be negative
    # (mean reversion) for any non-degenerate fit on this data.
    assert -2.0 < r["rho"] < 0.0
    assert r["df_t"] < 0.0


def test_tail_dependence_pairs_and_bounds(spark):
    from kp_crypto_market_analytics_spark.queries_r9b import (
        a_tail_dependence,
    )

    # sf0.001 has too few minute collisions for all C(5,2) pairs
    # to share minutes; sf0.01 aligns every pair.
    rows = a_tail_dependence(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 10  # C(5,2) unordered type pairs
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 <= r["n_both"] <= r["n_joint"]
        assert 0.0 <= r["p_both"] <= 1.0
        assert r["tail_lift"] is None or r["tail_lift"] >= 0.0


def test_coleman_liau_matches_python_counts(spark):
    from kp_crypto_market_analytics_spark.queries_r9b import t_coleman_liau

    docs = pd.read_parquet(SF_DIR + "/documents.parquet")

    def cli(text: str) -> float:
        letters = sum(ch.isascii() and ch.isalpha() for ch in text)
        words = len(text.strip().split())
        sentences = max(1, sum(ch in ".!?" for ch in text))
        return round(
            0.0588 * (letters * 100.0 / words)
            - 0.296 * (sentences * 100.0 / words)
            - 15.8,
            6,
        )

    docs["cli6"] = docs["text"].map(cli)
    exp = docs.groupby("source")["cli6"].agg(["count", "mean", "min", "max"])
    rows = {r["source"]: r for r in t_coleman_liau(spark, SF_DIR).collect()}
    assert set(rows) == set(exp.index)
    for src, e in exp.iterrows():
        r = rows[src]
        assert r["n_docs"] == e["count"]
        assert r["avg_cli"] == pytest.approx(e["mean"], abs=2e-6)
        assert r["min_cli"] == pytest.approx(e["min"], abs=1e-9)
        assert r["max_cli"] == pytest.approx(e["max"], abs=1e-9)


def test_l_diversity_matches_pandas_nunique(spark):
    from kp_crypto_market_analytics_spark.queries_r9b import (
        _LDIV_FLOOR,
        dq_l_diversity,
    )

    ev = pd.read_parquet(SF_DIR + "/events.parquet")
    ev["day"] = ev["ts"].dt.date
    l = ev.groupby(["event_type", "day"])["user_id"].nunique()
    rows = {r["event_type"]: r for r in dq_l_diversity(spark, SF_DIR).collect()}
    for et, g in l.groupby(level=0):
        r = rows[et]
        assert r["n_groups"] == len(g)
        assert r["min_l"] == int(g.min())
        assert r["avg_l"] == pytest.approx(float(g.mean()), abs=2e-6)
        assert r["n_below_floor"] == int((g < _LDIV_FLOOR).sum())


def test_granger_f_stat_nonnegative_and_r2_bounds(spark):
    from kp_crypto_market_analytics_spark.queries_r9b import (
        a_granger_causality,
    )

    rows = a_granger_causality(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 2
    assert {r["direction"] for r in rows} == {"click->view", "view->click"}
    for r in rows:
        # adding a regressor can never increase RSS
        assert r["f_stat"] >= 0.0
        assert 0.0 <= r["r2_u"] <= 1.0
        assert r["n"] > 10


def test_partial_corr_matches_closed_form_of_own_rs(spark):
    from kp_crypto_market_analytics_spark.queries_r9b import a_partial_corr

    r = a_partial_corr(spark, "/root/testdata/sf0.01").collect()[0]
    for c in ("r_xy", "r_xz", "r_yz", "partial_r"):
        assert -1.0 <= r[c] <= 1.0
    expect = (r["r_xy"] - r["r_xz"] * r["r_yz"]) / np.sqrt(
        (1 - r["r_xz"] ** 2) * (1 - r["r_yz"] ** 2)
    )
    assert r["partial_r"] == pytest.approx(expect, abs=2e-6)


def test_cross_corr_lag0_matches_numpy(spark, ticks_pd):
    from kp_crypto_market_analytics_spark.queries_r9b import (
        _EG_X,
        _EG_Y,
        a_cross_corr_leadlag,
    )

    rows = {r["lag_k"]: r for r in a_cross_corr_leadlag(spark, SF_DIR).collect()}
    assert sorted(rows) == list(range(-5, 6))
    m = (
        ticks_pd.assign(minute=ticks_pd["ts"].dt.floor("min"))
        .groupby(["event_type", "minute"])["vm"]
        .apply(lambda s: np.int64(round(float(s.sum()) / len(s))))
        .unstack(0)
    )
    j = m[[_EG_Y, _EG_X]].dropna()
    r0 = np.corrcoef(j[_EG_Y].to_numpy(float), j[_EG_X].to_numpy(float))[0, 1]
    assert rows[0]["ccf"] == pytest.approx(r0, abs=2e-6)
    assert rows[0]["n_pairs"] == len(j)
    # shifted frames shrink by |k| pairs (floored at 0 on tiny grids)
    for k in range(-5, 6):
        assert rows[k]["n_pairs"] == max(0, len(j) - abs(k))


def test_kaufman_er_matches_pandas(spark, ticks_pd):
    from kp_crypto_market_analytics_spark.queries_r9b import ti_kaufman_er

    rows = {r["event_type"]: r for r in ti_kaufman_er(spark, SF_DIR).collect()}
    for et, g in ticks_pd.groupby("event_type"):
        path = int(g["vm"].diff().abs().sum())
        net = abs(int(g["vm"].iloc[-1]) - int(g["vm"].iloc[0]))
        r = rows[et]
        assert r["n_ticks"] == len(g)
        assert r["efficiency_ratio"] == pytest.approx(net / path, abs=2e-6)
        assert 0.0 <= r["efficiency_ratio"] <= 1.0


def test_cmf_bounds_and_window_floor(spark):
    from kp_crypto_market_analytics_spark.queries_r9b import ti_cmf

    rows = ti_cmf(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        # CMF is a volume-weighted mean of multipliers in [-1, 1]
        assert -1.0 <= r["min_cmf"] <= r["last_cmf"] <= r["max_cmf"] + 1e-9 \
            or -1.0 <= r["min_cmf"] <= r["max_cmf"] <= 1.0
        assert -1.0 <= r["last_cmf"] <= 1.0
        assert r["n_days"] > 0


def test_markov_entropy_rate_matches_scipy_free_recompute(spark):
    from kp_crypto_market_analytics_spark.queries_r9b import (
        a_markov_entropy_rate,
    )

    ev = pd.read_parquet(SF_DIR + "/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ev["next"] = ev.groupby("user_id")["event_type"].shift(-1)
    tr = ev.dropna(subset=["next"]).groupby(["event_type", "next"]).size()
    nn = int(tr.sum())
    ni = tr.groupby(level=0).sum()
    h = sum(
        (nij / nn) * np.log(ni[cur] / nij) for (cur, _), nij in tr.items()
    )
    r = a_markov_entropy_rate(spark, SF_DIR).collect()[0]
    assert r["n_transitions"] == nn
    assert r["entropy_rate_nats"] == pytest.approx(h, abs=2e-6)
    assert 0.0 <= r["efficiency"] <= 1.0
    assert r["entropy_rate_nats"] <= np.log(r["n_states"]) + 1e-9


def test_naive_bayes_beats_prior_baseline(spark):
    """In-sample NB must beat the majority-class prior (otherwise the
    sufficient-statistics plumbing is broken), and the census must
    cover every language with exact doc counts."""
    from kp_crypto_market_analytics_spark.queries_r9c import t_naive_bayes

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    rows = {r["lang"]: r for r in t_naive_bayes(spark, "/root/testdata/sf0.01").collect()}
    counts = docs["lang"].value_counts()
    assert set(rows) == set(counts.index)
    total = int(counts.sum())
    correct = sum(r["n_correct"] for r in rows.values())
    majority = int(counts.max())
    assert sum(r["n_docs"] for r in rows.values()) == total
    assert correct > majority  # better than always-predict-majority
    for r in rows.values():
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["n_correct"] <= r["n_docs"]


def test_cuped_reduces_variance_and_preserves_lift_scale(spark):
    from kp_crypto_market_analytics_spark.queries_r9c import a_cuped

    r = a_cuped(spark, "/root/testdata/sf0.01").collect()[0]
    assert r["n_users"] > 10
    # theta is cov/var of the same-scale means: sane envelope
    assert -5.0 < r["theta"] < 5.0
    # CUPED can only reduce pooled variance (theta is the OLS argmin)
    assert 0.0 <= r["var_reduction"] < 1.0
    assert abs(r["lift_adj"]) < 1e3 and abs(r["lift_raw"]) < 1e3


def test_quantile_lift_monotone_deciles(spark):
    from kp_crypto_market_analytics_spark.queries_r9c import a_quantile_lift

    rows = a_quantile_lift(spark, "/root/testdata/sf0.01").collect()
    assert [r["pct"] for r in rows] == list(range(10, 100, 10))
    for col in ("q_arm_a", "q_arm_b"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals)  # deciles are monotone
    for r in rows:
        assert r["q_lift"] == pytest.approx(
            r["q_arm_b"] - r["q_arm_a"], abs=1e-9
        )


def test_ichimoku_midpoints_bracket_price_extremes(spark):
    from kp_crypto_market_analytics_spark.queries_r9c import ti_ichimoku

    rows = ti_ichimoku(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        # a 9-day midpoint sits within the 52-day range midpoint band
        assert r["senkou_b"] > 0
        assert r["cloud_position"] in ("above", "below", "in_cloud")
        # tenkan window is a subset of the senkou-B window: its high
        # <= 52d high and low >= 52d low, so midpoints can differ, but
        # both are positive prices under the data envelope
        assert 0 < r["tenkan"] < 1e4 and 0 < r["kijun"] < 1e4


def test_aroon_matches_pandas_rolling_argmax(spark):
    from kp_crypto_market_analytics_spark.queries_r9c import (
        _AROON_N,
        ti_aroon,
    )
    from kp_crypto_market_analytics_spark.queries_r9 import _daily_bars_df

    bars = (
        _daily_bars_df(spark, "/root/testdata/sf0.01")
        .orderBy("event_type", "day")
        .toPandas()
    )
    rows = {
        (r["event_type"], r["day"]): r
        for r in ti_aroon(spark, "/root/testdata/sf0.01").collect()
    }
    n_checked = 0
    for et, g in bars.groupby("event_type"):
        g = g.reset_index(drop=True)
        for i in range(_AROON_N - 1, len(g)):
            win_h = g["hm"].iloc[i - _AROON_N + 1 : i + 1]
            win_l = g["lm"].iloc[i - _AROON_N + 1 : i + 1]
            # most recent max/min (ties -> latest index)
            ds_hi = i - win_h[win_h == win_h.max()].index[-1]
            ds_lo = i - win_l[win_l == win_l.min()].index[-1]
            r = rows[(et, g["day"].iloc[i])]
            assert r["aroon_up"] == (_AROON_N - ds_hi) * 4
            assert r["aroon_down"] == (_AROON_N - ds_lo) * 4
            assert r["aroon_osc"] == r["aroon_up"] - r["aroon_down"]
            n_checked += 1
    assert n_checked == len(rows) > 0


def test_degenerate_tape_yields_nulls_not_nans(spark, tmp_path):
    """A constant-price tape (zero variance everywhere) must produce
    NULL statistics, not NaN — the guard contract that keeps the
    engines agreeing on exactly the data the estimators are undefined
    for."""
    import datetime

    from kp_crypto_market_analytics_spark.queries_r9b import (
        a_durbin_watson,
        ti_kyle_lambda,
    )

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
            i % 7,
            "flat",
            5.0,          # constant price -> every diff is 0
            '{"k": 10}',  # constant volume -> constant regressor
        )
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = str(tmp_path / "degenerate")
    df.coalesce(1).write.parquet(d + "/events.parquet")

    kl = ti_kyle_lambda(spark, d).collect()
    assert len(kl) == 1 and kl[0]["kyle_lambda"] is None

    dw = a_durbin_watson(spark, d).collect()
    assert len(dw) == 1
    assert dw[0]["slope"] is None  # constant-k regressor


def test_markov_entropy_single_state_efficiency_null(spark, tmp_path):
    """With a single event type ln(n_states) = 0; the efficiency ratio
    is undefined and must be NULL in BOTH engines (Spark would return
    null-on-divide-by-zero, DuckDB IEEE inf) — the same degenerate
    guard convention as kyle_lambda/durbin_watson (ADVICE r9)."""
    import datetime

    from kp_crypto_market_analytics_spark.queries_r9b import (
        a_markov_entropy_rate,
    )

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
            i % 3,
            "only_type",
            1.0,
            "{}",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = str(tmp_path / "one_state")
    df.coalesce(1).write.parquet(d + "/events.parquet")

    out = a_markov_entropy_rate(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_states"] == 1
    assert r["entropy_rate_nats"] == 0.0
    assert r["efficiency"] is None
