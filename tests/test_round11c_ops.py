"""Round-11 third-wave operator invariants — mathematical properties
the DuckDB oracle gate can't distinguish from a shared bug (the oracle
recomputes the same formula): range bounds, orderings, conservation
laws, and cross-query consistency checked independently here."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SFD = "/root/testdata/sf0.001"


def test_stoch_rsi_bounded(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import ti_stoch_rsi

    rows = ti_stoch_rsi(spark, SFD)
    srsi = rows.where(F.col("stoch_rsi").isNotNull())
    # both oscillators live in [0, 100] by construction
    assert (
        rows.where((F.col("rsi14") < 0) | (F.col("rsi14") > 100)).count()
        == 0
    )
    assert (
        srsi.where(
            (F.col("stoch_rsi") < 0) | (F.col("stoch_rsi") > 100)
        ).count()
        == 0
    )


def test_elder_ray_brackets_ema(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import ti_elder_ray

    rows = ti_elder_ray(spark, SFD)
    assert rows.count() > 0
    # high >= low means bull_power >= bear_power on every bar
    assert rows.where(F.col("bull_power") < F.col("bear_power")).count() == 0


def test_omega_consistent_with_gain_loss(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        ti_omega_ratio,
    )

    rows = ti_omega_ratio(spark, SFD).where(F.col("omega").isNotNull())
    for r in rows.collect():
        assert r["sum_gains"] >= 0 and r["sum_losses"] >= 0
        # omega is the ratio of the two reported legs
        assert abs(r["omega"] - r["sum_gains"] / r["sum_losses"]) < 1e-4


def test_dd_duration_nonnegative_and_bounded(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        ti_dd_duration,
    )

    for r in ti_dd_duration(spark, SFD).collect():
        assert 0 <= r["max_underwater_days"] <= r["n_days"] * 2
        assert 0.0 <= r["max_drawdown"] <= 1.0


def test_wasserstein_kuiper_energy_metric_axioms(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        a_energy_distance,
        a_kuiper,
        a_wasserstein_1d,
    )

    w = a_wasserstein_1d(spark, SFD).collect()[0]
    assert w["wasserstein_1"] >= 0.0
    k = a_kuiper(spark, SFD).collect()[0]
    assert 0.0 <= k["d_plus"] <= 1.0 and 0.0 <= k["d_minus"] <= 1.0
    assert abs(k["kuiper_v"] - (k["d_plus"] + k["d_minus"])) < 1e-5
    assert k["kuiper_v"] <= 2.0
    e = a_energy_distance(spark, SFD).collect()[0]
    # E-distance is nonnegative for any pair of distributions
    assert e["energy_distance"] >= 0.0


def test_pr_auc_and_mcc_ranges(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        a_matthews_corr,
        a_pr_auc,
    )

    ap = a_pr_auc(spark, SFD).collect()[0]
    assert 0.0 <= ap["avg_precision"] <= 1.0
    m = a_matthews_corr(spark, SFD).collect()[0]
    assert m["tp"] + m["fp"] + m["fn"] + m["tn"] > 0
    if m["mcc"] is not None:
        assert -1.0 <= m["mcc"] <= 1.0
    if m["f1"] is not None:
        assert 0.0 <= m["f1"] <= 1.0


def test_bh_rejection_set_is_step_up(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import a_fdr_bh

    rows = a_fdr_bh(spark, SFD).collect()
    assert len(rows) == 24
    # the BH rejection set is a prefix of the p-ascending order
    by_p = sorted(rows, key=lambda r: (r["p_value"], r["hr"]))
    seen_accept = False
    for r in by_p:
        if not r["rejected"]:
            seen_accept = True
        else:
            assert not seen_accept, "rejection after an accept: not step-up"


def test_cronbach_and_icc_ranges(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        a_cronbach_alpha,
        a_icc,
    )

    a = a_cronbach_alpha(spark, SFD).collect()[0]
    # alpha <= 1 always (can be negative); k items fixed at 4
    assert a["n_items"] == 4
    if a["cronbach_alpha"] is not None:
        assert a["cronbach_alpha"] <= 1.0
    i = a_icc(spark, SFD).collect()[0]
    if i["icc1"] is not None:
        # one-way ICC is bounded by [-1/(k-1), 1]
        assert -1.0 <= i["icc1"] <= 1.0


def test_hill_alpha_inverts_h(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import a_hill_tail

    for r in a_hill_tail(spark, SFD).collect():
        if r["hill_h"] is not None:
            assert r["hill_h"] > 0
            assert abs(r["tail_alpha"] * r["hill_h"] - 1.0) < 1e-3


def test_heaps_law_sublinear(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import t_heaps_law

    r = t_heaps_law(spark, SFD).collect()[0]
    assert r["n_points"] > 1
    # vocabulary grows sublinearly: 0 < beta < 1 on any natural corpus
    assert 0.0 < r["heaps_beta"] < 1.0
    assert r["heaps_k"] > 0.0


def test_simpson_diversity_complement(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        t_simpson_diversity,
    )

    r = t_simpson_diversity(spark, SFD).collect()[0]
    assert 0.0 <= r["simpson_d"] <= 1.0
    assert abs(r["simpson_d"] + r["diversity"] - 1.0) < 1e-5


def test_burstiness_of_uniform_term_near_one(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import t_burstiness

    rows = t_burstiness(spark, SFD).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        # Fano factor of counts is >= (1 - cf/n) > 0; top terms are
        # never perfectly regular so expect strictly positive
        assert r["burstiness"] > 0.0
        assert r["doc_freq"] <= r["coll_freq"]


def test_map_eval_ap_bounds(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import t_map_eval

    rows = t_map_eval(spark, SFD).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_rel"] <= r["n_candidates"]
        if r["avg_precision"] is not None:
            assert 0.0 < r["avg_precision"] <= 1.0


def test_katz_floor_is_beta(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import g_katz

    rows = g_katz(spark, SFD).collect()
    assert len(rows) > 0
    # x = beta + alpha*sum(...) >= beta = 1 for every node
    for r in rows:
        assert r["katz"] >= 1.0


def test_harmonic_bounded_by_reached(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import g_harmonic

    for r in g_harmonic(spark, SFD).collect():
        # each reached node contributes at most 1 (d=1) and at least
        # 1/4 (d=4)
        assert r["n_reached"] / 4.0 - 1e-6 <= r["harmonic"]
        assert r["harmonic"] <= r["n_reached"] + 1e-6


def test_wcc_census_conserves_nodes(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import g_wcc
    from kp_crypto_market_analytics_spark.queries_graph import (
        _copurchase_pairs,
    )

    census = g_wcc(spark, SFD).collect()
    n_nodes = (
        _copurchase_pairs(spark, SFD)
        .select(F.col("u").alias("n"))
        .unionByName(_copurchase_pairs(spark, SFD).select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    assert sum(r["size"] * r["n_components"] for r in census) == n_nodes
    # every component has at least 2 nodes (edges define the node set)
    assert all(r["size"] >= 2 for r in census)


def test_rsa_in_correlation_range(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import e_rsa

    r = e_rsa(spark, SFD).collect()[0]
    assert r["n_pairs"] > 0
    assert -1.0 <= r["rsa_spearman"] <= 1.0
    # int8 quantization should PRESERVE geometry — strong positive RSA
    assert r["rsa_spearman"] > 0.9


def test_lid_positive(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import e_lid

    r = e_lid(spark, SFD).collect()[0]
    assert r["n_queries"] > 0
    assert 0.0 < r["min_lid"] <= r["mean_lid"] <= r["max_lid"]


def test_order_reconciliation_census_consistent(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        dq_order_reconciliation,
    )

    r = dq_order_reconciliation(spark, SFD).collect()[0]
    assert r["n_mismatched"] <= r["n_orders"]
    assert r["max_abs_delta"] >= 0.0
    assert r["mean_abs_delta"] <= r["max_abs_delta"] + 1e-9


def test_date_sanity_bounds(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import dq_date_sanity

    r = dq_date_sanity(spark, SFD).collect()[0]
    assert r["n_ship_before_order"] + r["n_stale"] <= r["n_lines"]
    assert r["min_lag_days"] <= r["max_lag_days"]
    assert 0 <= r["violation_ppm"] <= 1_000_000


def test_savitzky_golay_preserves_constants(spark):
    """The SG weights sum to 35/35 = 1: a constant series must pass
    through unchanged — checked on flat stretches (smooth == close
    whenever the 5-point neighborhood is flat)."""
    from pyspark.sql import Window

    from kp_crypto_market_analytics_spark.queries_r11c import (
        w_savitzky_golay,
    )

    rows = w_savitzky_golay(spark, SFD)
    w = Window.partitionBy("event_type").orderBy("day")
    flat = rows.select(
        "event_type",
        "day",
        "close",
        "sg_smooth",
        F.min("close").over(w.rowsBetween(-2, 2)).alias("lo"),
        F.max("close").over(w.rowsBetween(-2, 2)).alias("hi"),
        F.count("close").over(w.rowsBetween(-2, 2)).alias("n5"),
    ).where(
        (F.col("n5") == 5) & (F.col("lo") == F.col("hi"))
        & F.col("sg_smooth").isNotNull()
    )
    bad = flat.where(F.abs(F.col("sg_smooth") - F.col("close")) > 1e-5)
    assert bad.count() == 0


def test_zscore_peaks_are_local_maxima(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        w_zscore_peaks,
    )

    for r in w_zscore_peaks(spark, SFD).collect():
        # the reported z must clear the integer threshold the exact
        # inequality enforced
        assert r["zscore"] > 2.0


def test_hma_tracks_level_on_flat_series(spark):
    """On any 11-bar flat stretch the HMA equals the level exactly
    (all WMAs of a constant are the constant)."""
    from pyspark.sql import Window

    from kp_crypto_market_analytics_spark.queries_r11c import ti_hma
    from kp_crypto_market_analytics_spark.queries_r9 import _daily_bars_df

    hma = ti_hma(spark, SFD)
    bars = _daily_bars_df(spark, SFD).select(
        "event_type", "day", (F.col("cm") / F.lit(1e6)).alias("close")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    j = hma.join(bars, ["event_type", "day"]).select(
        "event_type",
        "day",
        "hma9",
        "close",
        F.min("close").over(w.rowsBetween(-10, 0)).alias("lo"),
        F.max("close").over(w.rowsBetween(-10, 0)).alias("hi"),
        F.count("close").over(w.rowsBetween(-10, 0)).alias("n11"),
    )
    flat = j.where(
        (F.col("n11") == 11) & (F.col("lo") == F.col("hi"))
        & F.col("hma9").isNotNull()
    )
    bad = flat.where(F.abs(F.col("hma9") - F.col("close")) > 1e-5)
    assert bad.count() == 0


def test_dema_tema_track_flat_series(spark):
    """All EMA chains preserve constants, so DEMA = TEMA = close on an
    11-bar flat stretch."""
    from pyspark.sql import Window

    from kp_crypto_market_analytics_spark.queries_r11c import ti_dema_tema
    from kp_crypto_market_analytics_spark.queries_r9 import _daily_bars_df

    dt = ti_dema_tema(spark, SFD)
    bars = _daily_bars_df(spark, SFD).select(
        "event_type", "day", (F.col("cm") / F.lit(1e6)).alias("close")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    j = dt.join(bars, ["event_type", "day"]).select(
        "dema",
        "tema",
        "close",
        F.min("close").over(w.rowsBetween(-10, 0)).alias("lo"),
        F.max("close").over(w.rowsBetween(-10, 0)).alias("hi"),
        F.count("close").over(w.rowsBetween(-10, 0)).alias("n11"),
    ).where((F.col("n11") == 11) & (F.col("lo") == F.col("hi")))
    bad = j.where(
        (F.abs(F.col("dema") - F.col("close")) > 1e-4)
        | (F.abs(F.col("tema") - F.col("close")) > 1e-4)
    )
    assert bad.count() == 0


def test_tsi_bounded(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import ti_tsi

    rows = ti_tsi(spark, SFD).where(F.col("tsi").isNotNull())
    assert rows.count() > 0
    # |EMA(EMA(mom))| <= EMA(EMA(|mom|)) by the triangle inequality
    assert (
        rows.where((F.col("tsi") < -100.001) | (F.col("tsi") > 100.001))
        .count()
        == 0
    )


def test_jackknife_gini_range(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        a_jackknife_gini,
    )

    r = a_jackknife_gini(spark, SFD).collect()[0]
    assert 0.0 <= r["gini"] <= 1.0
    assert r["jackknife_se"] >= 0.0
    # dropping one of n days cannot move Gini much: SE well below 1
    assert r["jackknife_se"] < 0.5


def test_triplet_census_consistent(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        e_triplet_violations,
    )

    r = e_triplet_violations(spark, SFD).collect()[0]
    assert r["n_violations"] <= r["n_anchors"]
    assert 0 <= r["violation_ppm"] <= 1_000_000
    if r["n_violations"] > 0:
        assert r["mean_deficit"] > 0.0


def test_eigenvector_nonnegative(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import g_eigenvector

    rows = g_eigenvector(spark, SFD).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["eigen_score"] >= 0.0


def test_cohen_h_matches_rates(spark):
    import math

    from kp_crypto_market_analytics_spark.queries_r11c import a_cohen_h

    r = a_cohen_h(spark, SFD).collect()[0]
    expect = 2 * math.asin(math.sqrt(r["rate_weekend"])) - 2 * math.asin(
        math.sqrt(r["rate_weekday"])
    )
    assert abs(r["cohens_h"] - expect) < 1e-3
    assert -math.pi <= r["cohens_h"] <= math.pi


def test_qq_deciles_monotone(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import a_qq_deciles

    rows = a_qq_deciles(spark, SFD).collect()
    assert len(rows) == 9
    qa = [r["q_click"] for r in rows]
    qb = [r["q_view"] for r in rows]
    assert qa == sorted(qa) and qb == sorted(qb)


def test_rvi_bounded(spark):
    """|C−O| <= H−L on every bar, so each term and the 10-day ratio
    live in [-1, 1]."""
    from kp_crypto_market_analytics_spark.queries_r11c import ti_rvi

    rows = ti_rvi(spark, SFD).where(F.col("rvi").isNotNull())
    assert rows.count() > 0
    assert (
        rows.where((F.col("rvi") < -1.0) | (F.col("rvi") > 1.0)).count()
        == 0
    )


def test_wald_wolfowitz_runs_bounds(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        a_wald_wolfowitz,
    )

    r = a_wald_wolfowitz(spark, SFD).collect()[0]
    # runs count is between 1 and N, and at most 2*min(n,m)+1
    n, m = r["n_a"], r["n_total"] - r["n_a"]
    assert 1 <= r["n_runs"] <= r["n_total"]
    assert r["n_runs"] <= 2 * min(n, m) + 1


def test_ma_cross_state_never_vacuous(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import ti_ma_cross

    rows = ti_ma_cross(spark, SFD).collect()
    # the state table emits every qualifying day, so a trend-only
    # series still gates on real spread values
    assert len(rows) > 0
    for r in rows:
        assert r["signal"] in (None, "golden", "death")
        if r["signal"] == "golden":
            assert r["ma_spread"] > 0
        if r["signal"] == "death":
            assert r["ma_spread"] < 0


def test_capture_recapture_bounds(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        a_capture_recapture,
    )

    r = a_capture_recapture(spark, SFD).collect()[0]
    assert r["n_both"] <= min(r["n_day1"], r["n_day2"])
    # Chapman estimate is at least the larger observed sample
    assert r["chapman_nhat"] >= max(r["n_day1"], r["n_day2"]) - 1
    assert r["chapman_se"] >= 0.0


def test_two_proportion_z_sign_matches_cohen_h(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        a_cohen_h,
        a_two_proportion_z,
    )

    z = a_two_proportion_z(spark, SFD).collect()[0]
    h = a_cohen_h(spark, SFD).collect()[0]
    # same exact counts feed both: the effect directions must agree
    if z["z"] is not None and h["cohens_h"] is not None:
        assert (z["z"] >= 0) == (h["cohens_h"] >= 0)


def test_chaikin_osc_zero_on_flat_adl(spark):
    from kp_crypto_market_analytics_spark.queries_r11c import (
        ti_chaikin_osc,
    )
    from pyspark.sql import Window

    rows = ti_chaikin_osc(spark, SFD)
    w = Window.partitionBy("event_type").orderBy("day")
    flat = rows.select(
        "chaikin_osc",
        F.min("adl").over(w.rowsBetween(-7, 0)).alias("lo"),
        F.max("adl").over(w.rowsBetween(-7, 0)).alias("hi"),
        F.count("adl").over(w.rowsBetween(-7, 0)).alias("n8"),
    ).where((F.col("n8") == 8) & (F.col("lo") == F.col("hi")))
    bad = flat.where(F.abs(F.col("chaikin_osc")) > 1e-5)
    assert bad.count() == 0
