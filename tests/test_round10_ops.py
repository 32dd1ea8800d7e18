"""Invariant tests for round-10 registry queries (the oracle gates
prove engine agreement; these pin the semantic floors the oracles
can't — range bounds, conservation, monotone relations)."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_auc_brier_ece_ranges(spark):
    from kp_crypto_market_analytics_spark.queries_r10 import (
        a_auc_roc,
        a_brier_score,
        a_ece_calibration,
    )

    auc = a_auc_roc(spark, SF_DIR).collect()[0]
    assert auc["n_pos"] > 0 and auc["n_neg"] > 0
    assert 0.0 <= auc["auc"] <= 1.0
    assert auc["gini"] == pytest.approx(2 * auc["auc"] - 1, abs=2e-6)

    br = a_brier_score(spark, SF_DIR).collect()[0]
    assert 0.0 <= br["brier"] <= 1.0
    assert 0.0 <= br["brier_ref"] <= 0.25

    rows = a_ece_calibration(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["avg_conf"] <= 1.0
        assert 0.0 <= r["frac_pos"] <= 1.0
        assert r["abs_gap"] == pytest.approx(
            abs(r["avg_conf"] - r["frac_pos"]), abs=2e-6
        )
    n_total = sum(r["n_docs"] for r in rows)
    ece = sum(r["ece_term"] for r in rows)
    manual = sum(r["n_docs"] * r["abs_gap"] for r in rows) / n_total
    assert ece == pytest.approx(manual, abs=len(rows) * 1e-6)


def test_effect_sizes_bounded_and_consistent(spark):
    from kp_crypto_market_analytics_spark.queries_r10 import (
        a_cliffs_delta,
        a_cohens_d,
    )

    for r in a_cliffs_delta(spark, SF_DIR).collect():
        assert -1.0 <= r["cliffs_delta"] <= 1.0
        assert r["magnitude"] in {"negligible", "small", "medium", "large"}
    for r in a_cohens_d(spark, SF_DIR).collect():
        # Hedges' g is a shrinkage of d: same sign, |g| <= |d|
        if r["cohens_d"] is not None:
            assert abs(r["hedges_g"]) <= abs(r["cohens_d"]) + 1e-9
            assert r["hedges_g"] * r["cohens_d"] >= 0


def test_mcnemar_cochran_counts_conserve(spark):
    from kp_crypto_market_analytics_spark.queries_r10 import (
        a_cochran_q,
        a_mcnemar,
    )

    m = a_mcnemar(spark, SF_DIR).collect()[0]
    q = a_cochran_q(spark, SF_DIR).collect()[0]
    assert (
        m["n_both"] + m["n_len_only"] + m["n_quality_only"] + m["n_neither"]
        == q["n"]
    )
    assert m["n_both"] + m["n_len_only"] == q["n_pass_length"]
    assert m["n_both"] + m["n_quality_only"] == q["n_pass_quality"]
    if m["mcnemar_chi2"] is not None:
        assert m["mcnemar_chi2"] >= 0
        assert m["mcnemar_chi2_cc"] <= m["mcnemar_chi2"] + 1e-9
    assert q["cochran_q"] is None or q["cochran_q"] >= 0


def test_keltner_band_ordering(spark):
    from kp_crypto_market_analytics_spark.queries_r10 import ti_keltner

    rows = [
        r for r in ti_keltner(spark, SF_DIR).collect()
        if r["kc_middle"] is not None
    ]
    assert rows
    for r in rows:
        assert r["kc_lower"] <= r["kc_middle"] <= r["kc_upper"]


def test_vortex_positive_and_vr_positive(spark):
    from kp_crypto_market_analytics_spark.queries_r10 import (
        a_variance_ratio,
        ti_vortex,
    )

    scored = [
        r for r in ti_vortex(spark, SF_DIR).collect()
        if r["vi_plus"] is not None
    ]
    assert scored
    for r in scored:
        assert r["vi_plus"] >= 0 and r["vi_minus"] >= 0
        assert r["vi_diff"] == pytest.approx(
            r["vi_plus"] - r["vi_minus"], abs=2e-6
        )
    for r in a_variance_ratio(spark, SF_DIR).collect():
        if r["variance_ratio"] is not None:
            assert r["variance_ratio"] > 0


def test_embargo_split_conserves_and_orders(spark):
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.queries_r10 import (
        t_temporal_split_embargo,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    rows = t_temporal_split_embargo(spark, SF_DIR).collect()
    e = load_tables(spark, SF_DIR, ["events"])["events"]
    per_type = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert {r["event_type"] for r in rows} == set(per_type)
    for r in rows:
        assert (
            r["n_train"] + r["n_embargo"] + r["n_test"]
            == per_type[r["event_type"]]
        )
        assert r["n_users_leaking"] >= 0
    tot = sum(per_type.values())
    n_train = sum(r["n_train"] for r in rows)
    # cutoff at ceil(0.8 n): train fraction within a tick of 80%
    assert abs(n_train - 0.8 * tot) <= max(2, 0.02 * tot)


def test_group_kfold_covers_users_disjointly(spark):
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.queries_r10 import t_group_kfold
    from kp_crypto_market_analytics_spark.session import load_tables

    rows = t_group_kfold(spark, SF_DIR).collect()
    e = load_tables(spark, SF_DIR, ["events"])["events"]
    n_users = e.select("user_id").distinct().count()
    n_events = e.count()
    # folds are user-disjoint by construction, so user counts SUM
    assert sum(r["n_users"] for r in rows) == n_users
    assert sum(r["n_events"] for r in rows) == n_events


def test_poisson_bootstrap_ratio_near_one(spark):
    from kp_crypto_market_analytics_spark.queries_r10 import (
        t_poisson_bootstrap,
    )

    rows = t_poisson_bootstrap(spark, SF_DIR).collect()
    assert rows
    tot_o = sum(r["n_orig"] for r in rows)
    tot_r = sum(r["n_resampled"] for r in rows)
    # Poisson(1) weights: overall resample mass within 10% of original
    assert 0.9 <= tot_r / tot_o <= 1.1


def test_systematic_sample_stride(spark):
    from kp_crypto_market_analytics_spark.queries_r10 import (
        _SYS_K,
        o8_systematic_sample,
    )

    rows = o8_systematic_sample(spark, SF_DIR).collect()
    tot_o = sum(r["n_orig"] for r in rows)
    tot_s = sum(r["n_sample"] for r in rows)
    # global stride: exactly ceil(n / k) rows sampled (rn % k == 1)
    assert tot_s == (tot_o + _SYS_K - 1) // _SYS_K


def test_cdc_chunks_conserve_characters(spark):
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.queries_r10 import t_cdc_chunking
    from kp_crypto_market_analytics_spark.queries_r7 import _norm_text
    from kp_crypto_market_analytics_spark.session import load_tables

    rows = t_cdc_chunking(spark, SF_DIR).collect()
    d = load_tables(spark, SF_DIR, ["documents"])["documents"]
    per_src = {
        r["source"]: (r["n"], r["chars"])
        for r in d.select("source", _norm_text().alias("t"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("t")).alias("chars"),
        )
        .collect()
    }
    assert {r["source"] for r in rows} == set(per_src)
    for r in rows:
        n, chars = per_src[r["source"]]
        assert r["n_docs"] == n
        # chunks partition each document: total chunk chars == doc chars
        total_chunk_chars = round(r["mean_chunk_len"] * r["n_chunks"])
        assert abs(total_chunk_chars - chars) <= r["n_chunks"]  # 6dp mean
        assert 0 < r["n_unique"] <= r["n_chunks"]


def test_hampel_flags_are_rare_not_zero(spark):
    from kp_crypto_market_analytics_spark.queries_r10 import w_hampel_filter

    rows = w_hampel_filter(spark, SF_DIR).collect()
    assert rows
    tot_w = sum(r["n_windows"] for r in rows)
    tot_o = sum(r["n_outliers"] for r in rows)
    # a 3-sigma-equivalent robust fence: outliers exist but are rare
    assert 0 <= tot_o < 0.2 * tot_w


def test_transfer_entropy_nonnegative_ish(spark):
    # TE is >= 0 in expectation; the plug-in estimator can dip
    # epsilon-negative on tiny samples, so assert a loose floor and
    # internal consistency of the net column.
    from kp_crypto_market_analytics_spark.queries_r10 import (
        a_transfer_entropy,
    )

    r = a_transfer_entropy(spark, SF_DIR).collect()[0]
    assert r["n_obs"] > 0
    assert r["te_view_to_click"] >= -0.01
    assert r["te_click_to_view"] >= -0.01
    assert r["net_te"] == pytest.approx(
        r["te_view_to_click"] - r["te_click_to_view"], abs=2e-6
    )
