"""Semantics & SLO-floor tests for the round-3 graph / mining / audit
queries.  The DuckDB oracles recompute derived metrics identically on
both engines, so METRIC regressions never fail the gate — these
assertions are the tripwires (the sim_ivf_recall lesson), plus
constructed-input checks for the algorithmic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_kmv_estimate_error_bounded(spark):
    from kp_crypto_market_analytics_spark.queries_quality import a_kmv_overlap

    rows = a_kmv_overlap(spark, SF_DIR).collect()
    assert rows, "pair table must be non-empty"
    for r in rows:
        assert r["exact_inter"] > 0
        assert r["kmv_inter"] > 0
        # k=256 KMV: σ ≈ 1/√k ≈ 6.3%; 4σ guard.
        assert abs(r["rel_err"]) < 0.25, r


def test_jl_projection_ratio_sane(spark):
    from kp_crypto_market_analytics_spark.queries_quality import e_jl_projection

    r = e_jl_projection(spark, SF_DIR).collect()[0]
    assert r["n_pairs"] >= 1
    assert r["min_ratio"] > 0
    assert r["min_ratio"] <= r["mean_ratio"] <= r["max_ratio"]


def test_psi_nonnegative_and_undrifted_on_uniform_split(spark):
    from kp_crypto_market_analytics_spark.queries_quality import dq_drift_psi

    rows = dq_drift_psi(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["psi"] >= 0.0
        assert r["drifted"] == (r["psi"] > 0.2)
    # At sf0.001 each half is ~100 rows/type — PSI sampling noise alone
    # reaches 0.2.  The stationarity assertion needs the sf0.01 sample:
    # even/odd-day halves of the synthetic stream must not trip the
    # alert there — if one fires, the binning broke.
    for r in dq_drift_psi(spark, "/root/testdata/sf0.01").collect():
        assert not r["drifted"], r


def test_benford_shares_partition_unity(spark):
    from kp_crypto_market_analytics_spark.queries_quality import a_benford

    rows = a_benford(spark, SF_DIR).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["pct"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert 0.0 < r["expected_pct"] < 0.31
        assert r["abs_dev"] >= 0.0


def test_gapfill_interp_values_lie_between_neighbors(spark):
    from kp_crypto_market_analytics_spark.queries_quality import w_gapfill_interp

    pdf = w_gapfill_interp(spark, SF_DIR).toPandas()
    assert (pdf["value"].notna()).all()
    for _, grp in pdf.groupby("event_type"):
        grp = grp.sort_values("bucket").reset_index(drop=True)
        obs = grp[grp["filled"] == 0]["value"]
        lo, hi = obs.min(), obs.max()
        gaps = grp[grp["filled"] == 1]["value"]
        # Linear interpolation can never overshoot the observed range.
        assert gaps.between(lo - 1e-9, hi + 1e-9).all()


def test_markov_transition_rows_sum_to_one(spark):
    from kp_crypto_market_analytics_spark.queries_mining import a_markov_transition

    pdf = a_markov_transition(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    for cur, grp in pdf.groupby("cur_type"):
        assert abs(grp["p"].sum() - 1.0) < 5e-6 * len(grp) + 1e-9, cur


def test_pagerank_symmetric_two_cliques(spark):
    from kp_crypto_market_analytics_spark.operators.graph import pagerank_weighted

    # Symmetric 4-cycle with equal weights: every node's rank is exactly
    # 1.0 at every iteration (uniform fixed point).
    e = [(1, 2), (2, 3), (3, 4), (4, 1)]
    edges = spark.createDataFrame(
        [(a, b, 1) for a, b in e] + [(b, a, 1) for a, b in e],
        "src long, dst long, weight long",
    )
    pr = {r["node"]: r["pr"] for r in pagerank_weighted(edges, iters=3).collect()}
    assert pr == {1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0}


def test_pagerank_hub_outranks_leaf(spark):
    from kp_crypto_market_analytics_spark.operators.graph import pagerank_weighted

    # Star graph: the hub must accumulate strictly more mass.
    e = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        [(a, b, 1) for a, b in e] + [(b, a, 1) for a, b in e],
        "src long, dst long, weight long",
    )
    pr = {r["node"]: r["pr"] for r in pagerank_weighted(edges, iters=3).collect()}
    assert pr[0] > max(pr[i] for i in range(1, 5))


def test_label_prop_top_communities_disjoint_sizes(spark):
    from kp_crypto_market_analytics_spark.queries_graph import (
        g_degree_stats,
        g_label_prop,
    )

    comm = g_label_prop(spark, SF_DIR).collect()
    sizes = [r["n_members"] for r in comm]
    assert sizes == sorted(sizes, reverse=True)
    n_nodes = sum(
        r["n_parts"] for r in g_degree_stats(spark, SF_DIR).collect()
    )
    assert sum(sizes) <= n_nodes


def test_jaccard_sim_bounds(spark):
    from kp_crypto_market_analytics_spark.queries_mining import g_jaccard_sim

    rows = g_jaccard_sim(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["u"] < r["v"]
        assert r["common"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0


def test_rank_movers_delta_consistency(spark):
    from kp_crypto_market_analytics_spark.queries_mining import q_rank_movers

    rows = q_rank_movers(spark, SF_DIR).collect()
    assert rows
    deltas = [abs(r["rank_delta"]) for r in rows]
    assert deltas == sorted(deltas, reverse=True)
    for r in rows:
        assert r["rank_delta"] == r["rank_a"] - r["rank_b"]
        assert r["rank_a"] >= 1 and r["rank_b"] >= 1


def test_hashed_features_collision_audit(spark):
    from kp_crypto_market_analytics_spark.queries_mining import t_hashed_features

    rows = t_hashed_features(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bucket"] < 1024
        assert 1 <= r["n_distinct"] <= r["n_tokens"]


def test_audio_window_schedule_constructed(spark):
    from kp_crypto_market_analytics_spark.operators.multimodal import window_audio

    payload = "ab" * 80  # 160 chars, mirrors the 5×md5 payload shape
    df = spark.createDataFrame([(7, payload)], "media_id long, payload string")
    rows = sorted(
        window_audio(df, fake=True).collect(), key=lambda r: r["frame_idx"]
    )
    # Replay the fake decoder's schedule in pure Python.
    h = 0
    for b in payload.encode()[:64]:
        h = (h * 131 + b) % (1 << 31)
    sr = (8000, 16000, 44100)[h % 3]
    n_samples = 2048 + h % 100000
    expect_n = (n_samples - 1024) // 512 + 1
    assert len(rows) == expect_n
    for k, r in enumerate(rows):
        assert r["media_id"] == 7 and r["sr"] == sr
        assert r["frame_idx"] == k
        assert r["start_sample"] == k * 512
        assert r["start_sample"] + 1024 <= n_samples
        assert r["t_start_ms"] == k * 512 * 1000 // sr


def test_zipf_fit_slope_negative(spark):
    from kp_crypto_market_analytics_spark.queries_quality import t_zipf_fit

    r = t_zipf_fit(spark, SF_DIR).collect()[0]
    assert r["n_terms"] >= 10
    assert r["slope"] < 0  # frequency decays with rank, always
    assert 0.0 <= r["r2"] <= 1.0


def test_kcore_peel_monotone(spark):
    from kp_crypto_market_analytics_spark.queries_mining import g_kcore

    rows = sorted(g_kcore(spark, SF_DIR).collect(), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [0, 1, 2, 3, 4]
    nodes = [r["n_nodes"] for r in rows]
    edges = [r["n_edges"] for r in rows]
    # Peeling can only shrink the graph.
    assert nodes == sorted(nodes, reverse=True)
    assert edges == sorted(edges, reverse=True)
    assert nodes[0] > 0


def test_yoy_growth_join_alignment(spark):
    from kp_crypto_market_analytics_spark.queries_mining import q_yoy_growth

    rows = q_yoy_growth(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["mo"] <= 12
        assert r["prev_rev"] > 0
        # yoy recomputes from the emitted (rounded) revenues to ~1e-4.
        approx = (r["rev"] - r["prev_rev"]) / r["prev_rev"]
        assert abs(approx - r["yoy"]) < 1e-4


def test_scd2_lookup_partitions_every_event(spark):
    from kp_crypto_market_analytics_spark.queries_mining import j_scd2_lookup
    from kp_crypto_market_analytics_spark.session import load_tables

    rows = j_scd2_lookup(spark, SF_DIR).collect()
    total = sum(r["n_events"] for r in rows)
    n_events = load_tables(spark, SF_DIR, ["events"])["events"].count()
    # The intervals tile each user's timeline: every event lands in
    # EXACTLY one version interval.
    assert total == n_events
    assert all(r["n_users"] >= 1 for r in rows)


def test_stl_decomposition_identity(spark):
    from kp_crypto_market_analytics_spark.queries_mining import w_stl_decompose

    pdf = w_stl_decompose(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    inner = pdf[pdf["trend"].notna() & pdf["residual"].notna()]
    assert len(inner) > 0
    # value = trend + seasonal + residual up to the 6-dp re-rounding.
    err = (inner["v"] - inner["trend"] - inner["seasonal"] - inner["residual"]).abs()
    assert float(err.max()) < 2e-6
    # Edge hours (incomplete ±12 window) are honestly NULL.
    assert pdf["trend"].isna().any()


def test_abc_pareto_shares(spark):
    from kp_crypto_market_analytics_spark.queries_mining import q_abc_pareto

    rows = {r["abc_class"]: r for r in q_abc_pareto(spark, SF_DIR).collect()}
    assert set(rows) == {"A", "B", "C"}
    assert abs(sum(r["rev_share"] for r in rows.values()) - 1.0) < 1e-3
    # Pareto shape: class A captures ~80% of revenue with fewer parts
    # than C holds.
    assert rows["A"]["rev_share"] > rows["B"]["rev_share"] > rows["C"]["rev_share"]


def test_funnel_windowed_shrinks(spark):
    from kp_crypto_market_analytics_spark.queries_mining import a_funnel_windowed
    from kp_crypto_market_analytics_spark.queries_ext import a_funnel_steps

    rows = sorted(
        a_funnel_windowed(spark, SF_DIR).collect(), key=lambda r: r["step"]
    )
    assert [r["step_name"] for r in rows] == ["view", "click_7d", "purchase_7d"]
    ns = [r["n_users"] for r in rows]
    assert ns[0] >= ns[1] >= ns[2]
    assert rows[0]["conv_ppm"] == 1000000
    # The 7-day window can only remove conversions vs the unbounded
    # funnel.
    unbounded = {
        r["step"]: r["n_users"] for r in a_funnel_steps(spark, SF_DIR).collect()
    }
    assert ns[1] <= unbounded["2_click"] and ns[2] <= unbounded["3_purchase"]


def test_rake_phrases_are_stopword_free(spark):
    from kp_crypto_market_analytics_spark.queries_mining import (
        _RAKE_STOPS,
        t_keyphrase_rake,
    )

    rows = t_keyphrase_rake(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        words = r["phrase"].split(" ")
        assert len(words) == r["n_words"] >= 2
        assert not set(words) & set(_RAKE_STOPS)
        assert r["score"] > 0 and r["n_occurrences"] >= 1


def test_cohort_ltv_monotone_windows(spark):
    from kp_crypto_market_analytics_spark.queries_mining import a_cohort_ltv

    rows = a_cohort_ltv(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_users"] >= 1
        # Wider capture windows can only add revenue (values >= 0 is
        # NOT guaranteed — event values can be negative — so compare
        # only when all windows are nonneg-increasing in coverage).
        assert r["rev_w1"] == r["rev_w1"]  # not NaN


def test_bfs_distance_histogram(spark):
    from kp_crypto_market_analytics_spark.queries_graph import g_bfs_distance

    rows = {r["dist"]: r["n_parts"] for r in g_bfs_distance(spark, SF_DIR).collect()}
    assert rows.get(0) == 1  # exactly one source
    assert all(d in (-1, 0, 1, 2, 3, 4) for d in rows)
    # The hub has neighbors, so distance 1 must be populated.
    assert rows.get(1, 0) >= 1


def test_active_users_window_containment(spark):
    from kp_crypto_market_analytics_spark.queries_mining import a_active_users

    rows = a_active_users(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # Trailing windows nest: DAU ⊆ WAU ⊆ MAU.
        assert 1 <= r["dau"] <= r["wau"] <= r["mau"]
        assert 0.0 < r["stickiness"] <= 1.0


def test_gini_in_unit_interval(spark):
    from kp_crypto_market_analytics_spark.queries_quality import a_lorenz_gini

    r = a_lorenz_gini(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    assert r["n_customers"] >= 1 and r["total_rev"] > 0


def test_matryoshka_longer_prefix_is_closer(spark):
    from kp_crypto_market_analytics_spark.queries_quality import (
        e_matryoshka_prefix,
    )

    rows = {r["prefix_dim"]: r for r in e_matryoshka_prefix(spark, SF_DIR).collect()}
    assert set(rows) == {16, 32}
    # A longer prefix can only track the full cosine more closely (on
    # average) — the monotonicity serving decisions rely on.
    assert rows[32]["mean_abs_dev"] <= rows[16]["mean_abs_dev"]
    for r in rows.values():
        assert 0.0 <= r["mean_abs_dev"] <= r["max_abs_dev"] <= 2.0


def test_rfm_scores_partition_customers(spark):
    from kp_crypto_market_analytics_spark.queries_mining import q_customer_rfm
    from kp_crypto_market_analytics_spark.session import load_tables

    rows = q_customer_rfm(spark, SF_DIR).collect()
    assert rows
    n_cust = (
        load_tables(spark, SF_DIR, ["orders"])["orders"]
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["avg_monetary"] > 0


def test_order_intervals_sane(spark):
    from kp_crypto_market_analytics_spark.queries_mining import a_order_intervals

    r = a_order_intervals(spark, SF_DIR).collect()[0]
    assert r["n_intervals"] >= 1
    assert 0 <= r["p50_days"] <= r["p90_days"]
    assert r["mean_days"] > 0


def test_seasonal_naive_scores_nonnegative(spark):
    from kp_crypto_market_analytics_spark.queries_quality import (
        w_seasonal_naive_forecast,
    )

    rows = w_seasonal_naive_forecast(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r["n_scored"] >= 1
        assert 0.0 <= r["mae"] <= r["rmse"] * (r["n_scored"] ** 0.5) + 1e-9
        assert r["rmse"] >= 0.0 and r["mape_pct"] >= 0.0


def test_embedding_drift_identical_halves_look_alike(spark):
    from kp_crypto_market_analytics_spark.queries_quality import e_embedding_drift

    r = e_embedding_drift(spark, SF_DIR).collect()[0]
    # Even/odd halves of one isotropic ZERO-MEAN corpus: the centroids
    # are noise vectors, so their cosine is arbitrary in [-1, 1] (it
    # becomes meaningful only for non-centered real spaces) — the
    # stable invariants here are the energy ratio near 1 and a small
    # centroid shift.
    assert -1.0 <= r["centroid_cos"] <= 1.0
    assert 0.5 < r["energy_ratio"] < 2.0
    assert 0.0 <= r["centroid_l2"] < 1.0
