"""Round-11 second-wave operator invariants — mathematical properties
the DuckDB oracle gate can't distinguish from a shared bug (the oracle
recomputes the same formula): range bounds, orderings, and
conservation laws checked independently here."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SFD = "/root/testdata/sf0.001"


def test_ultimate_oscillator_bounded(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import (
        ti_ultimate_oscillator,
    )

    rows = ti_ultimate_oscillator(spark, SFD).where(
        F.col("ultimate_osc").isNotNull()
    )
    n = rows.count()
    assert n > 0
    # BP <= TR per day, so each S_k in [0,1] and the 4:2:1 blend of
    # 100*S_k stays in [0,100].
    assert (
        rows.where(
            (F.col("ultimate_osc") < 0) | (F.col("ultimate_osc") > 100)
        ).count()
        == 0
    )


def test_choppiness_bounded(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import ti_choppiness

    rows = ti_choppiness(spark, SFD).where(F.col("choppiness").isNotNull())
    assert rows.count() > 0
    # sum(TR) >= HH-LL always (the path covers the channel), and
    # sum(TR) <= 14*(HH-LL) since each TR is within the 14-day channel
    # => 0 <= chop <= 100.
    assert (
        rows.where(
            (F.col("choppiness") < 0) | (F.col("choppiness") > 100)
        ).count()
        == 0
    )


def test_pivot_levels_ordered(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import ti_pivot_points

    rows = ti_pivot_points(spark, SFD).where(F.col("pivot").isNotNull())
    assert rows.count() > 0
    bad = rows.where(
        ~(
            (F.col("s2") <= F.col("s1"))
            & (F.col("s1") <= F.col("pivot"))
            & (F.col("pivot") <= F.col("r1"))
            & (F.col("r1") <= F.col("r2"))
        )
    )
    assert bad.count() == 0


def test_sample_entropy_a_subset_of_b(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import w_sample_entropy

    rows = w_sample_entropy(spark, SFD).collect()
    assert rows
    for r in rows:
        # every (m+1)-length match is an m-length match (Chebyshev max
        # over a superset of coordinates can only grow)
        assert r["a_cnt"] <= r["b_cnt"]
        if r["sampen"] is not None:
            assert r["sampen"] >= 0.0


def test_permutation_entropy_bounds(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import (
        w_permutation_entropy,
    )

    rows = w_permutation_entropy(spark, SFD).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_patterns"] <= 27
        assert r["perm_entropy"] >= 0.0
        # H <= ln(n_patterns) <= ln(27) = 3*ln(3)
        import math

        assert r["perm_entropy"] <= math.log(27.0) + 1e-9


def test_participation_ratio_within_dim(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import (
        e_participation_ratio,
    )

    r = e_participation_ratio(spark, SFD).collect()[0]
    # Cauchy-Schwarz: 1 <= tr(C)^2/tr(C^2) <= d
    assert 1.0 - 1e-9 <= r["participation_ratio"] <= 64.0 + 1e-9
    assert 0.0 < r["isotropy_share"] <= 1.0 + 1e-9


def test_cka_unit_interval(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import e_cka

    r = e_cka(spark, SFD).collect()[0]
    # ||Cxy||_F^2 <= ||Cxx||_F * ||Cyy||_F (submultiplicative bound)
    assert 0.0 <= r["cka_linear"] <= 1.0 + 1e-9


def test_chow_sse_decomposition(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import a_chow_test

    r = a_chow_test(spark, SFD).collect()[0]
    assert r["n1"] + r["n2"] == r["n_days"]
    # per-segment fits can only reduce SSE (±1.5 slack: the three SSEs
    # are independently half-away-quantized to integers)
    assert r["sse_pooled"] >= r["sse_seg1"] + r["sse_seg2"] - 1.5
    assert r["chow_f"] >= -1e-5


def test_odds_ratio_cells_partition_pairs(spark):
    from kp_crypto_market_analytics_spark.queries_r11 import _paired_diffs_df
    from kp_crypto_market_analytics_spark.queries_r11b import a_odds_ratio

    r = a_odds_ratio(spark, SFD).collect()[0]
    n_pairs = _paired_diffs_df(spark, SFD).count()
    assert r["a"] + r["b"] + r["c"] + r["d"] == n_pairs


def test_fd_audit_keys_hold(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import dq_fd_discovery

    rows = {(r["tbl"], r["det"]): r for r in dq_fd_discovery(spark, SFD).collect()}
    # genuine keys: determinant IS the primary key, FD must hold
    assert rows[("customer", "c_custkey")]["fd_holds"] is True
    assert rows[("nation", "n_nationkey")]["fd_holds"] is True
    for r in rows.values():
        assert 0.0 <= r["violation_rate"] <= 1.0


def test_bipartite_projection_shape(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import (
        g_bipartite_projection,
    )

    rows = g_bipartite_projection(spark, SFD).collect()
    assert 0 < len(rows) <= 20
    weights = [r["n_orders"] for r in rows]
    assert weights == sorted(weights, reverse=True)
    for r in rows:
        assert r["part1"] < r["part2"]
        assert r["n_orders"] >= 1


def test_hapax_counts_conserve(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import t_hapax_richness

    for r in t_hapax_richness(spark, SFD).collect():
        assert r["v1"] + r["v2"] <= r["n_types"]
        assert r["n_types"] <= r["n_tokens"]
        assert 0.0 <= r["hapax_share"] <= 1.0
        assert 0.0 <= r["sichel_s"] <= 1.0


def test_distinct_n_ratios_in_unit_interval(spark):
    from kp_crypto_market_analytics_spark.queries_r11b import t_distinct_n

    rows = t_distinct_n(spark, SFD).collect()
    assert rows
    for r in rows:
        for c in ("distinct_1", "distinct_2", "distinct_3"):
            if r[c] is not None:
                assert 0.0 < r[c] <= 1.0
