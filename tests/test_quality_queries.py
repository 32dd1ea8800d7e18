"""Semantics tests for the quality family (queries_quality.py):
data-quality expectations, DDSketch-style quantile sketch + merge law,
grouping sets.  Constructed inputs pin the detection guarantees; the
testdata runs pin the non-vacuous findings and the error SLO."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from kp_crypto_market_analytics_spark.queries_quality import (
    DDS_ERR_FLOOR,
    a_ddsketch_merge,
    a_ddsketch_quantiles,
    a_grouping_sets,
    dq_constraints,
    _dds_buckets,
    _dds_estimates,
)


def test_dq_constraints_findings(spark):
    got = dq_constraints(spark, SF_DIR).toPandas().set_index("check_name")
    assert len(got) == 11
    # The synthetic corpus genuinely violates exactly these expectations
    # (plus reconciliation, which fails for every order because the
    # generator draws o_totalprice independently of lineitem).
    failing = set(got.index[~got["ok"]])
    assert {"lineitem_pk_unique", "orders_has_lineitem",
            "lineitem_ship_after_order", "orders_price_reconciles"} == failing
    # Clean expectations really are clean — zero violations, ppm 0.
    clean = got[got["ok"]]
    assert (clean["violations"] == 0).all() and (clean["viol_ppm"] == 0).all()
    # ppm is floor(1e6 * v / n) exactly.
    for _, r in got.iterrows():
        assert r["viol_ppm"] == (1_000_000 * r["violations"]) // r["total"]
        assert 0 <= r["violations"] <= r["total"]


def test_ddsketch_error_slo(spark):
    got = a_ddsketch_quantiles(spark, SF_DIR).toPandas()
    assert list(got["q_level"]) == [0.5, 0.9, 0.95, 0.99]
    # SLO: bucket-midpoint estimates land within the 1/64 + rank-slack
    # bound at every level (DDS_ERR_FLOOR keeps headroom below 2%).
    assert got["ok"].all()
    assert (got["rel_err"].abs() <= DDS_ERR_FLOOR).all()
    # The sketch is actually small: far fewer buckets than rows.
    assert got["n_buckets"].iloc[0] < 900


def test_ddsketch_bucket_relative_error_bound(spark):
    # Constructed values across 4 octaves: every midpoint estimate must
    # sit within half a sub-bucket (1/64) of the true value.
    vals = [37, 1000, 54321, 9_876_543, 33, 64, 65]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    buckets = _dds_buckets(df, []).toPandas()
    assert buckets["n"].sum() == len(vals)
    for v in vals:
        e = v.bit_length() - 1
        if e >= 5:
            key = 32 * e + (v >> (e - 5)) - 32
            lo = (32 + ((v >> (e - 5)) - 32)) << (e - 5)
            width = 1 << (e - 5)
        else:
            key = 32 * e + (v - (1 << e))
            lo, width = v, 1
        assert key in set(buckets["key"]), (v, key)
        mid = lo + width / 2.0
        assert abs(mid - v) / v <= 1 / 64 + 1e-12, (v, mid)


def test_ddsketch_merge_law(spark):
    got = a_ddsketch_merge(spark, SF_DIR).toPandas().iloc[0]
    assert bool(got["buckets_equal"]) and bool(got["q50_equal"])
    assert got["merged_q50"] == got["direct_q50"]


def test_grouping_sets_granularities(spark):
    got = a_grouping_sets(spark, SF_DIR).toPandas()
    grand = got[got["gid"] == 3]
    assert len(grand) == 1
    n_total = int(grand["n"].iloc[0])
    # Each single-attribute rollup partitions the same population.
    assert int(got[got["gid"] == 1]["n"].sum()) == n_total  # by type
    assert int(got[got["gid"] == 2]["n"].sum()) == n_total  # by day
    assert int(got[got["gid"] == 0]["n"].sum()) == n_total  # type x day
    # Rolled-up attributes are NULL exactly per the grouping id.
    assert got[got["gid"] == 1]["day"].isna().all()
    assert got[got["gid"] == 2]["event_type"].isna().all()
    # sum_value is consistent across granularities to the rounding ulp.
    s = got[got["gid"] == 3]["sum_value"].iloc[0]
    assert abs(got[got["gid"] == 1]["sum_value"].sum() - s) < 0.05


def test_triangle_count_constructed_graph(spark):
    from kp_crypto_market_analytics_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, 6 edges, every wedge closed) plus a
    # pendant path 4-5-6 (0 triangles, 2 open wedges at 5 plus the
    # wedges 4 gains from its 4th neighbor).
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5), (5, 6)], "u int, v int")
    got = triangle_count(edges).collect()[0]
    assert got["n_triangles"] == 4
    assert got["n_edges"] == 8 and got["n_nodes"] == 6
    # degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 2; 6 -> 1
    assert got["n_wedges"] == 3 * 3 + 6 + 1 + 0


def test_triangle_query_nonvacuous(spark):
    from kp_crypto_market_analytics_spark.queries_quality import g_triangle_count

    got = g_triangle_count(spark, SF_DIR).collect()[0]
    assert got["n_triangles"] > 0 and got["n_edges"] > 0
    assert 0.0 < got["clustering"] <= 1.0


def test_assoc_rules_semantics(spark):
    from kp_crypto_market_analytics_spark.queries_quality import g_assoc_rules

    got = g_assoc_rules(spark, SF_DIR).toPandas()
    assert len(got) == 20
    # Lift-sorted, confidence is a probability, support meets threshold.
    assert list(got["lift"]) == sorted(got["lift"], reverse=True)
    assert ((got["confidence"] > 0) & (got["confidence"] <= 1.0)).all()
    assert (got["s_pair"] >= 2).all()
    # Rules come in both directions: each undirected pair at the top of
    # the lift order contributes u->v and v->u with the SAME lift.
    pairs = {tuple(sorted((r["antecedent"], r["consequent"]))): r["lift"]
             for _, r in got.iterrows()}
    for (x, y), lift in pairs.items():
        sel = got[(got["antecedent"] == y) & (got["consequent"] == x)]
        if len(sel):  # reverse made the top-20 too
            assert sel["lift"].iloc[0] == lift


def test_covariance_matrix_properties(spark):
    import numpy as np

    from kp_crypto_market_analytics_spark.queries_quality import e_covariance

    got = e_covariance(spark, SF_DIR).toPandas()
    assert len(got) == 64 * 65 // 2
    # Diagonal entries are variances: strictly positive.
    diag = got[got["dim_i"] == got["dim_j"]]
    assert len(diag) == 64 and (diag["cov"] > 0).all()
    # Cross-check one cell against numpy's population covariance.
    import pandas as pd

    from kp_crypto_market_analytics_spark.session import load_tables

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"].toPandas()
    X = np.array([list(v) for v in emb["embedding"]], dtype=np.float64)
    expect = float(((X[:, 0] * X[:, 1]).sum() / len(X))
                   - X[:, 0].mean() * X[:, 1].mean())
    cell = float(got[(got["dim_i"] == 1) & (got["dim_j"] == 2)]["cov"].iloc[0])
    assert abs(cell - expect) < 2e-6


def test_scd2_intervals(spark):
    from kp_crypto_market_analytics_spark.queries_quality import cdc_scd2

    got = cdc_scd2(spark, SF_DIR).toPandas()
    for uid, grp in got.groupby("user_id"):
        grp = grp.sort_values("version_n")
        # Exactly one open (current) interval per user, at the end.
        assert grp["is_current"].sum() == 1 and bool(grp["is_current"].iloc[-1])
        # Half-open intervals chain: valid_to == next valid_from.
        assert (grp["valid_to"].iloc[:-1].values
                == grp["valid_from"].iloc[1:].values).all()
        # Consecutive versions always change state.
        types = list(grp["event_type"])
        assert all(a != b for a, b in zip(types, types[1:]))


def test_label_centroid_audit_beats_random_and_naive_match(spark):
    # Audit honesty: the oracle recomputes the metrics identically, so
    # the gate can't catch a metric regression — this floor does.  The
    # synthetic labels are weakly clustered: nearest-centroid accuracy
    # must beat the 10-label random baseline (100000 ppm) for every
    # label with a positive mean margin, and the per-label accuracy
    # must match a naive numpy nearest-centroid classifier.
    import numpy as np

    from kp_crypto_market_analytics_spark.queries_quality import (
        e_label_centroid_audit,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    got = e_label_centroid_audit(spark, SF_DIR).toPandas().set_index("label")
    assert (got["acc_ppm"] > 100_000).all(), got["acc_ppm"].to_dict()
    assert (got["mean_margin"] > 0).all()

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"].toPandas()
    X = np.array([list(v) for v in emb["embedding"]], dtype=np.float64)
    y = emb["label"].to_numpy()
    cents = np.stack([X[y == lbl].mean(axis=0) for lbl in sorted(set(y))])
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    pred = d2.argmin(axis=1)
    for lbl in sorted(set(y)):
        n = int((y == lbl).sum())
        n_ok = int(((y == lbl) & (pred == y)).sum())
        assert int(got.loc[lbl, "n_vecs"]) == n
        assert int(got.loc[lbl, "n_correct"]) == n_ok, lbl


def test_fisher_separation_matches_numpy(spark):
    # The top-10 Fisher scores must match a naive numpy computation of
    # between-class / within-class scatter per dimension, and the
    # returned dims must be exactly numpy's top-10 (score desc, dim
    # asc).
    import numpy as np

    from kp_crypto_market_analytics_spark.queries_quality import (
        e_fisher_separation,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    got = e_fisher_separation(spark, SF_DIR).toPandas()
    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"].toPandas()
    X = np.array([list(v) for v in emb["embedding"]], dtype=np.float64)
    y = emb["label"].to_numpy()
    gm = X.mean(axis=0)
    sb = np.zeros(X.shape[1])
    sw = np.zeros(X.shape[1])
    for lbl in sorted(set(y)):
        Z = X[y == lbl]
        sb += len(Z) * (Z.mean(axis=0) - gm) ** 2
        sw += len(Z) * Z.var(axis=0)  # population variance, n-weighted
    fisher = sb / sw
    order = sorted(range(X.shape[1]), key=lambda i: (-fisher[i], i))[:10]
    assert list(got["dim"]) == order
    for _, r in got.iterrows():
        assert abs(r["fisher_score"] - fisher[int(r["dim"])]) < 1e-4


def test_k_anonymity_planted_unique(spark, tmp_path):
    # A planted singleton quasi-identifier group must show up as a
    # re-identifiable row at EVERY k >= 2, and a table whose smallest
    # group is m must report zero risk for k <= m.
    from kp_crypto_market_analytics_spark.queries_quality import dq_k_anonymity

    rows = []
    # 3 groups of 4 + one singleton (nation 9, segment "ODD")
    cid = 0
    for nat, seg in ((1, "AUTO"), (2, "AUTO"), (3, "RAIL")):
        for _ in range(4):
            rows.append((cid, f"c{cid}", nat, 0.0, seg))
            cid += 1
    rows.append((cid, "lone", 9, 0.0, "ODD"))
    sf = tmp_path / "kanon"
    sf.mkdir()
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    ).write.parquet(str(sf / "customer.parquet"))

    got = {r["k"]: r for r in dq_k_anonymity(spark, str(sf)).collect()}
    assert got[2]["rows_below_k"] == 1 and got[2]["groups_below_k"] == 1
    assert got[5]["rows_below_k"] == 13 and got[5]["groups_below_k"] == 4
    assert got[2]["min_group_size"] == 1
    assert got[2]["risk_ppm"] == 1 * 1_000_000 // 13
    assert got[2]["n_rows"] == 13 and got[2]["n_groups"] == 4
