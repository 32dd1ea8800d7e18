"""Round-7 invariants: scale-out rank/cumsum, MG order statistic via
TakeOrdered, PPR seed-intersection semantics, checksum delimiter
escaping, KMV empty-difference reporting."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_range_partitioned_rank_desc_and_cumsum(spark):
    """Descending sort-order columns and the fused cumulative sum must
    be bit-identical to the single-partition window forms."""
    from kp_crypto_market_analytics_spark.operators.layout import (
        range_partitioned_rank,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    t = load_tables(spark, SF_DIR, ["events"])
    e = t["events"].select(
        "event_id", F.col("value").cast("decimal(18,6)").alias("v")
    )
    got = {
        r["event_id"]: (r["global_rn"], r["global_cumsum"])
        for r in range_partitioned_rank(
            e,
            [F.col("v").desc(), F.col("event_id").asc()],
            n_ranges=7,
            sum_col="v",
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("event_id").asc())
    want = {
        r["event_id"]: (r["rn"], r["cum"])
        for r in e.select(
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        ).collect()
    }
    assert got == want


def test_mg_reduce_takeordered_matches_rank_definition(spark):
    """The TakeOrdered(k+1) order statistic must subtract exactly the
    (k+1)-th largest weight — 0 when fewer than k+1 entries exist —
    and leave at most k strictly positive survivors."""
    from kp_crypto_market_analytics_spark.operators.heavyhitters import (
        mg_reduce,
    )

    rows = [("a", 10), ("b", 7), ("c", 7), ("d", 3), ("e", 1)]
    df = spark.createDataFrame(rows, ["tok", "w"]).withColumn(
        "w", F.col("w").cast("long")
    )
    for k in (2, 3, 4, 10):
        got = {r["tok"]: r["w"] for r in mg_reduce(df, k).collect()}
        ws = sorted((w for _, w in rows), reverse=True)
        d = ws[k] if len(ws) > k else 0
        want = {t: w - d for t, w in rows if w - d > 0}
        assert got == want, f"k={k}"
        assert len(got) <= k or d == 0


def test_ppr_excludes_out_of_graph_seeds(spark):
    """A seed absent from the edge set must not dilute the teleport
    denominator: ranks with and without the phantom seed are equal,
    and an all-phantom seed frame raises."""
    from kp_crypto_market_analytics_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "c", 1.0)],
        ["src", "dst", "weight"],
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    seeds_plus_ghost = spark.createDataFrame([("a",), ("zz",)], ["node"])
    base = {
        r["node"]: r["pr"]
        for r in personalized_pagerank(edges, seeds, iters=2).collect()
    }
    ghosted = {
        r["node"]: r["pr"]
        for r in personalized_pagerank(
            edges, seeds_plus_ghost, iters=2
        ).collect()
    }
    assert base == ghosted
    # teleport-only mass conservation sanity: iterate-0 mass was 1 on
    # the seed; after damped iterations total mass stays near 1.
    assert abs(sum(base.values()) - 1.0) < 0.2
    with pytest.raises(ValueError, match="no seed"):
        personalized_pagerank(
            edges, spark.createDataFrame([("zz",)], ["node"]), iters=1
        )


def test_checksum_canon_escapes_delimiter_and_sentinel(spark):
    """Rows that would render identically under a naive '|' join must
    canonicalize differently: pipe inside a value, literal '\\N', and
    NULL are three distinct renderings."""
    from kp_crypto_market_analytics_spark.queries_quality import (
        _checksum_canon,
    )

    df = spark.createDataFrame(
        [("a|b", "c"), ("a", "b|c"), ("\\N", "x"), (None, "x")], ["u", "v"]
    )
    txt = df.select(
        F.concat_ws(
            "|", _checksum_canon("u"), _checksum_canon("v")
        ).alias("t")
    )
    rendered = [r["t"] for r in txt.collect()]
    assert len(set(rendered)) == 4, rendered
    # the NULL sentinel is distinguishable from a literal backslash-N
    assert "\\\\N|x" in rendered and "\\N|x" in rendered


def test_kmv_difference_reports_empty_pairs(spark):
    """Every directed pair appears exactly once, kmv_diff >= 0, and a
    pair with an empty sketch difference reports 0 instead of
    vanishing (the all-pairs contract)."""
    from kp_crypto_market_analytics_spark.queries_quality import (
        a_kmv_difference,
    )

    rows = a_kmv_difference(spark, SF_DIR).collect()
    pairs = {(r["ta"], r["tb"]) for r in rows}
    types = sorted({r["ta"] for r in rows} | {r["tb"] for r in rows})
    assert len(pairs) == len(types) * (len(types) - 1)
    for r in rows:
        assert r["kmv_diff"] >= 0.0
        if r["exact_diff"] == 0:
            assert r["rel_err"] is None


def test_range_partitioned_cummax_exclusive(spark):
    """The range-partitioned exclusive prefix-max must match the
    single-partition window form, including the NULL on the global
    first row."""
    from kp_crypto_market_analytics_spark.operators.layout import (
        range_partitioned_rank,
    )

    rows = [(i, (i * 37) % 11) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r["pm"]
        for r in range_partitioned_rank(
            df,
            [F.col("k").desc()],
            out_col="__r",
            max_col="v",
            cummax_out="pm",
            exclusive_max=True,
            n_ranges=9,
        ).collect()
    }
    w = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = {
        r["k"]: r["pm"]
        for r in df.select("k", F.max("v").over(w).alias("pm")).collect()
    }
    assert got == want
    assert want[199] is None


def test_train_split_leakage_free_and_partitioned(spark):
    """The cluster-keyed split must (a) cover every document exactly
    once, (b) sum shares to ~1e6 ppm, and (c) leak ZERO near-dup
    pairs across splits — the property the operator exists for.  The
    naive doc-hash baseline's leak count is >= the cluster split's."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        t_split_leakage,
        t_train_split,
    )

    sf = "/root/testdata/sf0.01"
    rows = t_train_split(spark, sf).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows) == 500
    assert abs(sum(r["doc_share_ppm"] for r in rows) - 1_000_000) <= len(rows)
    by = {r["split"]: r for r in rows}
    assert by["train"]["n_docs"] > 400  # 98% quota dominates

    leak = t_split_leakage(spark, sf).collect()[0]
    assert leak["leaked_cluster_split"] == 0
    assert leak["leaked_doc_split"] >= 0
    assert leak["n_pairs"] > 0  # audit is non-vacuous on this corpus
    assert leak["n_dup_clusters"] > 0


def test_mix_weights_sum_to_one_and_upsample_small(spark):
    """Mixture shares must sum to ~1 and the sqrt temperature must
    up-sample below-average-size sources (oversample > 1) and
    down-sample above-average ones."""
    from kp_crypto_market_analytics_spark.queries_r7 import t_mix_weights

    rows = t_mix_weights(spark, "/root/testdata/sf0.01").collect()
    assert abs(sum(r["weight_share"] for r in rows) - 1.0) < 1e-4
    mean_tok = sum(r["n_tokens"] for r in rows) / len(rows)
    for r in rows:
        if r["n_tokens"] < mean_tok * 0.5:
            assert r["oversample"] > 1.0, r
        if r["n_tokens"] > mean_tok * 2.0:
            assert r["oversample"] < 1.0, r


def test_column_profile_counts(spark):
    """Profile invariants: n_null + nonnull-distinct bounds, numeric
    min <= max, string columns carry string bounds only."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        dq_column_profile,
    )

    rows = {r["column_name"]: r
            for r in dq_column_profile(spark, "/root/testdata/sf0.01").collect()}
    assert set(rows) == {"event_id", "user_id", "event_type", "value", "props"}
    for name, r in rows.items():
        assert 0 <= r["n_null"] <= r["n_rows"]
        assert r["n_distinct"] <= r["n_rows"] - r["n_null"]
        if r["min_num"] is not None:
            assert r["min_num"] <= r["max_num"]
            assert r["min_str"] is None
        else:
            assert r["min_str"] <= r["max_str"]
    assert rows["event_id"]["n_distinct"] == rows["event_id"]["n_rows"]


def test_ewma_truncated_matches_reference_fold(spark):
    """The 8-lag α=1/2 EWMA weights are exact rationals 2^(7-j)/255:
    a driver-side replay over one event type must reproduce the
    engine's daily closing EWMA bit for bit."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        w_ewma_truncated,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    rows = w_ewma_truncated(spark, sf).collect()
    assert rows
    et = rows[0]["event_type"]
    src = (
        load_tables(spark, sf, ["events"])["events"]
        .where(F.col("event_type") == et)
        .orderBy("ts", "event_id")
        .select("ts", F.col("value").cast("decimal(18,6)").alias("v"))
        .collect()
    )
    from decimal import Decimal

    vals = [r["v"] for r in src]
    days = [r["ts"].date() for r in src]
    close = {}
    for i in range(7, len(vals)):
        num = sum(
            Decimal(vals[i - j]) * (1 << (7 - j)) for j in range(8)
        )
        micro = int(num * 1_000_000)
        eu = (2 * micro + 255) // 510
        close[days[i]] = eu / 1_000_000.0
    got = {r["day"]: r["close_ewma"] for r in rows if r["event_type"] == et}
    assert got == {d: close[d] for d in got}


def test_open_orders_sweep_conservation(spark):
    """Sweep-line invariants: concurrency is non-negative everywhere,
    the global sum of deltas is zero (every opened order closes), and
    the peak equals a brute-force interval count at one probe day."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        a_open_orders_sweep,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    rows = a_open_orders_sweep(spark, sf).collect()
    assert rows
    assert all(r["max_open"] >= r["open_eom"] >= 0 for r in rows)
    assert rows[-1]["open_eom"] == 0  # all orders eventually ship

    # brute-force check at the global peak month's max
    t = load_tables(spark, sf, ["orders", "lineitem"])
    ends = t["lineitem"].groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("ls")
    )
    iv = (
        t["orders"]
        .select("o_orderkey", F.to_date("o_orderdate").alias("s"))
        .join(ends, F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn("e", F.greatest(F.col("s"), F.col("ls")))
    )
    peak = max(r["max_open"] for r in rows)
    # count intervals covering each start day in the peak months
    peak_rows = [r for r in rows if r["max_open"] == peak]
    y, m = peak_rows[0]["y"], peak_rows[0]["m"]
    days = [r["s"] for r in iv.where(
        (F.year("s") == y) & (F.month("s") == m)).collect()]
    best = 0
    for d in set(days):
        n = iv.where((F.col("s") <= F.lit(d)) & (F.col("e") >= F.lit(d))).count()
        best = max(best, n)
    assert best == peak


def test_hits_mutual_reinforcement(spark):
    """HITS invariants: scores in (0, 1], exactly one 1.0 per side
    (max-normalization), ranks contiguous from 1, hubs capped at 10."""
    from kp_crypto_market_analytics_spark.queries_r7 import g_hits

    rows = g_hits(spark, "/root/testdata/sf0.001").collect()
    sides = {}
    for r in rows:
        sides.setdefault(r["side"], []).append(r)
    assert set(sides) == {"authority", "hub"}
    assert len(sides["hub"]) <= 10
    for side, rs in sides.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(0 < r["score"] <= 1.0 for r in rs)
        assert rs[0]["score"] == 1.0  # the normalizer
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_ngram_novelty_bounds(spark):
    """Novelty is a fraction in [0, 1e6] ppm; the union of owned
    shingles equals the global distinct shingle count (every shingle
    has exactly one first owner)."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        t_ngram_novelty,
    )

    rows = t_ngram_novelty(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["mean_novelty_ppm"] <= 1_000_000
        assert 0 <= r["n_owned"] <= r["n_shingles"]


def test_bootstrap_ci_brackets_point_mean(spark):
    """The percentile CI must bracket the point mean, be ordered, and
    keep all 100 replicates (Poisson weights can't empty a 1.4k-row
    resample)."""
    from kp_crypto_market_analytics_spark.queries_r7 import a_bootstrap_ci

    r = a_bootstrap_ci(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_replicates"] == 100
    assert r["boot_lo"] < r["mean_rev"] < r["boot_hi"]
    # CI half-width sanity: within 50% of the mean for this n
    assert (r["boot_hi"] - r["boot_lo"]) < r["mean_rev"]


def test_epoch_shuffle_redeal_and_balance(spark):
    """Each epoch must cover every document exactly once, shards must
    be roughly balanced, and consecutive epochs must deal DIFFERENT
    assignments (different sigs)."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        t_epoch_shuffle,
    )

    rows = t_epoch_shuffle(spark, "/root/testdata/sf0.001").collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == {0, 1}
    totals = {e: sum(r["n_docs"] for r in rs) for e, rs in by_epoch.items()}
    assert totals[0] == totals[1]  # same corpus every epoch
    sig = {e: sorted(r["assign_sig"] for r in rs) for e, rs in by_epoch.items()}
    assert sig[0] != sig[1]  # the permutation actually changed
    for e, rs in by_epoch.items():
        ns = [r["n_docs"] for r in rs]
        assert max(ns) <= 3 * max(1, min(ns))  # crude balance bound


def test_rolling_median_robust_to_outliers(spark):
    """The rolling median must equal the brute-force median of the
    last 25 values for a replayed event type (driver-side replay)."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        w_rolling_median,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    rows = w_rolling_median(spark, sf).collect()
    assert rows
    et = rows[0]["event_type"]
    src = (
        load_tables(spark, sf, ["events"])["events"]
        .where(F.col("event_type") == et)
        .orderBy("ts", "event_id")
        .select("ts", F.col("value").cast("decimal(18,6)").alias("v"))
        .collect()
    )
    vals = [r["v"] for r in src]
    days = [r["ts"].date() for r in src]
    close = {}
    for i in range(24, len(vals)):
        med = sorted(vals[i - 24: i + 1])[12]
        close[days[i]] = float(med)
    got = {r["day"]: r["close_median"] for r in rows if r["event_type"] == et}
    assert got == {d: close[d] for d in got}


def test_scene_cut_census_consistent(spark):
    """Scene-cut census totals must equal the video count, cut counts
    stay within frame bounds, and mean first-cut positions lie in
    [1, 15]."""
    from kp_crypto_market_analytics_spark.queries_r7 import mm_scene_cut
    from kp_crypto_market_analytics_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    rows = mm_scene_cut(spark, sf).collect()
    n_videos = (
        load_tables(spark, sf, ["documents"])["documents"]
        .where(F.col("doc_id") % 3 == 2)
        .count()
    )
    assert sum(r["n_videos"] for r in rows) == n_videos
    for r in rows:
        assert 0 <= r["n_cuts"] <= 15
        if r["n_cuts"] == 0:
            assert r["n_with_cut"] == 0 and r["mean_first_cut"] is None
        else:
            assert r["n_with_cut"] == r["n_videos"]
            assert 1.0 <= r["mean_first_cut"] <= 15.0


def _events_pdf():
    import duckdb

    return duckdb.sql(
        "SELECT event_id, ts, event_type, value, props"
        f" FROM '{SF_DIR}/events.parquet'"
    ).df()


def test_chi_square_dof_and_effect_size(spark):
    """dof must equal (r-1)(c-1) of the observed table; chi2 >= 0 and
    Cramér's V in [0, 1]; n equals the event count."""
    from kp_crypto_market_analytics_spark.queries_r7 import a_chi_square

    pdf = _events_pdf()
    r = a_chi_square(spark, SF_DIR).collect()[0]
    n_types = pdf["event_type"].nunique()
    n_dows = pdf["ts"].dt.dayofweek.nunique()
    assert r["n"] == len(pdf)
    assert r["dof"] == (n_types - 1) * (n_dows - 1)
    assert r["chi2"] >= 0.0
    assert 0.0 <= r["cramers_v"] <= 1.0


def test_welch_ttest_matches_scipy_shape(spark):
    """Arm counts partition each type's rows; the t statistic matches
    a pandas recomputation from the same exact moments (sign included)."""
    from kp_crypto_market_analytics_spark.queries_r7 import a_welch_ttest

    pdf = _events_pdf()
    # Python weekday(): Mon=0..Sun=6 -> weekend is {5, 6}
    pdf["wknd"] = pdf["ts"].dt.dayofweek.isin([5, 6])
    rows = {r["event_type"]: r for r in a_welch_ttest(spark, SF_DIR).collect()}
    assert set(rows) == set(pdf["event_type"].unique())
    for et, grp in pdf.groupby("event_type"):
        r = rows[et]
        a, b = grp[grp["wknd"]]["value"], grp[~grp["wknd"]]["value"]
        assert r["n_wknd"] == len(a) and r["n_wkday"] == len(b)
        if len(a) > 1 and len(b) > 1:
            se = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
            want = (a.mean() - b.mean()) / se**0.5
            assert abs(r["t_stat"] - want) < 1e-4


def test_sharpe_matches_pandas_daily_recompute(spark):
    """Sharpe/Sortino must match a pandas recomputation of daily
    close-to-close log returns (same last-tick-of-day convention)."""
    import numpy as np

    from kp_crypto_market_analytics_spark.queries_r7 import ti_sharpe

    pdf = _events_pdf()
    pdf = pdf[pdf["value"] > 0].sort_values(["ts", "event_id"])
    rows = {r["event_type"]: r for r in ti_sharpe(spark, SF_DIR).collect()}
    for et, grp in pdf.groupby("event_type"):
        closes = grp.groupby(grp["ts"].dt.date)["value"].last()
        r = np.log(closes / closes.shift(1)).dropna()
        if len(r) <= 1:
            continue
        got = rows[et]
        assert got["n_days"] == len(r)
        if r.std(ddof=1) > 0:
            want = r.mean() / r.std(ddof=1) * np.sqrt(365.0)
            assert abs(got["sharpe"] - want) < 1e-3
        dn = r[r < 0]
        if len(dn):
            ddev = np.sqrt((dn**2).sum() / (len(r) - 1))
            want_s = r.mean() / ddev * np.sqrt(365.0)
            assert abs(got["sortino"] - want_s) < 1e-3


def test_amihud_positive_and_day_bounded(spark):
    """Illiquidity is non-negative and each type's day count is at
    most its return-day count (join can only drop zero-notional days)."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        ti_amihud,
        ti_sharpe,
    )

    am = {r["event_type"]: r for r in ti_amihud(spark, SF_DIR).collect()}
    sh = {r["event_type"]: r for r in ti_sharpe(spark, SF_DIR).collect()}
    assert am
    for et, r in am.items():
        assert r["amihud_e9"] >= 0.0
        assert r["n_days"] <= sh[et]["n_days"]


def test_outlier_iqr_fences_match_pandas(spark):
    """Q1/Q3 are the discrete rank-ceil order statistics; the census
    matches a pandas recount with the same fences."""
    import math

    from kp_crypto_market_analytics_spark.queries_r7 import dq_outlier_iqr

    pdf = _events_pdf()
    rows = {r["event_type"]: r for r in dq_outlier_iqr(spark, SF_DIR).collect()}
    for et, grp in pdf.groupby("event_type"):
        v = grp["value"].sort_values().to_numpy()
        n = len(v)
        q1 = v[math.ceil(n / 4) - 1]
        q3 = v[math.ceil(3 * n / 4) - 1]
        r = rows[et]
        assert r["n_rows"] == n
        assert abs(r["q1"] - q1) < 1e-6 and abs(r["q3"] - q3) < 1e-6
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert r["n_low"] == int((v < lo).sum())
        assert r["n_high"] == int((v > hi).sum())
        assert r["q1"] <= r["q3"]


def test_anova_matches_pandas_recompute(spark):
    """F statistic and eta-squared must match a pandas one-way ANOVA
    over the same grouping."""
    from kp_crypto_market_analytics_spark.queries_r7 import a_anova_f

    pdf = _events_pdf()
    r = a_anova_f(spark, SF_DIR).collect()[0]
    groups = [g["value"] for _, g in pdf.groupby("event_type")]
    n, k = len(pdf), len(groups)
    grand = pdf["value"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    want_f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k_groups"] == k and r["n"] == n
    assert abs(r["f_stat"] - want_f) < 1e-3
    assert abs(r["eta_sq"] - ssb / (ssb + ssw)) < 1e-5


def test_theil_sen_is_median_of_pairwise_slopes(spark):
    """The reported slope must equal the numpy lower-median of all
    pairwise daily-close slopes per type."""
    import numpy as np

    from kp_crypto_market_analytics_spark.queries_r7 import w_theil_sen

    pdf = _events_pdf()
    pdf = pdf[pdf["value"] > 0].sort_values(["ts", "event_id"])
    rows = {r["event_type"]: r for r in w_theil_sen(spark, SF_DIR).collect()}
    for et, grp in pdf.groupby("event_type"):
        closes = grp.groupby(grp["ts"].dt.date)["value"].last()
        days = np.array([d.toordinal() for d in closes.index])
        c = closes.to_numpy()
        slopes = [
            (c[j] - c[i]) / (days[j] - days[i])
            for i in range(len(c))
            for j in range(i + 1, len(c))
        ]
        slopes.sort()
        want = slopes[(len(slopes) + 1) // 2 - 1]
        r = rows[et]
        assert r["n_pairs"] == len(slopes)
        assert abs(r["theil_slope"] - want) < 1e-6


def test_quality_logreg_census_consistent(spark):
    """Keep counts bound by doc counts, ppm matches the exact ratio,
    scores in [0, 1]."""
    from kp_crypto_market_analytics_spark.queries_r7 import t_quality_logreg

    rows = t_quality_logreg(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        want_ppm = round(r["n_kept"] * 1_000_000 / r["n_docs"])
        assert abs(r["keep_ppm"] - want_ppm) <= 1
        assert 0.0 <= r["mean_score"] <= 1.0


def test_rouge_self_pair_is_perfect(spark):
    """ROUGE bounds: F1 in [0,1], ROUGE-2 <= ROUGE-1 on average for
    adjacent-doc pairs (bigram overlap implies unigram overlap), and a
    hand-built identical pair scores exactly 1.0."""
    from kp_crypto_market_analytics_spark.queries_r7 import t_rouge_eval

    rows = t_rouge_eval(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["rouge2_f1"] <= r["rouge1_f1"] <= 1.0

    # identical adjacent docs => clipped overlap == length => F1 == 1
    import math

    toks_a = ["the", "cat", "sat", "on", "the", "mat"]
    ca = {}
    for w in toks_a:
        ca[w] = ca.get(w, 0) + 1
    ov = sum(min(v, v) for v in ca.values())
    p = ov / len(toks_a)
    f1 = 2 * p * p / (p + p)
    assert math.isclose(f1, 1.0)


def test_survival_km_matches_lifelines_style_recompute(spark):
    """Survival must be monotone non-increasing in the horizon, equal
    a python product-limit recompute, and n_risk must shrink."""
    import duckdb
    import math

    from kp_crypto_market_analytics_spark.queries_r7 import (
        _KM_HORIZONS,
        a_survival_km,
    )

    od = duckdb.sql(
        "SELECT o_custkey, CAST(o_orderdate AS DATE) AS d"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).df()
    first = od.groupby("o_custkey")["d"].min()
    end = od["d"].max()
    durs = []
    for ck, d1 in first.items():
        later = od[(od["o_custkey"] == ck) & (od["d"] > d1)]["d"]
        if len(later):
            durs.append(((later.min() - d1).days, True))
        else:
            durs.append(((end - d1).days, False))
    rows = {r["horizon_days"]: r for r in a_survival_km(spark, SF_DIR).collect()}
    assert list(sorted(rows)) == sorted(_KM_HORIZONS)
    prev = 1.0
    n = len(durs)
    for h in sorted(rows):
        # python product-limit at horizon h
        days = sorted({t for t, ev in durs if ev and t <= h})
        s = 1.0
        for t in days:
            d_t = sum(1 for u, ev in durs if ev and u == t)
            n_t = sum(1 for u, _ in durs if u >= t)
            s *= 1.0 - d_t / n_t
        r = rows[h]
        assert abs(r["survival"] - s) < 1e-3
        assert r["n_risk"] == sum(1 for u, _ in durs if u >= h)
        assert r["survival"] <= prev + 1e-9
        prev = r["survival"]
        assert r["n_events_cum"] == sum(1 for u, ev in durs if ev and u <= h)
    assert n == len(first)


def test_info_gain_split_matches_sklearn_style_entropy(spark):
    """Each decile row's gain must match a pandas entropy recompute at
    the same discrete threshold; gains are non-negative."""
    import math

    from kp_crypto_market_analytics_spark.queries_r7 import a_info_gain_split

    pdf = _events_pdf()
    pos_type = pdf["event_type"].min()
    y = (pdf["event_type"] == pos_type).to_numpy()
    v = pdf["value"].to_numpy()
    n = len(v)

    def ent(p_cnt, n_cnt):
        if p_cnt == 0 or p_cnt == n_cnt:
            return 0.0
        p = p_cnt / n_cnt
        return -(p * math.log(p)) - ((1 - p) * math.log(1 - p))

    h_parent = ent(int(y.sum()), n)
    rows = a_info_gain_split(spark, SF_DIR).collect()
    assert len(rows) == 9
    order = sorted(range(n), key=lambda i: (v[i], i))
    for r in rows:
        theta = r["theta"]
        mask = v <= theta
        n_le, p_le = int(mask.sum()), int(y[mask].sum())
        assert r["n_le"] == n_le and r["pos_le"] == p_le
        want = h_parent - (
            n_le / n * ent(p_le, n_le)
            + (n - n_le) / n * ent(int(y.sum()) - p_le, n - n_le)
        )
        assert abs(r["info_gain"] - want) < 1e-5
        assert r["info_gain"] >= -1e-9


def test_runs_test_matches_hand_recompute(spark):
    """Run counts and z must match a python recompute of the sign
    sequence of daily close moves."""
    import math

    from kp_crypto_market_analytics_spark.queries_r7 import w_runs_test

    pdf = _events_pdf()
    pdf = pdf[pdf["value"] > 0].sort_values(["ts", "event_id"])
    rows = {r["event_type"]: r for r in w_runs_test(spark, SF_DIR).collect()}
    for et, grp in pdf.groupby("event_type"):
        closes = grp.groupby(grp["ts"].dt.date)["value"].last().to_numpy()
        sgns = [
            1 if b > a else -1
            for a, b in zip(closes, closes[1:])
            if b != a
        ]
        n1 = sum(1 for s in sgns if s == 1)
        n2 = len(sgns) - n1
        runs = 1 + sum(1 for a, b in zip(sgns, sgns[1:]) if a != b)
        r = rows[et]
        assert (r["n_up"], r["n_down"], r["n_runs"]) == (n1, n2, runs)
        if n1 and n2:
            n = n1 + n2
            mu = 1 + 2 * n1 * n2 / n
            var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
            assert abs(r["runs_z"] - (runs - mu) / math.sqrt(var)) < 1e-4


def test_mann_kendall_matches_hand_recompute(spark):
    """S, tau and z must match the textbook pairwise recompute with
    tie correction."""
    import math

    from kp_crypto_market_analytics_spark.queries_r7 import a_mann_kendall

    pdf = _events_pdf()
    pdf = pdf[pdf["value"] > 0].sort_values(["ts", "event_id"])
    rows = {r["event_type"]: r for r in a_mann_kendall(spark, SF_DIR).collect()}
    for et, grp in pdf.groupby("event_type"):
        c = grp.groupby(grp["ts"].dt.date)["value"].last().to_numpy()
        n = len(c)
        s = sum(
            (1 if c[j] > c[i] else -1 if c[j] < c[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        tc = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(c).values()
            if t > 1
        )
        var = (n * (n - 1) * (2 * n + 5) - tc) / 18
        r = rows[et]
        assert r["s_stat"] == s and r["n_days"] == n
        m = n * (n - 1) // 2
        assert abs(r["tau"] - s / m) < 1e-6
        want_z = (
            (s - 1) / math.sqrt(var)
            if s > 0
            else (s + 1) / math.sqrt(var)
            if s < 0
            else 0.0
        )
        assert abs(r["mk_z"] - want_z) < 1e-4


def test_gopher_rules_census_consistent(spark):
    """Pass count can never exceed docs minus the largest single-rule
    failure count; ppm matches the exact ratio."""
    from kp_crypto_market_analytics_spark.queries_r7 import t_gopher_rules

    rows = t_gopher_rules(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        worst = max(
            r["fail_len"], r["fail_wlen"], r["fail_stop"], r["fail_digit"]
        )
        assert 0 <= r["n_pass"] <= r["n_docs"] - worst
        want_ppm = round(r["n_pass"] * 1_000_000 / r["n_docs"])
        assert abs(r["pass_ppm"] - want_ppm) <= 1


def test_kruskal_wallis_matches_average_rank_recompute(spark):
    """H with tie correction must match the textbook midrank
    recompute (pandas average ranks)."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        a_kruskal_wallis,
    )

    pdf = _events_pdf()
    ranks = pdf["value"].rank(method="average")
    n = len(pdf)
    rsum = 0.0
    groups = pdf.groupby("event_type").groups
    for _, idx in groups.items():
        rj = float(ranks.loc[idx].sum())
        rsum += rj * rj / len(idx)
    h = 12.0 / (n * (n + 1)) * rsum - 3.0 * (n + 1)
    from collections import Counter

    tie = sum(
        t**3 - t for t in Counter(pdf["value"]).values() if t > 1
    )
    h /= 1.0 - tie / (n**3 - n)
    r = a_kruskal_wallis(spark, SF_DIR).collect()[0]
    assert r["n_rows"] == n and r["k_groups"] == len(groups)
    assert r["dof"] == len(groups) - 1
    assert abs(r["h_stat"] - h) < 1e-4
    want_eps = (h - len(groups) + 1) / (n - len(groups))
    assert abs(r["epsilon_sq"] - want_eps) < 1e-6


def _daily_frames():
    """Per-type pandas frame of (day, close, n_ticks) mirroring
    _daily_closes + the positive-tick volume."""
    pdf = _events_pdf()
    pdf = pdf[pdf["value"] > 0].sort_values(["ts", "event_id"])
    out = {}
    for et, grp in pdf.groupby("event_type"):
        day = grp["ts"].dt.date
        close = grp.groupby(day)["value"].last()
        nt = grp.groupby(day)["value"].count()
        out[et] = (close, nt)
    return out


def test_spearman_matches_pandas(spark):
    """rho must equal pandas' spearman correlation of daily close vs
    daily tick count."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        a_spearman_corr,
    )

    rows = {
        r["event_type"]: r
        for r in a_spearman_corr(spark, SF_DIR).collect()
    }
    for et, (close, nt) in _daily_frames().items():
        want = close.rank(method="average").corr(
            nt.rank(method="average")
        )
        r = rows[et]
        assert r["n_days"] == len(close)
        assert abs(r["spearman_rho"] - want) < 1e-4


def test_ljung_box_matches_recompute(spark):
    """Q must match the statsmodels-style recompute over the same
    nano-quantized return series."""
    import numpy as np

    from kp_crypto_market_analytics_spark.queries_r7 import (
        _LB_LAGS,
        ti_ljung_box,
    )

    rows = {
        r["event_type"]: r for r in ti_ljung_box(spark, SF_DIR).collect()
    }
    for et, (close, _) in _daily_frames().items():
        c = close.to_numpy()
        x = np.round(np.log(c[1:] / c[:-1]) * 1e9)
        n = len(x)
        r = rows[et]
        assert r["n_days"] == n and r["dof"] == _LB_LAGS
        if n <= _LB_LAGS:
            assert r["lb_q"] is None
            continue
        xm = x - x.mean()
        den = float((xm * xm).sum())
        q = 0.0
        for k in range(1, _LB_LAGS + 1):
            rho = float((xm[k:] * xm[:-k]).sum()) / den
            if k == 1:
                assert abs(r["acf1"] - rho) < 1e-6
            q += rho * rho / (n - k)
        q *= n * (n + 2)
        assert abs(r["lb_q"] - q) < 1e-4


def test_js_divergence_bounded_and_matches_recompute(spark):
    """JSD must lie in [0, 1] bits and match a direct python
    recompute from the same token counts."""
    import math
    import re
    from collections import Counter

    import duckdb

    from kp_crypto_market_analytics_spark.queries_r7 import (
        t_js_divergence,
    )

    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for src, text in docs:
        toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
        per_src.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    tt = sum(corpus.values())
    rows = {
        r["source"]: r for r in t_js_divergence(spark, SF_DIR).collect()
    }
    assert set(rows) == set(per_src)
    for src, cnt in per_src.items():
        ts = sum(cnt.values())
        jsd = 0.0
        for w, cw in corpus.items():
            p = cnt.get(w, 0) / ts
            q = cw / tt
            m = (p + q) / 2.0
            if p > 0:
                jsd += 0.5 * p * math.log2(p / m)
            jsd += 0.5 * q * math.log2(q / m)
        r = rows[src]
        assert r["n_tokens"] == ts
        assert r["n_vocab_hit"] == len(cnt)
        assert 0.0 <= r["jsd_bits"] <= 1.0
        assert abs(r["jsd_bits"] - jsd) < 1e-5


def _hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_silhouette_matches_numpy_recompute(spark):
    """Per-label mean simplified silhouette must match the numpy
    centroid recompute; bounds hold."""
    import duckdb
    import numpy as np

    from kp_crypto_market_analytics_spark.queries_r7 import e_silhouette

    rows = {r["label"]: r for r in e_silhouette(spark, SF_DIR).collect()}
    raw = duckdb.sql(
        f"SELECT label, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    X = np.array([np.array(e, dtype=np.float64) for _, e in raw])
    y = np.array([l for l, _ in raw])
    cents = {l: X[y == l].mean(axis=0) for l in np.unique(y)}
    for lab in np.unique(y):
        s_vals = []
        for v in X[y == lab]:
            a = float(np.linalg.norm(v - cents[lab]))
            b = min(
                float(np.linalg.norm(v - c))
                for l2, c in cents.items()
                if l2 != lab
            )
            s_vals.append((b - a) / max(a, b) if max(a, b) > 0 else 0.0)
        r = rows[int(lab)]
        assert r["n_vecs"] == len(s_vals)
        assert r["n_negative"] == sum(1 for s in s_vals if s < -5e-7)
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert abs(r["mean_silhouette"] - np.mean(s_vals)) < 1e-4


def test_ab_lift_counts_and_direction(spark):
    """Variant counts, conversions and the z sign must match the
    python hash recompute."""
    import duckdb

    from kp_crypto_market_analytics_spark.queries_r7 import (
        _AB_SALT,
        a_ab_lift,
    )

    conv = dict(
        duckdb.sql(
            "SELECT o_custkey, MAX(CASE WHEN o_orderpriority ="
            " '1-URGENT' THEN 1 ELSE 0 END)"
            f" FROM '{SF_DIR}/orders.parquet' GROUP BY 1"
        ).fetchall()
    )
    keys = [
        k
        for (k,) in duckdb.sql(
            f"SELECT c_custkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    ]
    n = [0, 0]
    c = [0, 0]
    for k in keys:
        v = _hash60(f"{k}{_AB_SALT}") % 2
        n[v] += 1
        c[v] += conv.get(k, 0)
    r = a_ab_lift(spark, SF_DIR).collect()[0]
    assert (r["n_a"], r["n_b"]) == (n[0], n[1])
    assert (r["conv_a"], r["conv_b"]) == (c[0], c[1])
    assert r["conv_a_ppm"] == round(c[0] * 1_000_000 / n[0])
    if r["lift_z"] is not None and abs(r["lift_z"]) > 1e-9:
        assert (r["lift_z"] > 0) == (c[1] / n[1] > c[0] / n[0])


def test_did_estimator_matches_pandas_cells(spark):
    """Cell counts/means and the DID arithmetic must match a pandas
    recompute with the same hash assignment and cutover."""
    from kp_crypto_market_analytics_spark.queries_r7 import (
        _DID_CUTOVER,
        _DID_SALT,
        a_did_estimator,
    )

    pdf = _events_pdf()
    pdf = pdf[pdf["event_type"] == "purchase"].copy()
    import duckdb

    users = duckdb.sql(
        f"SELECT event_id, user_id FROM '{SF_DIR}/events.parquet'"
    ).df()
    pdf = pdf.merge(users, on="event_id")
    pdf["tr"] = pdf["user_id"].map(
        lambda u: _hash60(f"{u}{_DID_SALT}") % 2
    )
    import datetime

    cut = datetime.date.fromisoformat(_DID_CUTOVER)
    pdf["po"] = pdf["ts"].dt.date >= cut
    r = a_did_estimator(spark, SF_DIR).collect()[0]
    cells = {}
    for (tr, po), grp in pdf.groupby(["tr", "po"]):
        cells[(tr, po)] = (len(grp), grp["value"].mean())
    assert r["n_treat_post"] == cells.get((1, True), (0,))[0]
    assert r["n_ctrl_pre"] == cells.get((0, False), (0,))[0]
    for key, col in [
        ((1, True), "mean_treat_post"),
        ((1, False), "mean_treat_pre"),
        ((0, True), "mean_ctrl_post"),
        ((0, False), "mean_ctrl_pre"),
    ]:
        if key in cells:
            assert abs(r[col] - cells[key][1]) < 1e-5
    want = (r["mean_treat_post"] - r["mean_treat_pre"]) - (
        r["mean_ctrl_post"] - r["mean_ctrl_pre"]
    )
    assert abs(r["did_estimate"] - want) < 1e-9


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _er_capped_blocks(parts, brand, cap):
    """(brand, token) blocks after the deterministic md5 hash-sample
    cap — the python mirror of er_name_match's blocking stage."""
    import hashlib
    from collections import defaultdict

    blocks = defaultdict(list)
    for ka, na in parts:
        for tok in na.split(" "):
            h = hashlib.md5(f"{brand}|{tok}|{ka}".encode()).hexdigest()
            blocks[tok].append((h, ka, na))
    return {
        tok: [(ka, na) for _, ka, na in sorted(members)[:cap]]
        for tok, members in blocks.items()
    }


def test_er_name_match_census_consistent(spark):
    """Census ordering invariants hold, and one brand's pair census
    matches a brute-force python recompute of the CAPPED blocking."""
    import duckdb

    from kp_crypto_market_analytics_spark.queries_r7 import (
        _ER_BLOCK_CAP,
        _ER_SIM_PPM,
        er_name_match,
    )

    rows = er_name_match(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_exact"] <= r["n_matched"] <= r["n_cand_pairs"]
    brand = rows[0]["brand"]
    parts = duckdb.sql(
        "SELECT p_partkey, p_name FROM"
        f" '{SF_DIR}/part.parquet' WHERE p_brand = '{brand}'"
    ).fetchall()
    blocks = _er_capped_blocks(parts, brand, _ER_BLOCK_CAP)
    cand = {}
    for members in blocks.values():
        for ka, na in members:
            for kb, nb in members:
                if ka < kb:
                    cand[(ka, kb)] = (na, nb)
    n_match = n_exact = 0
    for na, nb in cand.values():
        mx = max(len(na), len(nb))
        ppm = (2 * (mx - _lev(na, nb)) * 1_000_000 + mx) // (2 * mx)
        n_match += ppm >= _ER_SIM_PPM
        n_exact += na == nb
    r0 = rows[0]
    assert r0["n_parts"] == len(parts)
    assert r0["n_cand_pairs"] == len(cand)
    assert r0["n_matched"] == n_match and r0["n_exact"] == n_exact


def test_er_name_match_block_cap_bounds_pairs(spark):
    """The df-cap invariant: candidate pairs never exceed the sum of
    C(min(df, cap), 2) over capped (brand, token) blocks — i.e. hub
    blocks are genuinely bounded at C(cap, 2) pairs each — and the cap
    actually BINDS on this dataset (some block exceeds it), so the
    test exercises the sampling path, not just the pass-through."""
    import duckdb

    from kp_crypto_market_analytics_spark.queries_r7 import (
        _ER_BLOCK_CAP,
        er_name_match,
    )

    # sf0.01: block df reaches 20 > cap (sf0.001 blocks stay under it)
    sf = "/root/testdata/sf0.01"
    blk = duckdb.sql(
        "WITH toks AS (SELECT p_partkey, p_brand,"
        " unnest(string_split(p_name, ' ')) AS tok"
        f" FROM '{sf}/part.parquet')"
        " SELECT p_brand, COUNT(*) AS df FROM toks GROUP BY p_brand, tok"
    ).fetchall()
    assert any(df > _ER_BLOCK_CAP for _, df in blk), "cap must bind"
    cap_bound: dict[str, int] = {}
    for brand, df in blk:
        m = min(df, _ER_BLOCK_CAP)
        cap_bound[brand] = cap_bound.get(brand, 0) + m * (m - 1) // 2
    for r in er_name_match(spark, sf).collect():
        assert r["n_cand_pairs"] <= cap_bound.get(r["brand"], 0)


def test_adamic_adar_matches_python_recompute(spark):
    """AA scores of the returned top pairs must equal the exact
    python recompute over the same support-2 co-purchase graph."""
    import math
    from collections import defaultdict

    import duckdb

    from kp_crypto_market_analytics_spark.queries_r7 import g_adamic_adar

    rows = g_adamic_adar(spark, SF_DIR).collect()
    assert rows and len(rows) <= 30
    pairs = duckdb.sql(
        "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM"
        f" '{SF_DIR}/lineitem.parquet')"
        " SELECT a.l_partkey, b.l_partkey FROM li a JOIN li b ON"
        " a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
        " GROUP BY 1, 2 HAVING COUNT(*) >= 2"
    ).fetchall()
    adj = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    eset = {(u, v) for u, v in pairs}
    for r in rows:
        common = adj[r["u"]] & adj[r["v"]]
        assert r["common"] == len(common)
        aa_u = sum(
            round(1.0 / math.log(len(adj[z])) * 1e9) for z in common
        )
        assert abs(r["aa"] - aa_u / 1e9) < 2e-6
        assert r["is_edge"] == ((r["u"], r["v"]) in eset)
        assert r["aa"] > 0


def test_pettitt_matches_rank_recompute(spark):
    """K, the changepoint day and p must match the textbook midrank
    recompute."""
    import math

    from kp_crypto_market_analytics_spark.queries_r7 import (
        w_pettitt_change,
    )

    rows = {
        r["event_type"]: r
        for r in w_pettitt_change(spark, SF_DIR).collect()
    }
    for et, (close, _) in _daily_frames().items():
        n = len(close)
        ranks = close.rank(method="average")
        days = list(close.index)
        best_k, best_day = -1, None
        cum = 0.0
        for t in range(n - 1):
            cum += 2 * float(ranks.iloc[t])
            u = cum - (t + 1) * (n + 1)
            if abs(u) > best_k:
                best_k, best_day = abs(u), days[t]
        r = rows[et]
        assert r["n_days"] == n
        assert r["k_stat"] == int(best_k)
        assert r["change_day"] == best_day
        want_p = min(
            1.0, 2.0 * math.exp(-6.0 * best_k * best_k / (n**3 + n**2))
        )
        assert abs(r["p_approx"] - want_p) < 1e-6


def test_mann_whitney_matches_rank_recompute(spark):
    """U, the tie-corrected z and the rank-biserial must match the
    textbook midrank recompute of the weekend/weekday split."""
    import math

    from kp_crypto_market_analytics_spark.queries_r7 import a_mann_whitney

    pdf = _events_pdf()
    rows = {
        r["event_type"]: r for r in a_mann_whitney(spark, SF_DIR).collect()
    }
    for et, grp in pdf.groupby("event_type"):
        ranks = grp["value"].rank(method="average")
        wknd = grp["ts"].dt.dayofweek.isin([5, 6])
        na, nb = int(wknd.sum()), int((~wknd).sum())
        ra = float(ranks[wknd].sum())
        u = ra - na * (na + 1) / 2
        r = rows[et]
        assert (r["n_weekend"], r["n_weekday"]) == (na, nb)
        assert abs(r["u_stat"] - u) < 1e-9
        from collections import Counter

        tie = sum(
            t**3 - t for t in Counter(grp["value"]).values() if t > 1
        )
        nn = na + nb
        var = na * nb / 12.0 * ((nn + 1) - tie / (nn * (nn - 1)))
        mu = na * nb / 2.0
        cc = -0.5 if u > mu else (0.5 if u < mu else 0.0)
        want_z = (u - mu + cc) / math.sqrt(var) if var > 0 else None
        if want_z is not None:
            assert abs(r["mw_z"] - want_z) < 1e-5
        assert abs(r["rank_biserial"] - (2 * u / (na * nb) - 1)) < 1e-5


def test_cohens_kappa_identity_and_bounds(spark):
    """The four cells partition the corpus; kappa re-derives from the
    returned cells; agreement ppm is the exact rounded ratio."""
    from kp_crypto_market_analytics_spark.queries_r7 import a_cohens_kappa

    r = a_cohens_kappa(spark, SF_DIR).collect()[0]
    n = r["n_docs"]
    assert (
        r["n_both_keep"]
        + r["n_both_drop"]
        + r["n_only_logreg"]
        + r["n_only_gopher"]
        == n
    )
    r1 = r["n_both_keep"] + r["n_only_logreg"]
    c1 = r["n_both_keep"] + r["n_only_gopher"]
    chance = r1 * c1 + (n - r1) * (n - c1)
    den = n * n - chance
    if den > 0:
        want = (n * (r["n_both_keep"] + r["n_both_drop"]) - chance) / den
        assert abs(r["kappa"] - want) < 1e-6
        assert r["kappa"] <= 1.0
    assert r["agree_ppm"] == round(
        (r["n_both_keep"] + r["n_both_drop"]) * 1_000_000 / n
    )


def test_frame_luma_series_matches_rowwise_reference(spark):
    """The vectorized frame_luma_series batch body must emit exactly
    the rows the per-row reference loop emits — frame i exists iff
    4i+1 < len(payload) — including payloads that are empty, shorter
    than one frame, mid-frame truncated, and longer than 4*n_frames."""
    from kp_crypto_market_analytics_spark.operators.multimodal import (
        frame_luma_series,
    )

    n_frames = 4
    payloads = {
        1: b"",
        2: b"a",                       # 4*0+1 >= 1: zero frames
        3: b"ab",                      # exactly one frame
        4: b"abcde",                   # frame 1 cut mid-way (len 5 -> 1 frame... 4*1+1=5 >= 5)
        5: b"abcdef",                  # two frames
        6: bytes(range(16)),           # exactly n_frames
        7: bytes(range(40)),           # longer than 4*n_frames: capped
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id long, payload binary",
    )
    got = {
        (r["media_id"], r["frame_idx"]): r["luma"]
        for r in frame_luma_series(df, fake=True, n_frames=n_frames).collect()
    }
    want = {}
    for mid, b in payloads.items():
        for i in range(n_frames):
            if 4 * i + 1 >= len(b):
                break
            want[(mid, i)] = (131 * b[4 * i] + b[4 * i + 1]) % 256
    assert got == want
