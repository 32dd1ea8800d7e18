"""Invariant tests for round-8 registry queries (oracle gates prove
engine agreement; these pin the semantic floors the oracles can't —
monotone funnels, non-vacuity, cap behavior)."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_pipeline_funnel_monotone(spark):
    """Each stage only ever drops documents: n_docs >= n_dedup >=
    n_quality >= n_clean = n_train + n_val + n_test, and kept token
    mass is positive (the funnel must not go vacuous — the r8 pitfall
    that killed the any-overlap contamination rule at sf0.1)."""
    from kp_crypto_market_analytics_spark.queries_r8 import (
        t_corpus_pipeline,
    )

    rows = t_corpus_pipeline(spark, SF_DIR).collect()
    assert rows
    tot_clean = tot_docs = 0
    for r in rows:
        assert (
            r["n_docs"] >= r["n_dedup"] >= r["n_quality"] >= r["n_clean"]
        )
        assert r["n_clean"] == r["n_train"] + r["n_val"] + r["n_test"]
        assert 0 <= r["n_train_shards"] <= 32
        if r["n_train"] == 0:
            assert r["n_train_shards"] == 0
        tot_clean += r["n_clean"]
        tot_docs += r["n_docs"]
    assert 0 < tot_clean < tot_docs  # every stage has teeth, none vacuous
    shares = [r["weight_share"] for r in rows if r["weight_share"]]
    assert abs(sum(shares) - 1.0) < 1e-4


def test_corpus_pipeline_no_eval_source_row(spark):
    """The eval slice (src4) is never a corpus row, and split quotas
    follow the 98/1/1 bucket rule (train dominates)."""
    from kp_crypto_market_analytics_spark.queries_r8 import (
        t_corpus_pipeline,
    )

    rows = t_corpus_pipeline(spark, "/root/testdata/sf0.01").collect()
    assert all(r["source"] != "src4" for r in rows)
    n_train = sum(r["n_train"] for r in rows)
    n_eval = sum(r["n_val"] + r["n_test"] for r in rows)
    assert n_train > 10 * max(n_eval, 1)


def test_corpus_pipeline_dedup_consistent_with_clusters(spark):
    """Stage-1 survivors must equal the number of near-dup clusters
    that contain at least one corpus doc (one canonical per
    cluster)."""
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.queries_r7 import (
        _cluster_splits,
    )
    from kp_crypto_market_analytics_spark.queries_r8 import (
        _PIPE_EVAL_SRC,
        t_corpus_pipeline,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    rows = t_corpus_pipeline(spark, SF_DIR).collect()
    n_dedup = sum(r["n_dedup"] for r in rows)
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    corpus_ids = docs.where(F.col("source") != _PIPE_EVAL_SRC).select(
        "doc_id"
    )
    clusters = (
        _cluster_splits(spark, SF_DIR)
        .join(corpus_ids, "doc_id")
        .select("cluster_id")
        .distinct()
        .count()
    )
    assert n_dedup == clusters


def test_donchian_position_bounded(spark):
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.queries_r8 import ti_donchian

    df = ti_donchian(spark, SF_DIR)
    bad = df.where(
        (F.col("dc_pos") < 0)
        | (F.col("dc_pos") > 1)
        | (F.col("value") > F.col("dc_high"))
        | (F.col("value") < F.col("dc_low"))
    ).count()
    assert bad == 0
    assert df.where(F.col("dc_pos").isNotNull()).count() > 0


def test_ulcer_index_nonnegative_and_drawdown_nonpositive(spark):
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.queries_r8 import ti_ulcer_index

    df = ti_ulcer_index(spark, SF_DIR)
    assert df.where(F.col("drawdown_pct") > 0).count() == 0
    assert df.where(F.col("ulcer_index") < 0).count() == 0
    assert df.where(F.col("ulcer_index") > 0).count() > 0


def test_beta_of_benchmark_is_one(spark):
    from kp_crypto_market_analytics_spark.queries_r8 import (
        _BETA_BENCH,
        ti_beta,
    )

    rows = {r["event_type"]: r for r in ti_beta(spark, SF_DIR).collect()}
    assert rows[_BETA_BENCH]["beta"] == 1.0
    assert rows[_BETA_BENCH]["corr"] == 1.0
    assert len(rows) >= 2


def test_parkinson_vol_positive(spark):
    from kp_crypto_market_analytics_spark.queries_r8 import ti_parkinson

    for r in ti_parkinson(spark, SF_DIR).collect():
        assert r["parkinson_vol"] > 0 and r["n_days"] > 0


def test_levene_bf_matches_scipy_shape(spark):
    """Brown–Forsythe F recomputed in pure python from the same
    micro-rounded |x − median| values must match to 6 dp."""
    import duckdb

    from kp_crypto_market_analytics_spark.queries_r8 import a_levene_bf

    got = a_levene_bf(spark, SF_DIR).collect()[0]
    vals = duckdb.sql(
        f"SELECT event_type, value FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    import statistics
    from collections import defaultdict

    groups = defaultdict(list)
    for t, v in vals:
        groups[t].append(v)
    z = {
        t: [round(abs(v - statistics.median(g)) * 1e6) for v in g]
        for t, g in groups.items()
    }
    k = len(z)
    n = sum(len(g) for g in z.values())
    t_u = sum(round(sum(g) ** 2 / len(g)) for g in z.values())
    q = sum(x * x for g in z.values() for x in g)
    s = sum(sum(g) for g in z.values())
    ssb = t_u - s * s / n
    ssw = q - t_u
    want = round((ssb / (k - 1)) / (ssw / (n - k)), 6)
    assert got["k_groups"] == k and got["n"] == n
    assert abs(got["f_bf"] - want) < 2e-6


def test_hodges_lehmann_within_daily_mean_range(spark):
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.queries_r8 import (
        a_hodges_lehmann,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    hl = {
        r["event_type"]: r["hl_estimate"]
        for r in a_hodges_lehmann(spark, SF_DIR).collect()
    }
    daily = (
        load_tables(spark, SF_DIR, ["events"])["events"]
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.avg("value").alias("m"))
        .groupBy("event_type")
        .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
        .collect()
    )
    for r in daily:
        assert r["lo"] - 1e-6 <= hl[r["event_type"]] <= r["hi"] + 1e-6


def test_page_hinkley_alarms_present_but_rare(spark):
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.queries_r8 import (
        w_page_hinkley,
    )

    df = w_page_hinkley(spark, "/root/testdata/sf0.01")
    n = df.count()
    n_alarm = df.where(F.col("alarm")).count()
    assert 0 < n_alarm < n // 2  # non-vacuous in both directions
    # the excursion is nonnegative by construction
    assert df.where(F.col("ph_stat") < F.col("ph_min")).count() == 0


def test_sequence_gaps_arithmetic_consistent(spark):
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.queries_r8 import (
        dq_sequence_gaps,
    )

    df = dq_sequence_gaps(spark, SF_DIR)
    assert df.where(
        (F.col("hours_present") + F.col("hours_missing") != 24)
        | (F.col("max_gap_run") > F.col("hours_missing"))
        | (F.col("max_gap_run") < 0)
    ).count() == 0
    # sf0.001 is sparse enough that real gaps exist (non-vacuous)
    assert df.where(F.col("hours_missing") > 0).count() > 0


def test_clustering_coeff_matches_python_on_top_node(spark):
    from kp_crypto_market_analytics_spark.queries_mining import (
        _copurchase_edges,
    )
    from kp_crypto_market_analytics_spark.queries_r8 import (
        g_clustering_coeff,
    )

    rows = g_clustering_coeff(spark, SF_DIR).collect()
    assert rows
    edges = {
        (r["u"], r["v"]) for r in _copurchase_edges(spark, SF_DIR).collect()
    }
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    for r in rows[:5]:
        nbrs = sorted(adj[r["node"]])
        deg = len(nbrs)
        tri = sum(
            1
            for i in range(deg)
            for j in range(i + 1, deg)
            if (min(nbrs[i], nbrs[j]), max(nbrs[i], nbrs[j])) in edges
        )
        assert r["deg"] == deg and r["triangles"] == tri
        assert abs(r["coeff"] - round(2 * tri / (deg * (deg - 1)), 6)) < 1e-9


def test_pref_attachment_scores_are_degree_products(spark):
    from kp_crypto_market_analytics_spark.queries_mining import (
        _copurchase_edges,
    )
    from kp_crypto_market_analytics_spark.queries_r8 import (
        g_preferential_attachment,
    )

    from collections import defaultdict

    deg = defaultdict(int)
    for r in _copurchase_edges(spark, SF_DIR).collect():
        deg[r["u"]] += 1
        deg[r["v"]] += 1
    for r in g_preferential_attachment(spark, SF_DIR).collect():
        assert r["pa_score"] == deg[r["u"]] * deg[r["v"]]
        assert r["common"] >= 1


def test_dsir_selection_is_global_top_decile(spark):
    from kp_crypto_market_analytics_spark.queries_r8 import (
        t_dsir_weights,
    )

    sf = "/root/testdata/sf0.01"
    rows = t_dsir_weights(spark, sf).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_sel = sum(r["n_selected"] for r in rows)
    # >= p90 on an interpolated bar keeps ~10% (ties can nudge it)
    assert abs(n_sel - n_docs / 10) <= max(3, n_docs * 0.02)
    assert all(r["source"] != "src4" for r in rows)


def test_isotropy_bins_cover_all_pairs_and_center_near_zero(spark):
    from kp_crypto_market_analytics_spark.queries_r8 import (
        _ISO_SAMPLE_MOD,
        e_isotropy,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    sf = "/root/testdata/sf0.01"
    rows = e_isotropy(spark, sf).collect()
    n_vec = (
        load_tables(spark, sf, ["embeddings"])["embeddings"]
        .where(f"vec_id % {_ISO_SAMPLE_MOD} = 0")
        .count()
    )
    assert sum(r["n_pairs"] for r in rows) == n_vec * (n_vec - 1) // 2
    # synthetic embeddings are near-isotropic: mean pair cosine ~ 0
    assert abs(rows[0]["mean_cos"]) < 0.2 and rows[0]["sd_cos"] > 0


def test_jarque_bera_matches_python_recompute(spark):
    import duckdb

    from kp_crypto_market_analytics_spark.queries_r8 import a_jarque_bera

    got = {r["event_type"]: r for r in a_jarque_bera(spark, SF_DIR).collect()}
    vals = duckdb.sql(
        f"SELECT event_type, value FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    groups = defaultdict(list)
    for t, v in vals:
        groups[t].append(v)
    for t, g in groups.items():
        n = len(g)
        micro = sum(
            int(
                Decimal(v).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
                * 1_000_000
            )
            for v in g
        )
        sign = -1 if micro < 0 else 1
        mu = sign * ((2 * abs(micro) + n) // (2 * n))
        d = [round((v - mu / 1e6) * 1e3) for v in g]
        m2, m3, m4 = (
            sum(x * x for x in d),
            sum(x**3 for x in d),
            sum(x**4 for x in d),
        )
        v2 = m2 / n
        skew = (m3 / n) / v2**1.5
        kurt = (m4 / n) / (v2 * v2)
        assert abs(got[t]["skewness"] - round(skew, 6)) < 2e-6
        assert abs(got[t]["kurtosis"] - round(kurt, 6)) < 2e-6
        jb = n / 6 * (skew * skew + (kurt - 3) ** 2 / 4)
        assert abs(got[t]["jb_stat"] - round(jb, 6)) < 1e-4


def test_pk_uniqueness_catches_the_real_lineitem_violation(spark):
    """The synthetic lineitem VIOLATES TPC-H's (l_orderkey,
    l_linenumber) PK (1401 dup rows at sf0.001) — the audit must
    surface it, and report every other table clean.  Non-vacuity by
    construction: the gate demonstrably fires on real dirty data."""
    from kp_crypto_market_analytics_spark.queries_r8 import (
        _PK_SPEC,
        dq_pk_uniqueness,
    )

    rows = {r["table_name"]: r for r in dq_pk_uniqueness(spark, SF_DIR).collect()}
    assert len(rows) == len(_PK_SPEC)
    assert rows["lineitem"]["n_dup_rows"] > 0
    for name, r in rows.items():
        assert r["n_null_keys"] == 0
        assert r["n_rows"] == r["n_keys"] + r["n_dup_rows"] > 0
        if name != "lineitem":
            assert r["n_dup_rows"] == 0


def test_vocab_coverage_monotone_and_complete(spark):
    from kp_crypto_market_analytics_spark.queries_r8 import (
        t_vocab_coverage,
    )

    rows = t_vocab_coverage(spark, SF_DIR).collect()
    prev = 0
    for r in rows:
        assert r["coverage_ppm"] >= prev
        prev = r["coverage_ppm"]
        assert r["n_types"] <= r["top_k"]
    # every token type fits under the largest cutoff on this corpus
    assert rows[-1]["n_types"] == rows[-1]["total_types"]
    assert rows[-1]["coverage_ppm"] == 1_000_000


def test_sortino_calmar_consistent_with_returns(spark):
    from kp_crypto_market_analytics_spark.queries_r8 import (
        ti_calmar,
        ti_sortino,
    )

    srt = {r["event_type"]: r for r in ti_sortino(spark, SF_DIR).collect()}
    cal = {r["event_type"]: r for r in ti_calmar(spark, SF_DIR).collect()}
    assert set(srt) == set(cal) and srt
    for t, r in srt.items():
        if r["sortino"] is not None:
            assert r["downside_dev"] > 0
            # sign of sortino == sign of mean return
            assert (r["sortino"] >= 0) == (r["mean_ret"] >= 0)
        assert 0 <= cal[t]["max_drawdown"] <= 1


def test_msttr_bounded_and_segment_arithmetic(spark):
    from kp_crypto_market_analytics_spark.queries_r8 import (
        _MSTTR_SEG,
        t_msttr,
    )

    rows = t_msttr(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["msttr"] <= 1.0
        assert r["n_segs"] >= r["n_docs"] > 0  # docs have >= 1 full segment
    assert _MSTTR_SEG == 50


def test_mm_dedup_bytes_census_consistent(spark):
    from kp_crypto_market_analytics_spark.queries_r8 import (
        mm_dedup_bytes,
    )

    rows = mm_dedup_bytes(spark, SF_DIR).collect()
    assert rows
    tot_dup = 0
    for r in rows:
        assert r["n_payloads"] == r["n_unique"] + r["n_dup"]
        assert r["unique_bytes"] <= r["raw_bytes"]
        assert 0 <= r["saved_ppm"] <= 1_000_000
        tot_dup += r["n_dup"]
    assert tot_dup > 0  # block-grain dedup has teeth on this corpus


def test_corpus_pipeline_shares_one_documents_scan(spark):
    """The ask the query exists to prove: every stage reads the ONE
    checkpointed documents projection — the final executed plan
    contains ZERO parquet scans of documents (the single real scan ran
    once, inside the checkpoint build) and multiple readers of the
    materialized frame."""
    from kp_crypto_market_analytics_spark.queries_r8 import (
        t_corpus_pipeline,
    )

    df = t_corpus_pipeline(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("documents.parquet") == 0
    # Readers of the shared intermediates: the checkpointed base
    # projection (ExistingRDD) plus the session-materialized trigram /
    # cluster-label parquet tables (r11: stage 3 moved from a
    # per-query trigram checkpoint onto the shared _tri_capped_df
    # materialization, so some former ExistingRDD leaves are now temp
    # parquet scans — still never the documents table).
    assert plan.count("Scan ExistingRDD") >= 1


def test_corpus_pipeline_epoch_mix_stage8(spark):
    """Stage-8 invariants: the epoch draw fills min(target,
    available) packs per source, epoch token mass is bounded by train
    token mass, and the summed targets never exceed the pack budget
    (floor arithmetic) while remaining non-vacuous."""
    from kp_crypto_market_analytics_spark.queries_r8 import (
        t_corpus_pipeline,
    )

    rows = t_corpus_pipeline(spark, SF_DIR).collect()
    assert rows
    b_packs = sum(r["n_train_packs"] for r in rows)
    tot_target = sum(r["epoch_target_packs"] for r in rows)
    assert 0 < tot_target <= b_packs
    for r in rows:
        assert r["n_epoch_packs"] == min(
            r["epoch_target_packs"], r["n_train_packs"]
        )
        assert 0 <= r["epoch_tokens"] <= r["train_tokens"]
        if r["n_epoch_packs"] > 0:
            assert r["epoch_tokens"] > 0
