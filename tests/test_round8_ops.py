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
