"""Session-scoped materialization of shared derived datasets
(operators/materialize.py) and its co-purchase instantiation
(operators/copurchase.py).

The eight graph-family queries share one support-thresholded pair
build per (SparkSession, sf_dir); these tests pin the memoization
contract and its parity with an uncached build.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_materializes_once_per_key(spark):
    from kp_crypto_market_analytics_spark.operators.copurchase import (
        SUPPORT,
        copurchase_pairs,
    )
    from kp_crypto_market_analytics_spark.operators.materialize import _CACHE_ATTR

    copurchase_pairs(spark, SF_DIR)
    cache = getattr(spark, _CACHE_ATTR)
    key = f"copurchase:{SF_DIR}:support={SUPPORT}"
    assert key in cache
    path = cache[key]
    # Second call must hit the memo — same materialized path.
    copurchase_pairs(spark, SF_DIR)
    assert cache[key] == path


def test_cache_survives_clear_cache(spark):
    """bench.py clears the in-memory cache after every query; the
    parquet materialization must keep serving afterwards."""
    from kp_crypto_market_analytics_spark.operators.copurchase import copurchase_pairs

    before = copurchase_pairs(spark, SF_DIR).count()
    spark.catalog.clearCache()
    after = copurchase_pairs(spark, SF_DIR).count()
    assert before == after > 0


def test_distinct_keys_get_distinct_paths(spark):
    from kp_crypto_market_analytics_spark.operators.materialize import (
        _CACHE_ATTR,
        session_materialized,
    )

    a = session_materialized(
        spark, "test:lit:1", lambda: spark.range(3).selectExpr("id AS a")
    )
    b = session_materialized(
        spark, "test:lit:2", lambda: spark.range(5).selectExpr("id AS a")
    )
    assert a.count() == 3 and b.count() == 5
    cache = getattr(spark, _CACHE_ATTR)
    assert cache["test:lit:1"] != cache["test:lit:2"]


def test_cached_matches_uncached_build(spark):
    from kp_crypto_market_analytics_spark.operators.copurchase import (
        _build,
        copurchase_pairs,
    )

    cached = {
        tuple(r) for r in copurchase_pairs(spark, SF_DIR).collect()
    }
    fresh = {tuple(r) for r in _build(spark, SF_DIR).collect()}
    assert cached == fresh
    assert len(cached) > 0
    # Canonical orientation and threshold hold on every row.
    for u, v, support in cached:
        assert u < v
        assert support >= 2


def test_topk_guard_saturated_uses_materialization(spark):
    """With >= k edges above the support threshold, the guard must
    return the shared materialized table (no rebuild) and its top-k
    must equal the UNFILTERED build's top-k — the structural claim
    g_bipartite_projection rides on (r12, VERDICT r11 ask #4)."""
    from kp_crypto_market_analytics_spark.operators.copurchase import (
        _build,
        copurchase_pairs,
        copurchase_pairs_for_topk,
    )

    k = 20
    got = copurchase_pairs_for_topk(spark, SF_DIR, k)
    # Saturated at SF_DIR: same plan object as the materialization.
    mat = {tuple(r) for r in copurchase_pairs(spark, SF_DIR).collect()}
    assert {tuple(r) for r in got.collect()} == mat

    def topk(df):
        return [
            (r.u, r.v, r.support)
            for r in df.orderBy(
                df.support.desc(), df.u.asc(), df.v.asc()
            ).limit(k).collect()
        ]

    unfiltered = _build(spark, SF_DIR, min_support=1)
    assert topk(got) == topk(unfiltered)
    assert len(topk(got)) == k


def test_topk_guard_unsaturated_falls_back_to_unfiltered(spark, tmp_path):
    """With fewer than k surviving edges the guard must return the
    UNFILTERED build so weight-1 edges fill the top-k instead of
    silently vanishing — the regime r11's per-SF assertion could not
    cover."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kp_crypto_market_analytics_spark.operators.copurchase import (
        copurchase_pairs_for_topk,
    )

    # 3 orders: parts (1,2) co-occur twice (support 2); five other
    # pairs appear once each.  Only ONE edge survives support >= 2.
    baskets = [(100, [1, 2]), (101, [1, 2]), (102, [3, 4, 5])]
    ok, pk = [], []
    for o, parts in baskets:
        for p in parts:
            ok.append(o)
            pk.append(p)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = {
        (r.u, r.v, r.support)
        for r in copurchase_pairs_for_topk(spark, str(tmp_path), 20).collect()
    }
    assert got == {
        (1, 2, 2),
        (3, 4, 1),
        (3, 5, 1),
        (4, 5, 1),
    }


def test_capped_jaccard_materialization_matches_direct_build(spark):
    from kp_crypto_market_analytics_spark.operators.dedup import (
        capped_jaccard_pairs_materialized,
        ngram_jaccard_pairs,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    mat = {
        (r.doc_a, r.doc_b, r.inter_size, r.size_a, r.size_b)
        for r in capped_jaccard_pairs_materialized(spark, SF_DIR).collect()
    }
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    direct = {
        (r.doc_a, r.doc_b, r.inter_size, r.size_a, r.size_b)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", k=4, threshold=0.6, use_words=False,
            max_shingle_freq=50,
        ).collect()
    }
    assert mat == direct and len(mat) > 0


def test_minhash_sig_materialization_matches_direct_build(spark):
    from kp_crypto_market_analytics_spark.operators.dedup import minhash_signatures
    from kp_crypto_market_analytics_spark.queries_ext import (
        _LSH_DF_CAP,
        _LSH_NUM_HASHES,
        _minhash_sigs,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    mat = {tuple(r) for r in _minhash_sigs(spark, SF_DIR).collect()}
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    direct = {
        tuple(r)
        for r in minhash_signatures(
            docs, "text", "doc_id", num_hashes=_LSH_NUM_HASHES, k=4,
            use_words=False, max_shingle_freq=_LSH_DF_CAP,
        ).collect()
    }
    assert mat == direct and len(mat) > 0


def test_simhash_materialization_matches_direct_build(spark):
    from kp_crypto_market_analytics_spark.operators.dedup import simhash
    from kp_crypto_market_analytics_spark.queries_ext import _simhash_sigs
    from kp_crypto_market_analytics_spark.session import load_tables

    mat = {tuple(r) for r in _simhash_sigs(spark, SF_DIR).collect()}
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    direct = {tuple(r) for r in simhash(docs, "text", "doc_id").collect()}
    assert mat == direct and len(mat) > 0


def test_kmeans_cents_materialized_matches_direct(spark):
    """The session-materialized trained-centroid table shared by
    sim_ivf_trained and dedup_semantic must equal the direct
    kmeans_centroids build row-for-row."""
    from kp_crypto_market_analytics_spark.operators.similarity import (
        kmeans_centroids,
    )
    from kp_crypto_market_analytics_spark.session import load_tables
    from kp_crypto_market_analytics_spark.queries_ext import _kmeans_cents37

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    direct = {
        r["centroid_id"]: tuple(r["cent"])
        for r in kmeans_centroids(
            emb, "embedding", "vec_id", seed_mod=37, iters=2
        ).collect()
    }
    mat = {
        r["centroid_id"]: tuple(r["cent"])
        for r in _kmeans_cents37(spark, SF_DIR).collect()
    }
    assert mat == direct and len(mat) > 0


def test_nested_materialized_builds_do_not_deadlock(spark):
    """A materialized build may itself request another materialization
    (trained-IVF top-k reads the materialized centroid table) — the
    build lock must be reentrant or this self-deadlocks."""
    from kp_crypto_market_analytics_spark.operators.materialize import (
        session_materialized,
    )

    def inner():
        return spark.range(4).selectExpr("id AS a")

    def outer():
        return session_materialized(spark, "test:nested:inner", inner).selectExpr(
            "a * 2 AS b"
        )

    got = session_materialized(spark, "test:nested:outer", outer)
    assert sorted(r["b"] for r in got.collect()) == [0, 2, 4, 6]


def test_clear_session_materializations_forces_rebuild(spark):
    """bench.py --repeat clears the memo between passes: the clear
    must empty the memo, delete the backing dirs, and make the next
    request run a FRESH build (counted via the build callable)."""
    import os

    from kp_crypto_market_analytics_spark.operators.materialize import (
        _CACHE_ATTR,
        clear_session_materializations,
        session_materialized,
    )

    calls = []

    def build():
        calls.append(1)
        return spark.range(4).selectExpr("id AS a")

    session_materialized(spark, "test:clear:1", build)
    session_materialized(spark, "test:clear:1", build)
    assert len(calls) == 1  # memoized
    path = getattr(spark, _CACHE_ATTR)["test:clear:1"]
    assert os.path.exists(path)
    assert clear_session_materializations(spark) >= 1
    assert "test:clear:1" not in getattr(spark, _CACHE_ATTR, {})
    assert not os.path.exists(path)
    got = session_materialized(spark, "test:clear:1", build)
    assert len(calls) == 2 and got.count() == 4
