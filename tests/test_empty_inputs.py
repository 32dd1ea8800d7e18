"""Empty-frame robustness: the key operators must return empty (or
correctly degenerate) results on zero rows — not throw.  Constant and
empty inputs are the ANSI-mode landmines (the OFFLINE corr bug was
exactly this class)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _empty_events(spark):
    return spark.createDataFrame(
        [],
        StructType(
            [
                StructField("event_id", LongType()),
                StructField("event_type", StringType()),
                StructField("ts", TimestampType()),
                StructField("value", DoubleType()),
                StructField("user_id", LongType()),
            ]
        ),
    )


def test_empty_sessionize_and_windows(spark):
    from kp_crypto_market_analytics_spark.operators.windows import rolling_std, sessionize

    e = _empty_events(spark)
    assert sessionize(e, "user_id", "ts", 1800, tiebreak="event_id").count() == 0
    assert rolling_std(e, "event_type", "ts", "value", 60, 30).count() == 0


def test_empty_dedup_and_clusters(spark):
    from kp_crypto_market_analytics_spark.operators.dedup import (
        connected_component_labels,
        exact_dedup,
        minhash_lsh_pairs,
        simhash,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(docs, "text", "doc_id").count() == 0
    assert simhash(docs, "text", "doc_id").count() == 0
    assert minhash_lsh_pairs(docs, "text", "doc_id", 8, 2, k=4, use_words=False).count() == 0
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_component_labels(edges, docs.select(F.col("doc_id").alias("doc")), "doc").count() == 0


def test_empty_similarity_and_corr(spark):
    from kp_crypto_market_analytics_spark.operators.correlation import (
        pairwise_corr_long,
        scalar_corr,
    )
    from kp_crypto_market_analytics_spark.operators.similarity import brute_force_topk

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert brute_force_topk(emb, emb, k=5).count() == 0

    e = _empty_events(spark)
    assert pairwise_corr_long(e, "event_type", "ts", "value").count() == 0
    row = scalar_corr(e.withColumn("v2", F.col("value")), [("value", "v2")]).collect()[0]
    assert row[0] is None  # guarded: no rows -> null, not an error


def test_empty_candles_and_upsert(spark, tmp_path):
    from kp_crypto_market_analytics_spark.sinks.upsert import merge_into
    from kp_crypto_market_analytics_spark.streaming.candles import candles_from_trades

    trades = spark.createDataFrame(
        [], "symbol string, trade_id long, price double, qty double, trade_time timestamp"
    )
    assert candles_from_trades(trades).count() == 0
    # Upserting an empty batch into an existing table is a no-op.
    tgt = str(tmp_path / "t")
    base = spark.createDataFrame([("A", 1, 1.0)], "symbol string, trade_id long, price double")
    merge_into(spark, tgt, base, ["symbol", "trade_id"])
    merge_into(spark, tgt, base.limit(0), ["symbol", "trade_id"])
    assert spark.read.parquet(tgt).count() == 1


def test_empty_resample_and_rollup(spark):
    # Zero-row inputs flow through the new TS operators without error.
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        merge_partial_rollups,
        partial_rollup,
    )
    from kp_crypto_market_analytics_spark.operators.windows import resample_ffill

    empty = spark.createDataFrame([], "k: string, ts: timestamp, v: double")
    assert resample_ffill(empty, "k", "ts", "v").count() == 0
    parts = partial_rollup(empty, ["k"], "v")
    assert merge_partial_rollups(parts, ["k"]).count() == 0


def test_empty_pq_and_layout(spark):
    # PQ on an empty corpus yields empty codes/top-k; the z-order key is
    # well-defined on an empty frame.
    from pyspark.sql import functions as F

    from kp_crypto_market_analytics_spark.operators.layout import zorder_key
    from kp_crypto_market_analytics_spark.operators.similarity import pq_topk

    empty = spark.createDataFrame([], "vec_id: long, embedding: array<double>")
    assert pq_topk(empty, empty, k=5, m=4, ksub=16).count() == 0
    ez = spark.createDataFrame([], "x: long, y: long")
    assert zorder_key(ez, F.col("x"), F.col("y")).count() == 0


def test_empty_graph_operators(spark):
    from kp_crypto_market_analytics_spark.operators.graph import (
        pagerank_weighted,
        triangle_count,
    )

    edges = spark.createDataFrame([], "src long, dst long, weight long")
    assert pagerank_weighted(edges, iters=2).count() == 0
    und = spark.createDataFrame([], "u long, v long")
    row = triangle_count(und).collect()[0]
    assert row["n_nodes"] == 0 and row["n_triangles"] == 0


def test_empty_audio_windowing(spark):
    from kp_crypto_market_analytics_spark.operators.multimodal import window_audio

    media = spark.createDataFrame([], "media_id long, payload string")
    assert window_audio(media, fake=True).count() == 0


def test_empty_sketch_helpers(spark):
    # The sketch builders behind the streaming parity gates must
    # degrade to empty frames (not throw) on zero rows — the fold
    # union/agg shapes then stay empty through every round.
    from pyspark.sql.types import IntegerType

    from kp_crypto_market_analytics_spark.queries_ext import (
        _hll_estimate,
        _hll_registers,
    )
    from kp_crypto_market_analytics_spark.queries_quality import (
        _dds_buckets,
        _dds_estimates,
    )

    empty_v = spark.createDataFrame([], StructType([StructField("v", LongType())]))
    buckets = _dds_buckets(empty_v, [])
    assert buckets.count() == 0
    assert _dds_estimates(buckets).count() == 0
    # count-sum fold of two empty bucket frames stays empty
    assert (
        buckets.unionByName(buckets).groupBy("key").agg(F.sum("n").alias("n")).count()
        == 0
    )

    empty_u = spark.createDataFrame([], StructType([StructField("u", StringType())]))
    regs = _hll_registers(empty_u, [])
    assert regs.count() == 0
    assert (
        _hll_estimate(regs.select(F.lit(1).alias("g"), "idx", "m"), ["g"]).count() == 0
    )

    # labeled-embedding helpers: posexplode of an empty vector table
    from pyspark.sql.types import ArrayType, FloatType

    from kp_crypto_market_analytics_spark.functions.vectors import to_double_array

    empty_emb = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("label", IntegerType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )
    x = empty_emb.select(
        "label", F.posexplode(to_double_array("embedding")).alias("i", "xv")
    )
    assert x.groupBy("label", "i").agg(F.count(F.lit(1)).alias("n")).count() == 0


def test_empty_range_partitioned_rank(spark):
    from kp_crypto_market_analytics_spark.operators.layout import (
        range_partitioned_rank,
    )

    e = _empty_events(spark)
    out = range_partitioned_rank(e, ["ts", "event_id"], n_ranges=8)
    assert out.count() == 0
    assert "global_rn" in out.columns


def test_range_rank_more_ranges_than_rows(spark):
    """Empty range partitions must not corrupt offsets: with 16 ranges
    over 3 rows, the ranks are still exactly 1..3."""
    from kp_crypto_market_analytics_spark.operators.layout import (
        range_partitioned_rank,
    )

    df = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b")], "k long, v string"
    )
    got = sorted(
        (r["k"], r["global_rn"])
        for r in range_partitioned_rank(df, ["k"], n_ranges=16).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_round_ratio_micro_dec_half_tie_and_negative(spark):
    """The DECIMAL micro divider must round half-AWAY on exact .5 µ
    ties, positive and negative — the structural-tie class the int64
    helper was built for, now at DECIMAL(38,0) scale."""
    from pyspark.sql import functions as F  # noqa: F811

    from kp_crypto_market_analytics_spark.queries_indicators import (
        _round_ratio_micro_dec,
    )

    df = spark.createDataFrame(
        [(1, "0.000003", 2), (2, "-0.000003", 2), (3, "123.456789", 3)],
        "id long, num string, den long",
    ).select(
        "id",
        F.col("num").cast("decimal(18,6)").alias("num"),
        "den",
    )
    out = {
        r["id"]: r["q"]
        for r in df.select(
            "id", _round_ratio_micro_dec(F.col("num"), F.col("den")).alias("q")
        ).collect()
    }
    assert out[1] == 0.000002   # +1.5 µ -> 2 µ (half away from zero)
    assert out[2] == -0.000002  # -1.5 µ -> -2 µ
    assert out[3] == 41.152263  # 123.456789 / 3, exact
