"""Physical-layout tests for the 100 TB posture: partition pruning on
date-partitioned sinks, and bucketed tables joining without a shuffle.
These assert on the EXECUTED plan, not just results — the layout only
matters if Catalyst actually exploits it."""

from __future__ import annotations

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_sink_prunes(spark, tmp_path):
    # Facts partitioned by event date: a date filter must prune at the
    # directory level (PartitionFilters), not scan-and-discard.
    from kp_crypto_market_analytics_spark.session import load_tables

    e = load_tables(spark, "/root/testdata/sf0.001", ["events"])["events"]
    out = str(tmp_path / "events_by_date")
    e.withColumn("event_date", F.to_date("ts")).write.partitionBy("event_date").parquet(out)

    df = spark.read.parquet(out).where(F.col("event_date") == "2024-01-02")
    plan = df.queryExecution().executedPlan().toString() if hasattr(df, "queryExecution") else df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # Pruned scan reads only the one matching directory.
    n_all = spark.read.parquet(out).count()
    n_day = df.count()
    assert 0 < n_day < n_all


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    # Two tables bucketed+sorted on the join key must sort-merge join
    # with NO Exchange on either side — the co-located join layout for
    # repeated big-big joins at scale.
    from kp_crypto_market_analytics_spark.session import load_tables

    # warehouse.dir is static config — managed tables land in the
    # default ./spark-warehouse; DROP TABLE below removes the files.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = load_tables(spark, "/root/testdata/sf0.001", ["orders", "lineitem"])
        (
            t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable("li_b")
        )
        (
            t["orders"].withColumnRenamed("o_orderkey", "l_orderkey")
            .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable("ord_b")
        )
        joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        plan = _final_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_zorder_write_tiles_both_dimensions(spark, tmp_path):
    # Files written by zorder_write must each cover a SMALL envelope of
    # the (x, y) plane — that envelope is what parquet row-group min/max
    # stats expose, so predicates on either dimension prune files.  An
    # arrival-order layout gives every file the full global envelope.
    from kp_crypto_market_analytics_spark.operators.layout import zorder_write
    from kp_crypto_market_analytics_spark.session import load_tables

    e = load_tables(spark, "/root/testdata/sf0.001", ["events"])["events"]
    x = F.pmod(F.floor(F.unix_timestamp("ts") / 60).cast("long"), F.lit(1024))
    y = F.least(F.lit(1023).cast("long"), F.floor(F.col("value") * 2).cast("long"))
    quant = e.select(x.alias("qx"), y.alias("qy"))
    out = str(tmp_path / "events_zorder")
    zorder_write(quant, F.col("qx"), F.col("qy"), out, bits=10, num_files=16)

    back = spark.read.parquet(out).withColumn("f", F.input_file_name())
    assert back.count() == quant.count()
    env = (
        back.groupBy("f")
        .agg(
            (F.max("qx") - F.min("qx") + 1).alias("xr"),
            (F.max("qy") - F.min("qy") + 1).alias("yr"),
        )
        .select(F.avg(F.col("xr") * F.col("yr")).alias("mean_area"))
        .first()
    )
    g = quant.agg(
        (F.max("qx") - F.min("qx") + 1).alias("xr"),
        (F.max("qy") - F.min("qy") + 1).alias("yr"),
    ).first()
    global_area = g.xr * g.yr
    # A 16-way z-range split pins the top two bits of each dimension:
    # ideal mean envelope is global/16; allow boundary-straddling slack.
    assert env.mean_area <= global_area / 4


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Both fact tables written bucketed on the join key with the same
    bucket count: the later equi-join must plan with ZERO exchanges
    (bucket i joins bucket i in place) and agree row-for-row with the
    plain shuffled join, which on the same data DOES exchange both
    sides."""
    from kp_crypto_market_analytics_spark.operators.layout import bucketed_write
    from kp_crypto_market_analytics_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001", ["orders", "lineitem"])
    orders = t["orders"].select("o_orderkey", "o_totalprice")
    items = t["lineitem"].select("l_orderkey", "l_quantity")
    bucketed_write(orders, "t_bkt_orders", "o_orderkey", 4, str(tmp_path / "o"))
    bucketed_write(items, "t_bkt_items", "l_orderkey", 4, str(tmp_path / "l"))
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bi = spark.table("t_bkt_orders"), spark.table("t_bkt_items")

        def executed(df):
            df.collect()
            return df._jdf.queryExecution().executedPlan().toString().split(
                "== Initial Plan =="
            )[0]

        joined = bo.join(bi, bo["o_orderkey"] == bi["l_orderkey"]).select(
            "o_orderkey", "l_quantity"
        )
        plan = executed(joined)
        assert "Exchange " not in plan, plan
        assert "SortMergeJoin" in plan

        shuffled = orders.join(items, orders["o_orderkey"] == items["l_orderkey"]).select(
            "o_orderkey", "l_quantity"
        )
        assert "Exchange " in executed(shuffled)

        a = sorted(map(tuple, joined.collect()))
        b = sorted(map(tuple, shuffled.collect()))
        assert a == b and len(a) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
        spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS t_bkt_items")
