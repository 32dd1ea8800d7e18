"""Bucketed co-located joins: the zero-shuffle big-join lever.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides onto the join key.  Writing both tables bucketed (bucketBy +
sortBy on the key) pins the co-partitioning INTO THE STORAGE LAYOUT:
every later join on that key reads matching buckets pairwise and
neither side shuffles — the standard warehouse technique this engine's
sinks expose via Spark's native bucketing.

These tests prove the property from the executed plan, not by
assertion of intent: the bucketed-bucketed join carries ZERO exchange
nodes, while the identical unbucketed join shuffles both sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return plan.count("Exchange ")


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("va")
    )
    b = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("vb")
    )
    for name, df in (("t_bkt_a", a), ("t_bkt_b", b)):
        (
            df.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable(name)
        )
    try:
        ta, tb = spark.table("t_bkt_a"), spark.table("t_bkt_b")
        j = ta.join(tb, "k").select(F.sum(F.col("va") + F.col("vb")))
        (row,) = j.collect()
        assert row[0] == sum(i * 10 for i in range(10_000))
        # the whole point: ZERO exchanges — both sides read co-located
        assert _exchanges(ta.join(tb, "k")) == 0

        # control: the same join on unbucketed frames shuffles
        ua = spark.createDataFrame(a.collect(), a.schema)
        ub = spark.createDataFrame(b.collect(), b.schema)
        assert _exchanges(ua.join(ub, "k")) >= 2
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def test_bucketed_aggregation_skips_exchange(spark, no_broadcast):
    """groupBy on the bucket key also rides the stored partitioning —
    no exchange before the aggregate."""
    a = spark.range(0, 10_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    (
        a.write.mode("overwrite")
        .bucketBy(8, "k")
        .sortBy("k")
        .saveAsTable("t_bkt_g")
    )
    try:
        agg = spark.table("t_bkt_g").groupBy("k").agg(F.sum("v").alias("s"))
        assert agg.count() == 1000
        assert _exchanges(agg) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_g")
