"""Streaming form of the REST ticker source (SURVEY §2.1 S1 /
§2.9: the reference's poll loop main.py:23-27 re-expressed as a
Structured Streaming pipeline).

Two tiers:

- ``ticker_stream``: a rate source drives one price row per (tick,
  symbol).  OFFLINE parity: constant 100.0 (main.py:21-22) — fully
  deterministic, testable without network.
- ``start_ticker_ingest``: the ONLINE shape — rate ticks trigger a
  driver-side REST fetch inside foreachBatch (executors must not fan
  out HTTP to the same endpoint; the fetch is I/O-bound driver work,
  the WRITE fans out).  Appends are idempotent per micro-batch id via
  the keyed upsert sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ticker_stream(
    spark: SparkSession,
    symbols: list[str],
    rows_per_second: int = 1,
) -> DataFrame:
    """Rate-driven ticker stream: schema (ts, poll, symbol, price).
    OFFLINE semantics only — each tick emits the deterministic constant
    price per symbol; swap the price column for a foreachBatch fetch in
    online mode (see start_ticker_ingest)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    sym = F.explode(F.array(*[F.lit(s) for s in symbols])).alias("symbol")
    return rate.select(
        F.col("timestamp").alias("ts"),
        F.col("value").alias("poll"),
        sym,
    ).withColumn("price", F.lit(100.0))


def start_ticker_ingest(
    spark: SparkSession,
    symbols: list[str],
    target_path: str,
    checkpoint: str,
    rows_per_second: int = 1,
):
    """Online ingest: every rate tick triggers one driver-side ticker
    fetch per symbol (OFFLINE=1 short-circuits to the constant), and
    the batch upserts into the target on (poll, symbol) — re-delivered
    micro-batches are idempotent."""
    from kp_crypto_market_analytics_spark.sinks.upsert import merge_into
    from kp_crypto_market_analytics_spark.sources.binance import fetch_ticker_prices

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        n_ticks = batch_df.count()
        if n_ticks == 0:
            return
        prices = fetch_ticker_prices(spark, symbols, n_polls=1)
        batch = prices.withColumn("poll", F.lit(batch_id)).withColumn(
            "ingest_ts", F.current_timestamp()
        )
        merge_into(spark, target_path, batch, ["poll", "symbol"])

    return (
        rate.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .start()
    )
