"""Streaming candle construction (SURVEY.md §2.9).

The reference polls REST in a loop and recomputes batch-fully
(main.py:23-27); here the same semantics as a Structured Streaming
plan:

  trades stream → withWatermark → 1-minute tumbling window groupBy →
  OHLCV aggregates → foreachBatch MERGE into the candle table.

- Watermark bounds state for late data (the reference's "unlimited
  lateness" is watermark=∞ + upsert output: late rows still merge by
  PK, reference parity by construction).
- min_by/max_by give deterministic open/close under equal timestamps.
- The foreachBatch upsert (sinks/upsert.py) makes replays idempotent —
  exactly-once effect on the candle table via checkpointing,
  re-expressing the reference's ON CONFLICT idempotence (S14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.operators.aggregates import exact_sum
from kp_crypto_market_analytics_spark.sinks.upsert import upsert_foreach_batch


def candles_from_trades(
    trades: DataFrame,
    ts_col: str = "trade_time",
    symbol_col: str = "symbol",
    price_col: str = "price",
    qty_col: str = "qty",
    window: str = "1 minute",
    watermark: str | None = "2 minutes",
    id_col: str | None = "trade_id",
) -> DataFrame:
    """Tumbling-window OHLCV aggregation; works identically on batch
    and streaming frames (the batch twin is the oracle-gated
    stream_candles_1m query)."""
    df = trades
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    ord_key = (
        F.struct(F.col(ts_col), F.col(id_col)) if id_col and id_col in trades.columns
        else F.col(ts_col)
    )
    out = df.groupBy(
        F.col(symbol_col).alias("symbol"),
        F.window(ts_col, window).alias("w"),
    ).agg(
        F.min_by(price_col, ord_key).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, ord_key).alias("close"),
        exact_sum(qty_col).alias("volume"),
        F.count(F.lit(1)).alias("num_trades"),
    )
    return out.select(
        "symbol",
        F.col("w.start").alias("open_time"),
        "open", "high", "low", "close", "volume", "num_trades",
    )


def start_candle_stream(
    trades_stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    trigger_seconds: int | None = None,
):
    """Wire the stream end-to-end: window agg → foreachBatch upsert on
    PK (symbol, open_time).  Update-mode emits revised candles as late
    trades arrive; the merge keeps the table last-write-wins."""
    candles = candles_from_trades(trades_stream, window=window, watermark=watermark)
    writer = (
        candles.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(upsert_foreach_batch(target_path, ["symbol", "open_time"]))
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def synthetic_trades_stream(spark, rows_per_second: int = 100) -> DataFrame:
    """Deterministic-shape test stream from the rate source (the
    streaming analog of the OFFLINE fixture, api.py:56-64)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.concat(F.lit("SYM"), (F.col("value") % 3).cast("string")).alias("symbol"),
        F.col("value").alias("trade_id"),
        (F.lit(100.0) + (F.col("value") % 7).cast("double")).alias("price"),
        (F.lit(1.0) + (F.col("value") % 5).cast("double") / 10.0).alias("qty"),
        F.col("timestamp").alias("trade_time"),
    )


def sessionized_activity(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Session-window aggregation — the streaming twin of
    operators.windows.sessionize (same gap rule; session_window merges
    events closer than ``gap`` into one window).  On a stream the
    watermark closes sessions and bounds state; on a batch frame it
    yields the same sessions as the lag/cumsum operator."""
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("session"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            key_col,
            F.col("session.start").alias("window_start"),
            F.col("session.end").alias("window_end"),
            "n_events",
            "session_start",
            "session_end",
        )
    )
