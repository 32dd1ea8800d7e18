"""Canonical table schemas (reference db/schema.sql re-typed for Spark).

Storage-edge fidelity uses DecimalType(20,8) (NUMERIC(20,8) in
db/schema.sql:6-11); analytics run in DoubleType, matching the
reference's own float64 compute (binance_analysis.py:125).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# candles — db/schema.sql:1-15, PK (symbol, tf, open_time)
CANDLES_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("tf", StringType(), False),
        StructField("open_time", TimestampType(), False),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("num_trades", IntegerType()),
    ]
)
CANDLES_KEY = ["symbol", "tf", "open_time"]

# trades — db/schema.sql:17-27, PK (symbol, trade_id)
TRADES_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("trade_id", LongType(), False),
        StructField("price", DoubleType()),
        StructField("qty", DoubleType()),
        StructField("quote_qty", DoubleType()),
        StructField("trade_time", TimestampType()),
        StructField("is_buyer_maker", BooleanType()),
        StructField("is_best_match", BooleanType()),
    ]
)
TRADES_KEY = ["symbol", "trade_id"]

# order_books — db/schema.sql:29-37, PK (symbol, side, price, update_id)
ORDERBOOK_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("price", DoubleType(), False),
        StructField("qty", DoubleType()),
        StructField("side", StringType(), False),
        StructField("update_id", LongType(), False),
        StructField("update_time", TimestampType()),
    ]
)
ORDERBOOK_KEY = ["symbol", "side", "price", "update_id"]

# Raw Binance kline wire format: 12-element positional array with
# numbers-as-strings and epoch-ms times (api.py:62; field extraction
# prices_collector.py:32-43).
RAW_KLINE_SCHEMA = ArrayType(StringType())

# Raw depth snapshot: {lastUpdateId, bids: [[p,q]...], asks: [[p,q]...]}
RAW_DEPTH_SCHEMA = StructType(
    [
        StructField("lastUpdateId", LongType()),
        StructField("bids", ArrayType(ArrayType(StringType()))),
        StructField("asks", ArrayType(ArrayType(StringType()))),
    ]
)

# Multimodal media column: opaque binary payload + typed metadata
# (the decode itself is a Pandas-UDF stage; see operators/multimodal.py).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", StringType(), True),  # binary in real data
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)
