"""Binance-style REST market-data source (SURVEY.md §2.1 S1-S5).

HTTP happens on the driver (failover/rate-limit is client logic, not
engine logic — SURVEY §2.1 S2); rows land in a DataFrame and every
subsequent step fans out to executors.  ``offline=True`` (or env
OFFLINE=1) swaps in the deterministic synthetic generator mirroring the
reference's test fixture (api.py:56-64: 10 candles, constant "1.0"
prices, 1-minute step) — built with spark.range so even fixture
generation is distributed.

Reference parity map:
- host failover + skip-on-status: api.py:24-42  → _get_json
- klines fetch (limit<=1000):     api.py:44-75  → fetch_klines
- trades fetch:                   trades_collector.py:13-18
- depth fetch (nested arrays):    orderbook_collector.py:13-18
- positional→named projection:    prices_collector.py:32-43 → klines_to_df
- depth explode:                  orderbook_collector.py:25-37 → depth_to_df
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOSTS = [
    "https://api.binance.com",
    "https://api1.binance.com",
    "https://api2.binance.com",
    "https://api3.binance.com",
    "https://api4.binance.com",
]
SKIP_STATUSES = {451, 403, 429}
REQUEST_PACING_S = 0.1


def _offline() -> bool:
    return os.environ.get("OFFLINE", "0") == "1"


def _get_json(path: str, params: dict[str, Any], pacing: float = REQUEST_PACING_S):
    """GET with mirror-host failover; skip hosts on 451/403/429/5xx
    (api.py:24-42).  Import-gated: no network stack required offline."""
    import urllib.error
    import urllib.parse
    import urllib.request

    qs = urllib.parse.urlencode(params)
    last_err: Exception | None = None
    for host in HOSTS:
        try:
            with urllib.request.urlopen(f"{host}{path}?{qs}", timeout=10) as resp:
                if resp.status in SKIP_STATUSES or resp.status >= 500:
                    continue
                import json

                time.sleep(pacing)
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:  # noqa: PERF203
            last_err = e
            if e.code in SKIP_STATUSES or e.code >= 500:
                continue
            raise
        except OSError as e:
            last_err = e
            continue
    raise ConnectionError(f"all hosts failed for {path}") from last_err


def synthetic_klines(
    spark: SparkSession, symbol: str, start_ms: int | None = None, n: int = 10
) -> DataFrame:
    """Deterministic offline kline fixture (api.py:56-64): n rows,
    constant 1.0 prices, 60,000 ms step, in raw wire shape (strings)."""
    start = start_ms if start_ms is not None else 1_700_000_000_000
    return spark.range(n).select(
        (F.lit(start) + F.col("id") * 60_000).alias("open_time_ms"),
        F.lit("1.0").alias("open"),
        F.lit("1.0").alias("high"),
        F.lit("1.0").alias("low"),
        F.lit("1.0").alias("close"),
        F.lit("0.0").alias("volume"),
        (F.lit(start) + F.col("id") * 60_000 + 59_999).alias("close_time_ms"),
        F.lit("0.0").alias("quote_volume"),
        F.lit(0).alias("num_trades"),
        F.lit(symbol).alias("symbol"),
    )


def fetch_klines(
    spark: SparkSession,
    symbol: str,
    tf: str = "1m",
    start_ms: int | None = None,
    end_ms: int | None = None,
    limit: int = 1000,
) -> DataFrame:
    """S2/S3 — klines source: raw positional rows → named columns →
    typed candle frame.  Offline mode yields the synthetic fixture."""
    if _offline():
        raw = synthetic_klines(spark, symbol, start_ms)
    else:
        params: dict[str, Any] = {"symbol": symbol, "interval": tf, "limit": min(limit, 1000)}
        if start_ms is not None:
            params["startTime"] = start_ms
        if end_ms is not None:
            params["endTime"] = end_ms
        rows = _get_json("/api/v3/klines", params)
        raw = spark.createDataFrame(
            [
                (int(r[0]), str(r[1]), str(r[2]), str(r[3]), str(r[4]), str(r[5]),
                 int(r[6]), str(r[7]), int(r[8]), symbol)
                for r in rows
            ],
            _WIRE_SCHEMA,
        )
    return klines_to_df(raw, tf)


_TF_UNIT_MS = {"m": 60_000, "h": 3_600_000, "d": 86_400_000, "w": 604_800_000}
_SYNTH_DEFAULT_START = 1_700_000_000_000
_WIRE_SCHEMA = (
    "open_time_ms long, open string, high string, low string, close string,"
    " volume string, close_time_ms long, quote_volume string,"
    " num_trades int, symbol string"
)


def tf_to_ms(tf: str) -> int:
    """Candle interval → milliseconds ('1m', '15m', '4h', '1d', '1w')."""
    return int(tf[:-1]) * _TF_UNIT_MS[tf[-1]]


def _synthetic_page(
    symbol: str,
    tf: str,
    cursor_ms: int,
    end_ms: int | None,
    limit: int,
    grid_start: int,
) -> list[tuple]:
    """One page from the OFFLINE synthetic exchange: candles live on a
    fixed grid (grid_start + i*step, i in [0, total)), and a page
    request returns up to ``limit`` of them with open_time >= cursor
    (and <= end_ms when given) — the same request semantics as the live
    /api/v3/klines endpoint, so the pager's seam logic is exercised
    offline.  ``OFFLINE_KLINES_TOTAL`` sets the synthetic history depth
    (default 10, the reference fixture's size — api.py:56-64)."""
    step = tf_to_ms(tf)
    total = int(os.environ.get("OFFLINE_KLINES_TOTAL", "10"))
    first_i = max(0, -(-(cursor_ms - grid_start) // step))  # ceil
    rows: list[tuple] = []
    i = first_i
    while len(rows) < limit and i < total:
        t = grid_start + i * step
        if end_ms is not None and t > end_ms:
            break
        rows.append((t, "1.0", "1.0", "1.0", "1.0", "0.0", t + step - 1, "0.0", 0, symbol))
        i += 1
    return rows


def fetch_klines_paged(
    spark: SparkSession,
    symbol: str,
    tf: str = "1m",
    start_ms: int | None = None,
    end_ms: int | None = None,
    page_limit: int = 1000,
    max_pages: int | None = None,
) -> DataFrame:
    """S2 without the reference's silent truncation: the reference
    caps a klines request at 1000 candles and drops the rest of the
    range on the floor (api.py:49,66-72; SURVEY §3 E1 step 3 calls it
    a real semantic limitation).  This pager walks the time range —
    advance ``startTime`` past the last returned open_time, stitch,
    last-write-wins dedup on open_time across the page seam — so any
    range ingests completely.  Per-request pacing is kept (the REST
    failover/pacing lives in _get_json); HTTP stays on the driver like
    every REST source here, and rows land in ONE DataFrame built after
    the walk (the ingest boundary — everything downstream fans out to
    executors)."""
    step = tf_to_ms(tf)
    start = start_ms if start_ms is not None else _SYNTH_DEFAULT_START
    limit = min(page_limit, 1000)
    stitched: dict[int, tuple] = {}
    cursor, pages = start, 0
    while True:
        if _offline():
            page = _synthetic_page(symbol, tf, cursor, end_ms, limit, grid_start=start)
        else:
            params: dict[str, Any] = {
                "symbol": symbol, "interval": tf, "limit": limit, "startTime": cursor,
            }
            if end_ms is not None:
                params["endTime"] = end_ms
            page = [
                (int(r[0]), str(r[1]), str(r[2]), str(r[3]), str(r[4]), str(r[5]),
                 int(r[6]), str(r[7]), int(r[8]), symbol)
                for r in _get_json("/api/v3/klines", params)
            ]
        for r in page:
            stitched[int(r[0])] = r  # seam overlap: last write wins
        pages += 1
        if len(page) < limit:
            break  # exchange has no more candles in range
        nxt = int(page[-1][0]) + step
        if nxt <= cursor:
            break  # defensive: a non-advancing cursor must not loop forever
        cursor = nxt
        if end_ms is not None and cursor > end_ms:
            break
        if max_pages is not None and pages >= max_pages:
            break
    wire = [stitched[t] for t in sorted(stitched)]
    raw = spark.createDataFrame(wire, _WIRE_SCHEMA)
    return klines_to_df(raw, tf)


def klines_to_df(raw: DataFrame, tf: str) -> DataFrame:
    """P1/P3/F1 — positional wire rows → canonical typed candle frame
    (prices_collector.py:32-43): ms→timestamp, string→double with
    null-on-error (try_cast = pandas errors='coerce')."""
    return raw.select(
        F.col("symbol"),
        F.lit(tf).alias("tf"),
        F.timestamp_millis(F.col("open_time_ms")).alias("open_time"),
        F.col("open").try_cast("double").alias("open"),
        F.col("high").try_cast("double").alias("high"),
        F.col("low").try_cast("double").alias("low"),
        F.col("close").try_cast("double").alias("close"),
        F.col("volume").try_cast("double").alias("volume"),
        F.col("num_trades").cast("int").alias("num_trades"),
    )


def fetch_ticker_prices(
    spark: SparkSession, symbols: list[str], n_polls: int = 1, delay_s: float = 0.0
) -> DataFrame:
    """S1 — ticker poll loop (main.py:19-28).  Offline: constant 100.0
    (main.py:21-22).  Batch shape of the streaming source; the true
    streaming form is streaming/rest_stream.py."""
    rows = []
    for poll in range(n_polls):
        for sym in symbols:
            if _offline():
                price = 100.0
            else:
                data = _get_json("/api/v3/ticker/price", {"symbol": sym})
                price = float(data["price"])
            rows.append((poll, sym, price))
        if delay_s and poll < n_polls - 1:
            time.sleep(delay_s)
    return spark.createDataFrame(rows, "poll int, symbol string, price double")


def depth_to_df(spark: SparkSession, symbol: str, snapshot: dict, update_time_ms: int) -> DataFrame:
    """S5/P4 — depth snapshot {bids:[[p,q]..], asks:[[p,q]..]} → one row
    per level with a side tag (orderbook_collector.py:25-37): a single
    explode over the two tagged arrays."""
    raw = spark.createDataFrame(
        [(int(snapshot.get("lastUpdateId", 0)), snapshot.get("bids", []), snapshot.get("asks", []))],
        "lastUpdateId long, bids array<array<string>>, asks array<array<string>>",
    )
    tagged = raw.select(
        "lastUpdateId",
        F.explode(
            F.concat(
                F.transform("bids", lambda x: F.struct(F.lit("bid").alias("side"), x.alias("pq"))),
                F.transform("asks", lambda x: F.struct(F.lit("ask").alias("side"), x.alias("pq"))),
            )
        ).alias("lvl"),
    )
    return tagged.select(
        F.lit(symbol).alias("symbol"),
        F.col("lvl.pq")[0].try_cast("double").alias("price"),
        F.col("lvl.pq")[1].try_cast("double").alias("qty"),
        F.col("lvl.side").alias("side"),
        F.col("lastUpdateId").alias("update_id"),
        F.timestamp_millis(F.lit(update_time_ms)).alias("update_time"),
    )
