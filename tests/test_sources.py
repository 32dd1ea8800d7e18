"""Sources: offline fixtures, wire-format normalization, tolerant CSV
readers (SURVEY.md §2.1-§2.3, FIXTURES.md §4 malformed fixtures)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(autouse=True)
def offline_env(monkeypatch):
    monkeypatch.setenv("OFFLINE", "1")


def test_offline_klines_fixture(spark):
    # api.py:56-64 parity: 10 rows, constant 1.0 prices, 1-minute step
    from kp_crypto_market_analytics_spark.sources.binance import fetch_klines

    df = fetch_klines(spark, "BTCUSDT", "1m", start_ms=1_700_000_000_000)
    rows = df.orderBy("open_time").collect()
    assert len(rows) == 10
    assert all(r["open"] == 1.0 and r["close"] == 1.0 for r in rows)
    assert all(r["symbol"] == "BTCUSDT" and r["tf"] == "1m" for r in rows)
    deltas = {
        (b["open_time"] - a["open_time"]).total_seconds()
        for a, b in zip(rows, rows[1:])
    }
    assert deltas == {60.0}


def test_klines_to_df_null_coerce(spark):
    # P3: malformed numeric cells -> null, not error (ANSI-safe try_cast)
    from kp_crypto_market_analytics_spark.sources.binance import klines_to_df

    raw = spark.createDataFrame(
        [(1_700_000_000_000, "1.5", "2.0", "oops", "1.8", "9.9", 0, "0", 3, "X")],
        "open_time_ms long, open string, high string, low string, close string,"
        " volume string, close_time_ms long, quote_volume string, num_trades int, symbol string",
    )
    row = klines_to_df(raw, "1m").collect()[0]
    assert row["open"] == 1.5 and row["low"] is None and row["num_trades"] == 3


def test_ticker_offline_constant(spark):
    from kp_crypto_market_analytics_spark.sources.binance import fetch_ticker_prices

    df = fetch_ticker_prices(spark, ["AAA", "BBB"], n_polls=3)
    assert df.count() == 6
    assert {r["price"] for r in df.collect()} == {100.0}


def test_depth_explode(spark):
    # P4: nested bids/asks arrays -> one row per level with side tag
    from kp_crypto_market_analytics_spark.sources.binance import depth_to_df

    snap = {"lastUpdateId": 7, "bids": [["100.5", "2"], ["100.4", "1"]], "asks": [["100.6", "3"]]}
    df = depth_to_df(spark, "ETHUSDT", snap, 1_700_000_000_000)
    rows = df.orderBy("side", "price").collect()
    assert [(r["side"], r["price"], r["qty"]) for r in rows] == [
        ("ask", 100.6, 3.0), ("bid", 100.4, 1.0), ("bid", 100.5, 2.0),
    ]
    assert all(r["update_id"] == 7 for r in rows)


def test_tolerant_klines_csv(spark, tmp_path):
    # FIXTURES §4: ms-epoch vs ISO times; file without symbol column
    # named klines_BTCUSDT_1m.csv -> filename inference; trades-count
    # column candidates.
    from kp_crypto_market_analytics_spark.sources.files import read_klines_csv

    f1 = tmp_path / "klines_BTCUSDT_1m.csv"
    f1.write_text(
        "open_time,open,high,low,close,volume,trade_count\n"
        "1700000000000,1,2,0.5,1.5,10,7\n"
        "1700000060000,1.5,2,1,2,20,8\n"
    )
    f2 = tmp_path / "klines_ETHUSDT_1m.csv"
    f2.write_text(
        "open_time,open,high,low,close,volume\n"
        "2023-11-14 22:13:20,3,4,2,3.5,100\n"
    )
    df = read_klines_csv(spark, str(tmp_path / "klines_*.csv"))
    rows = sorted(df.collect(), key=lambda r: (r["symbol"], r["open_time"]))
    assert [r["symbol"] for r in rows] == ["BTCUSDT", "BTCUSDT", "ETHUSDT"]
    assert [r["num_trades"] for r in rows] == [7, 8, 0]  # candidates; default 0 when absent
    # ms-epoch and ISO encodings parse to the same instant
    assert rows[0]["open_time"] == rows[2]["open_time"]


def test_orderbook_csv_side_normalize(spark, tmp_path):
    # F11: side normalized lower(trim); junk sides filtered (P6)
    from kp_crypto_market_analytics_spark.sources.files import read_orderbook_csv

    f = tmp_path / "orderbook_BTCUSDT.csv"
    f.write_text(
        "price,qty,side,update_id,update_time\n"
        "100.5,2, BID ,1,1700000000000\n"
        "100.6,3,Ask,1,1700000000000\n"
        "100.7,1,junk,1,1700000000000\n"
    )
    df = read_orderbook_csv(spark, str(f))
    rows = df.orderBy("price").collect()
    assert [(r["side"], r["price"]) for r in rows] == [("bid", 100.5), ("ask", 100.6)]


def test_file_router(spark, tmp_path):
    from kp_crypto_market_analytics_spark.sources.files import route_files

    (tmp_path / "klines_AAA_1m.csv").write_text(
        "open_time,open,high,low,close,volume\n1700000000000,1,1,1,1,1\n"
    )
    (tmp_path / "trades_AAA.csv").write_text(
        "trade_id,price,qty,trade_time\n1,10,2,1700000000000\n"
    )
    out = route_files(spark, str(tmp_path))
    assert set(out) == {"candles", "trades"}
    assert out["trades"].collect()[0]["notional"] == 20.0


def test_source_router_csv_and_db_validation(spark, tmp_path, monkeypatch):
    # S12: csv route reads through the tolerant klines reader; db route
    # without a url must fail fast (no database in this environment).
    import pytest
    from kp_crypto_market_analytics_spark.sources.jdbc import load_candles

    p = tmp_path / "klines_BTCUSDT_1m.csv"
    p.write_text(
        "open_time,open,high,low,close,volume,num_trades\n"
        "1704067200000,1.0,2.0,0.5,1.5,10.0,3\n"
    )
    monkeypatch.setenv("DATA_SOURCE", "csv")
    df = load_candles(spark, csv_glob=str(tmp_path / "klines_*.csv"))
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["symbol"] == "BTCUSDT"

    monkeypatch.setenv("DATA_SOURCE", "db")
    with pytest.raises(ValueError, match="jdbc_url"):
        load_candles(spark, csv_glob=str(p))


def test_readers_conform_to_canonical_schemas(spark, tmp_path):
    # sources/ readers must land on the canonical schemas (schemas.py =
    # db/schema.sql re-typed): same column names, compatible types, and
    # the documented upsert keys present.
    from kp_crypto_market_analytics_spark import schemas
    from kp_crypto_market_analytics_spark.sources.files import (
        read_klines_csv,
        read_trades_csv,
    )

    k = tmp_path / "klines_BTCUSDT_1m.csv"
    k.write_text(
        "open_time,open,high,low,close,volume,trade_count\n"
        "1704067200000,1.0,2.0,0.5,1.5,10.0,3\n"
    )
    kl = read_klines_csv(spark, str(tmp_path / "klines_*.csv"))
    canonical = [f.name for f in schemas.CANDLES_SCHEMA.fields]
    assert [c for c in kl.columns] == canonical
    assert set(schemas.CANDLES_KEY) <= set(kl.columns)

    t = tmp_path / "trades_BTCUSDT.csv"
    t.write_text(
        "symbol,trade_id,price,qty,quote_qty,trade_time,is_buyer_maker,is_best_match\n"
        "BTCUSDT,1,100.0,0.5,50.0,2024-01-01 00:00:00,true,false\n"
    )
    tr = read_trades_csv(spark, str(t))
    trade_cols = {f.name for f in schemas.TRADES_SCHEMA.fields}
    assert set(schemas.TRADES_KEY) <= set(tr.columns) <= trade_cols | {"notional"}


def test_read_documents_jsonl_quarantines_malformed(spark, tmp_path):
    # PERMISSIVE JSONL scan: valid lines parse to the documents schema,
    # malformed lines land in the quarantine side with their raw text —
    # never dropped, never fatal.
    from kp_crypto_market_analytics_spark.sources.files import read_documents_jsonl

    p = tmp_path / "dump.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}\n'
        '{"doc_id": 2, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}\n'
        "{this is not json at all\n"
        '{"doc_id": 3, "text": "fine", "lang": "en", "source": "web", "n_chars": 4}\n'
    )
    good, bad = read_documents_jsonl(spark, str(p))
    g = good.orderBy("doc_id").collect()
    assert [r.doc_id for r in g] == [1, 2, 3]
    assert g[0].text == "hello world"
    b = bad.collect()
    assert len(b) == 1
    assert "not json" in b[0].raw_line


def test_paged_klines_stitch_no_gap_no_dup(spark, monkeypatch):
    # S2 pagination: the reference silently truncates any range to
    # 1000 candles per request (api.py:49,66-72).  The pager must walk
    # the range in page_limit-sized requests and stitch WITHOUT gaps
    # or duplicates across every page seam.
    from kp_crypto_market_analytics_spark.sources.binance import (
        fetch_klines_paged,
        tf_to_ms,
    )

    monkeypatch.setenv("OFFLINE_KLINES_TOTAL", "2537")
    start = 1_700_000_000_000
    df = fetch_klines_paged(
        spark, "BTCUSDT", "1m", start_ms=start, page_limit=1000
    )
    rows = df.orderBy("open_time").collect()
    assert len(rows) == 2537  # 3 pages: 1000 + 1000 + 537
    import datetime as dt

    ms = [int(r["open_time"].replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
          for r in rows]
    assert ms[0] == start
    step = tf_to_ms("1m")
    assert all(b - a == step for a, b in zip(ms, ms[1:]))  # no gap, no dup
    assert rows[0]["symbol"] == "BTCUSDT" and rows[0]["close"] == 1.0


def test_paged_klines_respects_end_and_tf(spark, monkeypatch):
    from kp_crypto_market_analytics_spark.sources.binance import (
        fetch_klines_paged,
        tf_to_ms,
    )

    monkeypatch.setenv("OFFLINE_KLINES_TOTAL", "500")
    start = 1_700_000_000_000
    step = tf_to_ms("1h")
    # end bound cuts the walk mid-history: only candles <= end survive
    end = start + 49 * step
    df = fetch_klines_paged(
        spark, "ETHUSDT", "1h", start_ms=start, end_ms=end, page_limit=20
    )
    assert df.count() == 50
    assert tf_to_ms("1w") == 7 * 24 * 3_600_000
    # defaulting total (10) preserves the reference fixture's shape
    monkeypatch.delenv("OFFLINE_KLINES_TOTAL")
    assert fetch_klines_paged(spark, "BTCUSDT", "1m", start_ms=start).count() == 10


def test_write_single_csv_file_round_trip(spark, tmp_path, monkeypatch):
    # The Spark single-file CSV write replaces the driver-side
    # toPandas edge: a paged >1000-row fetch must round-trip through
    # the tolerant klines scan with nothing lost.
    from kp_crypto_market_analytics_spark.sinks.artifacts import (
        write_single_csv_file,
    )
    from kp_crypto_market_analytics_spark.sources.binance import (
        fetch_klines_paged,
    )
    from kp_crypto_market_analytics_spark.sources.files import read_klines_csv

    monkeypatch.setenv("OFFLINE_KLINES_TOTAL", "1205")
    df = fetch_klines_paged(
        spark, "BTCUSDT", "1m", start_ms=1_700_000_000_000, page_limit=1000
    )
    path = str(tmp_path / "klines_BTCUSDT_1m.csv")
    write_single_csv_file(df, path)
    with open(path) as f:
        assert sum(1 for _ in f) == 1206  # header + every candle
    back = read_klines_csv(spark, path)
    assert back.count() == 1205
    assert back.where("symbol = 'BTCUSDT'").count() == 1205
    assert back.agg({"open_time": "min"}).collect()[0][0] is not None
