"""REAL-database round-trips for S11 (JDBC scan w/ pushdown) and
S14-W (JDBC upsert write-back) — closing the last fake-tested
operators.

No PostgreSQL ships in this container, but two real engines do:

- Apache Derby (embedded, ships in pyspark/jars, runs inside the
  Spark JVM): exercises the ACTUAL ``spark.read.format("jdbc")``
  scan path of ``read_candles_jdbc`` — remote CREATE/INSERT via
  Spark's JDBC writer, filter pushdown asserted from the executed
  plan, partitioned parallel reads, and the ``merge``-dialect
  upsert statement accepted and applied by a real SQL engine.
- DuckDB (Python DB-API with ON CONFLICT): exercises the ACTUAL
  executor-side ``foreachPartition`` protocol of
  ``write_jdbc_upsert`` — real connections, real executemany, real
  ON CONFLICT conflict resolution, idempotence and last-write-wins
  verified by reading the database back.

Reference parity: src/analytics/metrics.py:14-29 (pushdown scan),
src/etl/load_postgres.py:83-103 (ON CONFLICT upsert).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _derby_url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def _candles(spark):
    rows = [
        ("BTCUSDT", "1m", "2024-01-01 00:00:00", 100.0, 10.0),
        ("BTCUSDT", "1m", "2024-01-01 00:01:00", 101.0, 11.0),
        ("BTCUSDT", "5m", "2024-01-01 00:00:00", 100.5, 50.0),
        ("ETHUSDT", "1m", "2024-01-01 00:00:00", 50.0, 5.0),
    ]
    return spark.createDataFrame(
        rows, ["symbol", "tf", "ot", "close", "volume"]
    ).select(
        "symbol",
        "tf",
        F.to_timestamp("ot").alias("open_time"),
        "close",
        "volume",
    )


def _write_candles(spark, url: str) -> None:
    # Spark's generic JDBC dialect maps StringType to CLOB on Derby,
    # and Derby cannot compare CLOB against literals — pin VARCHAR so
    # the pushed-down filters are executable remotely (the same column
    # typing a production DDL would carry).
    (
        _candles(spark)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "candles")
        .option(
            "createTableColumnTypes", "symbol VARCHAR(16), tf VARCHAR(4)"
        )
        .mode("append")
        .save()
    )


def test_derby_scan_roundtrip_and_pushdown(spark, tmp_path):
    """read_candles_jdbc against a REAL database: rows survive the
    round-trip and the tf/symbol filters compile into the remote scan
    (PushedFilters in the executed plan), so the database — not Spark
    — does the filtering, exactly the reference's hand-written WHERE
    (binance_analysis.py:168-178)."""
    from kp_crypto_market_analytics_spark.sources.jdbc import (
        read_candles_jdbc,
    )

    url = _derby_url(tmp_path, "scan")
    _write_candles(spark, url)

    got = read_candles_jdbc(
        spark, url, tf="1m", symbols=["BTCUSDT"], partition_column=None
    )
    rows = got.collect()
    assert len(rows) == 2
    assert {(r["symbol"], r["tf"]) for r in rows} == {("BTCUSDT", "1m")}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan
    assert "tf" in plan.split("PushedFilters:")[1][:200]


def test_derby_partitioned_parallel_scan(spark, tmp_path):
    """partition_column splits the remote scan into range-bounded
    parallel queries — the JDBC analog of file splits; every row
    arrives exactly once across the partition queries."""
    from kp_crypto_market_analytics_spark.sources.jdbc import (
        read_candles_jdbc,
    )

    url = _derby_url(tmp_path, "part")
    _write_candles(spark, url)

    got = read_candles_jdbc(
        spark,
        url,
        tf=None,
        symbols=None,
        partition_column="open_time",
        num_partitions=4,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 4


def test_derby_staged_merge_upsert_applies(spark, tmp_path):
    """S13+S14 against a REAL MERGE engine: each batch is bulk-staged
    through Spark's parallel JDBC writer, then ONE set-oriented
    MERGE (merge_from_staging_statement) upserts it into the target —
    the reference's stage-then-upsert loader shape
    (load_postgres.py:66-103).  Second batch updates matched keys and
    inserts new ones; replaying a batch is a no-op (idempotent)."""
    from kp_crypto_market_analytics_spark.sinks.jdbc import (
        merge_from_staging_statement,
    )

    url = _derby_url(tmp_path, "merge")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    # Derby canonicalizes unquoted identifiers to UPPERCASE while
    # Spark's JDBC writer QUOTES the frame's column names verbatim —
    # uppercase names keep both sides pointing at the same columns.
    stmt = merge_from_staging_statement(
        "c", "stage", ["SYMBOL", "TF", "CLOSE_P"], ["SYMBOL", "TF"]
    )

    def read_target():
        rs = conn.createStatement().executeQuery(
            "SELECT symbol, close_p FROM c ORDER BY symbol"
        )
        got = {}
        while rs.next():
            got[rs.getString(1)] = rs.getDouble(2)
        return got

    def stage_and_merge(rows):
        (
            spark.createDataFrame(rows, ["SYMBOL", "TF", "CLOSE_P"])
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", "stage")
            .option(
                "createTableColumnTypes",
                "SYMBOL VARCHAR(16), TF VARCHAR(4)",
            )
            .mode("overwrite")
            .option("truncate", "true")
            .save()
        )
        conn.createStatement().executeUpdate(stmt)

    try:
        conn.createStatement().execute(
            "CREATE TABLE c (symbol VARCHAR(16) NOT NULL, "
            "tf VARCHAR(4) NOT NULL, close_p DOUBLE, "
            "PRIMARY KEY (symbol, tf))"
        )
        first = [("BTCUSDT", "1m", 100.0), ("ETHUSDT", "1m", 50.0)]
        stage_and_merge(first)
        assert read_target() == {"BTCUSDT": 100.0, "ETHUSDT": 50.0}
        stage_and_merge(first)  # idempotent replay
        assert read_target() == {"BTCUSDT": 100.0, "ETHUSDT": 50.0}
        stage_and_merge(
            [("BTCUSDT", "1m", 105.0), ("SOLUSDT", "1m", 20.0)]
        )
        got = read_target()
    finally:
        conn.close()
    assert got == {"BTCUSDT": 105.0, "ETHUSDT": 50.0, "SOLUSDT": 20.0}


def test_jdbc_upsert_roundtrip_duckdb(spark, tmp_path):
    """write_jdbc_upsert's REAL executor protocol against a real
    DB-API database with ON CONFLICT: per-partition connection,
    executemany batches, commit — then idempotent replay and a
    last-write-wins second load, all verified by reading the database
    back.  (coalesce(1): DuckDB permits one writer process; the
    protocol per partition is identical.)"""
    import duckdb

    from kp_crypto_market_analytics_spark.sinks.jdbc import (
        write_jdbc_upsert,
    )

    duck_path = str(tmp_path / "upsert.duckdb")

    # nested closure: cloudpickle ships it BY VALUE to the executors
    # (the test module itself is not importable on workers)
    def factory(path=duck_path):
        import duckdb

        return duckdb.connect(path)

    con = duckdb.connect(duck_path)
    con.execute(
        "CREATE TABLE candles (symbol VARCHAR, tf VARCHAR, close_p DOUBLE,"
        " PRIMARY KEY (symbol, tf))"
    )
    con.close()

    def load(rows):
        df = spark.createDataFrame(
            rows, ["symbol", "tf", "close_p"]
        ).coalesce(1)
        write_jdbc_upsert(
            df, "candles", ["symbol", "tf"], factory,
            dialect="postgres", placeholder="?",
        )

    first = [("BTCUSDT", "1m", 100.0), ("ETHUSDT", "1m", 50.0)]
    load(first)
    load(first)  # idempotent replay: task-retry safety
    load([("BTCUSDT", "1m", 107.0), ("SOLUSDT", "1m", 20.0)])  # LWW

    con = duckdb.connect(duck_path)
    got = dict(
        con.execute("SELECT symbol, close_p FROM candles").fetchall()
    )
    con.close()
    assert got == {"BTCUSDT": 107.0, "ETHUSDT": 50.0, "SOLUSDT": 20.0}
