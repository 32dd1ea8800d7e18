"""JDBC source + source router (SURVEY.md §2.1 S11/S12).

The reference pulls candles from PostgreSQL with the tf/symbol filter
and ORDER BY pushed into SQL (binance_analysis.py:148-195) and routes
csv-vs-db on the DATA_SOURCE env var (:198-206).  Spark's JDBC reader
gives the pushdown for free: filters on the returned DataFrame compile
into the remote WHERE clause (and with DSv2 aggregate pushdown, A1-style
aggregations run remotely too, matching metrics.py:15-28).

No PostgreSQL ships in this environment, but the scan path is
exercised against a REAL database: embedded Apache Derby (its jar
ships inside pyspark/jars) — tests/test_jdbc_roundtrip.py round-trips
write → read with the filter pushdown asserted from the executed plan
and the partitioned parallel scan counted.  On a cluster the target
engine's driver jar goes on the executor classpath (e.g. --jars
postgresql.jar).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_candles_jdbc(
    spark: SparkSession,
    url: str,
    table: str = "candles",
    tf: str | None = "1m",
    symbols: list[str] | None = None,
    partition_column: str | None = "open_time",
    num_partitions: int = 32,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S11 — JDBC scan with pushdown.  The tf/symbol filters are plain
    DataFrame filters; Catalyst pushes them into the generated remote
    query (the reference hand-writes WHERE tf=%s AND symbol=ANY(%s),
    :168-178).  ``partition_column`` splits the scan into parallel
    range-bounded queries — the JDBC analog of file splits; without it
    the whole table streams through one executor."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            # lower/upperBound are required with partitionColumn; callers
            # should override with real table bounds for even splits.
            .option("lowerBound", "2009-01-01 00:00:00")
            .option("upperBound", "2100-01-01 00:00:00")
        )
    df = reader.load()
    if tf is not None and "tf" in df.columns:
        df = df.where(F.col("tf") == tf)
    if symbols:
        df = df.where(F.col("symbol").isin(symbols))
    return df


def load_candles(
    spark: SparkSession,
    csv_glob: str | None = None,
    jdbc_url: str | None = None,
    **jdbc_kwargs,
) -> DataFrame:
    """S12 — source router: DATA_SOURCE=csv|db (reference :198-206),
    falling back to csv.  Returns the normalized candle DataFrame from
    whichever backend is selected."""
    source = os.environ.get("DATA_SOURCE", "csv").strip().lower()
    if source == "db":
        if not jdbc_url:
            raise ValueError("DATA_SOURCE=db requires jdbc_url")
        return read_candles_jdbc(spark, jdbc_url, **jdbc_kwargs)
    from kp_crypto_market_analytics_spark.sources.files import read_klines_csv

    if not csv_glob:
        raise ValueError("DATA_SOURCE=csv requires csv_glob")
    return read_klines_csv(spark, csv_glob)
