"""Tolerant file scans (SURVEY.md §2.1 S9-S12, §1.3 normalization).

The reference's ingest boundary is defensive: candidate column names,
two time encodings, symbol/tf inferred from filenames.  Re-expressed as
pure DataFrame transforms over a globbed CSV scan — glob + union +
input_file_name() are built in, so the per-file pandas loop
(binance_analysis.py:93-146) collapses into ONE distributed scan.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.functions.market import heuristic_time_parse

# Candidate spellings for the trades-count column (load_postgres.py:38-49).
TRADES_COL_CANDIDATES = ["trades", "num_trades", "trade_count", "count"]
# Candidate time columns (binance_analysis.py:361-368; orderbook :467-472).
TIME_COL_CANDIDATES = ["timestamp", "trade_time", "ts", "open_time", "update_time"]


def coalesce_candidates(df: DataFrame, candidates: list[str], default=None) -> Column:
    """P2 — first existing candidate column, else a literal default
    (load_postgres.py:38-49 resolves trades/num_trades/trade_count/count
    → 0)."""
    present = [c for c in candidates if c in df.columns]
    if not present:
        return F.lit(default)
    # The default participates in the coalesce: a multi-file glob scan
    # parses files lacking the column as nulls (global CSV schema), and
    # those rows must still get the default — per-row, not per-frame.
    cols = [F.col(c) for c in present]
    if default is not None:
        cols.append(F.lit(default))
    return F.coalesce(*cols) if len(cols) > 1 else cols[0]


def infer_from_filename(pattern: str = r"klines_([A-Z0-9]+)_(\w+)\.csv") -> tuple[Column, Column]:
    """F12 — (symbol, tf) parsed from the input file name
    (klines_{SYMBOL}_{TF}.csv — load_postgres.py:21-23,
    binance_analysis.py:75-90).  input_file_name() is evaluated
    per-split inside the scan, so inference is free."""
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return (
        F.regexp_extract(fname, pattern, 1),
        F.regexp_extract(fname, pattern, 2),
    )


def read_klines_csv(spark: SparkSession, glob_path: str, default_tf: str = "1m") -> DataFrame:
    """S9 — tolerant multi-file klines scan: one glob read, per-row
    normalization (the reference loops files in pandas,
    binance_analysis.py:93-146):

    - symbol/tf: column if present else filename inference (F12);
    - open_time: ms-epoch or ISO heuristic parse (F2);
    - numeric cols: null-on-error casts (P3);
    - trades count: candidate coalesce, default 0 (P2).
    """
    df = spark.read.csv(glob_path, header=True, inferSchema=False)
    sym_f, tf_f = infer_from_filename()
    symbol = F.col("symbol") if "symbol" in df.columns else sym_f
    tf = F.col("tf") if "tf" in df.columns else F.when(tf_f != "", tf_f).otherwise(F.lit(default_tf))
    out = df.select(
        symbol.alias("symbol"),
        tf.alias("tf"),
        heuristic_time_parse("open_time").alias("open_time"),
        *[F.col(c).try_cast("double").alias(c) for c in ["open", "high", "low", "close", "volume"] if c in df.columns],
        coalesce_candidates(df, TRADES_COL_CANDIDATES, 0).try_cast("int").alias("num_trades"),
    )
    return out.na.drop(subset=["open_time"])


def read_trades_csv(spark: SparkSession, glob_path: str) -> DataFrame:
    """S10 — trades scan with time-column candidates and null-tolerant
    numerics (binance_analysis.py:355-376)."""
    df = spark.read.csv(glob_path, header=True, inferSchema=False)
    sym_f, _ = infer_from_filename(r"trades_([A-Z0-9]+)\.csv")
    symbol = F.col("symbol") if "symbol" in df.columns else sym_f
    ts = coalesce_candidates(df, [c for c in TIME_COL_CANDIDATES if c in df.columns] or ["trade_time"])
    out = df.select(
        symbol.alias("symbol"),
        F.col("trade_id").try_cast("long").alias("trade_id") if "trade_id" in df.columns else F.lit(None).cast("long").alias("trade_id"),
        F.col("price").try_cast("double").alias("price"),
        F.col("qty").try_cast("double").alias("qty"),
        heuristic_time_parse(ts).alias("trade_time"),
        (F.col("price").try_cast("double") * F.col("qty").try_cast("double")).alias("notional"),
    )
    return out.na.drop(subset=["trade_time", "price", "qty"])


def read_orderbook_csv(spark: SparkSession, glob_path: str) -> DataFrame:
    """S10/P6/F11/W4-prep — orderbook scan: side normalized with
    lower(trim) and filtered to bid/ask (binance_analysis.py:483-486);
    level synthesized later by ranking when absent (:489-497)."""
    df = spark.read.csv(glob_path, header=True, inferSchema=False)
    sym_f, _ = infer_from_filename(r"orderbook_([A-Z0-9]+)\.csv")
    symbol = F.col("symbol") if "symbol" in df.columns else sym_f
    ts = coalesce_candidates(df, [c for c in ("timestamp", "update_time") if c in df.columns] or ["update_time"])
    out = df.select(
        symbol.alias("symbol"),
        F.col("price").try_cast("double").alias("price"),
        F.col("qty").try_cast("double").alias("qty"),
        F.lower(F.trim(F.col("side"))).alias("side"),
        F.col("update_id").try_cast("long").alias("update_id") if "update_id" in df.columns else F.lit(0).cast("long").alias("update_id"),
        heuristic_time_parse(ts).alias("update_time"),
    )
    return out.where(F.col("side").isin("bid", "ask")).na.drop(subset=["price", "qty"])


def route_files(spark: SparkSession, data_dir: str) -> dict[str, DataFrame]:
    """S12/P10 — source router: dispatch files by name substring to the
    right tolerant reader (load_all.py:42-79; DATA_SOURCE switch
    binance_analysis.py:198-206 is the csv-vs-jdbc analog)."""
    out: dict[str, DataFrame] = {}
    if any(f.startswith("klines_") for f in os.listdir(data_dir)):
        out["candles"] = read_klines_csv(spark, os.path.join(data_dir, "klines_*.csv"))
    if any(f.startswith("trades_") for f in os.listdir(data_dir)):
        out["trades"] = read_trades_csv(spark, os.path.join(data_dir, "trades_*.csv"))
    if any(f.startswith("orderbook_") for f in os.listdir(data_dir)):
        out["order_books"] = read_orderbook_csv(spark, os.path.join(data_dir, "orderbook_*.csv"))
    return out


def read_documents_jsonl(
    spark: SparkSession, glob_path: str
) -> tuple[DataFrame, DataFrame]:
    """Tolerant JSON-Lines corpus scan — the arrival format of public
    text dumps, read with S9's tolerant-scan semantics: an EXPLICIT
    schema (inference would cost a second full pass over 100 TB) in
    PERMISSIVE mode, malformed lines captured into a quarantine column
    instead of failing the job.  Returns (good, quarantined): good rows
    match the driver `documents` schema; quarantined rows keep the raw
    line for a replay/repair pass — dropping them silently is how
    corpora lose documents unnoticed.

    Spark subtlety: a filter referencing ONLY the corrupt-record column
    is rejected by the analyzer on an unpersisted scan, so the split
    projects the corrupt column alongside the data columns first."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(glob_path)
        .select("doc_id", "text", "lang", "source", "n_chars", "_corrupt_record")
    )
    good = raw.where(F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull()).drop(
        "_corrupt_record"
    )
    bad = raw.where(
        F.col("_corrupt_record").isNotNull() | F.col("doc_id").isNull()
    ).select(
        F.coalesce(
            "_corrupt_record",
            # Structurally-valid line with a null key: re-serialize ALL
            # parsed fields so the repair pass loses nothing.
            F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars")),
        ).alias("raw_line")
    )
    return good, bad
