"""Artifact sinks (SURVEY.md §2.1 S15-S16): the CSV/JSON summary files
the reference's analytics stage publishes for the dashboard
(binance_analysis.py:623,652,667,672,684,687; app.py reads them back).

Engine-side the canonical sink is partitioned parquet
(write_partitioned); CSV/JSON variants exist for dashboard-compat.
Small aggregate tables coalesce to one file (they are KB-sized by
construction — never do this to a fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Fact-table sink: partitioned parquet → partition pruning for
    every downstream time/symbol filter (SURVEY §4: partition by
    symbol/tf/date)."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def write_csv_artifact(df: DataFrame, path: str) -> None:
    """S16 — small summary CSV (single file, headered)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def write_json_artifact(df: DataFrame, path: str) -> None:
    """S15 — JSON artifact (one object per line)."""
    df.coalesce(1).write.mode("overwrite").json(path)


def summary_row_json(df: DataFrame) -> str:
    """F15 — single-row summary as a JSON string (json.dumps(dict)
    analog, binance_analysis.py:71-72) without collecting more than
    one row to the driver."""
    row = df.limit(1).select(F.to_json(F.struct(*df.columns)).alias("j")).collect()
    return row[0]["j"] if row else "{}"
