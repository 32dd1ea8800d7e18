"""Key-based upsert sink (SURVEY.md §2.1 S14, J5).

The reference's `INSERT … ON CONFLICT DO UPDATE` (load_postgres.py:
83-103, generic load_all.py:29-34) gives idempotent re-ingest with
last-write-wins on the PK.  Without Delta in this environment, the
same semantics over plain parquet:

    merged = union(target, staged) → row_number() over PK ordered by
    (version desc) → keep rn=1 → atomic swap of the table directory.

Staged rows outrank existing rows at equal version (EXCLUDED.* wins,
load_postgres.py:95-101).  At 100 TB this is Delta/Iceberg `MERGE
INTO` — same logical plan, plus file-skipping on PK ranges; the
`merge_into` signature is deliberately MERGE-shaped so swapping the
backend is a one-line change.  For streaming, pass
``upsert_foreach_batch`` to ``writeStream.foreachBatch``.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_into(
    spark: SparkSession,
    target_path: str,
    staged: DataFrame,
    key: list[str],
    version_col: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Upsert ``staged`` into the parquet table at ``target_path`` on
    ``key`` (last write wins; ``version_col`` orders writes, else
    staged-beats-target)."""
    staged = staged.withColumn("__src", F.lit(1))
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path).withColumn("__src", F.lit(0))
        merged = target.unionByName(staged)
    else:
        merged = staged
    order = [F.col("__src").desc()]
    if version_col:
        order = [F.col(version_col).desc(), *order]
    w = Window.partitionBy(*key).orderBy(*order)
    dedup = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    _atomic_overwrite(spark, dedup, target_path, partition_by)


def _atomic_overwrite(
    spark: SparkSession, df: DataFrame, path: str, partition_by: list[str] | None
) -> None:
    """Write to a temp dir then swap — readers never observe a partial
    table.  (Delta gets this from the transaction log; plain parquet
    needs the rename dance.)"""
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def upsert_foreach_batch(target_path: str, key: list[str], version_col: str | None = None):
    """Streaming adapter: `df.writeStream.foreachBatch(upsert_foreach_batch(...))`
    — each micro-batch merges idempotently, so replays after checkpoint
    recovery do not duplicate (the streaming twin of S14 idempotence)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into(batch_df.sparkSession, target_path, batch_df, key, version_col)

    return _apply
