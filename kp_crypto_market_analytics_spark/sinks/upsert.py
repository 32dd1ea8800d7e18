"""Key-based upsert sink (SURVEY.md §2.1 S14, J5).

The reference's `INSERT … ON CONFLICT DO UPDATE` (load_postgres.py:
83-103, generic load_all.py:29-34) gives idempotent re-ingest with
last-write-wins on the PK.  Without Delta in this environment, the
same semantics over plain parquet:

    merged = union(target, staged) → row_number() over PK ordered by
    (version desc) → keep rn=1 → swap of the affected directories.

Staged rows outrank existing rows at equal version (EXCLUDED.* wins,
load_postgres.py:95-101).

Scale: when the table is partitioned, the merge is PARTITION-SCOPED —
only partitions that contain staged keys are read, merged, and swapped;
untouched partition directories are never rewritten, so per-batch write
amplification is O(touched partitions), not O(table).  At 100 TB this
is Delta/Iceberg `MERGE INTO` — same logical plan, plus file-skipping
on PK ranges; the `merge_into` signature is deliberately MERGE-shaped
so swapping the backend is a one-line change.  For streaming, pass
``upsert_foreach_batch`` to ``writeStream.foreachBatch``.

The directory-swap commit below is per-directory-atomic only and needs
POSIX rename; ``sinks/manifest_table.py`` provides the object-store-safe
commit (immutable data dirs + single-file manifest publish, multi-
partition all-or-nothing) with the same merge semantics — prefer it for
any deployment where readers race writers or storage is an object store.
"""

from __future__ import annotations

import functools
import operator
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
    staged-beats-target).

    With ``partition_by`` and an existing target, only the partitions
    present in ``staged`` are merged and replaced (see module doc).
    The partition columns must be functionally determined by the merge
    key (true for the reference PK layouts — e.g. PK (symbol, tf,
    open_time) partitioned by symbol or date(open_time)); otherwise a
    key whose new row lands in a different partition could leave its
    old row behind in an untouched directory."""
    if partition_by and os.path.exists(target_path):
        _merge_touched_partitions(
            spark, target_path, staged, key, version_col, partition_by
        )
        return
    staged = staged.withColumn("__src", F.lit(1))
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path).withColumn("__src", F.lit(0))
        merged = target.unionByName(staged)
    else:
        merged = staged
    _atomic_overwrite(spark, _pick_winners(merged, key, version_col), target_path, partition_by)


def _pick_winners(merged: DataFrame, key: list[str], version_col: str | None) -> DataFrame:
    """ON CONFLICT winner per key: highest version, staged over target
    at equal version (EXCLUDED.* wins, load_postgres.py:95-101)."""
    order = [F.col("__src").desc()]
    if version_col:
        order = [F.col(version_col).desc(), *order]
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def _merge_touched_partitions(
    spark: SparkSession,
    target_path: str,
    staged: DataFrame,
    key: list[str],
    version_col: str | None,
    partition_by: list[str],
) -> None:
    """Partition-scoped merge: read only the target partitions whose
    values appear in ``staged`` (static partition pruning via an
    OR-of-equalities predicate), merge, write them to a temp dir, and
    swap just those directories.  The collect below is bounded by the
    number of touched partitions in the batch (a few symbols/dates),
    never by row count."""
    touched = [tuple(r) for r in staged.select(*partition_by).distinct().collect()]
    if not touched:
        return
    clauses = [
        functools.reduce(
            operator.and_,
            [F.col(c).eqNullSafe(F.lit(v)) for c, v in zip(partition_by, vals)],
        )
        for vals in touched
    ]
    pred = functools.reduce(operator.or_, clauses)
    target = spark.read.parquet(target_path).where(pred).withColumn("__src", F.lit(0))
    merged = target.unionByName(staged.withColumn("__src", F.lit(1)))
    dedup = _pick_winners(merged, key, version_col)
    tmp = f"{target_path}__tmp_{uuid.uuid4().hex[:8]}"
    dedup.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    _swap_partition_dirs(tmp, target_path, depth=len(partition_by))


def _swap_partition_dirs(tmp: str, target: str, depth: int) -> None:
    """Swap each leaf partition directory produced under ``tmp`` into
    ``target`` (rename out, rename in, clean up).  Each swap is an
    atomic rename; the batch of swaps is not globally atomic — that is
    the honest plain-parquet limit (Delta's log is the real fix)."""
    olds: list[str] = []
    for rel in _leaf_partition_dirs(tmp, depth):
        dst = os.path.join(target, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.exists(dst):
            old = f"{dst}__old_{uuid.uuid4().hex[:8]}"
            os.rename(dst, old)
            olds.append(old)
        os.rename(os.path.join(tmp, rel), dst)
    for old in olds:
        shutil.rmtree(old)
    shutil.rmtree(tmp)


def _leaf_partition_dirs(root: str, depth: int) -> list[str]:
    """Relative paths of the ``col=value`` leaf dirs ``depth`` levels
    under ``root`` (Spark's own encoding — never re-derive dir names
    from values)."""
    rels = [""]
    for _ in range(depth):
        nxt = []
        for rel in rels:
            base = os.path.join(root, rel)
            for name in sorted(os.listdir(base)):
                if "=" in name and os.path.isdir(os.path.join(base, name)):
                    nxt.append(os.path.join(rel, name) if rel else name)
        rels = nxt
    return rels


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


def upsert_foreach_batch(
    target_path: str,
    key: list[str],
    version_col: str | None = None,
    partition_by: list[str] | None = None,
):
    """Streaming adapter: `df.writeStream.foreachBatch(upsert_foreach_batch(...))`
    — each micro-batch merges idempotently, so replays after checkpoint
    recovery do not duplicate (the streaming twin of S14 idempotence).
    With ``partition_by``, each micro-batch rewrites only its touched
    partitions — per-batch cost stays O(batch), not O(table)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into(
            batch_df.sparkSession, target_path, batch_df, key, version_col, partition_by
        )

    return _apply
