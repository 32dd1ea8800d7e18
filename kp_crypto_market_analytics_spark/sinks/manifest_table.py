"""Manifest-committed parquet table: object-store-safe upsert (S14 at scale).

The plain-parquet upsert in ``sinks/upsert.py`` swaps partition
directories with POSIX ``os.rename`` — each swap is atomic, but a batch
of swaps is not, and object stores have no atomic directory rename at
all.  This module removes both limits with the commit protocol every
production table format (Delta, Iceberg, Hudi) uses:

1. **Data is immutable and append-only.**  Each merge writes its output
   under a fresh, uniquely named commit directory
   (``data/<commit-id>/<part=val>/part-*.parquet``).  Nothing is ever
   renamed or overwritten — on an object store every operation is a PUT
   of a new key.
2. **The commit point is ONE small file.**  After the data lands, a
   manifest (``_manifests/manifest-<version>.json``) mapping each live
   partition to its current data directory is published.  Readers
   resolve the highest-numbered manifest and read exactly the
   directories it lists.  A writer crash before publish leaves only
   unreferenced orphan directories — readers never observe a
   half-merged table, no matter how many partitions the batch touched.
3. **Orphans are vacuumed, not trusted.**  ``vacuum`` deletes data
   directories no retained manifest references (failed commits, old
   versions), with retained history as the reader grace period.

Because data is immutable and manifests are versioned, two reader
features fall out for free (both tested):

- **Time travel** — ``read_table(version=N)`` resolves manifest N and
  reads the table exactly as it was at that commit, until vacuumed.
- **Data skipping** — ``merge_into(stats_cols=[...])`` records
  per-partition [min, max] in the manifest; ``read_table(where=(col,
  lo, hi))`` drops partitions whose range cannot intersect BEFORE the
  object-store LIST, then applies the predicate (Delta/Iceberg
  file-skipping, one level up).  Untouched partitions carry their
  stats forward; stats-less entries are conservatively scanned.
- **Change data feed** — ``read_changes(from_v, to_v)`` diffs two
  manifests: partitions with identical entries are skipped at the
  metadata tier, changed partitions are key-joined row-wise into
  insert/delete/update_preimage/update_postimage rows (Delta CDF
  parity) — incremental consumers pay for the change, not the table.

Atomicity of the publish itself: locally, write-temp + ``os.rename`` of
the single manifest file; on an object store the equivalent is one
conditional PUT (put-if-absent on the new manifest key), which S3/GCS/
ABFS all support natively — single-writer here, and the version-numbered
name means a lost race is detected, not silently merged.

Reference semantics: `INSERT … ON CONFLICT DO UPDATE` idempotent
re-ingest, load_postgres.py:83-103 — same last-write-wins merge as
``upsert.merge_into``, different (scale-safe) commit.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.sinks.upsert import (
    _leaf_partition_dirs,
    _pick_winners,
)

_MANIFEST_DIR = "_manifests"
_MANIFEST_RE = re.compile(r"manifest-(\d{10})\.json$")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"manifest-{version:010d}.json")


def manifest_versions(root: str) -> list[int]:
    """All published manifest versions, ascending.  One small-directory
    listing of one-per-commit files, never of the data tree."""
    mdir = os.path.join(root, _MANIFEST_DIR)
    versions = []
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            m = _MANIFEST_RE.fullmatch(name)
            if m:
                versions.append(int(m.group(1)))
    return sorted(versions)


def latest_manifest(root: str) -> tuple[int, dict]:
    """(version, manifest) of the newest published manifest, or (0, empty).

    Readers call this at plan time; the listing is of one small
    directory of one-per-commit files, never of the data tree.
    """
    versions = manifest_versions(root)
    if not versions:
        return 0, {"version": 0, "partition_by": [], "entries": {}}
    best = versions[-1]
    with open(_manifest_path(root, best)) as f:
        return best, json.load(f)


def _publish_manifest(root: str, version: int, manifest: dict) -> None:
    """THE commit point: one new small file, atomically visible.

    Local FS: temp file + rename.  Object store: conditional PUT of the
    new key (put-if-absent) — the rename below is the local stand-in.
    """
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    final = _manifest_path(root, version)
    if os.path.exists(final):  # lost a commit race: surface, never clobber
        raise FileExistsError(f"manifest version {version} already published: {final}")
    tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, final)


def manifest_at(root: str, version: int) -> dict:
    """Load a SPECIFIC manifest version (time travel).  Raises
    FileNotFoundError if that version was never published or has been
    vacuumed past the retention window."""
    path = _manifest_path(root, version)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"manifest version {version} not found (vacuumed or never published): {path}"
        )
    with open(path) as f:
        return json.load(f)


def _prune_entries(
    manifest: dict, where: tuple[str, object, object] | None
) -> dict[str, str]:
    """Data skipping: drop entries whose recorded [min, max] for the
    predicate column cannot intersect [lo, hi].  Entries without stats
    (older commits, un-tracked columns) are conservatively kept."""
    entries: dict[str, str] = manifest["entries"]
    if where is None:
        return entries
    col, lo, hi = where
    stats: dict[str, dict] = manifest.get("stats", {})
    kept = {}
    for part_rel, data_rel in entries.items():
        rng = stats.get(part_rel, {}).get(col)
        if rng is not None:
            if rng[0] is None:
                # Tracked and all-NULL: BETWEEN can match no row.
                continue
            if rng[0] > _stat_key(hi) or rng[1] < _stat_key(lo):
                continue
        kept[part_rel] = data_rel
    return kept


def read_table(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    where: tuple[str, object, object] | None = None,
) -> DataFrame | None:
    """Resolve a manifest and read exactly its live directories.

    Entries written by the same commit are read in one scan (shared
    ``basePath`` keeps hive-style partition columns); the number of
    unions equals the number of live commits, which compaction/vacuum
    keeps small — the plan never grows with partition count alone.
    Returns None for a table with no published manifest.

    ``version`` time-travels to a historical manifest (any retained
    version reads the table exactly as it was — data directories are
    immutable, so old manifests stay valid until vacuumed).

    ``where=(col, lo, hi)`` applies a BETWEEN predicate with manifest-
    level data skipping: partitions whose recorded [min, max] for
    ``col`` cannot intersect [lo, hi] are never listed or scanned (the
    Delta/Iceberg file-skipping pattern, one level up) — at 100 TB this
    prunes the object-store LIST as well as the read.  Result is
    identical to reading everything and filtering; stats-less entries
    are conservatively scanned.
    """
    manifest = (
        latest_manifest(root)[1] if version is None else manifest_at(root, version)
    )
    if not manifest["entries"]:
        return None
    entries = _prune_entries(manifest, where)
    if not entries:
        # Every partition pruned: keep one (its recorded range proves
        # the predicate matches none of its rows) so the caller gets an
        # EMPTY frame with the table schema — exactly what scan+filter
        # would yield.  A None here would make downstream behavior
        # depend on the data distribution.
        entries = dict(list(manifest["entries"].items())[:1])
    df = _union_entries(spark, root, entries)
    if where is not None:
        col, lo, hi = where
        if col not in df.columns:
            # Schema-evolution corner: every SURVIVING commit predates
            # the predicate column (rows there are null ⇒ excluded, but
            # the filter cannot even resolve, and dropping the column
            # from the result schema would diverge from scan+filter).
            # Fall back to the unpruned read — correctness and schema
            # stability over skipping, for this rare mix.
            df = _union_entries(spark, root, manifest["entries"])
        df = df.where(F.col(col).between(F.lit(lo), F.lit(hi)))
    return df


def _union_entries(spark: SparkSession, root: str, entries: dict[str, str]) -> DataFrame:
    by_commit: dict[str, list[str]] = {}
    for part_rel, data_rel in entries.items():
        commit_rel = data_rel if not part_rel else data_rel[: -len(part_rel) - 1]
        by_commit.setdefault(commit_rel, []).append(os.path.join(root, data_rel))
    frames = [
        spark.read.option("basePath", os.path.join(root, commit_rel)).parquet(*paths)
        for commit_rel, paths in sorted(by_commit.items())
    ]
    df = frames[0]
    for other in frames[1:]:
        # Commits written before a schema evolution are narrower;
        # null-fill their missing columns instead of failing the read.
        df = df.unionByName(other, allowMissingColumns=True)
    return df


def _stat_key(v):
    """JSON-comparable stat value: numbers (incl. Decimal) as numbers —
    a Decimal stored as a string would prune LEXICOGRAPHICALLY ("9" >
    "85") and silently drop matching partitions; everything else (str,
    timestamp, date) as its string form — ISO timestamp strings order
    lexicographically, so range pruning stays correct."""
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (int, float)):
        return v
    return str(v)


def _collect_stats(
    spark: SparkSession,
    root: str,
    commit_rel: str,
    partition_by: list[str],
    stats_cols: list[str],
) -> dict[str, dict]:
    """Per-partition-dir [min, max] of each stats column, computed from
    the data the commit actually wrote (one skinny agg over the fresh,
    page-cache-warm commit dir — never the whole table)."""
    commit_dir = os.path.join(root, commit_rel)
    df = spark.read.option("basePath", commit_dir).parquet(commit_dir)
    # An evolve_schema batch touching only NEW partitions can legally
    # write files missing a tracked column (no live rows to union with)
    # — skip those columns rather than failing the merge after the data
    # has landed; the stats-less entries are conservatively scanned.
    stats_cols = [c for c in stats_cols if c in df.columns]
    if not stats_cols:
        return {}
    # Row count rides along with every stats collection ("__rows" key)
    # so count(*) / per-partition counts answer from the manifest alone.
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in stats_cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    if partition_by:
        rows = df.groupBy(*partition_by).agg(*aggs).collect()
    else:
        rows = df.agg(*aggs).collect()
    out: dict[str, dict] = {}
    for r in rows:
        if partition_by:
            parts = []
            for c in partition_by:
                sval = "__HIVE_DEFAULT_PARTITION__" if r[c] is None else str(r[c])
                parts.append(f"{c}={_escape_path_name(sval)}")
            rel = os.path.join(*parts)
        else:
            rel = ""
        # A tracked-but-all-NULL column records [null, null] — readers
        # must distinguish "no non-null values here" (skippable) from
        # "this commit predates tracking this column" (key absent,
        # conservative).  Collapsing both to key-absent made
        # metadata_stats silently wrong after a stats_cols expansion.
        out[rel] = {
            c: [_stat_key(r[f"__mn_{c}"]), _stat_key(r[f"__mx_{c}"])]
            for c in stats_cols
        }
        out[rel]["__rows"] = int(r["__rows"])
    return out


def merge_into(
    spark: SparkSession,
    root: str,
    staged: DataFrame,
    key: list[str],
    version_col: str | None = None,
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    evolve_schema: bool = False,
) -> int:
    """Upsert ``staged`` into the manifest table at ``root`` (last write
    wins on ``key``; see upsert.merge_into for the merge semantics and
    the partition/key functional-dependency requirement).

    Partition-scoped: only partitions present in ``staged`` are read,
    merged, and re-pointed in the new manifest; untouched partitions
    keep their existing data directories byte-for-byte.  Returns the
    published manifest version.

    ``stats_cols`` records per-partition [min, max] of the named
    columns in the manifest for reader-side data skipping
    (``read_table(where=...)``); once set it sticks for the table —
    later merges refresh stats for the partitions they touch and carry
    untouched partitions' stats forward unchanged.

    ``evolve_schema=True`` lets the staged batch ADD columns: live rows
    merge with nulls in the new columns, and a staged batch missing an
    existing column null-fills it for the keys it rewrites (the
    add-column semantics of Delta's mergeSchema).  Untouched
    partitions keep their narrower files; readers union with
    allowMissingColumns, so historical commits stay readable without
    rewrite.  Default (False) keeps the strict-schema error.
    """
    partition_by = partition_by or []
    cur_version, manifest = latest_manifest(root)
    entries = dict(manifest["entries"])
    stats = dict(manifest.get("stats", {}))
    stats_cols = list(stats_cols or manifest.get("stats_cols", []))
    if entries and manifest.get("partition_by", []) != partition_by:
        raise ValueError(
            f"table partitioned by {manifest['partition_by']}, got {partition_by}"
        )

    commit_id = uuid.uuid4().hex[:12]
    commit_rel = os.path.join("data", commit_id)
    commit_dir = os.path.join(root, commit_rel)

    if partition_by:
        touched_rels = _touched_partition_rels(staged, partition_by)
        touched_live = {rel: entries[rel] for rel in touched_rels if rel in entries}
        if touched_live:
            # Static pruning for free: only the touched dirs are listed.
            old = _union_entries(spark, root, touched_live)
            merged = old.withColumn("__src", F.lit(0)).unionByName(
                staged.withColumn("__src", F.lit(1)),
                allowMissingColumns=evolve_schema,
            )
        else:
            merged = staged.withColumn("__src", F.lit(1))
        winners = _pick_winners(merged, key, version_col)
        winners.write.mode("errorifexists").partitionBy(*partition_by).parquet(commit_dir)
        # Spark's writer is the source of truth for hive dir encoding:
        # record what it actually wrote.  A written dir our derivation
        # did not predict means the matching LIVE entry was not
        # pre-merged (escaping drift) — fail loudly, never publish a
        # manifest with the same key live in two directories.
        written = set(_leaf_partition_dirs(commit_dir, len(partition_by)))
        unexpected = written - set(touched_rels)
        if unexpected:
            raise RuntimeError(
                f"partition-path escaping drift: writer produced {sorted(unexpected)} "
                f"but staged batch derived {touched_rels}"
            )
        for rel in written:
            entries[rel] = os.path.join(commit_rel, rel)
    else:
        old = _union_entries(spark, root, entries) if entries else None
        merged = (
            old.withColumn("__src", F.lit(0)).unionByName(
                staged.withColumn("__src", F.lit(1)),
                allowMissingColumns=evolve_schema,
            )
            if old is not None
            else staged.withColumn("__src", F.lit(1))
        )
        _pick_winners(merged, key, version_col).write.mode("errorifexists").parquet(
            commit_dir
        )
        entries = {"": commit_rel}

    if stats_cols:
        stats.update(_collect_stats(spark, root, commit_rel, partition_by, stats_cols))
        stats = {k: v for k, v in stats.items() if k in entries}
    new_version = cur_version + 1
    _publish_manifest(
        root,
        new_version,
        {
            "version": new_version,
            "partition_by": partition_by,
            "entries": entries,
            "stats": stats,
            "stats_cols": stats_cols,
            # Recorded so read_changes can diff versions row-wise
            # without the caller re-supplying the merge key.
            "key": list(key),
        },
    )
    return new_version


def _touched_partition_rels(staged: DataFrame, partition_by: list[str]) -> list[str]:
    """Hive-encoded relative dir per distinct staged partition tuple.

    Bounded by touched partitions per batch (symbols/dates), never rows.
    Encoding mirrors Spark's ``ExternalCatalogUtils.escapePathName``
    char set; ``merge_into`` cross-checks the prediction against the
    dirs the writer actually produced and aborts on drift.
    """
    rows = [tuple(r) for r in staged.select(*partition_by).distinct().collect()]
    rels = []
    for vals in rows:
        parts = []
        for col, val in zip(partition_by, vals):
            sval = "__HIVE_DEFAULT_PARTITION__" if val is None else str(val)
            parts.append(f"{col}={_escape_path_name(sval)}")
        rels.append(os.path.join(*parts))
    return sorted(rels)


# Spark ExternalCatalogUtils.charToEscape: control chars plus these.
_ESCAPED_CHARS = set('"#%\'*/:=?\\{[]^')


def _escape_path_name(value: str) -> str:
    out = []
    for ch in value:
        if ch in _ESCAPED_CHARS or ord(ch) < 0x20 or ord(ch) == 0x7F:
            out.append(f"%{ord(ch):02X}")
        else:
            out.append(ch)
    return "".join(out)


def delete_where(spark: SparkSession, root: str, condition: str) -> int | None:
    """Partition-scoped DELETE (Delta `DELETE FROM ... WHERE` parity,
    the GDPR/retention op): rewrite ONLY the partitions that contain
    matching rows, drop partitions the delete empties entirely, and
    publish a new manifest — untouched partitions keep their existing
    data directories byte-for-byte, and history still reads the
    pre-delete table via time travel until vacuumed.

    ``condition`` is a SQL boolean expression over the table columns.
    Returns the new manifest version, or None when nothing matched.
    """
    cur_version, manifest = latest_manifest(root)
    entries: dict[str, str] = dict(manifest["entries"])
    partition_by: list[str] = manifest.get("partition_by", [])
    stats = dict(manifest.get("stats", {}))
    stats_cols: list[str] = manifest.get("stats_cols", [])
    if not entries:
        return None
    df = _union_entries(spark, root, entries)
    match = df.where(F.expr(condition))
    if partition_by:
        touched_rels = _touched_partition_rels(match, partition_by)
    else:
        touched_rels = [""] if not match.isEmpty() else []
    if not touched_rels:
        return None

    # Same escaping/type-drift guard as merge_into: every matched row
    # came FROM a live partition, so a derived rel that is not a
    # manifest key means the hive-path round trip disagreed — abort
    # loudly instead of silently leaving matched rows live.
    missing = [rel for rel in touched_rels if rel not in entries]
    if missing:
        raise RuntimeError(
            f"partition-path escaping drift: matched rows derived {missing} "
            f"but the manifest has no such entries"
        )
    touched = {rel: entries[rel] for rel in touched_rels}
    keep_src = _union_entries(spark, root, touched)
    # Schema-evolution corner (same mix read_table handles): the
    # condition may reference a column every TOUCHED commit predates
    # even though the full-table union has it — null-fill it so the
    # filter resolves and the rewrite keeps the full table width.
    for field in df.schema.fields:
        if field.name not in keep_src.columns:
            keep_src = keep_src.withColumn(
                field.name, F.lit(None).cast(field.dataType)
            )
    # SQL DELETE semantics: rows where the condition is NULL are NOT
    # deleted — keep condition false OR NULL, drop only true.
    keep = keep_src.where(~F.coalesce(F.expr(condition), F.lit(False)))
    commit_id = uuid.uuid4().hex[:12]
    commit_rel = os.path.join("data", commit_id)
    commit_dir = os.path.join(root, commit_rel)
    writer = keep.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(commit_dir)

    # Partitions fully emptied by the delete produce no output dir and
    # leave the manifest; the rest re-point at the rewrite.
    for rel in touched_rels:
        entries.pop(rel, None)
        stats.pop(rel, None)
    if partition_by:
        written = _leaf_partition_dirs(commit_dir, len(partition_by))
    else:
        # The writer already materialized the answer — inspect the
        # written commit dir (an empty write may still emit an empty
        # part file) instead of recomputing the keep plan over the
        # source with a second scan.
        has_parts = any(
            name.startswith("part-") and name.endswith(".parquet")
            for name in os.listdir(commit_dir)
        )
        wrote_rows = has_parts and not spark.read.parquet(commit_dir).isEmpty()
        written = [""] if wrote_rows else []
    for rel in written:
        entries[rel] = os.path.join(commit_rel, rel) if rel else commit_rel
    if stats_cols and written:
        stats.update(_collect_stats(spark, root, commit_rel, partition_by, stats_cols))
        stats = {k: v for k, v in stats.items() if k in entries}

    new_version = cur_version + 1
    _publish_manifest(
        root,
        new_version,
        {
            "version": new_version,
            "partition_by": partition_by,
            "entries": entries,
            "stats": stats,
            "stats_cols": stats_cols,
            "key": manifest.get("key", []),
        },
    )
    return new_version


def compact(
    spark: SparkSession, root: str, max_live_commits: int = 8
) -> int | None:
    """Rewrite every live partition into ONE fresh commit when the
    table's entries span more than ``max_live_commits`` commit
    directories — the read-amplification lever: reads union one frame
    per live commit, so steady micro-batch upserts need periodic
    compaction to keep plans O(1) (same role as Delta OPTIMIZE / the
    small-file compaction pass in sinks/artifacts.py, but at the
    commit-protocol level).  Pure rewrite: no merge logic runs, reader
    results are identical before and after; publishes a new manifest
    version (returned) or None when already compact.
    """
    cur_version, manifest = latest_manifest(root)
    entries: dict[str, str] = manifest["entries"]
    partition_by: list[str] = manifest.get("partition_by", [])
    live_commits = {rel.split(os.sep)[1] for rel in entries.values()}
    if not entries or len(live_commits) <= max_live_commits:
        return None
    df = _union_entries(spark, root, entries)
    commit_id = uuid.uuid4().hex[:12]
    commit_rel = os.path.join("data", commit_id)
    commit_dir = os.path.join(root, commit_rel)
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(commit_dir)
    if partition_by:
        new_entries = {
            rel: os.path.join(commit_rel, rel)
            for rel in _leaf_partition_dirs(commit_dir, len(partition_by))
        }
    else:
        new_entries = {"": commit_rel}
    new_version = cur_version + 1
    # Pure rewrite: same rows land under the same partition rels, so
    # recorded column stats remain valid and carry forward as-is.
    _publish_manifest(
        root,
        new_version,
        {
            "version": new_version,
            "partition_by": partition_by,
            "entries": new_entries,
            "stats": {k: v for k, v in manifest.get("stats", {}).items() if k in new_entries},
            "stats_cols": manifest.get("stats_cols", []),
            "key": manifest.get("key", []),
        },
    )
    return new_version


def vacuum(root: str, keep_versions: int = 2) -> list[str]:
    """Delete data directories referenced by NO retained manifest —
    failed-commit orphans and superseded versions — keeping the last
    ``keep_versions`` manifests as the grace window for in-flight
    readers.  Returns the deleted relative paths.
    """
    versions = manifest_versions(root)
    retained = versions[-keep_versions:] if keep_versions else []
    live_commits: set[str] = set()
    for v in retained:
        with open(_manifest_path(root, v)) as f:
            for data_rel in json.load(f)["entries"].values():
                live_commits.add(data_rel.split(os.sep)[1])  # data/<commit-id>/...
    deleted = []
    data_dir = os.path.join(root, "data")
    if os.path.isdir(data_dir):
        for name in sorted(os.listdir(data_dir)):
            if name not in live_commits:
                shutil.rmtree(os.path.join(data_dir, name))
                deleted.append(os.path.join("data", name))
    for v in versions[: max(0, len(versions) - keep_versions)]:
        os.remove(_manifest_path(root, v))
    return deleted


def metadata_stats(root: str, version: int | None = None) -> dict:
    """Answer count(*) / per-partition counts / column min-max from the
    manifest ALONE — no data file is listed or read (the metadata-only
    query optimization of Delta/Iceberg: at 100 TB a `SELECT COUNT(*)`
    or MIN/MAX over a tracked column costs one small JSON read).

    Returns ``{"rows": total | None, "partitions": {rel: rows},
    "cols": {col: [min, max] | None}}``.  Conservative by construction:
    ``rows`` is None when any live entry predates row-count tracking
    (stats-less commits must be scanned, not guessed); a column's range
    is None under the same condition.  Per-column fold semantics: a
    partition whose stats entry LACKS the column key predates tracking
    it — values unknown, the fold refuses (range None); a partition
    tracked as ``[null, null]`` is known all-NULL and is safely
    skipped."""
    manifest = (
        latest_manifest(root)[1] if version is None else manifest_at(root, version)
    )
    entries: dict[str, str] = manifest["entries"]
    stats: dict[str, dict] = manifest.get("stats", {})
    stats_cols: list[str] = manifest.get("stats_cols", [])
    parts: dict[str, int] = {}
    complete = True
    for rel in entries:
        n = stats.get(rel, {}).get("__rows")
        if n is None:
            complete = False
        else:
            parts[rel] = n
    cols: dict[str, list | None] = {}
    for c in stats_cols:
        lo = hi = None
        ok = True
        for rel in entries:
            rng = stats.get(rel, {}).get(c)
            if rng is None:
                # Key absent = this partition's commit predates tracking
                # this column (e.g. stats_cols expanded later) — its
                # values are UNKNOWN, so the fold must refuse, not skip.
                # (All-NULL partitions record [null, null] and are
                # correctly skippable below.)
                ok = False
                break
            if rng[0] is None:  # tracked, all-NULL partition
                continue
            lo = rng[0] if lo is None or rng[0] < lo else lo
            hi = rng[1] if hi is None or rng[1] > hi else hi
        cols[c] = [lo, hi] if ok and lo is not None else None
    return {
        "rows": sum(parts.values()) if complete else None,
        "partitions": parts,
        "cols": cols,
    }


def read_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
    key: list[str] | None = None,
) -> DataFrame | None:
    """Change data feed: row-level changes between two manifest versions
    (Delta CDF / Iceberg incremental-read parity).

    Because data directories are immutable and the manifest maps each
    partition to its current directory, the diff is two-tier and never
    scans the whole table:

    1. **Partition tier (metadata only):** partitions whose entry is
       identical in both manifests are skipped without listing a single
       file — a steady upsert workload touches few partitions per
       commit, so the read cost scales with the CHANGE, not the table.
    2. **Row tier:** for the changed partitions, old and new data are
       full-outer joined on the table's merge key (recorded in the
       manifest by ``merge_into``): key only in new → ``insert``; only
       in old → ``delete``; present in both with any non-key column
       differing (null-safely) → an ``update_preimage`` +
       ``update_postimage`` row pair; identical rows (e.g. from
       ``compact``'s pure rewrite) emit nothing.

    Output: the table columns plus ``_change_type``/``_from_version``/
    ``_to_version``.  Returns None when the manifests are entry-
    identical.  Works across ``evolve_schema`` commits — pre-images of
    rows that predate an added column carry NULL there, exactly as
    ``read_table`` serves them.  Both versions must still be retained
    (not vacuumed); ``from_version=0`` yields the initial snapshot as
    inserts.
    """
    if to_version is None:
        to_version = latest_manifest(root)[0]
    if from_version > to_version:
        # A swapped range would silently emit the INVERTED feed
        # (inserts as deletes) — refuse instead.
        raise ValueError(
            f"from_version {from_version} > to_version {to_version}"
        )
    m_old = (
        manifest_at(root, from_version)
        if from_version
        else {"entries": {}, "key": []}
    )
    m_new = manifest_at(root, to_version)
    key = list(key or m_new.get("key") or m_old.get("key") or [])
    if not key:
        raise ValueError(
            "no merge key recorded in either manifest (pre-CDF table?) — pass key=[...]"
        )
    old_e: dict[str, str] = m_old["entries"]
    new_e: dict[str, str] = m_new["entries"]
    changed = {
        rel
        for rel in set(old_e) | set(new_e)
        if old_e.get(rel) != new_e.get(rel)
    }
    if not changed:
        return None
    old_changed = {r: old_e[r] for r in changed if r in old_e}
    new_changed = {r: new_e[r] for r in changed if r in new_e}
    old_df = _union_entries(spark, root, old_changed) if old_changed else None
    new_df = _union_entries(spark, root, new_changed) if new_changed else None

    # Align to the union of both schemas (evolve_schema commits differ).
    cols: list[str] = []
    fields = {}
    for df in (old_df, new_df):
        if df is not None:
            for f in df.schema.fields:
                if f.name not in fields:
                    fields[f.name] = f.dataType
                    cols.append(f.name)

    def _aligned(df: DataFrame | None) -> DataFrame | None:
        if df is None:
            return None
        for name, dtype in fields.items():
            if name not in df.columns:
                df = df.withColumn(name, F.lit(None).cast(dtype))
        return df.select(*cols)

    old_df, new_df = _aligned(old_df), _aligned(new_df)
    meta = [
        F.lit(from_version).alias("_from_version"),
        F.lit(to_version).alias("_to_version"),
    ]
    if old_df is None:
        return new_df.select(*cols, F.lit("insert").alias("_change_type"), *meta)
    if new_df is None:
        return old_df.select(*cols, F.lit("delete").alias("_change_type"), *meta)

    o = old_df.select(F.struct(*cols).alias("__pre"), *[F.col(c).alias(f"__k_{c}") for c in key])
    n = new_df.select(F.struct(*cols).alias("__post"), *[F.col(c).alias(f"__k_{c}") for c in key])
    cond = None
    for c in key:
        eq = o[f"__k_{c}"].eqNullSafe(n[f"__k_{c}"])
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    # Struct equality uses row ordering semantics (nulls compare equal
    # field-wise), so a pure rewrite contributes no change rows.
    changes = j.select(
        F.when(F.col("__pre").isNull(), F.array(F.struct(F.lit("insert").alias("t"), F.col("__post").alias("img"))))
        .when(F.col("__post").isNull(), F.array(F.struct(F.lit("delete").alias("t"), F.col("__pre").alias("img"))))
        .when(
            # Unchanged row (pure rewrite): null marker, filtered below —
            # keeps every branch the same array element type.
            F.col("__pre").eqNullSafe(F.col("__post")),
            F.array(F.struct(F.lit(None).cast("string").alias("t"), F.col("__pre").alias("img"))),
        )
        .otherwise(
            F.array(
                F.struct(F.lit("update_preimage").alias("t"), F.col("__pre").alias("img")),
                F.struct(F.lit("update_postimage").alias("t"), F.col("__post").alias("img")),
            )
        )
        .alias("__ch")
    ).select(F.explode("__ch").alias("__c")).where(F.col("__c.t").isNotNull())
    return changes.select(
        *[F.col(f"__c.img.{c}").alias(c) for c in cols],
        F.col("__c.t").alias("_change_type"),
        *meta,
    )


def upsert_foreach_batch(
    root: str,
    key: list[str],
    version_col: str | None = None,
    partition_by: list[str] | None = None,
):
    """Streaming adapter: manifest-committed twin of
    ``upsert.upsert_foreach_batch`` — micro-batch replays after
    checkpoint recovery re-merge idempotently AND each batch's multi-
    partition commit is all-or-nothing for readers.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into(batch_df.sparkSession, root, batch_df, key, version_col, partition_by)

    return _apply
