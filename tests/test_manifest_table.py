"""Manifest-committed table: the object-store-safe S14 commit protocol.

The behaviors under test are the three that plain-parquet directory
swaps cannot give (VERDICT r2 "What's missing" #3):
  - a multi-partition merge is ALL-OR-NOTHING for readers,
  - a writer crash at any point before manifest publish leaves the
    table exactly as it was (crash injection),
  - data is never renamed or overwritten — only new keys + one small
    manifest PUT, i.e. the protocol survives on object stores.
Reference semantics unchanged: idempotent last-write-wins upsert
(load_postgres.py:83-103).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.sinks import manifest_table as mt


def _mk(spark, rows):
    df = spark.createDataFrame(
        rows, "symbol string, tf string, open_time string, close double"
    )
    return df.withColumn("open_time", F.to_timestamp("open_time"))


def _state(spark, root):
    df = mt.read_table(spark, root)
    if df is None:
        return {}
    return {
        (r["symbol"], r["tf"], str(r["open_time"])): r["close"] for r in df.collect()
    }


KEY = ["symbol", "tf", "open_time"]


def test_roundtrip_and_partition_scoped_stability(spark, tmp_path):
    root = str(tmp_path / "t")
    base = _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
        ("A", "1m", "2024-01-01 00:01:00", 2.0),
        ("B", "1m", "2024-01-01 00:00:00", 3.0),
    ])
    v1 = mt.merge_into(spark, root, base, KEY, partition_by=["symbol"])
    assert v1 == 1
    _, m1 = mt.latest_manifest(root)

    # Touch only B (update) and C (new): A's entry must still point at
    # the ORIGINAL data directory — not rewritten, not moved.
    batch = _mk(spark, [
        ("B", "1m", "2024-01-01 00:00:00", 30.0),
        ("C", "1m", "2024-01-01 00:00:00", 4.0),
    ])
    v2 = mt.merge_into(spark, root, batch, KEY, partition_by=["symbol"])
    assert v2 == 2
    _, m2 = mt.latest_manifest(root)
    assert m2["entries"]["symbol=A"] == m1["entries"]["symbol=A"]
    assert m2["entries"]["symbol=B"] != m1["entries"]["symbol=B"]

    assert _state(spark, root) == {
        ("A", "1m", "2024-01-01 00:00:00"): 1.0,
        ("A", "1m", "2024-01-01 00:01:00"): 2.0,
        ("B", "1m", "2024-01-01 00:00:00"): 30.0,
        ("C", "1m", "2024-01-01 00:00:00"): 4.0,
    }


def test_idempotent_reingest_and_last_write_wins(spark, tmp_path):
    root = str(tmp_path / "t")
    batch = _mk(spark, [("A", "1m", "2024-01-01 00:00:00", 1.0)])
    mt.merge_into(spark, root, batch, KEY, partition_by=["symbol"])
    mt.merge_into(spark, root, batch, KEY, partition_by=["symbol"])  # replay
    mt.merge_into(
        spark, root, _mk(spark, [("A", "1m", "2024-01-01 00:00:00", 99.0)]),
        KEY, partition_by=["symbol"],
    )
    assert _state(spark, root) == {("A", "1m", "2024-01-01 00:00:00"): 99.0}


def test_version_col_orders_writes(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("A", 2, 5.0)], "symbol string, ver int, close double"
    )
    mt.merge_into(spark, root, df, ["symbol"], version_col="ver")
    older = spark.createDataFrame([("A", 1, 9.0)], "symbol string, ver int, close double")
    mt.merge_into(spark, root, older, ["symbol"], version_col="ver")
    rows = mt.read_table(spark, root).collect()
    assert len(rows) == 1 and rows[0]["close"] == 5.0  # stale version loses


def test_crash_before_publish_is_invisible_and_retryable(spark, tmp_path, monkeypatch):
    # THE crash-injection gate: kill the writer AFTER all data files of
    # a multi-partition merge land but BEFORE the manifest publish.
    # Readers must see the exact pre-merge table — not a half-merged
    # mix — and a retry must converge to the correct final state.
    root = str(tmp_path / "t")
    base = _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
        ("B", "1m", "2024-01-01 00:00:00", 2.0),
    ])
    mt.merge_into(spark, root, base, KEY, partition_by=["symbol"])
    before = _state(spark, root)

    real_publish = mt._publish_manifest

    def crash(*a, **k):
        raise OSError("injected: writer died before commit point")

    monkeypatch.setattr(mt, "_publish_manifest", crash)
    batch = _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 10.0),   # update partition A
        ("B", "1m", "2024-01-01 00:01:00", 20.0),   # append into B
        ("C", "1m", "2024-01-01 00:00:00", 30.0),   # brand-new partition
    ])
    with pytest.raises(OSError, match="injected"):
        mt.merge_into(spark, root, batch, KEY, partition_by=["symbol"])

    # All-or-nothing: none of the three touched partitions is visible.
    assert _state(spark, root) == before
    v, _ = mt.latest_manifest(root)
    assert v == 1

    # The orphan data directory from the failed commit is unreferenced;
    # vacuum removes it without touching live data.
    orphans = mt.vacuum(root, keep_versions=2)
    assert len(orphans) == 1
    assert _state(spark, root) == before

    # Retry after recovery converges.
    monkeypatch.setattr(mt, "_publish_manifest", real_publish)
    mt.merge_into(spark, root, batch, KEY, partition_by=["symbol"])
    assert _state(spark, root) == {
        ("A", "1m", "2024-01-01 00:00:00"): 10.0,
        ("B", "1m", "2024-01-01 00:00:00"): 2.0,
        ("B", "1m", "2024-01-01 00:01:00"): 20.0,
        ("C", "1m", "2024-01-01 00:00:00"): 30.0,
    }


def test_crash_mid_data_write_is_invisible(spark, tmp_path):
    # Even rawer failure mode: a half-written data directory (job died
    # mid-write, no manifest).  Readers resolve via manifest only, so
    # the junk is simply never read; vacuum clears it.
    root = str(tmp_path / "t")
    mt.merge_into(
        spark, root, _mk(spark, [("A", "1m", "2024-01-01 00:00:00", 1.0)]),
        KEY, partition_by=["symbol"],
    )
    junk = os.path.join(root, "data", "deadbeef0000", "symbol=A")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00not a parquet file")
    assert _state(spark, root) == {("A", "1m", "2024-01-01 00:00:00"): 1.0}
    assert mt.vacuum(root) == [os.path.join("data", "deadbeef0000")]


def test_publish_never_clobbers_an_existing_version(tmp_path):
    # Commit-race detection: version N already published → loud failure
    # (object-store equivalent: conditional PUT of the manifest key).
    root = str(tmp_path / "t")
    mt._publish_manifest(root, 1, {"version": 1, "partition_by": [], "entries": {}})
    with pytest.raises(FileExistsError):
        mt._publish_manifest(root, 1, {"version": 1, "partition_by": [], "entries": {}})


def test_unpartitioned_merge(spark, tmp_path):
    root = str(tmp_path / "t")
    mt.merge_into(spark, root, _mk(spark, [("A", "1m", "2024-01-01 00:00:00", 1.0)]), KEY)
    mt.merge_into(spark, root, _mk(spark, [("A", "1m", "2024-01-01 00:00:00", 7.0)]), KEY)
    assert _state(spark, root) == {("A", "1m", "2024-01-01 00:00:00"): 7.0}


def test_escaped_partition_values_round_trip(spark, tmp_path):
    # '/' and ':' are in Spark's partition-path escape set; the
    # derivation must agree with the writer or merge_into aborts.
    root = str(tmp_path / "t")
    rows = [("A/B:1", "1m", "2024-01-01 00:00:00", 1.0)]
    mt.merge_into(spark, root, _mk(spark, rows), KEY, partition_by=["symbol"])
    mt.merge_into(
        spark, root, _mk(spark, [("A/B:1", "1m", "2024-01-01 00:00:00", 2.0)]),
        KEY, partition_by=["symbol"],
    )
    out = mt.read_table(spark, root).collect()
    assert len(out) == 1 and out[0]["symbol"] == "A/B:1" and out[0]["close"] == 2.0


def test_vacuum_retains_reader_grace_window(spark, tmp_path):
    root = str(tmp_path / "t")
    for i, px in enumerate([1.0, 2.0, 3.0]):
        mt.merge_into(
            spark, root, _mk(spark, [("A", "1m", "2024-01-01 00:00:00", px)]),
            KEY, partition_by=["symbol"],
        )
    mt.vacuum(root, keep_versions=2)
    mdir = os.path.join(root, mt._MANIFEST_DIR)
    kept = sorted(os.listdir(mdir))
    assert kept == ["manifest-0000000002.json", "manifest-0000000003.json"]
    # The previous version's data survives for in-flight readers.
    with open(os.path.join(mdir, kept[0])) as f:
        prev = json.load(f)
    for rel in prev["entries"].values():
        assert os.path.isdir(os.path.join(root, rel))
    assert _state(spark, root) == {("A", "1m", "2024-01-01 00:00:00"): 3.0}


def test_streaming_foreach_batch_replay_idempotent(spark, tmp_path):
    # Checkpoint-recovery replay: the same micro-batch delivered twice
    # must converge, and each batch's commit is all-or-nothing.
    root = str(tmp_path / "t")
    apply_fn = mt.upsert_foreach_batch(root, KEY, partition_by=["symbol"])
    batch = _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
        ("B", "1m", "2024-01-01 00:00:00", 2.0),
    ])
    apply_fn(batch, 0)
    apply_fn(batch, 0)  # replay after restart
    assert _state(spark, root) == {
        ("A", "1m", "2024-01-01 00:00:00"): 1.0,
        ("B", "1m", "2024-01-01 00:00:00"): 2.0,
    }


def test_compact_collapses_live_commits(spark, tmp_path):
    # Steady micro-batch upserts leave one live commit per touched
    # partition-batch; compaction rewrites them into ONE commit with
    # byte-identical reader results, and vacuum then reclaims the old
    # dirs.  Below the threshold it is a no-op.
    root = str(tmp_path / "t")
    for i in range(5):
        mt.merge_into(
            spark, root,
            _mk(spark, [(f"S{i}", "1m", "2024-01-01 00:00:00", float(i))]),
            KEY, partition_by=["symbol"],
        )
    before = _state(spark, root)
    assert mt.compact(spark, root, max_live_commits=8) is None  # under threshold

    v = mt.compact(spark, root, max_live_commits=2)
    assert v == 6
    _, m = mt.latest_manifest(root)
    commits = {rel.split(os.sep)[1] for rel in m["entries"].values()}
    assert len(commits) == 1 and len(m["entries"]) == 5
    assert _state(spark, root) == before

    mt.vacuum(root, keep_versions=1)
    assert _state(spark, root) == before
    data_dirs = os.listdir(os.path.join(root, "data"))
    assert data_dirs == [commits.pop()]


def test_compact_unpartitioned(spark, tmp_path):
    root = str(tmp_path / "t")
    # Unpartitioned merges already collapse to one live commit each
    # time (global merge) - compact is a no-op by construction.
    mt.merge_into(spark, root, _mk(spark, [("A", "1m", "2024-01-01 00:00:00", 1.0)]), KEY)
    mt.merge_into(spark, root, _mk(spark, [("B", "1m", "2024-01-01 00:00:00", 2.0)]), KEY)
    assert mt.compact(spark, root, max_live_commits=1) is None
    assert len(_state(spark, root)) == 2


def test_streaming_checkpoint_restart_manifest_backend(spark, tmp_path):
    # The parquet path's checkpoint-restart gate, on the manifest
    # backend: restart with the same checkpoint must not re-merge
    # processed files, and reads resolve only published manifests.
    from pyspark.sql import functions as SF

    from kp_crypto_market_analytics_spark.session import load_tables
    from kp_crypto_market_analytics_spark.streaming.candles import candles_from_trades

    e = (
        load_tables(spark, "/root/testdata/sf0.001", ["events"])["events"]
        .selectExpr(
            "event_type AS symbol", "ts AS trade_time", "value AS price",
            "value AS qty", "event_id AS trade_id",
        )
        .orderBy("trade_time")
        .limit(200)
    )
    pdf = e.toPandas()
    src = str(tmp_path / "src"); ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "table")
    spark.createDataFrame(pdf.iloc[:100]).coalesce(1).write.parquet(src + "/a")

    def run_once():
        stream = spark.readStream.schema(e.schema).parquet(src + "/*")
        q = (
            candles_from_trades(stream, watermark=None)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                mt.upsert_foreach_batch(
                    root, ["symbol", "open_time"], partition_by=["symbol"]
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = mt.read_table(spark, root).agg(SF.sum("num_trades")).collect()[0][0]
    assert first == 100

    spark.createDataFrame(pdf.iloc[100:]).coalesce(1).write.parquet(src + "/b")
    run_once()
    total = mt.read_table(spark, root).agg(SF.sum("num_trades")).collect()[0][0]
    assert total == 200, "restart must not re-merge already-processed files"
    # Maintenance keeps reads O(1) and reclaims superseded commits.
    mt.compact(spark, root, max_live_commits=1)
    mt.vacuum(root, keep_versions=1)
    assert mt.read_table(spark, root).agg(SF.sum("num_trades")).collect()[0][0] == 200


def test_time_travel_reads_historical_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY, partition_by=["symbol"])
    v2 = mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 10.0),
        ("B", "1m", "2024-01-01 00:00:00", 2.0),
    ]), KEY, partition_by=["symbol"])
    assert (v1, v2) == (1, 2)

    def at(v):
        df = mt.read_table(spark, root, version=v)
        return {(r["symbol"], r["close"]) for r in df.collect()}

    # Data dirs are immutable, so retained old manifests read the table
    # exactly as it was at that commit.
    assert at(1) == {("A", 1.0)}
    assert at(2) == {("A", 10.0), ("B", 2.0)}
    assert at(None) == at(2)
    with pytest.raises(FileNotFoundError):
        mt.manifest_at(root, 99)
    # Vacuum past v1's grace window: time travel to it now fails
    # loudly instead of reading half-vacuumed data.
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 100.0),
    ]), KEY, partition_by=["symbol"])
    mt.vacuum(root, keep_versions=1)
    with pytest.raises(FileNotFoundError):
        mt.read_table(spark, root, version=1)


def test_stats_skipping_prunes_partitions_and_matches_full_filter(spark, tmp_path):
    root = str(tmp_path / "t")
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
        ("A", "1m", "2024-01-01 00:01:00", 2.0),
        ("B", "1m", "2024-01-02 00:00:00", 30.0),
        ("C", "1m", "2024-01-03 00:00:00", 4.0),
    ]), KEY, partition_by=["symbol"], stats_cols=["close", "open_time"])
    _, m = mt.latest_manifest(root)
    assert m["stats"]["symbol=A"]["close"] == [1.0, 2.0]

    # Manifest-level pruning: only A's entry survives the range.
    kept = mt._prune_entries(m, ("close", 0.0, 2.5))
    assert set(kept) == {"symbol=A"}
    pruned = mt.read_table(spark, root, where=("close", 0.0, 2.5))
    assert all("symbol=A" in f for f in pruned.inputFiles())

    # Semantics identical to full scan + filter.
    full = mt.read_table(spark, root).where(F.col("close").between(0.0, 2.5))
    assert _rows(pruned) == _rows(full)

    # Timestamp stats prune lexicographically on ISO strings.
    ts = mt.read_table(
        spark, root, where=("open_time", "2024-01-02 00:00:00", "2024-01-02 23:59:59")
    )
    assert {r["symbol"] for r in ts.collect()} == {"B"}
    assert all("symbol=B" in f for f in ts.inputFiles())

    # A later merge refreshes touched partitions' stats and carries the
    # untouched ones forward unchanged (stats_cols sticks table-wide).
    mt.merge_into(spark, root, _mk(spark, [
        ("B", "1m", "2024-01-02 00:00:00", 5.0),
    ]), KEY, partition_by=["symbol"])
    _, m2 = mt.latest_manifest(root)
    assert m2["stats"]["symbol=B"]["close"] == [5.0, 5.0]
    assert m2["stats"]["symbol=A"]["close"] == [1.0, 2.0]
    got = mt.read_table(spark, root, where=("close", 4.5, 10.0))
    assert {(r["symbol"], r["close"]) for r in got.collect()} == {("B", 5.0)}


def test_stats_skipping_unpartitioned_and_statless_entries_kept(spark, tmp_path):
    root = str(tmp_path / "t")
    # First merge records no stats: reader must conservatively scan.
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY)
    got = mt.read_table(spark, root, where=("close", 100.0, 200.0))
    assert got is not None and got.count() == 0  # scanned, filtered empty
    # Enable stats; the whole-table entry now prunes — result is the
    # SAME empty frame (never None: scan+filter equivalence).
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:01:00", 2.0),
    ]), KEY, stats_cols=["close"])
    pruned = mt.read_table(spark, root, where=("close", 100.0, 200.0))
    assert pruned is not None and pruned.count() == 0
    assert {r["close"] for r in mt.read_table(spark, root).collect()} == {1.0, 2.0}


def _rows(df):
    return sorted((r["symbol"], r["tf"], str(r["open_time"]), r["close"]) for r in df.collect())


def test_schema_evolution_add_column(spark, tmp_path):
    root = str(tmp_path / "t")
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
        ("B", "1m", "2024-01-01 00:00:00", 2.0),
    ]), KEY, partition_by=["symbol"])

    wide = _mk(spark, [
        ("B", "1m", "2024-01-01 00:00:00", 20.0),
    ]).withColumn("volume", F.lit(7.5))

    # Strict mode refuses the wider batch...
    with pytest.raises(Exception):
        mt.merge_into(spark, root, wide, KEY, partition_by=["symbol"])
    # ...evolution merges it: B gets the new column, A's untouched
    # partition keeps its narrow files and reads back null-filled.
    mt.merge_into(
        spark, root, wide, KEY, partition_by=["symbol"], evolve_schema=True
    )
    got = {
        (r["symbol"], r["close"], r["volume"])
        for r in mt.read_table(spark, root).collect()
    }
    assert got == {("A", 1.0, None), ("B", 20.0, 7.5)}
    # Time travel to v1 still shows the pre-evolution schema.
    assert "volume" not in mt.read_table(spark, root, version=1).columns

    # A narrower later batch null-fills the evolved column for the keys
    # it rewrites (documented add-column semantics), others keep theirs.
    mt.merge_into(spark, root, _mk(spark, [
        ("B", "1m", "2024-01-01 00:00:00", 200.0),
        ("C", "1m", "2024-01-01 00:00:00", 3.0),
    ]), KEY, partition_by=["symbol"], evolve_schema=True)
    got = {
        (r["symbol"], r["close"], r["volume"])
        for r in mt.read_table(spark, root).collect()
    }
    assert got == {("A", 1.0, None), ("B", 200.0, None), ("C", 3.0, None)}


def test_stats_decimal_column_prunes_numerically(spark, tmp_path):
    # Decimal stats stored as strings would prune lexicographically
    # ("9" > "85") and silently drop matching partitions.
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("A", "9.00"), ("A", "100.00"), ("B", "500.00")],
        "symbol string, amount string",
    ).select("symbol", F.col("amount").cast("decimal(18,2)").alias("amount"))
    mt.merge_into(
        spark, root, df, ["symbol", "amount"],
        partition_by=["symbol"], stats_cols=["amount"],
    )
    _, m = mt.latest_manifest(root)
    assert m["stats"]["symbol=A"]["amount"] == [9.0, 100.0]
    got = mt.read_table(spark, root, where=("amount", 10.0, 85.0))
    # A's [9, 100] range intersects [10, 85]: must be scanned (empty
    # result is fine; being pruned away would be the bug).
    assert any("symbol=A" in f for f in got.inputFiles())
    assert got.count() == 0
    got2 = mt.read_table(spark, root, where=("amount", 90.0, 600.0))
    assert {str(r["amount"]) for r in got2.collect()} == {"100.00", "500.00"}


def test_evolved_batch_missing_stats_col_on_new_partition(spark, tmp_path):
    # stats_cols includes an evolved column; a later evolve batch that
    # lacks it and touches only NEW partitions must not fail the merge
    # (its files legally omit the column) — entries just go stats-less
    # for that column and are conservatively scanned.
    root = str(tmp_path / "t")
    wide = _mk(spark, [("A", "1m", "2024-01-01 00:00:00", 1.0)]).withColumn(
        "volume", F.lit(2.0)
    )
    mt.merge_into(
        spark, root, wide, KEY, partition_by=["symbol"],
        stats_cols=["close", "volume"],
    )
    narrow = _mk(spark, [("Z", "1m", "2024-01-01 00:00:00", 9.0)])
    mt.merge_into(
        spark, root, narrow, KEY, partition_by=["symbol"], evolve_schema=True
    )
    _, m = mt.latest_manifest(root)
    assert "volume" not in m["stats"]["symbol=Z"]
    assert m["stats"]["symbol=Z"]["close"] == [9.0, 9.0]
    # Z's files lack the volume column entirely; the predicate must
    # still resolve (schema-stable result including the evolved
    # column), and Z's null-volume rows are correctly excluded —
    # Catalyst folds `null BETWEEN ...` to false, so the branch may be
    # optimized to an empty scan rather than read.
    got = mt.read_table(spark, root, where=("volume", 100.0, 200.0))
    assert "volume" in got.columns
    assert got.count() == 0
    got2 = mt.read_table(spark, root, where=("volume", 1.0, 3.0))
    assert {(r["symbol"], r["volume"]) for r in got2.collect()} == {("A", 2.0)}


def test_all_partitions_pruned_returns_empty_frame_not_none(spark, tmp_path):
    root = str(tmp_path / "t")
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY, partition_by=["symbol"], stats_cols=["close"])
    got = mt.read_table(spark, root, where=("close", 100.0, 200.0))
    assert got is not None and got.count() == 0
    assert "close" in got.columns  # full table schema, just empty


def test_delete_where_partition_scoped(spark, tmp_path):
    root = str(tmp_path / "t")
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
        ("A", "1m", "2024-01-01 00:01:00", 2.0),
        ("B", "1m", "2024-01-01 00:00:00", 3.0),
        ("C", "1m", "2024-01-01 00:00:00", 4.0),
    ]), KEY, partition_by=["symbol"], stats_cols=["close"])
    _, m1 = mt.latest_manifest(root)

    # Partial delete in A, full wipe of C, B untouched.
    v = mt.delete_where(spark, root, "close = 1.0 OR symbol = 'C'")
    assert v == 2
    _, m2 = mt.latest_manifest(root)
    assert m2["entries"]["symbol=B"] == m1["entries"]["symbol=B"]  # byte-stable
    assert "symbol=C" not in m2["entries"]  # emptied partition dropped
    assert m2["stats"]["symbol=A"]["close"] == [2.0, 2.0]  # refreshed
    assert _state(spark, root) == {
        ("A", "1m", "2024-01-01 00:01:00"): 2.0,
        ("B", "1m", "2024-01-01 00:00:00"): 3.0,
    }
    # Pre-delete state still readable via time travel.
    old = mt.read_table(spark, root, version=1)
    assert old.count() == 4

    # No-op delete publishes nothing.
    assert mt.delete_where(spark, root, "close > 100") is None
    assert mt.latest_manifest(root)[0] == 2


def test_delete_where_unpartitioned_to_empty(spark, tmp_path):
    root = str(tmp_path / "t")
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY)
    assert mt.delete_where(spark, root, "close >= 0") == 2
    assert mt.read_table(spark, root) is None


def test_delete_where_null_condition_rows_are_kept(spark, tmp_path):
    # SQL DELETE semantics: a row where the condition evaluates to NULL
    # is NOT deleted (delete only where true) — a bare NOT(cond) filter
    # would silently drop it.
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("A", "x", 1.0), ("A", "y", None), ("A", "z", 3.0)],
        "symbol string, tf string, close double",
    )
    mt.merge_into(spark, root, df, ["symbol", "tf"], partition_by=["symbol"])
    mt.delete_where(spark, root, "close = 1.0")
    got = {(r["tf"], r["close"]) for r in mt.read_table(spark, root).collect()}
    assert got == {("y", None), ("z", 3.0)}


def test_delete_where_condition_on_evolved_column(spark, tmp_path):
    # The delete condition may reference a column the touched commits
    # predate (null there => not deleted); the rewrite must resolve the
    # filter and keep the full table width.
    root = str(tmp_path / "t")
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY, partition_by=["symbol"])
    wide = _mk(spark, [
        ("B", "1m", "2024-01-01 00:00:00", 2.0),
        ("A", "1m", "2024-01-01 00:05:00", 5.0),
    ]).withColumn("volume", F.lit(7.0))
    mt.merge_into(spark, root, wide, KEY, partition_by=["symbol"], evolve_schema=True)
    # "volume IS NULL" is TRUE for the pre-evolution rows, so the
    # delete touches partition A whose OLDEST commit predates the
    # column — the keep filter must still resolve there (null-fill) and
    # the evolved row in the same partition must survive with its value.
    v = mt.delete_where(spark, root, "volume IS NULL")
    assert v == 3
    got = {(r["symbol"], str(r["open_time"]), r["volume"])
           for r in mt.read_table(spark, root).collect()}
    assert got == {
        ("A", "2024-01-01 00:05:00", 7.0),
        ("B", "2024-01-01 00:00:00", 7.0),
    }


# ------------------------------------------------------ change data feed

def _changes(spark, root, v_from, v_to=None):
    df = mt.read_changes(spark, root, v_from, v_to)
    if df is None:
        return []
    return sorted(
        (r["_change_type"], r["symbol"], r["tf"], str(r["open_time"]), r["close"])
        for r in df.collect()
    )


def test_read_changes_insert_update_delete(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
        ("A", "1m", "2024-01-01 00:01:00", 2.0),
        ("B", "1m", "2024-01-01 00:00:00", 3.0),
    ]), KEY, partition_by=["symbol"])
    v2 = mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:01:00", 20.0),   # update
        ("C", "1m", "2024-01-01 00:00:00", 4.0),    # insert (new partition)
    ]), KEY, partition_by=["symbol"])
    got = _changes(spark, root, v1, v2)
    assert got == [
        ("insert", "C", "1m", "2024-01-01 00:00:00", 4.0),
        ("update_postimage", "A", "1m", "2024-01-01 00:01:00", 20.0),
        ("update_preimage", "A", "1m", "2024-01-01 00:01:00", 2.0),
    ]
    # B's partition was untouched: its rows never appear, and the
    # unchanged row of A's rewritten partition is also silent.
    meta = mt.read_changes(spark, root, v1, v2).select(
        "_from_version", "_to_version").distinct().collect()
    assert [(r[0], r[1]) for r in meta] == [(v1, v2)]


def test_read_changes_initial_snapshot_and_delete(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
        ("B", "1m", "2024-01-01 00:00:00", 3.0),
    ]), KEY, partition_by=["symbol"])
    # From the empty table, everything is an insert.
    assert [c[0] for c in _changes(spark, root, 0, v1)] == ["insert", "insert"]
    v2 = mt.delete_where(spark, root, "symbol = 'B'")
    got = _changes(spark, root, v1, v2)
    assert got == [("delete", "B", "1m", "2024-01-01 00:00:00", 3.0)]


def test_read_changes_compact_is_silent_and_replay_matches_state(spark, tmp_path):
    root = str(tmp_path / "t")
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY, partition_by=["symbol"])
    for i in range(9):  # force many live commits, then compact
        mt.merge_into(spark, root, _mk(spark, [
            (chr(ord("B") + i), "1m", "2024-01-01 00:00:00", float(i)),
        ]), KEY, partition_by=["symbol"])
    v_before = mt.latest_manifest(root)[0]
    v_after = mt.compact(spark, root, max_live_commits=2)
    assert v_after is not None
    # Pure rewrite: every partition re-pointed, zero row-level changes.
    assert _changes(spark, root, v_before, v_after) == []
    # CDF replay reconstructs the table: apply the full feed from 0.
    feed = mt.read_changes(spark, root, 0, v_after)
    live = {
        (r["symbol"], r["tf"], str(r["open_time"])): r["close"]
        for r in feed.where(F.col("_change_type").isin("insert", "update_postimage")).collect()
    }
    dead = {
        (r["symbol"], r["tf"], str(r["open_time"]))
        for r in feed.where(F.col("_change_type") == "delete").collect()
    }
    assert {k: v for k, v in live.items() if k not in dead} == _state(spark, root)


def test_read_changes_across_schema_evolution(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY, partition_by=["symbol"])
    wide = _mk(spark, [("A", "1m", "2024-01-01 00:00:00", 5.0)]).withColumn(
        "volume", F.lit(9.0)
    )
    v2 = mt.merge_into(
        spark, root, wide, KEY, partition_by=["symbol"], evolve_schema=True
    )
    rows = {
        r["_change_type"]: (r["close"], r["volume"])
        for r in mt.read_changes(spark, root, v1, v2).collect()
    }
    # Pre-image predates the added column: NULL there, as read_table serves it.
    assert rows == {
        "update_preimage": (1.0, None),
        "update_postimage": (5.0, 9.0),
    }


def test_read_changes_requires_recorded_or_explicit_key(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY, partition_by=["symbol"])
    # Simulate a pre-CDF manifest (no recorded key).
    path = mt._manifest_path(root, v1)
    with open(path) as f:
        m = json.load(f)
    m.pop("key", None)
    os.remove(path)
    with open(path, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="merge key"):
        mt.read_changes(spark, root, 0, v1)
    got = mt.read_changes(spark, root, 0, v1, key=KEY)
    assert got.count() == 1


# --------------------------------------------------- metadata-only stats

def test_metadata_stats_answer_without_scanning(spark, tmp_path):
    root = str(tmp_path / "t")
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
        ("A", "1m", "2024-01-01 00:01:00", 2.0),
        ("B", "1m", "2024-01-01 00:00:00", 3.0),
    ]), KEY, partition_by=["symbol"], stats_cols=["close"])
    mt.merge_into(spark, root, _mk(spark, [
        ("B", "1m", "2024-01-01 00:01:00", 30.0),   # touches only B
    ]), KEY, partition_by=["symbol"], stats_cols=["close"])
    got = mt.metadata_stats(root)
    # Equals the full scan, computed from the manifest alone.
    df = mt.read_table(spark, root)
    agg = df.agg(F.count(F.lit(1)), F.min("close"), F.max("close")).collect()[0]
    assert got["rows"] == agg[0] == 4
    assert got["partitions"] == {"symbol=A": 2, "symbol=B": 2}
    assert got["cols"]["close"] == [agg[1], agg[2]] == [1.0, 30.0]
    # Untouched partition A carried its counts/ranges forward.
    v1_stats = mt.metadata_stats(root, version=1)
    assert v1_stats["rows"] == 3 and v1_stats["cols"]["close"] == [1.0, 3.0]


def test_metadata_stats_conservative_without_row_tracking(spark, tmp_path):
    root = str(tmp_path / "t")
    # No stats_cols: commits record nothing — stats must refuse to guess.
    mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY, partition_by=["symbol"])
    got = mt.metadata_stats(root)
    assert got["rows"] is None and got["partitions"] == {} and got["cols"] == {}


def test_metadata_stats_expanded_stats_cols_refuses_partial_range(spark, tmp_path):
    # Reviewer-confirmed hazard: v1 tracks only close; v2 expands
    # stats_cols to close+volume but touches only partition B.  A's
    # volume range is UNKNOWN (its commit predates tracking), so the
    # fold must return None for volume — not B's range presented as
    # global truth.
    root = str(tmp_path / "t")
    wide = _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]).withColumn("volume", F.lit(200.0))
    mt.merge_into(spark, root, wide, KEY, partition_by=["symbol"],
                  stats_cols=["close"])
    wide2 = _mk(spark, [
        ("B", "1m", "2024-01-01 00:00:00", 3.0),
    ]).withColumn("volume", F.lit(5.0))
    mt.merge_into(spark, root, wide2, KEY, partition_by=["symbol"],
                  stats_cols=["close", "volume"])
    got = mt.metadata_stats(root)
    assert got["cols"]["close"] == [1.0, 3.0]      # tracked everywhere
    assert got["cols"]["volume"] is None           # A's range unknown
    # Rows are still complete: both commits recorded __rows.
    assert got["rows"] == 2


def test_metadata_stats_all_null_column_skipped_not_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    a = _mk(spark, [("A", "1m", "2024-01-01 00:00:00", 1.0)]).withColumn(
        "volume", F.lit(None).cast("double")
    )
    b = _mk(spark, [("B", "1m", "2024-01-01 00:00:00", 3.0)]).withColumn(
        "volume", F.lit(7.0)
    )
    mt.merge_into(spark, root, a, KEY, partition_by=["symbol"],
                  stats_cols=["close", "volume"])
    mt.merge_into(spark, root, b, KEY, partition_by=["symbol"],
                  stats_cols=["close", "volume"])
    got = mt.metadata_stats(root)
    # A is tracked-and-all-NULL in volume: skippable, B's range stands.
    assert got["cols"]["volume"] == [7.0, 7.0]
    # And data skipping can drop the all-NULL partition for a volume
    # predicate without changing results.
    df = mt.read_table(spark, root, where=("volume", 0.0, 10.0))
    assert [(r["symbol"], r["volume"]) for r in df.collect()] == [("B", 7.0)]


def test_read_changes_rejects_inverted_range(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 1.0),
    ]), KEY, partition_by=["symbol"])
    v2 = mt.merge_into(spark, root, _mk(spark, [
        ("A", "1m", "2024-01-01 00:00:00", 2.0),
    ]), KEY, partition_by=["symbol"])
    with pytest.raises(ValueError, match="from_version"):
        mt.read_changes(spark, root, v2, v1)
