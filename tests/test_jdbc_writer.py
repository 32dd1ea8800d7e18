"""JDBC upsert writer (S13/S14 write-back): statement generation and
the executor-side foreachPartition protocol, exercised through a fake
DB-API connection (no database in this container)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.sinks.jdbc import (
    jdbc_upsert_foreach_batch,
    upsert_statement,
    write_jdbc_upsert,
)


def test_upsert_statement_postgres_matches_reference_shape():
    # load_postgres.py:83-103 parity: EXCLUDED.* update on PK conflict,
    # key columns never reassigned.
    stmt = upsert_statement(
        "candles",
        ["symbol", "tf", "open_time", "close", "volume"],
        ["symbol", "tf", "open_time"],
    )
    assert stmt == (
        "INSERT INTO candles (symbol, tf, open_time, close, volume) "
        "VALUES (%s, %s, %s, %s, %s) "
        "ON CONFLICT (symbol, tf, open_time) "
        "DO UPDATE SET close = EXCLUDED.close, volume = EXCLUDED.volume"
    )


def test_upsert_statement_all_key_do_nothing_and_merge_dialect():
    assert upsert_statement("t", ["a", "b"], ["a", "b"]).endswith("DO NOTHING")
    m = upsert_statement("t", ["a", "b"], ["a"], dialect="merge", placeholder="?")
    assert m == (
        "MERGE INTO t USING (SELECT ? AS a, ? AS b) s ON t.a = s.a "
        "WHEN MATCHED THEN UPDATE SET t.b = s.b "
        "WHEN NOT MATCHED THEN INSERT (a, b) VALUES (s.a, s.b)"
    ).replace("MERGE INTO t USING", "MERGE INTO t t USING")
    with pytest.raises(ValueError):
        upsert_statement("t", ["a"], ["missing"])
    with pytest.raises(ValueError):
        upsert_statement("t", ["a"], ["a"], dialect="oracle9i")


def _recording_factory(out_dir: str):
    """Picklable fake DB-API factory: every connection logs executemany
    batches + commit/rollback to its own JSONL file in out_dir."""

    def factory():
        import json as _json
        import os as _os
        import uuid as _uuid

        path = _os.path.join(out_dir, _uuid.uuid4().hex + ".jsonl")

        class Cursor:
            def executemany(self, stmt, batch):
                with open(path, "a") as f:
                    f.write(_json.dumps({"stmt": stmt, "n": len(batch),
                                         "params": [list(p) for p in batch]}) + "\n")

        class Conn:
            def cursor(self):
                return Cursor()

            def commit(self):
                with open(path, "a") as f:
                    f.write(_json.dumps({"event": "commit"}) + "\n")

            def rollback(self):
                with open(path, "a") as f:
                    f.write(_json.dumps({"event": "rollback"}) + "\n")

            def close(self):
                pass

        return Conn()

    return factory


def _read_logs(out_dir: str):
    events = []
    for name in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, name)) as f:
            events.append([json.loads(line) for line in f])
    return events


def test_write_jdbc_upsert_partition_protocol(spark, tmp_path):
    out_dir = str(tmp_path / "writes")
    os.makedirs(out_dir)
    df = (
        spark.range(0, 5)
        .select(
            F.col("id").alias("trade_id"),
            F.lit("BTCUSDT").alias("symbol"),
            (F.col("id") * 1.5).alias("price"),
        )
        .repartition(1)
    )
    write_jdbc_upsert(
        df, "trades", ["symbol", "trade_id"],
        _recording_factory(out_dir), batch_size=2,
    )
    logs = _read_logs(out_dir)
    conns = [log for log in logs if log]
    assert len(conns) == 1  # one connection per non-empty partition
    log = conns[0]
    assert log[-1] == {"event": "commit"}
    batches = [e for e in log if "stmt" in e]
    assert [b["n"] for b in batches] == [2, 2, 1]  # batch_size chunking
    stmt = batches[0]["stmt"]
    assert "ON CONFLICT (symbol, trade_id)" in stmt
    assert "price = EXCLUDED.price" in stmt
    rows = {tuple(p) for b in batches for p in b["params"]}
    assert rows == {(i, "BTCUSDT", i * 1.5) for i in range(5)}


def test_jdbc_upsert_foreach_batch_skips_empty_and_writes(spark, tmp_path):
    out_dir = str(tmp_path / "writes")
    os.makedirs(out_dir)
    apply_fn = jdbc_upsert_foreach_batch(
        "trades", ["trade_id"], _recording_factory(out_dir)
    )
    empty = spark.createDataFrame([], "trade_id long, price double")
    apply_fn(empty, 0)
    assert _read_logs(out_dir) == []
    batch = spark.createDataFrame([(1, 2.0)], "trade_id long, price double").coalesce(1)
    apply_fn(batch, 1)
    logs = [log for log in _read_logs(out_dir) if log]
    assert len(logs) == 1 and logs[0][-1] == {"event": "commit"}
    assert logs[0][0]["params"] == [[1, 2.0]]


def _batch_tagged_factory(out_dir: str, batch_id: int):
    """Like _recording_factory but filenames carry the micro-batch id,
    so the replay interpreter can apply cross-batch writes in delivery
    order (within a batch, keys are unique — aggregation emits one row
    per key per batch — so intra-batch order is irrelevant)."""

    def factory():
        import json as _json
        import os as _os
        import uuid as _uuid

        path = _os.path.join(out_dir, f"{batch_id:05d}_{_uuid.uuid4().hex}.jsonl")

        class Cursor:
            def executemany(self, stmt, batch):
                with open(path, "a") as f:
                    f.write(_json.dumps({"stmt": stmt,
                                         "params": [list(p) for p in batch]}) + "\n")

        class Conn:
            def cursor(self):
                return Cursor()

            def commit(self):
                with open(path, "a") as f:
                    f.write(_json.dumps({"event": "commit"}) + "\n")

            def rollback(self):
                with open(path, "a") as f:
                    f.write(_json.dumps({"event": "rollback"}) + "\n")

            def close(self):
                pass

        return Conn()

    return factory


def _replay_on_conflict(out_dir: str, columns: list[str], key: list[str]):
    """Postgres stand-in: apply every COMMITTED connection's batches in
    micro-batch delivery order to an in-memory table with
    INSERT … ON CONFLICT DO UPDATE semantics (last write per PK wins;
    uncommitted connections are discarded, as the DB would)."""
    table = {}
    for name in sorted(os.listdir(out_dir)):  # batch_id prefix orders files
        with open(os.path.join(out_dir, name)) as f:
            events = [json.loads(line) for line in f]
        if not events or events[-1] != {"event": "commit"}:
            continue
        for e in events:
            for p in e.get("params", []):
                row = dict(zip(columns, p))
                table[tuple(row[k] for k in key)] = row
    return table


def test_streaming_restart_replay_exactly_once(spark, tmp_path):
    # End-to-end exactly-once EFFECT for the JDBC sink (VERDICT r2 #6):
    # the sink lands micro-batch 0 in the "database", then the driver
    # dies BEFORE the checkpoint commit; the restarted query re-delivers
    # batch 0.  The DB sees the same ON CONFLICT rows twice and must end
    # in the state a single delivery produces — the fake applies real
    # upsert semantics instead of just recording statement text.
    from kp_crypto_market_analytics_spark.session import load_tables
    from kp_crypto_market_analytics_spark.sinks.jdbc import write_jdbc_upsert
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
    out_dir = str(tmp_path / "db"); os.makedirs(out_dir)
    crashed_flag = str(tmp_path / "crashed_once")
    spark.createDataFrame(pdf.iloc[:100]).coalesce(1).write.parquet(src + "/a")

    key = ["symbol", "open_time"]

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        batch_df = batch_df.withColumn(
            "open_time", F.date_format("open_time", "yyyy-MM-dd HH:mm:ss")
        )
        write_jdbc_upsert(
            batch_df, "candles", key, _batch_tagged_factory(out_dir, batch_id)
        )
        if not os.path.exists(crashed_flag):
            open(crashed_flag, "w").close()
            raise RuntimeError("injected: died after DB write, before checkpoint commit")

    def run_once(expect_fail=False):
        stream = spark.readStream.schema(e.schema).parquet(src + "/*")
        candles = candles_from_trades(stream, watermark=None)
        q = (
            candles.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        if expect_fail:
            with pytest.raises(Exception, match="injected"):
                q.awaitTermination(120)
        else:
            q.awaitTermination(120)

    run_once(expect_fail=True)   # batch 0 lands in DB, checkpoint does NOT commit
    run_once()                   # restart re-delivers batch 0

    exp_first = candles_from_trades(
        spark.createDataFrame(pdf.iloc[:100]), watermark=None
    )
    cols = list(exp_first.columns)  # exact sink schema
    table = _replay_on_conflict(out_dir, cols, key)
    assert sum(r["num_trades"] for r in table.values()) == 100, (
        "replayed delivery must not inflate counts (plain INSERT would give 200)"
    )
    assert len(table) == exp_first.count()

    # More data + clean restart: incremental processing, still exact.
    spark.createDataFrame(pdf.iloc[100:]).coalesce(1).write.parquet(src + "/b")
    run_once()
    table = _replay_on_conflict(out_dir, cols, key)
    assert sum(r["num_trades"] for r in table.values()) == 200
    exp_all = candles_from_trades(spark.createDataFrame(pdf), watermark=None)
    exp = {
        (r["symbol"], r["open_time"].strftime("%Y-%m-%d %H:%M:%S")): r["num_trades"]
        for r in exp_all.collect()
    }
    got = {k: r["num_trades"] for k, r in table.items()}
    assert got == exp
