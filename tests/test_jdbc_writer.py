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
