"""JDBC upsert writer (SURVEY.md §2.1 S13-S14 write-back parity).

The reference ETL's terminal state is rows in PostgreSQL via
`INSERT … ON CONFLICT (pk) DO UPDATE SET col = EXCLUDED.col`
(load_postgres.py:83-103).  Spark's built-in JDBC writer only appends
or overwrites, so the upsert runs as ``foreachPartition``: each
partition opens its own DB-API connection (executor-side — the driver
never funnels rows) and streams `executemany` batches of the generated
statement.  Parallelism = DataFrame partitions, the JDBC-write analog
of file-sink tasks; repartition the frame to the connection budget the
database can absorb.

The connection is a picklable factory the caller supplies
(psycopg2.connect in production).  No PostgreSQL ships in this
container, but the protocol is exercised against REAL databases:
``write_jdbc_upsert`` end-to-end against DuckDB (a DB-API engine with
ON CONFLICT — idempotent replay + last-write-wins verified by reading
the database back) and the staged MERGE path against embedded Apache
Derby (tests/test_jdbc_roundtrip.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame


def upsert_statement(
    table: str,
    columns: list[str],
    key: list[str],
    dialect: str = "postgres",
    placeholder: str = "%s",
) -> str:
    """SQL text for a key-merge upsert of one row batch.

    ``postgres`` emits INSERT … ON CONFLICT DO UPDATE (EXCLUDED.*
    semantics, load_postgres.py:95-101); ``merge`` emits ANSI/Spark-SQL
    MERGE INTO for engines without ON CONFLICT.  Key columns are never
    re-assigned in the update clause."""
    if not columns or not key:
        raise ValueError("columns and key must be non-empty")
    missing = [k for k in key if k not in columns]
    if missing:
        raise ValueError(f"key columns not in columns: {missing}")
    cols = ", ".join(columns)
    vals = ", ".join([placeholder] * len(columns))
    updates = [c for c in columns if c not in key]
    if dialect == "postgres":
        conflict = ", ".join(key)
        if updates:
            setters = ", ".join(f"{c} = EXCLUDED.{c}" for c in updates)
            action = f"DO UPDATE SET {setters}"
        else:
            action = "DO NOTHING"
        return (
            f"INSERT INTO {table} ({cols}) VALUES ({vals}) "
            f"ON CONFLICT ({conflict}) {action}"
        )
    if dialect == "merge":
        on = " AND ".join(f"t.{k} = s.{k}" for k in key)
        src_cols = ", ".join(f"{placeholder} AS {c}" for c in columns)
        insert_vals = ", ".join(f"s.{c}" for c in columns)
        stmt = (
            f"MERGE INTO {table} t USING (SELECT {src_cols}) s ON {on} "
        )
        if updates:
            setters = ", ".join(f"t.{c} = s.{c}" for c in updates)
            stmt += f"WHEN MATCHED THEN UPDATE SET {setters} "
        stmt += f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({insert_vals})"
        return stmt
    raise ValueError(f"unknown dialect: {dialect}")


def merge_from_staging_statement(
    table: str,
    staging: str,
    columns: list[str],
    key: list[str],
) -> str:
    """MERGE INTO ``table`` from a staged BASE table — the bulk-load
    upsert shape (reference load_postgres.py:66-103 stages rows, then
    upserts into the target).  Unlike :func:`upsert_statement`'s
    row-parameterized ``merge`` dialect (a ``USING (SELECT ?…)``
    source, which engines like Derby reject — their MERGE source must
    be a base table), this form works on every MERGE-capable engine
    and moves the whole batch in ONE set-oriented statement — the
    scale path: stage via the parallel JDBC writer, merge once.

    The staging table must be key-deduplicated first (standard MERGE
    precondition: two source rows matching one target row is an
    error on every engine)."""
    if not columns or not key:
        raise ValueError("columns and key must be non-empty")
    missing = [k for k in key if k not in columns]
    if missing:
        raise ValueError(f"key columns not in columns: {missing}")
    on = " AND ".join(f"t.{k} = s.{k}" for k in key)
    updates = [c for c in columns if c not in key]
    stmt = f"MERGE INTO {table} t USING {staging} s ON {on} "
    if updates:
        setters = ", ".join(f"t.{c} = s.{c}" for c in updates)
        stmt += f"WHEN MATCHED THEN UPDATE SET {setters} "
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    stmt += f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    return stmt


def write_jdbc_upsert(
    df: DataFrame,
    table: str,
    key: list[str],
    connection_factory: Callable[[], Any],
    dialect: str = "postgres",
    batch_size: int = 1000,
    placeholder: str = "%s",
) -> None:
    """Upsert ``df`` into ``table`` on ``key`` through DB-API
    connections opened PER PARTITION on the executors.

    Each partition: one connection, `executemany` in ``batch_size``
    chunks, single commit at the end (per-partition atomicity — the
    idempotent ON CONFLICT statement makes task retries safe, the same
    argument as the reference's re-runnable loader).  The factory must
    be picklable (module-level function or functools.partial)."""
    columns = list(df.columns)
    stmt = upsert_statement(table, columns, key, dialect, placeholder)

    def _write_partition(rows: Iterator[Any]) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch: list[tuple] = []
            for row in rows:
                batch.append(tuple(row[c] for c in columns))
                if len(batch) >= batch_size:
                    cur.executemany(stmt, batch)
                    batch = []
            if batch:
                cur.executemany(stmt, batch)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    df.foreachPartition(_write_partition)


def jdbc_upsert_foreach_batch(
    table: str,
    key: list[str],
    connection_factory: Callable[[], Any],
    dialect: str = "postgres",
    batch_size: int = 1000,
):
    """Streaming adapter: ``writeStream.foreachBatch(...)`` lands every
    micro-batch in the RDBMS with upsert semantics — checkpoint replays
    re-execute the same ON CONFLICT rows and change nothing (S14
    idempotence, streaming edition)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_jdbc_upsert(
            batch_df, table, key, connection_factory, dialect, batch_size
        )

    return _apply
