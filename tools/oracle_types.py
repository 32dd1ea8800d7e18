"""Oracle output-type tripwire.

The driver's correctness hash is TYPE-SENSITIVE: an uncast DuckDB
``SUM(bigint)`` returns HUGEINT (int128) where Spark's ``sum(long)``
returns BIGINT, so value-equal results still hash-mismatch.  That
exact failure burned ``p_props_extract`` in round 1 and the four
round-3 FAILs (``ti_obv``, ``t_word_entropy``, ``t_bpe_merges``,
``t_countmin_hh``).  ``tools/verify_local.py``'s comparator normalizes
Decimal/int128 to Python numbers, so it structurally CANNOT see this
class of miss — this tripwire inspects the bound output schema of
every oracle instead.  DuckDB relations expose output types from
binding alone (parquet footers only, no row reads), so sweeping all
~200 oracles takes seconds.

Any oracle whose output (including nested list/struct element types)
contains a type outside the approved map fails.  Approved = the DuckDB
types whose values hash identically to the Spark types our queries
produce.
"""

from __future__ import annotations

import os
import re

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_TYPES_SF_DIR", "/root/testdata/sf0.001")

# DuckDB base type ids that map 1:1 onto the Spark result types our
# queries emit.  Anything NOT here (HUGEINT, UHUGEINT, UBIGINT,
# UINTEGER, INTERVAL, TIME, BIT, ...) is a hash landmine.
_APPROVED_BASE = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "DECIMAL",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
    "BLOB",
    "LIST",
    "STRUCT",
    "MAP",
}

_TYPE_WORD = re.compile(r"[A-Z][A-Z_]*(?: [A-Z][A-Z_]*)*")


def _base_ids(t) -> set[str]:
    """All base type identifiers in a DuckDB type, walked STRUCTURALLY
    (``DuckDBPyType.id`` + ``.children``), e.g. ``STRUCT(a HUGEINT,
    b VARCHAR[])`` -> {STRUCT, HUGEINT, VARCHAR, LIST}.

    Structural, not string-rendered: a quoted uppercase struct-field
    alias (``STRUCT("N" BIGINT)`` renders as ``N BIGINT``) must not be
    flagged as a pseudo-type.  Falls back to the regex scan only for
    plain strings (callers passing pre-rendered type names, e.g. in
    tests)."""
    if isinstance(t, str):
        out = set()
        if "[]" in t:
            out.add("LIST")
        for m in _TYPE_WORD.finditer(t):
            out.add(m.group())
        return out
    out = {str(t.id).upper()}
    # Recurse into nested element types only: struct/list/map children
    # are (name, DuckDBPyType) pairs; decimal's are (precision, scale)
    # ints and must not be walked.
    if str(t.id) in ("struct", "list", "map", "union", "array"):
        try:
            children = t.children
        except Exception:
            children = []
        for _, child in children:
            if isinstance(child, duckdb.typing.DuckDBPyType):
                out |= _base_ids(child)
    return out


def offending_types(types: list) -> list[str]:
    """Return the disapproved base ids found in a list of DuckDB
    column types (objects or rendered strings; empty list == clean)."""
    bad = []
    for t in types:
        for base in _base_ids(t):
            if base not in _APPROVED_BASE and base not in bad:
                bad.append(base)
    return bad


def views_connection(sf_dir: str = DEFAULT_SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def oracle_output_types(
    sql: str, con: duckdb.DuckDBPyConnection
) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs for an oracle, from binding only."""
    rel = con.sql(sql)
    return list(zip(rel.columns, [str(t) for t in rel.types]))


def sweep(
    oracles: dict[str, str], con: duckdb.DuckDBPyConnection | None = None
) -> dict[str, list[str]]:
    """Bind every oracle and return {name: [bad_type, ...]} for all
    offenders (empty dict == registry is clean).  A binding error is
    surfaced as its own offender entry rather than swallowed."""
    own = con is None
    if own:
        con = views_connection()
    bad: dict[str, list[str]] = {}
    try:
        for name, sql in oracles.items():
            try:
                # Bind only — type OBJECTS, so nested types are walked
                # structurally (not regexed from the rendered string).
                types = list(con.sql(sql).types)
            except Exception as e:
                bad[name] = [f"BIND_ERROR: {e}"]
                continue
            off = offending_types(types)
            if off:
                bad[name] = off
    finally:
        if own:
            con.close()
    return bad


def main() -> int:
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod

    bad = sweep(entrymod.oracle_sql())
    if not bad:
        print("oracle type sweep: clean (no HUGEINT or off-map output columns)")
        return 0
    for name, off in sorted(bad.items()):
        print(f"OFFENDER {name}: {off}")
    print(f"\n{len(bad)} oracle(s) with hash-unsafe output types")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
