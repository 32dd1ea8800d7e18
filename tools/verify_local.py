"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
values (exact for non-floats; exact AND approx-tolerance reported for
floats so rounding risk is visible before the driver runs).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "timestamp") and not isinstance(v, str):  # datetime
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def compare(spark_rows, duck_rows, spark_cols, duck_cols):
    issues = []
    if len(spark_rows) != len(duck_rows):
        issues.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        return issues, None
    if sorted(spark_cols) != sorted(duck_cols):
        issues.append(f"columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return issues, None
    # driver sorts columns by name before hashing
    s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_ix = [duck_cols.index(c) for c in sorted(duck_cols)]

    def keyrow(row, ix):
        out = []
        for i in ix:
            v = normalize(row[i])
            out.append(repr(v) if not isinstance(v, float) else f"{v:.17g}")
        return tuple(out)

    s_sorted = sorted(keyrow(r, s_ix) for r in spark_rows)
    d_sorted = sorted(keyrow(r, d_ix) for r in duck_rows)
    max_float_delta = 0.0
    n_mismatch = 0
    for sr, dr in zip(s_sorted, d_sorted):
        if sr == dr:
            continue
        # measure float deltas
        row_bad = False
        for a, b in zip(sr, dr):
            if a == b:
                continue
            try:
                fa, fb = float(a), float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                delta = abs(fa - fb) / max(1.0, abs(fa), abs(fb))
                max_float_delta = max(max_float_delta, delta)
                if delta > 1e-9:
                    row_bad = True
            except (ValueError, TypeError):
                row_bad = True
        if row_bad:
            n_mismatch += 1
            if n_mismatch <= 3:
                issues.append(f"row mismatch: spark={sr[:6]} duck={dr[:6]}")
    if n_mismatch:
        issues.append(f"{n_mismatch} mismatched rows")
    return issues, max_float_delta


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from kp_crypto_market_analytics_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(spark_rows)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        issues, max_delta = compare(spark_rows, duck_rows, spark_cols, duck_cols)
        exact = not issues and (max_delta == 0.0 or max_delta is None)
        if not issues:
            tag = "PASS" if exact else "pass~"
            print(
                f"{tag} {name}: rows={len(spark_rows)} max_float_delta={max_delta} [{time.time()-t0:.1f}s]"
            )
            n_pass += 1
        else:
            print(f"FAIL {name}: rows={len(spark_rows)} {issues[:5]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
