"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

Usage: python tools/explain_dump.py <tag> <suffix> <query> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (the judge's
plan-evidence contract: `_before`/`_after` pairs per touched query).
Runs on the bench session config (approx-sketch confs on, same as
bench.py) so the captured plan is the plan the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kp_crypto_market_analytics_spark.operators.aggregates import (
        APPROX_DISTINCT_CONF,
        APPROX_QUANTILES_CONF,
    )
    from kp_crypto_market_analytics_spark.queries import QUERIES
    from kp_crypto_market_analytics_spark.session import get_spark

    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(APPROX_QUANTILES_CONF, "true")
    spark.conf.set(APPROX_DISTINCT_CONF, "true")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange nodes)")


if __name__ == "__main__":
    main()
