"""Stream-stream joins (beyond-reference Structured Streaming
coverage: the reference only ever polls and recomputes batch-fully).

The canonical enrich: a trades stream joined to a quotes stream where
the quote is at-or-before the trade within a bounded lookback.  Both
sides carry watermarks so Spark can bound join state: a quote older
than (watermark + lookback) can never match a future trade and is
evicted.  The time-range predicate is what makes state finite —
an unbounded stream-stream equi join would buffer forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_recent(
    facts: DataFrame,
    context: DataFrame,
    key: str = "symbol",
    fact_ts: str = "ts",
    ctx_ts: str = "ctx_ts",
    lookback: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to every context row of the same key within
    ``(fact_ts - lookback, fact_ts]``.  Works identically on batch
    frames (no watermark applied) — the batch twin is the equivalence
    oracle in tests.

    State bound: |keys| × (watermark + lookback) worth of context rows.
    """
    f, c = facts, context
    if f.isStreaming:
        f = f.withWatermark(fact_ts, watermark)
    if c.isStreaming:
        c = c.withWatermark(ctx_ts, watermark)
    cond = (
        (F.col(f"f.{key}") == F.col(f"c.{key}"))
        & (F.col(f"c.{ctx_ts}") <= F.col(f"f.{fact_ts}"))
        & (F.col(f"c.{ctx_ts}") > F.col(f"f.{fact_ts}") - F.expr(f"INTERVAL {lookback}"))
    )
    return f.alias("f").join(c.alias("c"), cond, how)
