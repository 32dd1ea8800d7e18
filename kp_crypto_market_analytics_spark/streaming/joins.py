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
    in_range = lambda: (  # noqa: E731
        (F.col(f"c.{ctx_ts}") <= F.col(f"f.{fact_ts}"))
        & (
            F.col(f"c.{ctx_ts}")
            > F.col(f"f.{fact_ts}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    if f.isStreaming or c.isStreaming:
        # Streaming: the raw time-range condition must live in the join
        # so Spark derives the state bound from it (watermark +
        # lookback eviction).
        if f.isStreaming:
            f = f.withWatermark(fact_ts, watermark)
        if c.isStreaming:
            c = c.withWatermark(ctx_ts, watermark)
        cond = (F.col(f"f.{key}") == F.col(f"c.{key}")) & in_range()
        return f.alias("f").join(c.alias("c"), cond, how)
    # Batch: an equi-join on a low-cardinality key materializes
    # |facts|×|ctx| pairs PER KEY before the range filter — quadratic
    # in symbol depth.  Bucket time at the lookback width instead
    # (the operators.joins.range_join_buckets recipe): ctx_ts <=
    # fact_ts < ctx_ts + L means the fact's bucket is the ctx's
    # bucket or the next one, so the ctx side explodes into exactly 2
    # buckets, the join key becomes the high-cardinality (key,
    # bucket), and the exact predicate filters the tiny per-bucket
    # candidates.  Row-for-row equal to the raw theta join — but ONLY
    # for facts-preserving join types: the explode duplicates each ctx
    # row into 2 bucket copies, so right/full outer would emit an
    # unmatched ctx row TWICE (one null-padded row per copy).  Those
    # ctx-preserving modes take the raw theta join instead.
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        cond = (F.col(f"f.{key}") == F.col(f"c.{key}")) & in_range()
        return f.alias("f").join(c.alias("c"), cond, how)
    lb_ms = _interval_ms(lookback)
    fb = f.withColumn(
        "__fb", F.floor(F.unix_millis(F.col(fact_ts)) / F.lit(lb_ms))
    )
    cbucket = F.floor(F.unix_millis(F.col(ctx_ts)) / F.lit(lb_ms))
    cb = c.withColumn(
        "__cb", F.explode(F.array(cbucket, cbucket + F.lit(1)))
    )
    cond = (
        (F.col("f.__fb") == F.col("c.__cb"))
        & (F.col(f"f.{key}") == F.col(f"c.{key}"))
        & in_range()
    )
    return (
        fb.alias("f")
        .join(cb.alias("c"), cond, how)
        .drop("__fb")
        .drop("__cb")
    )


def _interval_ms(interval: str) -> int:
    """Milliseconds in a compound ``'N unit [N unit ...]'`` interval
    string — the same grammar the streaming path's ``INTERVAL``
    expression accepts for watermark-style strings ('500 milliseconds',
    '1 week', '1 hour 30 minutes'), so lookbacks that work in
    streaming mode never raise in batch mode.  Unknown units raise a
    ``ValueError`` naming the accepted grammar at function entry
    instead of a bare ``KeyError`` deep in the plan build."""
    unit_ms = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
        "week": 604_800_000,
    }
    parts = interval.split()
    if not parts or len(parts) % 2:
        raise ValueError(
            f"lookback {interval!r}: expected 'N unit [N unit ...]' with"
            f" units {sorted(unit_ms)} (plural accepted)"
        )
    total = 0
    for n, unit in zip(parts[::2], parts[1::2]):
        u = unit.lower().rstrip("s")
        if u not in unit_ms or not n.lstrip("-").isdigit() or int(n) < 0:
            raise ValueError(
                f"lookback {interval!r}: expected 'N unit [N unit ...]'"
                f" with non-negative integer N and units"
                f" {sorted(unit_ms)} (plural accepted)"
            )
        total += int(n) * unit_ms[u]
    if total == 0:
        # An all-zero lookback ('0 minutes') has no valid bucket width:
        # lb_ms=0 would flow into floor(ms/0) in the bucketed batch
        # path (NULL buckets => silently empty join) while the raw
        # theta path still matches ts-equal rows — exactly the
        # batch/stream divergence this rewrite must preclude.
        raise ValueError(
            f"lookback {interval!r}: total duration must be positive"
        )
    return total
