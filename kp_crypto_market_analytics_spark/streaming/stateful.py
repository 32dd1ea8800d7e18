"""Custom stateful streaming operator: rolling volatility over a live
stream (SURVEY.md §2.9 / §7 — the one reference behavior with no
native Structured Streaming form: a 60-ROW trailing frame has no
window()/watermark equivalent, so it needs keyed state).

``applyInPandasWithState`` carries the last ``window_rows - 1`` values
per key across micro-batches; each incoming row (event-time ordered
within the batch) emits the trailing sample stddev with the reference's
``min_periods`` mask (pandas rolling(60, min_periods=30).std() parity,
binance_analysis.py:233-239).

State is a bounded float list — O(window) per key, so total state is
|symbols|×window doubles regardless of stream length; the watermark on
the upstream source bounds reordering, and replays are deterministic
because processing order within a batch is sorted on (ts, id).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ROLLING_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("rolling_std", DoubleType()),
    ]
)

STATE_SCHEMA = "values array<double>"


def _rolling_emit(
    key: tuple,
    pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
    window_rows: int,
    min_periods: int,
) -> Iterator["pandas.DataFrame"]:
    import pandas as pd

    (symbol,) = key
    tail: list[float] = list(state.get[0]) if state.exists else []
    out_rows: list[dict[str, Any]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for r in pdf.itertuples():
            tail.append(float(r.value))
            if len(tail) > window_rows:
                tail.pop(0)
            n = len(tail)
            if n >= min_periods:
                mean = sum(tail) / n
                var = sum((x - mean) ** 2 for x in tail) / (n - 1)
                std = math.sqrt(var)
            else:
                std = None
            out_rows.append(
                {
                    "symbol": symbol,
                    "event_id": int(r.event_id),
                    "ts": r.ts,
                    "value": float(r.value),
                    "rolling_std": std,
                }
            )
    state.update((tail[-(window_rows - 1):],))
    yield pd.DataFrame(out_rows, columns=[f.name for f in ROLLING_SCHEMA.fields])


def rolling_std_stream(
    events: DataFrame,
    window_rows: int = 60,
    min_periods: int = 30,
) -> DataFrame:
    """Keyed stateful rolling stddev over a streaming frame with
    columns (symbol, event_id, ts, value).  Works on batch frames too
    (state spans the whole group — same result as the W2 window)."""

    def fn(key, pdfs, state):
        return _rolling_emit(key, pdfs, state, window_rows, min_periods)

    return events.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=ROLLING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
