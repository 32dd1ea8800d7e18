"""Streaming CUSUM change-point monitor (stateful twin of the batch
``w_cusum`` query).

Batch CUSUM unrolls the clamp recurrence into window ops (see
queries_indicators.w_cusum); a LIVE monitor cannot — the running
statistic must survive micro-batch boundaries, and the prefix-min
trick needs the whole history.  The recurrence form is exactly what
keyed state is for: two floats (S⁺, S⁻) per symbol, O(1) state
regardless of stream length.

Baselines (μ, σ per symbol) are a precomputed reference-period input —
the realistic deployment shape: train the baseline offline (one batch
agg), monitor online against it.  Batch/stream equivalence for a fixed
baseline is pinned by tests/test_sinks_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CUSUM_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
        StructField("alarm", BooleanType()),
    ]
)

STATE_SCHEMA = "sp double, sn double"


def _cusum_emit(
    key: tuple,
    pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
    baselines: dict[str, tuple[float, float]],
    kappa_sigma: float,
    h_sigma: float,
) -> Iterator["pandas.DataFrame"]:
    import pandas as pd

    (symbol,) = key
    sp, sn = state.get if state.exists else (0.0, 0.0)
    mu, sigma = baselines.get(symbol, (0.0, 1.0))
    kappa = kappa_sigma * sigma
    h = h_sigma * sigma
    out_rows: list[dict[str, Any]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for r in pdf.itertuples():
            # same 6-dp step rounding as the batch twin; the float64
            # accumulation tracks the batch decimal statistic to ~1e-10
            sp = max(0.0, sp + round(float(r.value) - mu - kappa, 6))
            sn = max(0.0, sn + round(mu - float(r.value) - kappa, 6))
            out_rows.append(
                {
                    "symbol": symbol,
                    "event_id": int(r.event_id),
                    "ts": r.ts,
                    "value": float(r.value),
                    "cusum_pos": sp,
                    "cusum_neg": sn,
                    "alarm": bool(sp > h or sn > h),
                }
            )
    state.update((sp, sn))
    yield pd.DataFrame(out_rows, columns=[f.name for f in CUSUM_SCHEMA.fields])


def cusum_stream(
    events: DataFrame,
    baselines: dict[str, tuple[float, float]],
    kappa_sigma: float = 0.25,
    h_sigma: float = 4.0,
) -> DataFrame:
    """Keyed stateful CUSUM over a streaming frame with columns
    (symbol, event_id, ts, value) against precomputed per-symbol
    baselines {symbol: (mu, sigma)}.  Works on batch frames too (state
    spans the whole group — same result as the w_cusum windows)."""

    def fn(key, pdfs, state):
        return _cusum_emit(key, pdfs, state, baselines, kappa_sigma, h_sigma)

    return events.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
