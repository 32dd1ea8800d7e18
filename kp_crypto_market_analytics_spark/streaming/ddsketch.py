"""Streaming quantiles with constant state: a keyed DDSketch-style
bucket histogram carried across micro-batches.

Exact streaming percentiles need every value retained (unbounded on a
stream); the production streaming form is the log-bucket histogram AS
the keyed state — ≤ ~900 (bucket, count) pairs per key, updated from
each micro-batch by count increments and merged by count-sum, the same
mergeability law the batch side gates (``a_ddsketch_merge``).  Total
state is |keys| × buckets no matter how many rows the stream has seen.

Bucket layout and estimator are BIT-IDENTICAL to the batch side
(queries_quality ``_dds_buckets`` / ``_dds_estimates``: base-2 octaves
× 32 integer sub-buckets, ceil-rank cumulative walk, bucket-midpoint
answer) so the final streaming emission equals the batch computation on
the same data — tests/test_sinks_streaming.py pins that parity across
micro-batch boundaries.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kp_crypto_market_analytics_spark.queries_quality import _DDS_LEVELS, _DDS_SUB

DDS_SCHEMA = StructType(
    [StructField("g", StringType()), StructField("n_seen", LongType())]
    + [
        StructField(f"p{int(q * 100)}_est", DoubleType())
        for q in _DDS_LEVELS
    ]
)

STATE_SCHEMA = "keys array<bigint>, counts array<bigint>, n_seen bigint"


def dds_key(v: int) -> int:
    """Bucket key of one positive integer — the exact Python twin of
    the engine-side bitlength/sub-bucket integer math."""
    e = v.bit_length() - 1
    if e >= 5:
        return 32 * e + (v >> (e - 5)) - _DDS_SUB
    return 32 * e + (v - (1 << e))


def dds_midpoint(key: int) -> float:
    """Bucket midpoint — identical literal arithmetic to the engine/SQL
    estimator (lo + width/2 in IEEE doubles)."""
    e, s = divmod(key, 32)
    if e >= 5:
        width = 1 << (e - 5)
        lo = (s + _DDS_SUB) * width
    else:
        width, lo = 1, (1 << e) + s
    return float(lo) + float(width) / 2.0


def dds_estimate(hist: dict[int, int], q: float) -> float:
    """Quantile estimate from a bucket histogram: smallest bucket whose
    cumulative count reaches ceil(q·n), answered at its midpoint."""
    n = sum(hist.values())
    target = math.ceil(q * float(n))
    cum = 0
    for key in sorted(hist):
        cum += hist[key]
        if cum >= target:
            return dds_midpoint(key)
    raise ValueError("empty histogram")


def _dds_emit(
    key: tuple,
    pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pandas.DataFrame"]:
    import pandas as pd

    (g,) = key
    if state.exists:
        keys, counts, n_seen = state.get
        hist = dict(zip(keys, counts))
        n_seen = int(n_seen)
    else:
        hist, n_seen = {}, 0
    for pdf in pdfs:
        for v in pdf["v"]:
            k = dds_key(int(v))
            hist[k] = hist.get(k, 0) + 1
        n_seen += len(pdf)
    items = sorted(hist.items())
    state.update(([k for k, _ in items], [c for _, c in items], n_seen))
    row = {"g": g, "n_seen": n_seen}
    for q in _DDS_LEVELS:
        row[f"p{int(q * 100)}_est"] = dds_estimate(hist, q)
    yield pd.DataFrame([row], columns=[f.name for f in DDS_SCHEMA.fields])


def quantiles_stream(rows: DataFrame) -> DataFrame:
    """Keyed streaming quantile estimates over a STREAMING frame with
    columns (g, v) — v a positive BIGINT measure.  Emits one (g,
    n_seen, p50..p99) row per key per micro-batch: the running
    quantiles after that batch.  Streaming-only (applyInPandasWithState
    rejects batch frames); the batch twin is
    ``queries_quality.a_ddsketch_quantiles`` and the parity test pins
    that the final streaming emission equals the batch sketch."""
    return rows.groupBy("g").applyInPandasWithState(
        _dds_emit,
        outputStructType=DDS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
