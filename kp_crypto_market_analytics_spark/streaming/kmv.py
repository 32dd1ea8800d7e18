"""Streaming distinct-cardinality with bounded state via KMV / theta
sketches: the k smallest distinct hashes per key carried across
micro-batches.

The HLL operator (streaming/hll.py) answers "how many distinct" with
constant state; KMV answers the same AND supports set algebra
(intersection / union estimates via theta thresholds — the batch twin
``a_kmv_overlap`` audits that), at state ≤ k hashes per key.  The
fold is union + re-top-k: by the min-wise order-statistic property,
the k smallest of a union are contained in the union of each side's k
smallest, so sequential accumulation is lossless — the law
``a_kmv_stream_parity`` gates against DuckDB prefix recomputation.

Hash and estimator are BIT-IDENTICAL to the batch side
(queries_quality ``a_kmv_overlap`` / ``a_kmv_stream_parity``:
portable md5-derived 60-bit hash of ``u || '#kmv'``, estimate
(k-1)·2^60/kth when the sketch is full, exact count when not);
tests/test_sinks_streaming.py pins the streaming emission against the
gated batch fold.
"""

from __future__ import annotations

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

KMV_K = 256
KMV_SCALE = 1 << 60  # hash64 range: [0, 2^60)

KMV_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events_seen", LongType()),
        StructField("n_kept", LongType()),
        StructField("kth_value", LongType()),
        StructField("kmv_est", DoubleType()),
    ]
)

STATE_SCHEMA = "hashes array<long>, n_seen bigint"


def kmv_hash(user: str) -> int:
    """60-bit portable hash of one key — the exact Python twin of the
    engine-side md5/substr/conv layout used by a_kmv_overlap."""
    from kp_crypto_market_analytics_spark.functions.text import hash64_py

    return hash64_py(f"{user}#kmv")


def kmv_estimate(hashes: list[int]) -> float:
    """Distinct estimate from a sorted sketch: exact count while the
    sketch is not full, (k-1)·scale/kth once it is — identical
    arithmetic to the gated batch fold.  kth <= 0 (a zero hash landing
    as the kth order statistic) falls back to the exact count so the
    divisor can never be zero; the batch est_expr and the DuckDB
    oracle carry the same guard, keeping all three bit-identical."""
    if len(hashes) < KMV_K or hashes[-1] <= 0:
        return float(len(hashes))
    return round(float(KMV_K - 1) * float(KMV_SCALE) / float(hashes[-1]), 6)


def _kmv_emit(
    key: tuple,
    pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pandas.DataFrame"]:
    import pandas as pd

    (event_type,) = key
    if state.exists:
        hashes, n_seen = list(state.get[0]), int(state.get[1])
    else:
        hashes, n_seen = [], 0
    seen = set(hashes)
    for pdf in pdfs:
        for u in pdf["u"]:
            seen.add(kmv_hash(str(u)))
        n_seen += len(pdf)
    hashes = sorted(seen)[:KMV_K]
    state.update((hashes, n_seen))
    yield pd.DataFrame(
        [
            {
                "event_type": event_type,
                "n_events_seen": n_seen,
                "n_kept": len(hashes),
                "kth_value": hashes[-1] if hashes else 0,
                "kmv_est": kmv_estimate(hashes),
            }
        ],
        columns=[f.name for f in KMV_SCHEMA.fields],
    )


def distinct_users_kmv_stream(events: DataFrame) -> DataFrame:
    """Keyed streaming KMV distinct-user estimate over a STREAMING
    frame with columns (event_type, u).  Emits one (event_type,
    n_events_seen, n_kept, kth_value, kmv_est) row per key per
    micro-batch — the running sketch stats after that batch.
    Streaming-only (applyInPandasWithState rejects batch frames); the
    sequential-fold law it relies on is gated by
    ``a_kmv_stream_parity``."""
    return events.groupBy("event_type").applyInPandasWithState(
        _kmv_emit,
        outputStructType=KMV_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
