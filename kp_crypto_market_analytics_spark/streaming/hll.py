"""Streaming distinct-cardinality with constant state: a keyed
HyperLogLog register array carried across micro-batches.

``count_distinct`` needs per-user state (unbounded on a stream);
``approx_count_distinct`` is batch-only as an aggregate over complete
groups.  The production streaming form is the HLL register array AS the
keyed state: 1024 small ints per key, updated from each micro-batch and
merged by element-wise max — the same mergeability law the batch
queries gate (``a_hll_merge``).  Total state is |keys| × 1024 ints no
matter how many events the stream has seen.

Register layout, hash, and estimator are BIT-IDENTICAL to the batch
side (queries_ext ``_hll_registers`` / ``_hll_estimate``: portable
md5-derived 60-bit hash, low-10-bit index, bitlength rank, integer-
exact register sum, linear-counting correction) so the streaming
emission equals the batch query on the same prefix of data —
tests/test_sinks_streaming.py pins that parity across micro-batch
boundaries.
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

HLL_P = 10
HLL_M = 1 << HLL_P
HLL_MAXRANK = 60 - HLL_P + 1
HLL_SCALE = 1 << HLL_MAXRANK
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)

HLL_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events_seen", LongType()),
        StructField("hll_est", DoubleType()),
    ]
)

STATE_SCHEMA = "regs array<integer>, n_seen bigint"


def hll_rank_parts(user: str) -> tuple[int, int]:
    """(register index, rank) of one key — the exact Python twin of the
    engine-side hash64/shiftright/conv layout."""
    from kp_crypto_market_analytics_spark.functions.text import hash64_py

    h = hash64_py(f"{user}#hll")
    idx = h % HLL_M
    w = h >> HLL_P
    rank = HLL_MAXRANK if w == 0 else HLL_MAXRANK - w.bit_length()
    return idx, rank


def hll_estimate(regs: list[int]) -> float:
    """Estimate from a full register array (0 = empty register) —
    integer-exact register sum, linear-counting correction, round(4);
    identical arithmetic to queries_ext._hll_estimate."""
    zeros = sum(1 for m in regs if m == 0)
    s_total = sum(1 << (HLL_MAXRANK - m) for m in regs if m > 0) + zeros * HLL_SCALE
    raw = HLL_ALPHA * float(HLL_M) * float(HLL_M) * float(HLL_SCALE) / s_total
    if raw <= 2.5 * HLL_M and zeros > 0:
        est = float(HLL_M) * math.log(float(HLL_M) / zeros)
    else:
        est = raw
    return round(est, 4)


def _hll_emit(
    key: tuple,
    pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pandas.DataFrame"]:
    import pandas as pd

    (event_type,) = key
    if state.exists:
        regs, n_seen = list(state.get[0]), int(state.get[1])
    else:
        regs, n_seen = [0] * HLL_M, 0
    for pdf in pdfs:
        for u in pdf["u"]:
            idx, rank = hll_rank_parts(str(u))
            if rank > regs[idx]:
                regs[idx] = rank
        n_seen += len(pdf)
    state.update((regs, n_seen))
    yield pd.DataFrame(
        [
            {
                "event_type": event_type,
                "n_events_seen": n_seen,
                "hll_est": hll_estimate(regs),
            }
        ],
        columns=[f.name for f in HLL_SCHEMA.fields],
    )


def distinct_users_stream(events: DataFrame) -> DataFrame:
    """Keyed streaming distinct-user estimate over a STREAMING frame
    with columns (event_type, u).  Emits one (event_type,
    n_events_seen, hll_est) row per key per micro-batch — the running
    cardinality after that batch.  Streaming-only
    (applyInPandasWithState rejects batch frames); the batch twin is
    ``queries_ext.a_hll_distinct``, and the parity test pins that the
    final streaming emission equals it."""
    return events.groupBy("event_type").applyInPandasWithState(
        _hll_emit,
        outputStructType=HLL_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
