"""Streaming Welch A/B monitor (stateful twin of the batch
``a_welch_ttest`` query and the per-batch fold ``a_welch_stream_parity``
gates).

A live experimentation monitor cannot re-aggregate history per
trigger: the per-arm moments (n, Σv, Σv²) must survive micro-batch
boundaries.  Welch's statistic is a pure function of those six
numbers, so the keyed state is O(1) per group regardless of stream
length — the canonical streaming-sufficient-statistics shape.

Exactness protocol (shared with the batch twin): values are cast to
scale-6 decimals (micro units) BEFORE summation, so Σv is an exact
integer number of micros and Σv² an exact integer number of
pico-units; both engines' double-valued t/dof are then the identical
IEEE chain over the SAME exact rationals.  The state carries the
integers as strings because Σv² exceeds int64 on long streams —
Python integers are unbounded, Spark state columns are not.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WELCH_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("batch_idx", LongType()),
        StructField("n_a", LongType()),
        StructField("n_b", LongType()),
        StructField("mean_a", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("t_stat", DoubleType()),
        StructField("welch_dof", DoubleType()),
    ]
)

# exact integer moments as strings (sum of pico-units overflows int64)
STATE_SCHEMA = (
    "k bigint, na bigint, sa string, qa string,"
    " nb bigint, sb string, qb string"
)

_MICRO = Decimal("0.000001")


def _v_micro(v: float) -> int:
    """Spark's double→DECIMAL(18,6) cast, exactly: Spark rounds the
    SHORTEST decimal representation (Java Double.toString) HALF_UP at
    the 6th place, and Python's repr() is the same shortest round-trip
    decimal — so quantize Decimal(repr(v)), NOT Decimal(v) (the exact
    binary expansion diverges by 1 micro on 7th-digit ties; ADVICE
    r8)."""
    return int(
        Decimal(repr(v)).quantize(_MICRO, rounding=ROUND_HALF_UP)
        * 1_000_000
    )


def _round_mean_micro_py(micro: int, n: int) -> float:
    """Python twin of operators.aggregates.round_mean_micro (exact
    half-away-from-zero micro division)."""
    sign = -1 if micro < 0 else 1
    return sign * ((2 * abs(micro) + n) // (2 * n)) / 1_000_000.0


def welch_from_moments(
    na: int, sa: int, qa: int, nb: int, sb: int, qb: int
) -> tuple[float | None, float | None, float | None, float | None]:
    """(mean_a, mean_b, t, dof) from exact integer micro/pico moments —
    the identical IEEE chain a_welch_ttest runs on its decimal sums."""
    mean_a = _round_mean_micro_py(sa, na) if na > 0 else None
    mean_b = _round_mean_micro_py(sb, nb) if nb > 0 else None
    if na <= 1 or nb <= 1:
        return mean_a, mean_b, None, None
    # int/int true division is correctly rounded → same double as
    # Spark's decimal.doubleValue of the exact sums
    sa_d, qa_d = sa / 10**6, qa / 10**12
    sb_d, qb_d = sb / 10**6, qb / 10**12
    va = (qa_d - sa_d * sa_d / na) / (na - 1)
    vb = (qb_d - sb_d * sb_d / nb) / (nb - 1)
    aa, bb = va / na, vb / nb
    if not aa + bb > 0:
        return mean_a, mean_b, None, None
    t = (sa_d / na - sb_d / nb) / (aa + bb) ** 0.5
    dof = (aa + bb) * (aa + bb) / (
        aa * aa / (na - 1) + bb * bb / (nb - 1)
    )
    return (
        mean_a,
        mean_b,
        round(t, 6) + 0.0,
        round(dof, 6) + 0.0,
    )


def _welch_emit(
    key: tuple,
    pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
    arm_a,
) -> Iterator["pandas.DataFrame"]:
    import pandas as pd

    (etype,) = key
    if state.exists:
        k, na, sa_s, qa_s, nb, sb_s, qb_s = state.get
        sa, qa, sb, qb = int(sa_s), int(qa_s), int(sb_s), int(qb_s)
    else:
        k = na = sa = qa = nb = sb = qb = 0
    for pdf in pdfs:
        for r in pdf.itertuples():
            m = _v_micro(float(r.value))
            if arm_a(r):
                na += 1
                sa += m
                qa += m * m
            else:
                nb += 1
                sb += m
                qb += m * m
    k += 1
    state.update((k, na, str(sa), str(qa), nb, str(sb), str(qb)))
    mean_a, mean_b, t, dof = welch_from_moments(na, sa, qa, nb, sb, qb)
    yield pd.DataFrame(
        [
            {
                "event_type": etype,
                "batch_idx": k,
                "n_a": na,
                "n_b": nb,
                "mean_a": mean_a,
                "mean_b": mean_b,
                "t_stat": t,
                "welch_dof": dof,
            }
        ],
        columns=[f.name for f in WELCH_SCHEMA.fields],
    )


def welch_monitor_stream(events: DataFrame, arm_a=None) -> DataFrame:
    """Keyed stateful Welch monitor over a streaming frame with
    columns (event_type, ts, value): per micro-batch and event type,
    one emission with the cumulative per-arm counts, exact micro
    means, and the Welch t / Welch–Satterthwaite dof.  ``arm_a`` is a
    row predicate choosing arm A (default: weekend rows — the batch
    a_welch_ttest arms).  Works on batch frames too (one emission
    covering the whole group)."""
    if arm_a is None:
        def arm_a(r):  # noqa: ANN001
            return r.ts.weekday() >= 5  # Sat/Sun

    def fn(key, pdfs, state):
        return _welch_emit(key, pdfs, state, arm_a)

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=WELCH_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
