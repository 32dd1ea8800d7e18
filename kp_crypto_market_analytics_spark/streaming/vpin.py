"""Streaming VPIN monitor: the volume-clock order-flow-imbalance
detector as a keyed stateful operator (the live twin of the batch
``a_vpin`` query; gated batch fold ``a_vpin_stream_parity``).

VPIN is *defined* on a volume clock, which makes it inherently
streaming: each symbol's tape is cut into fixed-volume buckets and a
bucket only "exists" once enough volume has arrived to close it.  The
keyed state is O(1) per symbol — the last tick price (for the tick
rule), the carried trade sign, the cumulative classified volume, and
the partials of the one open bucket — so state size is independent of
stream length, the canonical streaming-sufficient-statistics shape.

Emission contract: one row per COMPLETED bucket (a bucket completes
when the first classified row lands in a later bucket).  Because
bucket boundaries are pure integer arithmetic on the cumulative
volume, emissions are micro-batch-boundary independent: streaming the
same tape in 1 file or 10 yields identical rows.  The open bucket is
never emitted (its partials live in state) — exactly the rows the
batch fold drops as each symbol's max bucket id.

Exactness protocol: prices arrive as micro BIGINTs, volumes as
BIGINTs; every emitted column is an exact integer, so stream/batch
parity is bitwise, not tolerance-based.

Row-atomic contract (shared with ``a_vpin``): a row's whole volume is
assigned to the bucket its cumulative-volume-before falls in — no
trade splitting across buckets — so a row larger than the bucket size
produces an oversized bucket and skips ids, in BOTH the operator and
the SQL twin.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

VPIN_BUCKET_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket_id", LongType()),
        StructField("buy_vol", LongType()),
        StructField("sell_vol", LongType()),
        StructField("bucket_vol", LongType()),
        StructField("imbalance", LongType()),
    ]
)

# last tick price (micro), carried sign (0 = undefined yet), cumulative
# classified volume, open-bucket id (-1 = none) + its three partials.
STATE_SCHEMA = (
    "last_vm bigint, sign int, cumv bigint,"
    " ob_id bigint, ob_bv bigint, ob_sv bigint, ob_vol bigint"
)


def _vpin_emit(
    key: tuple,
    pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
    bucket_volume: int,
) -> Iterator["pandas.DataFrame"]:
    import pandas as pd

    (event_type,) = key
    if state.exists:
        last_vm, sign, cumv, ob_id, ob_bv, ob_sv, ob_vol = state.get
    else:
        last_vm, sign, cumv, ob_id, ob_bv, ob_sv, ob_vol = (
            None,
            0,
            0,
            -1,
            0,
            0,
            0,
        )
    out: list[dict[str, Any]] = []
    # applyInPandasWithState yields a group's micro-batch rows as
    # MULTIPLE Arrow chunks (~10k rows each) in shuffle order, so the
    # sort must be GLOBAL across the whole micro-batch — sorting each
    # chunk independently would evolve the tick-rule sign, cumulative
    # volume, and bucket ids out of order once a symbol's trigger rows
    # span more than one chunk, silently breaking stream/batch parity.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        whole = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values(["ts", "event_id"])
        for r in whole.itertuples():
            vm = int(r.vm)
            if last_vm is not None:
                d = vm - last_vm
                if d > 0:
                    sign = 1
                elif d < 0:
                    sign = -1
            last_vm = vm
            k = r.k
            if sign == 0 or k is None or pd.isna(k):
                continue
            k = int(k)
            b = cumv // bucket_volume
            if ob_id == -1:
                ob_id = b
            elif b != ob_id:
                out.append(
                    {
                        "event_type": event_type,
                        "bucket_id": int(ob_id),
                        "buy_vol": int(ob_bv),
                        "sell_vol": int(ob_sv),
                        "bucket_vol": int(ob_vol),
                        "imbalance": abs(int(ob_bv) - int(ob_sv)),
                    }
                )
                ob_id, ob_bv, ob_sv, ob_vol = b, 0, 0, 0
            if sign == 1:
                ob_bv += k
            else:
                ob_sv += k
            ob_vol += k
            cumv += k
    state.update(
        (
            last_vm,
            int(sign),
            int(cumv),
            int(ob_id),
            int(ob_bv),
            int(ob_sv),
            int(ob_vol),
        )
    )
    yield pd.DataFrame(
        out, columns=[f.name for f in VPIN_BUCKET_SCHEMA.fields]
    )


def vpin_stream(events: DataFrame, bucket_volume: int = 2000) -> DataFrame:
    """Keyed stateful VPIN bucketizer over a (streaming or batch) frame
    with columns (event_type, event_id, ts, vm, k): vm = micro price
    BIGINT, k = trade volume BIGINT (nullable).  Emits one row per
    completed fixed-volume bucket."""

    def fn(key, pdfs, state):
        return _vpin_emit(key, pdfs, state, bucket_volume)

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=VPIN_BUCKET_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
