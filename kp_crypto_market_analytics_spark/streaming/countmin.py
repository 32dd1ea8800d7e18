"""Streaming frequency sketch with constant state: sharded count-min
counters carried across micro-batches.

Exact streaming term frequencies need |vocab| state (unbounded); the
production streaming form is the count-min counter grid AS the keyed
state.  The stream is sharded by token hash so updates parallelize;
because CMS is LINEAR (sketch(A∪B) = sketch(A) + sketch(B) cell-wise),
the per-shard grids cell-sum into exactly the sketch a single pass
would build — the same mergeability story as the HLL (max-merge) and
DDSketch (count-sum) streaming states, and the property the parity
test pins against the batch ``t_countmin_hh`` sketch.

State per shard: 4×1024 BIGINT counters (32 KiB), no matter how many
tokens the stream has seen.  Hash layout is the exact Python twin of
the engine/oracle side (md5-derived 60-bit hash, per-row salt).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from kp_crypto_market_analytics_spark.functions.text import hash64_py
from kp_crypto_market_analytics_spark.queries_corpus import _CM_ROWS, _CM_WIDTH

# Grid geometry IS the batch sketch's — imported, not re-declared, so a
# batch-side tuning can never silently diverge the streaming twin.
CM_ROWS = _CM_ROWS
CM_WIDTH = _CM_WIDTH

CM_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("n_seen", LongType()),
        StructField("counters", ArrayType(LongType())),
    ]
)

STATE_SCHEMA = "counters array<bigint>, n_seen bigint"


def cm_cells(tok: str) -> list[tuple[int, int]]:
    """The (row, bucket) cells one token increments — identical salt
    layout to the batch sketch (``tok#cm{j}`` → bucket = h60 % width)."""
    return [(j, hash64_py(f"{tok}#cm{j}") % CM_WIDTH) for j in range(CM_ROWS)]


def shard_of(tok: str, n_shards: int) -> int:
    """Stream shard of a token (hash-stable: a token always lands on
    the same shard, so shard grids never double-count)."""
    return hash64_py(f"{tok}#shard") % n_shards


def _cm_emit(
    key: tuple,
    pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pandas.DataFrame"]:
    import pandas as pd

    (shard,) = key
    if state.exists:
        counters, n_seen = list(state.get[0]), int(state.get[1])
    else:
        counters, n_seen = [0] * (CM_ROWS * CM_WIDTH), 0
    for pdf in pdfs:
        for tok in pdf["tok"]:
            for j, b in cm_cells(str(tok)):
                counters[j * CM_WIDTH + b] += 1
        n_seen += len(pdf)
    state.update((counters, n_seen))
    yield pd.DataFrame(
        [{"shard": shard, "n_seen": n_seen, "counters": counters}],
        columns=[f.name for f in CM_SCHEMA.fields],
    )


def countmin_stream(toks: DataFrame) -> DataFrame:
    """Sharded streaming count-min over a STREAMING frame with columns
    (shard, tok).  Emits each shard's full counter grid per micro-batch
    (the running sketch after that batch); cell-summing the final
    per-shard grids yields the exact single-pass batch sketch —
    linearity, pinned by the parity test against ``t_countmin_hh``'s
    engine-built cells."""
    return toks.groupBy("shard").applyInPandasWithState(
        _cm_emit,
        outputStructType=CM_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
