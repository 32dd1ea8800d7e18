"""Streaming heavy hitters with bounded state via Misra-Gries
summaries: at most MG_K counters per key carried across micro-batches.

Completes the heavy-hitter pair the way the sketch quartet is built:
count-min (streaming/countmin.py) OVERestimates any probed key;
Misra-Gries UNDERestimates but carries its own candidate set with the
deterministic guarantee that any item with true prefix count above the
subtracted total is still in the summary.  The fold is
merge-counts-then-reduce (subtract the (k+1)-th largest weight, keep
positive — Misra & Gries 1982), whose batching-dependent algebra the
gated ``t_mg_stream_parity`` replays step-for-step against DuckDB;
tests/test_sinks_streaming.py pins this operator's emissions against
that gated fold.

State is <= MG_K (token, weight) counters + two integers per key —
constant regardless of stream length or vocabulary size.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MG_K = 15

MG_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_toks_seen", LongType()),
        StructField("state_size", LongType()),
        StructField("state_wsum", LongType()),
        StructField("d_step", LongType()),
        StructField("d_cum", LongType()),
        StructField("top_tok", StringType()),
        StructField("top_w", LongType()),
    ]
)

STATE_SCHEMA = (
    "toks array<string>, ws array<long>, n_seen bigint, d_cum bigint"
)


def mg_merge_reduce(
    weights: dict[str, int], batch_counts: dict[str, int], k: int = MG_K
) -> tuple[dict[str, int], int]:
    """One Misra-Gries fold step — the exact Python twin of the gated
    DataFrame fold (queries_quality.t_mg_stream_parity) and its DuckDB
    replay: merge by summing, subtract the (k+1)-th largest weight
    (counted with multiplicity; 0 when <= k entries), keep strictly
    positive.  Returns (new_state, subtracted_value)."""
    merged = dict(weights)
    for tok, c in batch_counts.items():
        merged[tok] = merged.get(tok, 0) + c
    if len(merged) <= k:
        return merged, 0
    d = sorted(merged.values(), reverse=True)[k]
    return {t: w - d for t, w in merged.items() if w - d > 0}, d


def _mg_emit(
    key: tuple,
    pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pandas.DataFrame"]:
    import pandas as pd

    (k,) = key
    if state.exists:
        toks, ws, n_seen, d_cum = state.get
        weights = dict(zip(list(toks), [int(w) for w in ws]))
        n_seen, d_cum = int(n_seen), int(d_cum)
    else:
        weights, n_seen, d_cum = {}, 0, 0
    batch: dict[str, int] = {}
    for pdf in pdfs:
        vc = pdf["tok"].value_counts()
        for tok, c in vc.items():
            batch[str(tok)] = batch.get(str(tok), 0) + int(c)
        n_seen += len(pdf)
    weights, d = mg_merge_reduce(weights, batch)
    d_cum += d
    state.update((list(weights), [weights[t] for t in weights], n_seen, d_cum))
    top_tok, top_w = (None, 0)
    if weights:
        top_tok = min(weights, key=lambda t: (-weights[t], t))
        top_w = weights[top_tok]
    yield pd.DataFrame(
        [
            {
                "key": k,
                "n_toks_seen": n_seen,
                "state_size": len(weights),
                "state_wsum": sum(weights.values()),
                "d_step": d,
                "d_cum": d_cum,
                "top_tok": top_tok,
                "top_w": top_w,
            }
        ],
        columns=[f.name for f in MG_SCHEMA.fields],
    )


def heavy_hitters_mg_stream(tokens: DataFrame) -> DataFrame:
    """Keyed streaming Misra-Gries summary over a STREAMING frame with
    columns (key, tok).  Emits one running-summary stat row per key per
    micro-batch.  Streaming-only (applyInPandasWithState rejects batch
    frames); the fold algebra is gated by ``t_mg_stream_parity``."""
    return tokens.groupBy("key").applyInPandasWithState(
        _mg_emit,
        outputStructType=MG_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
