"""Misra-Gries / SpaceSaving heavy hitters — deterministic-error
frequent-items sketches (Misra & Gries 1982; Metwally et al. 2005
SpaceSaving; Agarwal et al. 2013 mergeability).

Why alongside count-min (queries_corpus.t_countmin_hh): count-min
OVERestimates and needs a probe set; Misra-Gries UNDERestimates with a
deterministic bound and carries its own candidate set — the natural
"top tokens without a vocab shuffle" sketch.  A summary of k counters
over a stream of N items guarantees every item with true count
> N/(k+1) survives, and weight <= true count <= weight + subtracted
total.

Two shapes here:
- ``mg_reduce``: one DataFrame fold step (merge counts into <= k
  counters) — the building block the oracle-gated sequential-fold
  query (queries_quality.t_mg_stream_parity) unrolls, bit-identical
  to its DuckDB twin.
- ``misra_gries_topk``: the distributed production path — exact
  per-Arrow-batch counts reduced to k-counter partial summaries
  inside ``mapInPandas`` (no row-at-a-time Python, no token shuffle),
  merged by a |summaries|-sized groupBy, then reduced once more.
  Merged-summary error <= 2N/(k+1) (one N/(k+1) from the partial
  reductions, one from the final reduce); the pytest pins both
  bounds and the no-false-negative guarantee.

No reference counterpart (the reference has no sketches); extension
operator per BASELINE.json's LLM-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_reduce(counts: DataFrame, k: int, tok: str = "tok", w: str = "w") -> DataFrame:
    """One Misra-Gries reduction: subtract the (k+1)-th largest weight
    (0 when there are <= k entries) from every entry and keep the
    strictly positive ones — at most k survive.  The subtracted value
    is a VALUE-order statistic, so tie order cannot change it and the
    result is deterministic for a given input multiset."""
    # The (k+1)-th largest = MIN over the distributed TakeOrdered(k+1)
    # top slice (each shard forwards at most k+1 rows), 0 when fewer
    # than k+1 entries exist — one ORDER statistic never justifies
    # ranking the whole counts frame through a single partition.
    top = counts.select(F.col(w).alias("__w")).orderBy(
        F.col("__w").desc()
    ).limit(k + 1)
    d = top.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("__w"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__d")
    )
    return (
        counts.crossJoin(F.broadcast(d))
        .select(F.col(tok), (F.col(w) - F.col("__d")).alias(w))
        .where(F.col(w) > 0)
    )


def misra_gries_topk(df: DataFrame, col: str, k: int) -> DataFrame:
    """Distributed Misra-Gries summary of the ``col`` stream: returns
    <= k rows (tok, w) with w <= true count and true count - w <=
    2N/(k+1).  Items with true count > 2N/(k+1) are guaranteed present.

    Scale: each Arrow batch collapses to <= k counters BEFORE any
    shuffle (value_counts + reduce inside mapInPandas), so shuffle
    traffic is k x n_batches rows regardless of stream size or vocab —
    the property that matters when the vocab itself no longer fits an
    executor.  The merge is a plain sum-groupBy over those partials
    (mergeability per Agarwal et al. 2013), then one final reduce."""
    import pandas as pd  # noqa: F401 — imported for the worker closure

    def partials(batches):
        for pdf in batches:
            vc = pdf[col].value_counts()
            if len(vc) > k:
                d = int(vc.iloc[k])  # (k+1)-th largest
                vc = vc.iloc[:k] - d
                vc = vc[vc > 0]
            yield vc.rename_axis("tok").reset_index(name="w")

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        partials, schema="tok string, w long"
    )
    merged = summaries.groupBy("tok").agg(F.sum("w").alias("w"))
    return mg_reduce(merged, k)
