"""Iterative graph algorithms as DataFrame plans.

Complements operators/dedup.py's connected components (min-label
propagation): here the fixed-point is NUMERIC (PageRank mass), so the
exact-oracle recipe changes from min-folds to the decimal-sum trick
used by kmeans_centroids — per-iteration rounding plus exact decimal
contribution sums make every iterate bit-identical across engines,
letting an iterative numeric algorithm carry an exact SQL gate.

Scale shape per iteration: one hash join of the (src, dst, ratio)
edge list against the current (node, pr) vector — both skinny — and
one map-side-combined sum per destination.  Edges are localCheckpointed
once (consumed every round); rank vectors are checkpointed per round to
keep the plan tree flat (the CC lineage lesson, SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_weighted(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    prec: int = 10,
) -> DataFrame:
    """Weighted PageRank, TextRank formulation (Mihalcea & Tarau 2004,
    public): pr(v) = (1-d) + d·Σ_{u→v} (w(u,v)/wdeg(u))·pr(u), from
    pr₀ = 1.  ``edges`` is (src, dst, weight); undirected callers pass
    both directions.  No dangling-mass redistribution — the TextRank
    variant's simple form (symmetrized graphs have no dangling nodes).

    Engine parity: ratios are exact-integer divisions rendered as
    doubles, contributions fold through DECIMAL(28,12) (exact ⇒
    order-independent), each iterate rounds to ``prec`` dp — a DuckDB
    oracle unrolling the same iterations reproduces every rank bit for
    bit."""
    wdeg = edges.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    er = (
        edges.join(wdeg, "src")
        .select(
            "src",
            "dst",
            (F.col("weight").cast("double") / F.col("wdeg")).alias("ratio"),
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        er.select(F.col("src").alias("node"))
        .union(er.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pr = nodes.select("node", F.lit(1.0).alias("pr"))
    for _ in range(iters):
        contrib = (
            er.join(pr, er.src == pr.node)
            .select("dst", (F.col("ratio") * F.col("pr")).cast("decimal(28,12)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("s", F.lit(0.0)),
                    prec,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr
