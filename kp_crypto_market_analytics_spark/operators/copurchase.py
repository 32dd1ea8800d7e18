"""Shared co-purchase pair builder for the graph query family.

Eight registry queries (g_pagerank, g_degree_stats, g_label_prop,
g_bfs_distance, g_jaccard_sim, g_kcore, g_triangle_count,
g_assoc_rules) analyze the same support-thresholded co-purchase graph
derived from ``lineitem``: canonical (u < v) part pairs that co-occur
in >= ``SUPPORT`` distinct orders.  Before round 5 each query rebuilt
the pair list independently — one distinct-scan + self-join + groupBy
per query, 8x redundant inside a bench/driver session.  This module
builds it once per (SparkSession, sf_dir), writes it to a
session-scoped temp parquet, and memoizes the path on the session
object itself, so the materialization dies with the session and can
never leak across JVMs or into a session it was not built on.

Scale shape (unchanged from the per-query builds): per-order baskets
are small, so the self-join produces sum-over-orders C(k, 2) rows; the
support HAVING prunes the long tail before any graph work ships.  The
materialized pair list is three BIGINT columns — at 100 TB it is the
classic shared derived dataset (build once, serve the whole graph
family), and the one build replaces N full lineitem scans with one
scan plus N cheap parquet reads whose exact size stats let every
downstream join broadcast the pair side on its own.

Reference tie: the co-purchase basket analysis generalizes
src/analytics/binance_analysis.py's symbol co-occurrence profiling to
order-basket grain; the caching mirrors Spark's own ``DataFrame
.persist`` contract rather than any reference mechanism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.operators.materialize import (
    session_materialized,
)
from kp_crypto_market_analytics_spark.session import load_tables

SUPPORT = 2


def _build(
    spark: SparkSession, sf_dir: str, min_support: int = SUPPORT
) -> DataFrame:
    """Uncached build: canonical (u < v, support) pairs.

    ``min_support=1`` yields the UNFILTERED projection (every
    co-occurring pair with its exact count) — the fallback arm of
    :func:`copurchase_pairs_for_topk`'s saturation guard."""
    li = (
        load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    if min_support > 1:
        pairs = pairs.where(F.col("support") >= min_support)
    return pairs


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-materialized canonical co-purchase pairs (u, v, support).

    First call per (session, sf_dir) builds the pair list and writes
    it to a session-scoped temp parquet — a materialized shared
    intermediate, the same move a 100 TB deployment makes (build the
    derived co-purchase graph once, then serve every graph query from
    the materialization instead of re-running the basket self-join
    N times).  Later calls — including from other queries in the same
    bench/driver session — read the parquet back.

    Mechanics and the parquet-over-persist rationale live in
    ``operators/materialize.py``.
    """
    return session_materialized(
        spark,
        f"copurchase:{sf_dir}:support={SUPPORT}",
        lambda: _build(spark, sf_dir),
    )


def copurchase_pairs_for_topk(
    spark: SparkSession, sf_dir: str, k: int
) -> DataFrame:
    """Pair table guaranteed to contain the UNFILTERED top-``k``
    co-purchase edges under (support desc, u asc, v asc).

    The shared materialization keeps only support >= ``SUPPORT``
    edges.  Its top-k equals the unfiltered top-k IFF at least k
    edges survive the filter: under the support-first order no
    support-1 edge can outrank a surviving edge, and every surviving
    edge carries its exact count.  r11 asserted that saturation
    held per tested SF (a data-dependent claim — the observed margin
    was shrinking: min top-20 weight 4/3/2 at sf0.001/0.01/0.1); this
    makes the guarantee STRUCTURAL at any scale.  The guard counts at
    most k rows of the 3-column materialized parquet (one tiny
    metadata-bounded job — not a result collect; the guide §5 rule
    targets pulling data volumes to the driver).  In the unsaturated
    regime — only reachable when the thresholded basket graph itself
    is near-empty — it falls back to the unfiltered build, whose
    weight-1 tail is affordable exactly because the data is that
    small."""
    pairs = copurchase_pairs(spark, sf_dir)
    if pairs.limit(k).count() >= k:
        return pairs
    return _build(spark, sf_dir, min_support=1)


PAIRS_SQL = f"""li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {SUPPORT}
)"""
