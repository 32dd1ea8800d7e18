"""Detector-health surface (VERDICT r8 ask #8): the honesty audits the
engine already gates — MinHash-LSH banding recall, trained-IVF ANN
recall, PQ+rerank ANN recall — normalized into ONE operator-visible
table, published by the `health` CLI verb and rendered by the static
`report` page next to the analytics artifacts.

Each row is (detector, n_true, n_hits, recall, floor, meets_floor):
the truth-set size, the detector's hits against it, the exact-int64
recall the registry query computes, the SLO floor the pytest gate
asserts, and the boolean a pipeline owner checks before trusting the
detector at 100 TB.  All values come from the SAME gated registry
queries (dedup_lsh_recall, sim_ivf_recall, sim_pq_recall) — the report
shows exactly what the correctness gate verifies, never a parallel
computation that could drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def detector_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per gated detector audit, schema
    (detector, n_true, n_hits, recall, floor, meets_floor)."""
    from kp_crypto_market_analytics_spark.queries_corpus import (
        dedup_lsh_recall,
    )
    from kp_crypto_market_analytics_spark.queries_ext import (
        IVF_RECALL_FLOOR_PCT,
        PQ_RECALL_FLOOR_PCT,
        _LSH_RECALL_FLOOR,
        sim_ivf_recall,
        sim_pq_recall,
    )

    specs = [
        # (name, query fn, hits column, floor as fraction)
        ("minhash_lsh_banding", dedup_lsh_recall, "n_hits_bucket",
         _LSH_RECALL_FLOOR),
        ("ann_ivf_trained", sim_ivf_recall, "n_hits",
         IVF_RECALL_FLOOR_PCT / 100.0),
        ("ann_pq_rerank", sim_pq_recall, "n_hits",
         PQ_RECALL_FLOOR_PCT / 100.0),
    ]
    out: DataFrame | None = None
    for name, fn, hits_col, floor in specs:
        row = fn(spark, sf_dir).select(
            F.lit(name).alias("detector"),
            F.col("n_true").cast("long").alias("n_true"),
            F.col(hits_col).cast("long").alias("n_hits"),
            F.col("recall").cast("double").alias("recall"),
            F.lit(floor).alias("floor"),
            F.col("meets_floor").alias("meets_floor"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("detector")
