"""Round-10 registry queries.

Headline: streaming near-dup dedup (VERDICT r9 ask #3) —
``dedup_lsh_stream_parity`` gates the incremental MinHash-LSH ingest
loop (streaming/dedup_lsh.py) as an unrolled batch fold: the corpus
arrives in 3 batches (doc_id mod 3), each batch is deduped against
the accumulated signature store by the SAME generator the stream's
``foreachBatch`` runs (lsh_ingest_pairs → operators.dedup.
incremental_lsh_pairs, 64 df-capped hashes / 16 bands / star-routed
bucket cap 64), and the union of the per-batch emissions is the
gated table.  tests/test_sinks_streaming.py::
test_lsh_dedup_stream_matches_gated_fold pins the real streaming
query emission-for-emission to this fold.

Every query carries an exact DuckDB oracle (same column names, exact
integer or n/64-exact arithmetic) per the repo determinism recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.operators.aggregates import DEC
from kp_crypto_market_analytics_spark.session import (
    ensure_parallelism,
    load_tables,
)

R10_QUERIES: dict = {}
_R10_ORACLES: dict = {}


def r10_oracles() -> dict[str, str]:
    return {name: fn() for name, fn in _R10_ORACLES.items()}


# --------------------------------------------- dedup_lsh_stream_parity

_SLSH_BATCHES = 3


def dedup_lsh_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental-LSH near-dup ingest, gated batch-side:
    the corpus arrives as 3 micro-batches (doc_id mod 3 — deterministic
    integer arithmetic), and each batch's near-dup pairs against the
    accumulated signature store are emitted with the arrival batch id.
    The pair generator is the streaming loop's own core
    (streaming/dedup_lsh.py lsh_ingest_pairs): production 64-hash
    df-capped signatures from the frozen store (queries_ext.
    _minhash_sigs), 16 threshold-derived bands, star-routed bucket cap
    — bucket sizes (and hence pair/star tiers) are computed over the
    corpus AS OF each batch, exactly what the stream sees.

    Union-over-batches property: every near-dup pair is emitted at the
    batch where its LATER side arrives, exactly once; old×old pairs
    never re-form.  Determinism: doc ids are exact BIGINTs, tiers are
    min-folded strings, est_jaccard = matches/64 is binary-exact.
    Scale shape per batch: |batch| signature rows probe the band
    buckets — O(batch × bucket-mates), the same plan the gated
    dedup_incremental runs."""
    from kp_crypto_market_analytics_spark.queries_ext import (
        _LSH_BANDS,
        _LSH_BUCKET_CAP,
        _LSH_NUM_HASHES,
        _minhash_sigs,
    )
    from kp_crypto_market_analytics_spark.streaming.dedup_lsh import (
        lsh_ingest_pairs,
    )

    sigs = _minhash_sigs(spark, sf_dir)
    folds = []
    for b in range(_SLSH_BATCHES):
        new_sigs = sigs.where(F.col("doc_id") % _SLSH_BATCHES == b)
        old_sigs = sigs.where(F.col("doc_id") % _SLSH_BATCHES < b)
        folds.append(
            lsh_ingest_pairs(
                new_sigs,
                old_sigs,
                id_col="doc_id",
                num_hashes=_LSH_NUM_HASHES,
                bands=_LSH_BANDS,
                max_bucket_size=_LSH_BUCKET_CAP,
            ).select(
                F.lit(b).cast("long").alias("batch"),
                "doc_a",
                "doc_b",
                "new_a",
                "new_b",
                "tier",
                "est_jaccard",
            )
        )
    out = folds[0]
    for f in folds[1:]:
        out = out.unionByName(f)
    return out.orderBy("batch", "doc_a", "doc_b")


def _dedup_lsh_stream_parity_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_ext import (
        _BJOIN,
        _BKEY,
        _EST_SQL,
        _LSH_BUCKET_CAP,
        CAPPED_HSETS_CTE,
        _bands_select_sql,
    )

    cap = _LSH_BUCKET_CAP
    nb = _SLSH_BATCHES
    # Materialize the shared signature/band tables: 3 folds × (cand +
    # sa + sb) references would otherwise re-inline the minhash
    # aggregation ~12× (the g_kcore DuckDB-CTE lesson).
    hsets = CAPPED_HSETS_CTE.replace(
        "sigs AS (", "sigs AS MATERIALIZED ("
    )
    fold_ctes = []
    fold_sel = []
    for b in range(nb):
        pair_new = (
            f"AND (a.doc_id % {nb} = {b} OR b.doc_id % {nb} = {b})"
        )
        star_new = f"AND (doc_id % {nb} = {b} OR rep % {nb} = {b})"
        fold_ctes.append(
            f""", sized_{b} AS MATERIALIZED (
  SELECT *, COUNT(*) OVER (PARTITION BY {_BKEY}) AS bn,
         MIN(doc_id) OVER (PARTITION BY {_BKEY}) AS rep
  FROM bands WHERE doc_id % {nb} <= {b}
), cand_{b} AS (
  SELECT doc_a, doc_b, MIN(tier) AS tier FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 'pair' AS tier
    FROM sized_{b} a JOIN sized_{b} b ON {_BJOIN} AND a.doc_id < b.doc_id
    WHERE a.bn <= {cap} AND b.bn <= {cap} {pair_new}
    UNION ALL
    SELECT rep AS doc_a, doc_id AS doc_b, 'star' AS tier
    FROM sized_{b} WHERE bn > {cap} AND doc_id <> rep {star_new}
  ) GROUP BY 1, 2
)"""
        )
        fold_sel.append(
            f"""SELECT CAST({b} AS BIGINT) AS batch, doc_a, doc_b,
    doc_a % {nb} = {b} AS new_a, doc_b % {nb} = {b} AS new_b,
    tier, {_EST_SQL} AS est_jaccard
  FROM cand_{b}
  JOIN sigs sa ON sa.doc_id = doc_a JOIN sigs sb ON sb.doc_id = doc_b"""
        )
    return f"""
WITH {hsets}, bands AS MATERIALIZED (
  {_bands_select_sql()}
){''.join(fold_ctes)}
SELECT * FROM (
  {" UNION ALL ".join(fold_sel)}
)
ORDER BY batch, doc_a, doc_b
"""


R10_QUERIES["dedup_lsh_stream_parity"] = dedup_lsh_stream_parity
_R10_ORACLES["dedup_lsh_stream_parity"] = _dedup_lsh_stream_parity_sql
