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


# ------------------------------------------------------- t_pii_redact


def _pii_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The t_pii_scan planted-PII corpus (doc_id % 97 gets a contact
    line appended in-query on BOTH engines) — the redactor is
    exercised on real text with known-position matches instead of
    passing vacuously on a PII-free synthetic corpus."""
    t = load_tables(spark, sf_dir, ["documents"])
    return t["documents"].withColumn(
        "text",
        F.when(
            F.col("doc_id") % 97 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com via https://ex.org/u/"),
                F.col("doc_id").cast("string"),
                F.lit(" ref 9876543210"),
            ),
        ).otherwise(F.col("text")),
    )


def t_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII REDACTION census (VERDICT r10 ask #5): t_pii_scan detected;
    this transforms — the regexp_replace chain (operators/redact.py:
    email -> URL -> long-digit-run, inert replacement tokens) over the
    same planted corpus, gated on the per-document audit a scrub pass
    publishes: per-class hit counts, the redacted-character delta, and
    the RESCAN residual, which the inert-token construction forces to
    zero for every document (tests pin the invariant corpus-wide plus
    byte-identity of untouched text).

    Determinism: hit counts and character deltas are exact integers;
    the delta subtracts out the untouched text, so it is
    engine-independent even where absolute length semantics could
    differ.  Scale: one narrow codegen'd projection per doc — the
    transform maps over 100 TB with no shuffle; this census adds one
    (filter + sort) on the touched slice."""
    from kp_crypto_market_analytics_spark.operators.redact import pii_redact

    red = pii_redact(_pii_augmented(spark, sf_dir))
    return (
        red.where(
            (F.col("n_emails") + F.col("n_urls") + F.col("n_digit_runs")) > 0
        )
        .select(
            "doc_id",
            "n_emails",
            "n_urls",
            "n_digit_runs",
            "chars_redacted",
            "residual_hits",
        )
        .orderBy("doc_id")
    )


def _t_pii_redact_sql() -> str:
    from kp_crypto_market_analytics_spark.operators.redact import PII_PATTERNS

    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    red = "text"
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    rescan = " + ".join(
        f"len(regexp_extract_all(red, '{pat}'))" for _, pat, _ in PII_PATTERNS
    )
    return f"""
WITH aug AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0
         THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
              || '@example.com via https://ex.org/u/' || CAST(doc_id AS VARCHAR)
              || ' ref 9876543210'
         ELSE text END AS text
  FROM documents
), r AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '{pats["email"]}')) AS n_emails,
    len(regexp_extract_all(text, '{pats["url"]}')) AS n_urls,
    len(regexp_extract_all(text, '{pats["digits"]}')) AS n_digit_runs,
    text, {red} AS red
  FROM aug
)
SELECT doc_id, n_emails, n_urls, n_digit_runs,
  len(text) - len(red) AS chars_redacted,
  {rescan} AS residual_hits
FROM r
WHERE n_emails + n_urls + n_digit_runs > 0
ORDER BY doc_id
"""


R11_QUERIES["t_pii_redact"] = t_pii_redact
_R11_ORACLES["t_pii_redact"] = _t_pii_redact_sql
