"""Round-7 registry queries: leakage-safe dataset splitting, domain
mixture weights, tokenizer fertility, column profiling, sweep-line
concurrency, truncated EWMA, n-gram novelty, HITS.

Extension operators for the LLM-data-pipeline north star
(BASELINE.json): the reference engine ends at market analytics; a
100 TB training-data pipeline additionally needs the split/mixture/
profiling primitives here.  Every query carries an exact DuckDB
oracle (same column names, exact-integer or micro-rounded arithmetic)
and follows the repo's determinism recipes (hash64 for cross-engine
hashing, round_mean_micro for mean shapes, no row-at-a-time UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.operators.aggregates import (
    round_mean_micro,
    sql_round_mean_micro,
)
from kp_crypto_market_analytics_spark.session import (
    ensure_parallelism,
    load_tables,
)

H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"
NORM_TEXT_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

# 98/1/1 split quotas in bucket space (standard LLM pretraining split)
_SPLIT_TRAIN_LT = 98
_SPLIT_VAL_EQ = 98


def _norm_text() -> F.Column:
    return F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))


def _split_of(bucket: F.Column) -> F.Column:
    return (
        F.when(bucket < _SPLIT_TRAIN_LT, F.lit("train"))
        .when(bucket == _SPLIT_VAL_EQ, F.lit("val"))
        .otherwise(F.lit("test"))
    )


_SPLIT_SQL = (
    f"CASE WHEN bucket < {_SPLIT_TRAIN_LT} THEN 'train' "
    f"WHEN bucket = {_SPLIT_VAL_EQ} THEN 'val' ELSE 'test' END"
)


def _cluster_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, split, ntok): every document labeled with
    its near-dup connected-component cluster and the CLUSTER-keyed
    split assignment — all members of a near-dup family land in the
    same split, so no train/test contamination can cross a dedup
    edge.  Shares the session-materialized capped-Jaccard pair graph
    with dedup_clusters/dedup_canonical (built once per session)."""
    from kp_crypto_market_analytics_spark.functions.text import hash64
    from kp_crypto_market_analytics_spark.operators.dedup import (
        capped_jaccard_pairs_materialized,
        connected_component_labels,
    )

    t = load_tables(spark, sf_dir, ["documents"])
    d = ensure_parallelism(t["documents"])
    edges = capped_jaccard_pairs_materialized(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    nodes = d.select(F.col("doc_id").alias("doc"))
    labels = connected_component_labels(edges, nodes, "doc").select(
        F.col("doc").alias("doc_id"), "cluster_id"
    )
    bucket = hash64(
        F.concat(F.col("cluster_id").cast("string"), F.lit("#split"))
    ) % 100
    return (
        d.select("doc_id", F.size(F.split(_norm_text(), " ")).alias("ntok"))
        .join(labels, "doc_id")
        .withColumn("split", _split_of(bucket))
    )


def t_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (98/1/1): the split key is
    the near-dup CLUSTER id, not the document — near-duplicates of a
    training document can never land in val/test (the contamination
    class Lee et al. 2022 'Deduplicating Training Data' measures).
    Per split: clusters, documents, whitespace tokens, and the exact
    half-away document share in ppm.

    Determinism: the bucket is the portable 60-bit md5 hash of the
    cluster id (hash64), mod 100 — both engines compute the identical
    integer; shares are exact integer half-away division.

    Scale shape: reuses the session-materialized pair graph +
    O(diameter) label propagation (the dedup family's plan); the
    split itself adds one hash, one broadcastable |splits|-row total,
    and a 3-row agg — nothing new shuffles at corpus scale."""
    s = _cluster_splits(spark, sf_dir)
    tot = s.agg(F.count(F.lit(1)).alias("t_docs"))
    agg = s.groupBy("split").agg(
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("n_tokens"),
    )
    share = F.call_function(
        "div",
        F.lit(2) * F.col("n_docs") * F.lit(1_000_000) + F.col("t_docs"),
        F.lit(2) * F.col("t_docs"),
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "split",
            F.col("n_clusters").cast("long").alias("n_clusters"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            share.cast("long").alias("doc_share_ppm"),
        )
        .orderBy("split")
    )


def _t_train_split_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_ext import _CLUSTER_CTES

    h = H60.format(x="CAST(cluster_id AS VARCHAR) || '#split'")
    return f"""
{_CLUSTER_CTES}, b AS (
  SELECT l.doc_id, l.cluster_id, {h} % 100 AS bucket,
    len(string_split({NORM_TEXT_SQL}, ' ')) AS ntok
  FROM labeled l JOIN documents USING (doc_id)
), s AS (
  SELECT cluster_id, ntok, {_SPLIT_SQL} AS split FROM b
), tot AS (SELECT COUNT(*) AS t_docs FROM s)
SELECT split,
  CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
  CAST((2 * COUNT(*) * 1000000 + t_docs) // (2 * t_docs) AS BIGINT)
    AS doc_share_ppm
FROM s CROSS JOIN tot
GROUP BY split, t_docs ORDER BY split
"""


def t_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-contamination audit: how many near-dup pairs CROSS a
    split boundary under (a) the cluster-keyed split (0 by
    construction — the property t_train_split exists to provide) and
    (b) a naive per-document hash split (the baseline every pipeline
    starts from, where ~4% of dup pairs leak into eval).  One row:
    pair count, both leak counts, dup-cluster census.

    The DuckDB oracle recomputes the identical construction, so the
    gate proves engine agreement; the invariant leaked_cluster = 0 is
    additionally pinned by a pytest floor (audit-query rule)."""
    from kp_crypto_market_analytics_spark.functions.text import hash64
    from kp_crypto_market_analytics_spark.operators.dedup import (
        capped_jaccard_pairs_materialized,
    )

    s = _cluster_splits(spark, sf_dir)
    doc_bucket = hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit("#docsplit"))
    ) % 100
    assign = s.select(
        "doc_id",
        "cluster_id",
        F.col("split").alias("c_split"),
        _split_of(doc_bucket).alias("d_split"),
    ).localCheckpoint(eager=True)
    pairs = capped_jaccard_pairs_materialized(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    a = assign.select(
        F.col("doc_id").alias("doc_a"),
        F.col("c_split").alias("ca"),
        F.col("d_split").alias("da"),
    )
    b = assign.select(
        F.col("doc_id").alias("doc_b"),
        F.col("c_split").alias("cb"),
        F.col("d_split").alias("db"),
    )
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    leak = j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("ca") != F.col("cb"), F.lit(1)).otherwise(F.lit(0))
        ).alias("leaked_cluster_split"),
        F.sum(
            F.when(F.col("da") != F.col("db"), F.lit(1)).otherwise(F.lit(0))
        ).alias("leaked_doc_split"),
    )
    cl = assign.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    census = cl.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.when(F.col("sz") > 1, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_dup_clusters"
        ),
    )
    return leak.crossJoin(F.broadcast(census)).select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("leaked_cluster_split").cast("long").alias(
            "leaked_cluster_split"
        ),
        F.col("leaked_doc_split").cast("long").alias("leaked_doc_split"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        F.col("n_dup_clusters").cast("long").alias("n_dup_clusters"),
    )


def _t_split_leakage_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_ext import _CLUSTER_CTES

    hc = H60.format(x="CAST(cluster_id AS VARCHAR) || '#split'")
    hd = H60.format(x="CAST(doc_id AS VARCHAR) || '#docsplit'")
    return f"""
{_CLUSTER_CTES}, assign AS (
  SELECT doc_id, cluster_id, c_split, d_split FROM (
    SELECT doc_id, cluster_id,
      (SELECT {_SPLIT_SQL} FROM (SELECT {hc} % 100 AS bucket)) AS c_split,
      (SELECT {_SPLIT_SQL} FROM (SELECT {hd} % 100 AS bucket)) AS d_split
    FROM labeled
  )
), leak AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
    CAST(SUM(CASE WHEN a.c_split <> b.c_split THEN 1 ELSE 0 END) AS BIGINT)
      AS leaked_cluster_split,
    CAST(SUM(CASE WHEN a.d_split <> b.d_split THEN 1 ELSE 0 END) AS BIGINT)
      AS leaked_doc_split
  FROM edges e JOIN assign a ON a.doc_id = e.doc_a
    JOIN assign b ON b.doc_id = e.doc_b
), census AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
    CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_dup_clusters
  FROM (SELECT cluster_id, COUNT(*) AS sz FROM assign GROUP BY 1)
)
SELECT n_pairs, leaked_cluster_split, leaked_doc_split,
  n_clusters, n_dup_clusters
FROM leak CROSS JOIN census
"""


def t_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling weights: per source, the
    temperature-scaled weight w = sqrt(tokens) (α = 0.5 — the
    multilingual up-sampling rule of Conneau & Lample 2019, public)
    with its normalized share and the oversample factor vs natural
    token share — the table a data-loader mixes batches from.

    Determinism: sqrt is correctly-rounded IEEE on both engines;
    weights round to 6 dp and sum as exact DECIMAL(18,6) so the
    normalizer is order-independent; token shares are exact integer
    half-away ppm.

    Scale shape: one token-count agg per source (map-side combined,
    |sources| rows), one broadcast 1-row total — constant exchange
    width at any corpus size."""
    t = load_tables(spark, sf_dir, ["documents"])
    d = ensure_parallelism(t["documents"])
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(_norm_text(), " "))).alias("n_tokens"),
    )
    w = F.round(F.sqrt(F.col("n_tokens").cast("double")), 6)
    weighted = per_src.withColumn("w", w.cast("decimal(18,6)"))
    tot = weighted.agg(
        F.sum("w").alias("t_w"), F.sum("n_tokens").alias("t_tok")
    )
    tok_share = F.call_function(
        "div",
        F.lit(2) * F.col("n_tokens") * F.lit(1_000_000) + F.col("t_tok"),
        F.lit(2) * F.col("t_tok"),
    )
    w_share = F.round(
        F.col("w").cast("double") / F.col("t_w").cast("double"), 6
    )
    oversample = F.round(
        F.col("w").cast("double")
        * F.col("t_tok").cast("double")
        / (F.col("t_w").cast("double") * F.col("n_tokens").cast("double")),
        6,
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("w").cast("double").alias("weight"),
            w_share.alias("weight_share"),
            tok_share.cast("long").alias("token_share_ppm"),
            oversample.alias("oversample"),
        )
        .orderBy("source")
    )


T_MIX_WEIGHTS_SQL = f"""
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(len(string_split({NORM_TEXT_SQL}, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), weighted AS (
  SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))
    AS w
  FROM per_src
), tot AS (
  SELECT CAST(SUM(w) AS DECIMAL(18,6)) AS t_w,
    CAST(SUM(n_tokens) AS BIGINT) AS t_tok
  FROM weighted
)
SELECT source, n_docs, n_tokens,
  CAST(w AS DOUBLE) AS weight,
  round(CAST(w AS DOUBLE) / CAST(t_w AS DOUBLE), 6) AS weight_share,
  CAST((2 * n_tokens * 1000000 + t_tok) // (2 * t_tok) AS BIGINT)
    AS token_share_ppm,
  round(CAST(w AS DOUBLE) * CAST(t_tok AS DOUBLE)
    / (CAST(t_w AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6) AS oversample
FROM weighted CROSS JOIN tot
ORDER BY source
"""


def t_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility profile per language: bytes/chars/words and
    the exact ratios (chars per word, bytes per word, bytes per char)
    — the table a tokenizer evaluation reads to spot languages the
    vocab under-serves (fertility spikes → more tokens per word →
    higher serving cost).

    Determinism: counts are exact integers (octet_length on raw text,
    length on raw text, whitespace words on normalized text); ratios
    go through the exact micro half-away division (round_mean_micro).

    Scale shape: pure per-language agg with map-side partials — one
    |langs|-row exchange regardless of corpus size."""
    t = load_tables(spark, sf_dir, ["documents"])
    d = ensure_parallelism(t["documents"])
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(_norm_text(), " "))).alias("n_words"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum(F.octet_length("text")).alias("n_bytes"),
    )
    return agg.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        round_mean_micro(
            F.col("n_chars").cast("decimal(18,6)"), F.col("n_words")
        ).alias("chars_per_word"),
        round_mean_micro(
            F.col("n_bytes").cast("decimal(18,6)"), F.col("n_words")
        ).alias("bytes_per_word"),
        round_mean_micro(
            F.col("n_bytes").cast("decimal(18,6)"), F.col("n_chars")
        ).alias("bytes_per_char"),
    ).orderBy("lang")


T_TOKENIZER_FERTILITY_SQL = f"""
WITH agg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(len(string_split({NORM_TEXT_SQL}, ' '))) AS BIGINT) AS n_words,
    CAST(SUM(length(text)) AS BIGINT) AS n_chars,
    CAST(SUM(octet_length(encode(text))) AS BIGINT) AS n_bytes
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, n_words, n_chars, n_bytes,
  {sql_round_mean_micro("CAST(n_chars AS DECIMAL(18,6))", "n_words")}
    AS chars_per_word,
  {sql_round_mean_micro("CAST(n_bytes AS DECIMAL(18,6))", "n_words")}
    AS bytes_per_word,
  {sql_round_mean_micro("CAST(n_bytes AS DECIMAL(18,6))", "n_chars")}
    AS bytes_per_char
FROM agg ORDER BY lang
"""


# column kinds for dq_column_profile: (name, numeric?)
_PROFILE_COLS = [
    ("event_id", True),
    ("user_id", True),
    ("event_type", False),
    ("value", True),
    ("props", False),
]


def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dataset profile of the events table: null count,
    exact distinct count, numeric min/max for numeric columns and
    lexicographic min/max for string columns — the first screen every
    data-quality tool shows, computed in ONE scan.

    Scale shape: a single aggregate over the table computes all 5×4
    metrics (Spark expands multi-distinct internally with partial
    aggregation); the unpivot to one-row-per-column happens on the
    1-row aggregate, not on data.  Exchange width: one row."""
    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, numeric in _PROFILE_COLS:
        aggs += [
            F.count(name).alias(f"nn_{name}"),
            F.countDistinct(name).alias(f"nd_{name}"),
            F.min(name).alias(f"mn_{name}"),
            F.max(name).alias(f"mx_{name}"),
        ]
    one = e.agg(*aggs)
    entries = []
    for name, numeric in _PROFILE_COLS:
        entries.append(
            F.struct(
                F.lit(name).alias("column_name"),
                (F.col("n_rows") - F.col(f"nn_{name}"))
                .cast("long")
                .alias("n_null"),
                F.col(f"nd_{name}").cast("long").alias("n_distinct"),
                (
                    F.col(f"mn_{name}").cast("double")
                    if numeric
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"mx_{name}").cast("double")
                    if numeric
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.col(f"mn_{name}").cast("string")
                    if not numeric
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"mx_{name}").cast("string")
                    if not numeric
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    return (
        one.select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.explode(F.array(*entries)).alias("e"),
        )
        .select("e.column_name", "n_rows", "e.n_null", "e.n_distinct",
                "e.min_num", "e.max_num", "e.min_str", "e.max_str")
        .orderBy("column_name")
    )


def _dq_column_profile_sql() -> str:
    parts = []
    for name, numeric in _PROFILE_COLS:
        mn = (
            f"CAST(MIN({name}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        )
        mx = (
            f"CAST(MAX({name}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        )
        ms = (
            "CAST(NULL AS VARCHAR)" if numeric else f"CAST(MIN({name}) AS VARCHAR)"
        )
        xs = (
            "CAST(NULL AS VARCHAR)" if numeric else f"CAST(MAX({name}) AS VARCHAR)"
        )
        parts.append(
            f"SELECT '{name}' AS column_name,"
            f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_null,"
            f" CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num,"
            f" {ms} AS min_str, {xs} AS max_str"
            f" FROM events"
        )
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


R7_QUERIES = {
    "t_train_split": t_train_split,
    "t_split_leakage": t_split_leakage,
    "t_mix_weights": t_mix_weights,
    "t_tokenizer_fertility": t_tokenizer_fertility,
    "dq_column_profile": dq_column_profile,
}


def r7_oracles() -> dict[str, str]:
    return {
        "t_train_split": _t_train_split_sql(),
        "t_split_leakage": _t_split_leakage_sql(),
        "t_mix_weights": T_MIX_WEIGHTS_SQL,
        "t_tokenizer_fertility": T_TOKENIZER_FERTILITY_SQL,
        "dq_column_profile": _dq_column_profile_sql(),
    }
