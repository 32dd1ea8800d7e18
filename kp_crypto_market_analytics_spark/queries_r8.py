"""Round-8 registry queries.

Headline: ``t_corpus_pipeline`` — the END-TO-END corpus-build funnel
(near-dup dedup → quality gate → benchmark decontamination →
leakage-safe split → epoch shuffle → mixture weights) composed as ONE
gated query, so the INTERACTION of the stages (every earlier stage
changes what later stages see) is oracle-verified, not just each
stage alone.  Reference analog: the analytics fan-out off one shared
frame (reference src/analytics/binance_analysis.py:571-732 runs its
metric suite off one loaded candle frame); here the fan-out is the
LLM-data-pipeline composition SURVEY.md §7 calls the north star.

Every query carries an exact DuckDB oracle (same column names,
exact-integer or micro-rounded arithmetic) and follows the repo's
determinism recipes (hash64 for cross-engine hashing,
round_mean_micro for mean shapes, no row-at-a-time UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.session import (
    ensure_parallelism,
    load_tables,
)

H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"
NORM_TEXT_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

R8_QUERIES: dict = {}
_R8_ORACLES: dict = {}


def r8_oracles() -> dict[str, str]:
    return {name: fn() for name, fn in _R8_ORACLES.items()}


# ------------------------------------------------------ t_corpus_pipeline

_PIPE_EVAL_SRC = "src4"  # the held-out benchmark slice
_PIPE_MIN_TOKENS = 25
_PIPE_MIN_QUALITY = 0.4
_PIPE_MAX_DUP_RATIO = 0.06
_PIPE_TRI_DF_CAP = 100
_PIPE_N_SHARDS = 32
_PIPE_PACK_TOKENS = 2048


def t_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus build, stage-chained over ONE
    scan of ``documents`` and reported as the per-source retention
    census a data-curation run publishes:

      0. corpus = every non-eval source ('src4' is the benchmark
         slice, never trainable);
      1. DEDUP: keep the min doc_id per near-dup cluster (capped
         Jaccard pair graph → connected components — the shared
         session-materialized build t_train_split/dedup_clusters use);
      2. QUALITY: Gopher-style gate on the survivors — tokens >= 25,
         heuristic quality score >= 0.4, duplicate-bigram ratio
         <= 0.06 (t_corpus_filter's exact expressions);
      3. DECONTAMINATE: drop survivors whose df-capped word-trigram
         set is >= 50% CONTAINED in the eval slice's trigram set
         (t_decontaminate's inverted index, thresholded on
         containment — the GPT-3-style overlap rule; any-overlap goes
         vacuous on a small-vocabulary corpus where every doc shares
         some trigram with eval);
      4. SPLIT: 98/1/1 train/val/test keyed by the near-dup CLUSTER id
         so no dup pair crosses a split boundary (t_train_split);
      5. EPOCH SHUFFLE: deterministic hash re-deal of the final train
         docs into 32 loader shards (t_epoch_shuffle's rule);
      6. MIX WEIGHTS: temperature-scaled weight sqrt(kept_tokens) with
         normalized share (t_mix_weights, alpha = 0.5) — computed on
         the SURVIVING tokens, the number a loader actually mixes by;
      7. PACK & SHARD (r9, VERDICT ask #3): the loader artifact — each
         train shard's docs pack into 2048-token
         sequences (per-(source, shard) running token sum, pack_id =
         starting offset DIV budget — t_pack_sequences' rule), and the
         census reports train_tokens, n_train_packs, and
         tokens_per_shard — the numbers a training job actually
         consumes;
      8. EPOCH MIX (r10, VERDICT ask #6): the epoch-1 deal — each
         source's pack draw target is its stage-6 mixture share of
         the total pack budget (floor(w_micro·B / t_w_micro), exact
         int64), filled by the first target_s packs of a
         deterministic hash shuffle and capped by availability; the
         census reports epoch_target_packs / n_epoch_packs /
         epoch_tokens — per-source pack counts AGAINST target
         weights, the loader-schedule honesty check.

    Stage order is load-bearing (dedup BEFORE quality keeps the
    canonical doc even when a higher-quality duplicate exists;
    decontamination sees only quality survivors) — exactly the
    interaction the oracle gates.

    Determinism: cluster ids are min doc_ids; split/shard hashes are
    portable 60-bit md5 (hash64); weights round to 6 dp and normalize
    over an exact DECIMAL(18,6) sum; every count is an integer.

    Scale shape: ONE scan of documents feeds every stage (the
    projected feature frame is checkpointed and reused — the shared-
    frame reuse this query exists to prove; see EXPLAINS.md row); the
    pair graph is the session-materialized capped-Jaccard build
    (df<=50 caps candidate blocks); trigram contamination is an
    inverted-index join with a df<=100 cap and a broadcast eval side;
    everything after is per-doc flags + one |sources|-row agg."""
    from kp_crypto_market_analytics_spark.functions.text import (
        hash64,
        quality_score,
        token_count,
    )
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        round_mean_micro,
    )
    from kp_crypto_market_analytics_spark.operators.dedup import (
        cluster_labels_materialized,
    )
    from kp_crypto_market_analytics_spark.queries_r7 import (
        _norm_text,
        _split_of,
    )

    t = load_tables(spark, sf_dir, ["documents"])
    toks = F.split(_norm_text(), " ")
    n_big = F.size("toks") - 1
    bigrams = F.when(
        F.size("toks") >= 2,
        F.zip_with(
            F.slice("toks", 1, n_big),
            F.slice("toks", 2, n_big),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # ONE scan of documents: every downstream stage (quality flags,
    # trigram contamination, cluster nodes, census) reads this
    # checkpointed projection, never the parquet again.
    base = (
        ensure_parallelism(t["documents"])
        .select(
            "doc_id",
            "source",
            toks.alias("toks"),
            token_count("text").alias("ntok"),
            quality_score("text").alias("q"),
        )
        .withColumn(
            "dup_ratio",
            F.when(
                F.size(bigrams) > 0,
                F.lit(1.0)
                - F.size(F.array_distinct(bigrams))
                / F.size(bigrams).cast("double"),
            ),
        )
        # toks fed only the trigram stage, which now reads the shared
        # materialization — drop the array before the checkpoint so
        # the materialized frame is the skinny per-doc flag row.
        .drop("toks")
        .localCheckpoint(eager=True)
    )

    # Stage 3 input: df-capped word-trigram inverted index — the
    # SHARED session materialization t_decontaminate reads (identical
    # construction: same tokenization, >=3-token filter, df cap 100),
    # replacing this query's own explode+distinct+df pass (r11
    # optimization, guide §2.4).
    from kp_crypto_market_analytics_spark.queries_ext import _tri_capped_df

    tcap = _tri_capped_df(spark, sf_dir)
    ev = (
        tcap.where(F.col("source") == _PIPE_EVAL_SRC)
        .select("g")
        .distinct()
    )
    corp_tri = tcap.where(F.col("source") != _PIPE_EVAL_SRC)
    n_tri = corp_tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tri")
    )
    n_shared = (
        corp_tri.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
    )
    # contaminated ⇔ shared/total >= 1/2, in exact integer arithmetic
    contam = (
        n_tri.join(n_shared, "doc_id", "left")
        .where(
            F.lit(2) * F.coalesce(F.col("n_shared"), F.lit(0))
            >= F.col("n_tri")
        )
        .select("doc_id")
        .withColumn("contam", F.lit(True))
    )

    # Shared session-materialized CC labels (r11 optimization): the
    # same (doc_id, cluster_id) table dedup_clusters/dedup_canonical/
    # t_train_split consume — built once per session instead of
    # re-running the iterative propagation here (node set identical:
    # every document).
    labels = cluster_labels_materialized(spark, sf_dir)

    asg = (
        base
        .join(labels, "doc_id")
        .join(contam, "doc_id", "left")
        .withColumn("in_corpus", F.col("source") != _PIPE_EVAL_SRC)
    )
    w_cl = Window.partitionBy("cluster_id")
    asg = asg.withColumn(
        "keep_dedup",
        F.col("in_corpus")
        & (
            F.col("doc_id")
            == F.min(
                F.when(F.col("in_corpus"), F.col("doc_id"))
            ).over(w_cl)
        ),
    )
    asg = asg.withColumn(
        "keep_quality",
        F.col("keep_dedup")
        & (F.col("ntok") >= _PIPE_MIN_TOKENS)
        & (F.col("q") >= _PIPE_MIN_QUALITY)
        & F.coalesce(
            F.col("dup_ratio") <= _PIPE_MAX_DUP_RATIO, F.lit(True)
        ),
    )
    asg = asg.withColumn(
        "keep_clean",
        F.col("keep_quality") & ~F.coalesce(F.col("contam"), F.lit(False)),
    )
    bucket = (
        hash64(
            F.concat(F.col("cluster_id").cast("string"), F.lit("#split"))
        )
        % 100
    )
    asg = asg.withColumn(
        "split", F.when(F.col("keep_clean"), _split_of(bucket))
    )
    shard = (
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit("#ep1")))
        % _PIPE_N_SHARDS
    )
    asg = asg.withColumn(
        "shard", F.when(F.col("split") == "train", shard)
    )

    # Stage 7: pack each train shard's docs into 2048-token sequences
    # (t_pack_sequences' offset rule, scoped per (source, shard) so the
    # cumsum window never single-partitions) and census the loader
    # numbers.  Reads the same checkpointed base lineage — no new scan.
    wp = Window.partitionBy("source", "shard").orderBy("doc_id")
    train = asg.where(F.col("split") == "train").select(
        "source", "shard", "doc_id", "ntok"
    )
    packs = train.withColumn("cum", F.sum("ntok").over(wp)).withColumn(
        "pack_id",
        F.call_function(
            "div",
            F.col("cum") - F.col("ntok"),
            F.lit(_PIPE_PACK_TOKENS).cast("long"),
        ),
    )
    pack_census = packs.groupBy("source").agg(
        F.sum("ntok").cast("long").alias("train_tokens"),
        F.count_distinct(F.struct("shard", "pack_id"))
        .cast("long")
        .alias("n_train_packs"),
    )

    # Stage 8 (r10, VERDICT ask #6): mixture-weighted epoch deal over
    # the stage-7 packs.  The epoch-1 loader draws packs per source in
    # proportion to the stage-6 mixture share, not the natural pack
    # share: target_s = floor(w_s_micro * B / t_w_micro) with B = the
    # total pack count (exact int64 arithmetic — the ceil(frac*n)
    # IEEE trap), and the drawn packs are the target_s first packs in
    # a deterministic hash shuffle (hash64(source#shard#pack#epmix)),
    # capped by availability.  Same checkpointed lineage — no new scan.
    #
    # KP_CORPUS_PIPELINE_STAGES=7 (VERDICT r10 ask #1) elides this
    # stage so the isolated fresh-JVM A/B (bench.py --one under each
    # env) can PRICE it: the r10 bench recorded +52% on this query and
    # the stage-8 addition was the unpriced suspect.  Pricing knob
    # ONLY — the registry/oracle path always runs the default 8; the
    # stage-7 config emits the three stage-8 columns as zeros so the
    # output schema (and thus the timed sink work) is identical.
    import os as _os

    _stages = int(_os.environ.get("KP_CORPUS_PIPELINE_STAGES", "8"))

    def cnt(c):  # noqa: ANN001
        return F.sum(F.when(F.col(c), 1).otherwise(0))

    census = (
        asg.where("in_corpus")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("keep_dedup").alias("n_dedup"),
            cnt("keep_quality").alias("n_quality"),
            cnt("keep_clean").alias("n_clean"),
            F.sum(
                F.when(F.col("split") == "train", 1).otherwise(0)
            ).alias("n_train"),
            F.sum(
                F.when(F.col("split") == "val", 1).otherwise(0)
            ).alias("n_val"),
            F.sum(
                F.when(F.col("split") == "test", 1).otherwise(0)
            ).alias("n_test"),
            F.sum(
                F.when(F.col("keep_clean"), F.col("ntok")).otherwise(0)
            ).alias("kept_tokens"),
            F.countDistinct("shard").alias("n_train_shards"),
        )
    )
    census = census.join(pack_census, "source", "left")
    weighted = census.withColumn(
        "w",
        F.round(F.sqrt(F.col("kept_tokens").cast("double")), 6).cast(
            "decimal(18,6)"
        ),
    )
    tot = weighted.agg(F.sum("w").alias("t_w"))

    out = weighted.crossJoin(F.broadcast(tot))
    if _stages >= 8:
        pack_lvl = packs.groupBy("source", "shard", "pack_id").agg(
            F.sum("ntok").cast("long").alias("pack_tokens")
        )
        # stage-8 epoch targets + deterministic draw
        b_packs = pack_census.agg(
            F.coalesce(F.sum("n_train_packs"), F.lit(0))
            .cast("long")
            .alias("b_packs")
        )
        wm = F.round(F.col("w") * F.lit(1_000_000), 0).cast("long")
        twm = F.round(F.col("t_w") * F.lit(1_000_000), 0).cast("long")
        target = (
            weighted.crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(b_packs))
            .select(
                "source",
                F.when(
                    twm != 0,
                    F.call_function("div", wm * F.col("b_packs"), twm),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("epoch_target_packs"),
            )
        )
        eh = hash64(
            F.concat(
                F.col("source"),
                F.lit("#"),
                F.col("shard").cast("string"),
                F.lit("#"),
                F.col("pack_id").cast("string"),
                F.lit("#epmix"),
            )
        )
        we = Window.partitionBy("source").orderBy(eh, "shard", "pack_id")
        esel = (
            pack_lvl.withColumn("rn", F.row_number().over(we))
            .join(target, "source")
            .where(F.col("rn") <= F.col("epoch_target_packs"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_epoch_packs"),
                F.sum("pack_tokens").cast("long").alias("epoch_tokens"),
            )
        )
        out = out.join(target, "source", "left").join(esel, "source", "left")
    else:  # stage-7 pricing config: same schema, stage-8 work elided
        for c in ("epoch_target_packs", "n_epoch_packs", "epoch_tokens"):
            out = out.withColumn(c, F.lit(None).cast("long"))
    return (
        out
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_dedup").cast("long").alias("n_dedup"),
            F.col("n_quality").cast("long").alias("n_quality"),
            F.col("n_clean").cast("long").alias("n_clean"),
            F.col("n_train").cast("long").alias("n_train"),
            F.col("n_val").cast("long").alias("n_val"),
            F.col("n_test").cast("long").alias("n_test"),
            F.col("kept_tokens").cast("long").alias("kept_tokens"),
            F.col("n_train_shards").cast("long").alias("n_train_shards"),
            F.coalesce(F.col("train_tokens"), F.lit(0))
            .cast("long")
            .alias("train_tokens"),
            F.coalesce(F.col("n_train_packs"), F.lit(0))
            .cast("long")
            .alias("n_train_packs"),
            F.when(
                F.col("n_train_shards") > 0,
                round_mean_micro(
                    F.coalesce(F.col("train_tokens"), F.lit(0)).cast(
                        "decimal(18,6)"
                    ),
                    F.col("n_train_shards"),
                ),
            ).alias("tokens_per_shard"),
            F.col("w").cast("double").alias("weight"),
            F.when(
                F.col("t_w") != 0,
                F.round(
                    F.col("w").cast("double")
                    / F.col("t_w").cast("double"),
                    6,
                ),
            ).alias("weight_share"),
            F.coalesce("epoch_target_packs", F.lit(0))
            .cast("long")
            .alias("epoch_target_packs"),
            F.coalesce("n_epoch_packs", F.lit(0))
            .cast("long")
            .alias("n_epoch_packs"),
            F.coalesce("epoch_tokens", F.lit(0))
            .cast("long")
            .alias("epoch_tokens"),
        )
        .orderBy("source")
    )


def _t_corpus_pipeline_sql() -> str:
    from kp_crypto_market_analytics_spark.functions.text import STOPWORDS
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        sql_round_mean_micro,
    )
    from kp_crypto_market_analytics_spark.queries_ext import _CLUSTER_CTES
    from kp_crypto_market_analytics_spark.queries_r7 import _SPLIT_SQL

    hit_terms = " + ".join(
        f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2}"
        " AS BIGINT)"
        for w in STOPWORDS
    )
    hc = H60.format(x="CAST(cluster_id AS VARCHAR) || '#split'")
    hd = H60.format(x="CAST(doc_id AS VARCHAR) || '#ep1'")
    _EH60 = H60.format(
        x="source || '#' || CAST(shard AS VARCHAR) || '#'"
        " || CAST(pack_id AS VARCHAR) || '#epmix'"
    )
    return f"""
{_CLUSTER_CTES}, feat AS (
  SELECT doc_id, source, {NORM_TEXT_SQL} AS t,
    ' ' || {NORM_TEXT_SQL} || ' ' AS p,
    string_split({NORM_TEXT_SQL}, ' ') AS l,
    CASE WHEN length({NORM_TEXT_SQL}) = 0 THEN 0
         ELSE CAST(length({NORM_TEXT_SQL})
              - length(replace({NORM_TEXT_SQL}, ' ', '')) AS BIGINT) + 1
    END AS ntok
  FROM documents
), scored AS (
  SELECT doc_id, source, ntok, l,
    {hit_terms} AS stopword_hits,
    CASE WHEN len(l) >= 2 THEN
      1.0 - CAST(len(list_distinct(list_transform(
                generate_series(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1]))) AS DOUBLE) / (len(l) - 1)
    END AS dup_ratio
  FROM feat
), quality AS (
  SELECT doc_id, source, ntok, dup_ratio,
    (ntok >= {_PIPE_MIN_TOKENS} AND
     round(least(ntok / 100.0, 1.0) * 0.5
         + least(CASE WHEN ntok > 0
                 THEN CAST(stopword_hits AS DOUBLE) / ntok END * 5,
                 1.0) * 0.5, 6) >= {_PIPE_MIN_QUALITY}
     AND coalesce(dup_ratio <= {_PIPE_MAX_DUP_RATIO}, TRUE)) AS pass_q
  FROM scored
), tidx AS (
  SELECT doc_id, source, l, unnest(generate_series(1, len(l) - 2)) AS i
  FROM scored
), tri AS (
  SELECT DISTINCT doc_id, source,
    l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS g
  FROM tidx
), tfreq AS (
  SELECT g, COUNT(*) AS df FROM tri GROUP BY 1
), tcap AS (
  SELECT tri.doc_id, tri.source, tri.g FROM tri JOIN tfreq USING (g)
  WHERE df <= {_PIPE_TRI_DF_CAP}
), corp_tri AS (
  SELECT doc_id, g FROM tcap WHERE source <> '{_PIPE_EVAL_SRC}'
), ntri AS (
  SELECT doc_id, COUNT(*) AS n_tri FROM corp_tri GROUP BY 1
), nshared AS (
  SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_shared FROM corp_tri c
  JOIN (SELECT DISTINCT g FROM tcap
        WHERE source = '{_PIPE_EVAL_SRC}') e USING (g)
  GROUP BY 1
), contam AS (
  SELECT ntri.doc_id FROM ntri LEFT JOIN nshared USING (doc_id)
  WHERE 2 * coalesce(n_shared, 0) >= n_tri
), asg AS (
  SELECT q.doc_id, q.source, q.ntok, lb.cluster_id,
    q.source <> '{_PIPE_EVAL_SRC}' AS in_corpus,
    q.pass_q,
    (q.doc_id IN (SELECT doc_id FROM contam)) AS is_contam
  FROM quality q JOIN labeled lb USING (doc_id)
), flagged AS (
  SELECT *,
    (in_corpus AND doc_id = MIN(CASE WHEN in_corpus THEN doc_id END)
        OVER (PARTITION BY cluster_id)) AS keep_dedup
  FROM asg
), flagged2 AS (
  SELECT *,
    (keep_dedup AND pass_q) AS keep_quality,
    (keep_dedup AND pass_q AND NOT is_contam) AS keep_clean
  FROM flagged
), final AS (
  SELECT *,
    CASE WHEN keep_clean THEN
      (SELECT {_SPLIT_SQL} FROM (SELECT {hc} % 100 AS bucket))
    END AS split,
    CASE WHEN keep_clean AND
      (SELECT {_SPLIT_SQL} FROM (SELECT {hc} % 100 AS bucket)) = 'train'
    THEN {hd} % {_PIPE_N_SHARDS} END AS shard
  FROM flagged2
), census AS (
  SELECT source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN keep_dedup THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
    CAST(SUM(CASE WHEN keep_quality THEN 1 ELSE 0 END) AS BIGINT)
      AS n_quality,
    CAST(SUM(CASE WHEN keep_clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_train,
    CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_test,
    CAST(SUM(CASE WHEN keep_clean THEN ntok ELSE 0 END) AS BIGINT)
      AS kept_tokens,
    CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_train_shards
  FROM final WHERE in_corpus GROUP BY source
), packs AS (
  SELECT source, shard, ntok,
    SUM(ntok) OVER (PARTITION BY source, shard ORDER BY doc_id) AS cum
  FROM final WHERE split = 'train'
), pc AS (
  SELECT source,
    CAST(SUM(ntok) AS BIGINT) AS train_tokens,
    CAST(COUNT(DISTINCT (shard, (cum - ntok) // {_PIPE_PACK_TOKENS}))
         AS BIGINT) AS n_train_packs
  FROM packs GROUP BY source
), weighted AS (
  SELECT *, CAST(round(sqrt(CAST(kept_tokens AS DOUBLE)), 6)
                 AS DECIMAL(18,6)) AS w
  FROM census
), tot AS (SELECT CAST(SUM(w) AS DECIMAL(18,6)) AS t_w FROM weighted
), pack_lvl AS (
  SELECT source, shard, (cum - ntok) // {_PIPE_PACK_TOKENS} AS pack_id,
    CAST(SUM(ntok) AS BIGINT) AS pack_tokens
  FROM packs GROUP BY 1, 2, 3
), bp AS (
  SELECT CAST(coalesce(SUM(n_train_packs), 0) AS BIGINT) AS b_packs
  FROM pc
), targets AS (
  SELECT source,
    CASE WHEN CAST(t_w * 1000000 AS BIGINT) <> 0 THEN
      (CAST(w * 1000000 AS BIGINT) * b_packs)
        // CAST(t_w * 1000000 AS BIGINT)
    ELSE 0 END AS epoch_target_packs
  FROM weighted CROSS JOIN tot CROSS JOIN bp
), ranked AS (
  SELECT source, pack_tokens,
    row_number() OVER (PARTITION BY source ORDER BY
      {_EH60}, shard, pack_id) AS rn
  FROM pack_lvl
), esel AS (
  SELECT r.source,
    CAST(COUNT(*) AS BIGINT) AS n_epoch_packs,
    CAST(SUM(pack_tokens) AS BIGINT) AS epoch_tokens
  FROM ranked r JOIN targets tg USING (source)
  WHERE r.rn <= tg.epoch_target_packs
  GROUP BY 1
)
SELECT source, n_docs, n_dedup, n_quality, n_clean, n_train, n_val,
  n_test, kept_tokens, n_train_shards,
  CAST(coalesce(train_tokens, 0) AS BIGINT) AS train_tokens,
  CAST(coalesce(n_train_packs, 0) AS BIGINT) AS n_train_packs,
  CASE WHEN n_train_shards > 0 THEN
    {sql_round_mean_micro("CAST(coalesce(train_tokens, 0) AS DECIMAL(18,6))", "n_train_shards")}
  END AS tokens_per_shard,
  CAST(w AS DOUBLE) AS weight,
  CASE WHEN t_w <> 0 THEN
    round(CAST(w AS DOUBLE) / CAST(t_w AS DOUBLE), 6)
  END AS weight_share,
  CAST(coalesce(epoch_target_packs, 0) AS BIGINT) AS epoch_target_packs,
  CAST(coalesce(n_epoch_packs, 0) AS BIGINT) AS n_epoch_packs,
  CAST(coalesce(epoch_tokens, 0) AS BIGINT) AS epoch_tokens
FROM weighted LEFT JOIN pc USING (source) CROSS JOIN tot
  LEFT JOIN targets USING (source) LEFT JOIN esel USING (source)
ORDER BY source
"""


R8_QUERIES["t_corpus_pipeline"] = t_corpus_pipeline
_R8_ORACLES["t_corpus_pipeline"] = _t_corpus_pipeline_sql


# -------------------------------------------------- a_welch_stream_parity

_WELCH_BATCHES = 4


def a_welch_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Welch A/B monitor, gated batch-side: fold 4
    deterministic micro-batches of the event stream (batch = event_id
    mod 4) through the cumulative per-arm sufficient statistics
    (n, Σv, Σv²) per event type and emit the Welch t / Welch–
    Satterthwaite dof AFTER EACH BATCH — what a live experimentation
    monitor publishes per trigger (arms: weekend vs weekday, the
    a_welch_ttest arms).  The REAL streaming operator
    (streaming/welch.py, applyInPandasWithState keyed state) is pinned
    emission-for-emission to this fold by
    tests/test_sinks_streaming.py::test_welch_stream_matches_batch_fold
    — the statistics-family counterpart of the sketch quartet's parity
    gates (t_mg_stream_parity et al.).

    Determinism: per-(batch, type, arm) moments are exact DECIMAL(18,6)
    sums; the cumulative prefix is a 4×4 triangular join over the tiny
    per-batch partial frame (never a window); t and dof are the
    identical IEEE chain over the exact moments in both engines; means
    ride round_mean_micro.

    Scale shape: ONE map-side-combined groupBy(event_type, bid) — the
    only full-data pass; everything after is |types|×4 rows."""
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        round_mean_micro,
    )

    t = load_tables(spark, sf_dir, ["events"])
    e = ensure_parallelism(t["events"])
    v = F.col("value").cast("decimal(18,6)")
    wknd = F.dayofweek("ts").isin(1, 7)
    part = e.groupBy(
        "event_type",
        (F.pmod(F.col("event_id"), F.lit(_WELCH_BATCHES)) + 1).alias("bid"),
    ).agg(
        F.sum(F.when(wknd, v)).alias("psa"),
        F.sum(F.when(wknd, v * v)).alias("pqa"),
        F.count(F.when(wknd, F.lit(1))).alias("pna"),
        F.sum(F.when(~wknd, v)).alias("psb"),
        F.sum(F.when(~wknd, v * v)).alias("pqb"),
        F.count(F.when(~wknd, F.lit(1))).alias("pnb"),
    )
    ks = spark.range(1, _WELCH_BATCHES + 1).select(
        F.col("id").cast("int").alias("batch_idx")
    )
    cum = (
        part.join(
            F.broadcast(ks), F.col("bid") <= F.col("batch_idx")
        )
        .groupBy("batch_idx", "event_type")
        .agg(
            F.sum("psa").alias("sa"),
            F.sum("pqa").alias("qa"),
            F.sum("pna").alias("na"),
            F.sum("psb").alias("sb"),
            F.sum("pqb").alias("qb"),
            F.sum("pnb").alias("nb"),
        )
    )
    sa, qa, na = (
        F.col("sa").cast("double"),
        F.col("qa").cast("double"),
        F.col("na"),
    )
    sb, qb, nb = (
        F.col("sb").cast("double"),
        F.col("qb").cast("double"),
        F.col("nb"),
    )
    va = (qa - sa * sa / na) / (na - F.lit(1))
    vb = (qb - sb * sb / nb) / (nb - F.lit(1))
    aa = va / na
    bb = vb / nb
    ok = (na > 1) & (nb > 1) & (aa + bb > 0)
    tstat = (sa / na - sb / nb) / F.sqrt(aa + bb)
    dof = (aa + bb) * (aa + bb) / (
        aa * aa / (na - F.lit(1)) + bb * bb / (nb - F.lit(1))
    )
    return cum.select(
        F.col("batch_idx").cast("long").alias("batch_idx"),
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.when(na > 0, round_mean_micro(F.col("sa"), na)).alias("mean_a"),
        F.when(nb > 0, round_mean_micro(F.col("sb"), nb)).alias("mean_b"),
        F.when(ok, F.round(tstat, 6) + F.lit(0.0)).alias("t_stat"),
        F.when(ok, F.round(dof, 6) + F.lit(0.0)).alias("welch_dof"),
    ).orderBy("batch_idx", "event_type")


def _a_welch_stream_parity_sql() -> str:
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        sql_round_mean_micro,
    )

    mean_a = sql_round_mean_micro("sa", "na")
    mean_b = sql_round_mean_micro("sb", "nb")
    va = "((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na) / (na - 1))"
    vb = "((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb) / (nb - 1))"
    aa = f"({va} / na)"
    bb = f"({vb} / nb)"
    ok = f"(na > 1 AND nb > 1 AND {aa} + {bb} > 0)"
    tstat = (
        f"(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)"
        f" / sqrt({aa} + {bb})"
    )
    dof = (
        f"({aa} + {bb}) * ({aa} + {bb})"
        f" / ({aa} * {aa} / (na - 1) + {bb} * {bb} / (nb - 1))"
    )
    return f"""
WITH part AS (
  SELECT event_type, event_id % {_WELCH_BATCHES} + 1 AS bid,
    SUM(CASE WHEN dayofweek(ts) IN (0, 6)
      THEN CAST(value AS DECIMAL(18,6)) END) AS psa,
    SUM(CASE WHEN dayofweek(ts) IN (0, 6)
      THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
      END) AS pqa,
    COUNT(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 END) AS pna,
    SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6)
      THEN CAST(value AS DECIMAL(18,6)) END) AS psb,
    SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6)
      THEN CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
      END) AS pqb,
    COUNT(CASE WHEN dayofweek(ts) NOT IN (0, 6) THEN 1 END) AS pnb
  FROM events GROUP BY 1, 2
), ks AS (
  SELECT unnest(generate_series(1, {_WELCH_BATCHES})) AS batch_idx
), cum AS (
  SELECT batch_idx, event_type,
    CAST(SUM(psa) AS DECIMAL(18,6)) AS sa,
    CAST(SUM(pqa) AS DECIMAL(38,12)) AS qa,
    CAST(SUM(pna) AS BIGINT) AS na,
    CAST(SUM(psb) AS DECIMAL(18,6)) AS sb,
    CAST(SUM(pqb) AS DECIMAL(38,12)) AS qb,
    CAST(SUM(pnb) AS BIGINT) AS nb
  FROM part JOIN ks ON bid <= batch_idx
  GROUP BY 1, 2
)
SELECT CAST(batch_idx AS BIGINT) AS batch_idx, event_type, na AS n_a,
  nb AS n_b,
  CASE WHEN na > 0 THEN {mean_a} END AS mean_a,
  CASE WHEN nb > 0 THEN {mean_b} END AS mean_b,
  CASE WHEN {ok} THEN round({tstat}, 6) + 0.0 END AS t_stat,
  CASE WHEN {ok} THEN round({dof}, 6) + 0.0 END AS welch_dof
FROM cum ORDER BY batch_idx, event_type
"""


R8_QUERIES["a_welch_stream_parity"] = a_welch_stream_parity
_R8_ORACLES["a_welch_stream_parity"] = _a_welch_stream_parity_sql


# ----------------------------------------------------------- indicators
#
# Round-8 batch A: the remaining classic channel/risk indicators over
# the family's shared tick series (symbol = event_type, price = value,
# ORDER BY ts, event_id — the queries_indicators conventions).

_TICK_W_SQL = "PARTITION BY event_type ORDER BY ts, event_id"


def _tick_w() -> Window:
    return Window.partitionBy("event_type").orderBy("ts", "event_id")


def ti_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian channel (20-row rolling high/low, Richard Donchian's
    trend rule, public) with the channel position (value − low) /
    (high − low) — the breakout indicator pair ti_bollinger's
    stat-band complements; masked below 20 observations and on a flat
    channel.

    Determinism: high/low are exact order statistics of the raw
    doubles (no arithmetic); the position is one identical IEEE
    division rounded to 6 dp with −0.0 normalized.

    Scale shape: rides the family's ONE window sort per symbol —
    rolling min/max add no shuffle."""
    t = load_tables(spark, sf_dir, ["events"])
    w = _tick_w().rowsBetween(-19, 0)
    hi, lo, n = (
        F.max("value").over(w),
        F.min("value").over(w),
        F.count("value").over(w),
    )
    pos = F.when(
        (n >= 20) & (hi > lo),
        F.round((F.col("value") - lo) / (hi - lo), 6) + F.lit(0.0),
    )
    return t["events"].select(
        "event_id",
        "event_type",
        "value",
        F.when(n >= 20, hi).alias("dc_high"),
        F.when(n >= 20, lo).alias("dc_low"),
        pos.alias("dc_pos"),
    )


TI_DONCHIAN_SQL = f"""
SELECT event_id, event_type, value,
  CASE WHEN n >= 20 THEN hi END AS dc_high,
  CASE WHEN n >= 20 THEN lo END AS dc_low,
  CASE WHEN n >= 20 AND hi > lo
    THEN round((value - lo) / (hi - lo), 6) + 0.0 END AS dc_pos
FROM (
  SELECT event_id, event_type, value,
    MAX(value) OVER w AS hi, MIN(value) OVER w AS lo,
    COUNT(value) OVER w AS n
  FROM events
  WINDOW w AS ({_TICK_W_SQL} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
"""


def ti_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer index (Peter Martin 1987, public): RMS of the rolling
    percentage drawdown from the running high over a 14-row window —
    the downside-risk twin of rolling stddev (which penalizes upside
    too); masked below 14 rows.

    Determinism: drawdowns are micro-rounded BIGINTs (one IEEE
    division each off the exact running max), so the windowed Σdd² is
    an exact integer fold — a float window sum would be
    order-dependent; the final sqrt is one IEEE op.

    Scale shape: running max + rolling sum on the family's ONE window
    sort; no extra shuffle."""
    t = load_tables(spark, sf_dir, ["events"])
    w = _tick_w()
    runmax = F.max("value").over(w.rowsBetween(Window.unboundedPreceding, 0))
    dd_micro = F.when(
        runmax > 0,
        F.round(
            (F.col("value") / runmax - F.lit(1.0)) * F.lit(100_000_000.0), 0
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    w14 = _tick_w().rowsBetween(-13, 0)
    # re-sort-free: ddm rides the same (type, ts, event_id) frame
    base = t["events"].select(
        "event_id",
        "event_type",
        "value",
        "ts",
        dd_micro.alias("ddm"),
    )
    n = F.count("ddm").over(w14)
    s2 = F.sum(F.col("ddm") * F.col("ddm")).over(w14)
    ulcer = F.when(
        n >= 14,
        F.round(
            F.sqrt(s2.cast("double") / (n * F.lit(1e12))), 6
        )
        + F.lit(0.0),
    )
    return base.select(
        "event_id",
        "event_type",
        "value",
        (F.col("ddm") / F.lit(1_000_000.0)).alias("drawdown_pct"),
        ulcer.alias("ulcer_index"),
    )


TI_ULCER_SQL = f"""
SELECT event_id, event_type, value,
  ddm / 1000000.0 AS drawdown_pct,
  CASE WHEN n >= 14 THEN
    round(sqrt(CAST(s2 AS DOUBLE) / (n * 1e12)), 6) + 0.0
  END AS ulcer_index
FROM (
  SELECT event_id, event_type, value,
    COUNT(ddm) OVER w14 AS n,
    SUM(ddm * ddm) OVER w14 AS s2, ddm
  FROM (
    SELECT event_id, event_type, value, ts,
      CASE WHEN runmax > 0 THEN
        CAST(round((value / runmax - 1.0) * 100000000.0, 0) AS BIGINT)
      ELSE 0 END AS ddm
    FROM (
      SELECT event_id, event_type, value, ts,
        MAX(value) OVER ({_TICK_W_SQL}
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
      FROM events
    )
  )
  WINDOW w14 AS ({_TICK_W_SQL} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
"""


_BETA_BENCH = "click"  # densest series = the market proxy


def ti_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM beta per symbol against the '{bench}' series (Sharpe 1964,
    public): daily-close log returns aligned by calendar day, β =
    (nΣxy − ΣxΣy) / (nΣxx − (Σx)²), plus the return correlation — the
    cross-asset risk table the reference's correlation matrix
    (src/analytics/binance_analysis.py:543-546) is one step away from.

    Determinism: daily closes are row_number-picked on the total
    (ts, event_id) order; zero/negative closes are filtered before the
    log like ti_realized_vol; returns are micro-rounded BIGINTs so
    every moment sum is exact; β/ρ are single IEEE chains on exact
    integers, rounded with −0.0 normalized.

    Scale shape: one (type, day) agg for closes, one lag window on the
    |types|×|days| daily frame, one broadcast join of the benchmark
    day column, one moment agg — nothing at tick grain shuffles
    twice."""
    t = load_tables(spark, sf_dir, ["events"])
    rn = F.row_number().over(
        Window.partitionBy("event_type", F.to_date("ts")).orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    closes = (
        t["events"]
        .withColumn("__rn", rn)
        .where((F.col("__rn") == 1) & (F.col("value") > 0))
        .select(
            "event_type", F.to_date("ts").alias("day"),
            F.col("value").alias("close"),
        )
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    rets = (
        closes.withColumn("prev", F.lag("close").over(wd))
        .where(F.col("prev") > 0)
        .select(
            "event_type",
            "day",
            F.round(
                F.log(F.col("close") / F.col("prev")) * F.lit(1_000_000.0), 0
            )
            .cast("long")
            .alias("rm"),
        )
    )
    bench = rets.where(F.col("event_type") == _BETA_BENCH).select(
        "day", F.col("rm").alias("bm")
    )
    j = rets.join(F.broadcast(bench), "day")
    m = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rm").alias("sx"),
        F.sum("bm").alias("sy"),
        F.sum(F.col("rm") * F.col("rm")).alias("sxx"),
        F.sum(F.col("bm") * F.col("bm")).alias("syy"),
        F.sum(F.col("rm") * F.col("bm")).alias("sxy"),
    )
    n = F.col("n")
    cov_n = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    var_b = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    var_s = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ok_b = (n > 1) & (var_b > 0)
    ok_r = ok_b & (var_s > 0)
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.when(ok_b, F.round(cov_n / var_b, 6) + F.lit(0.0)).alias("beta"),
        F.when(
            ok_r,
            F.round(cov_n / F.sqrt(var_b * var_s), 6) + F.lit(0.0),
        ).alias("corr"),
    ).orderBy("event_type")


ti_beta.__doc__ = ti_beta.__doc__.format(bench=_BETA_BENCH)


TI_BETA_SQL = f"""
WITH closes AS (
  SELECT event_type, day, close FROM (
    SELECT event_type, CAST(ts AS DATE) AS day, value AS close,
      row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                         ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND close > 0
), rets AS (
  SELECT event_type, day,
    CAST(round(ln(close / prev) * 1000000.0, 0) AS BIGINT) AS rm
  FROM (
    SELECT event_type, day, close,
      lag(close) OVER (PARTITION BY event_type ORDER BY day) AS prev
    FROM closes
  ) WHERE prev > 0
), bench AS (
  SELECT day, rm AS bm FROM rets WHERE event_type = '{_BETA_BENCH}'
), m AS (
  SELECT r.event_type, COUNT(*) AS n,
    SUM(rm) AS sx, SUM(bm) AS sy,
    SUM(rm * rm) AS sxx, SUM(bm * bm) AS syy, SUM(rm * bm) AS sxy
  FROM rets r JOIN bench USING (day) GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
  CASE WHEN n > 1 AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
    round(CAST(n * sxy - sx * sy AS DOUBLE)
        / CAST(n * syy - sy * sy AS DOUBLE), 6) + 0.0 END AS beta,
  CASE WHEN n > 1 AND CAST(n * syy - sy * sy AS DOUBLE) > 0
        AND CAST(n * sxx - sx * sx AS DOUBLE) > 0 THEN
    round(CAST(n * sxy - sx * sy AS DOUBLE)
        / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
             * CAST(n * sxx - sx * sx AS DOUBLE)), 6) + 0.0 END AS corr
FROM m ORDER BY event_type
"""


_PK_4LN2 = 2.772588722239781  # 4·ln2, shared double literal


def ti_parkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson range volatility per symbol (Parkinson 1980, public):
    σ_P = sqrt(Σ ln(H/L)² / (4·ln2·n)) over daily high/low candles —
    the range estimator that is ~5× more efficient than close-to-close
    vol, computable straight from OHLC without tick storage.

    Determinism: daily H/L are exact order statistics; each ln(H/L) is
    micro-rounded to BIGINT so Σx² folds exactly; one IEEE
    sqrt/division at the end.  Days with L <= 0 or a flat range
    contribute like any other (ln(H/L) = 0 when H = L; L <= 0 days are
    dropped — the ti_realized_vol zero-price rule).

    Scale shape: one (type, day) agg then a |types|-row agg."""
    t = load_tables(spark, sf_dir, ["events"])
    daily = (
        t["events"]
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.max("value").alias("h"), F.min("value").alias("l"))
        .where(F.col("l") > 0)
        .select(
            "event_type",
            F.round(
                F.log(F.col("h") / F.col("l")) * F.lit(1_000_000.0), 0
            )
            .cast("long")
            .alias("xm"),
        )
    )
    out = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("xm") * F.col("xm")).alias("s2"),
    )
    return out.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(
            F.sqrt(
                F.col("s2").cast("double")
                / (F.lit(_PK_4LN2) * F.col("n_days") * F.lit(1e12))
            ),
            6,
        ).alias("parkinson_vol"),
    ).orderBy("event_type")


TI_PARKINSON_SQL = f"""
WITH daily AS (
  SELECT event_type,
    CAST(round(ln(h / l) * 1000000.0, 0) AS BIGINT) AS xm
  FROM (
    SELECT event_type, CAST(ts AS DATE) AS day,
      MAX(value) AS h, MIN(value) AS l
    FROM events GROUP BY 1, 2
  ) WHERE l > 0
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
  round(sqrt(CAST(SUM(xm * xm) AS DOUBLE)
      / ({_PK_4LN2} * COUNT(*) * 1e12)), 6) AS parkinson_vol
FROM daily GROUP BY event_type ORDER BY event_type
"""


R8_QUERIES.update(
    {
        "ti_donchian": ti_donchian,
        "ti_ulcer_index": ti_ulcer_index,
        "ti_beta": ti_beta,
        "ti_parkinson": ti_parkinson,
    }
)
_R8_ORACLES.update(
    {
        "ti_donchian": lambda: TI_DONCHIAN_SQL,
        "ti_ulcer_index": lambda: TI_ULCER_SQL,
        "ti_beta": lambda: TI_BETA_SQL,
        "ti_parkinson": lambda: TI_PARKINSON_SQL,
    }
)


# ----------------------------------------------------------- statistics
#
# Round-8 batch B: the robust/post-hoc tests the r7 statistics layer
# stops short of — Brown–Forsythe (robust variance equality), Tukey
# HSD (which groups differ, after a_anova_f says "some do"),
# Hodges–Lehmann (the rank family's location estimate), Page–Hinkley
# (the sequential drift detector w_cusum's mean-tracking twin).


def a_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Brown & Forsythe 1974, public): one-way
    ANOVA on |x − group median| across event types — "are the
    variances equal?", robust to non-normality (the median-centered
    Levene variant).  The homoscedasticity gate one checks before
    trusting a_anova_f's pooled variance.

    Determinism: group medians are the engine-exact interpolated
    percentile (the a_grouped_quantiles parity recipe; flips to
    approx sketches only under the bench conf); each |x − med| is
    micro-rounded to BIGINT so all moment sums fold exactly
    (Σz² rides DECIMAL(38,0) — micro² × corpus exceeds int64); the
    per-group s²/n between terms are unit-rounded DECIMAL(38,0) so
    the Σ over groups is exact; F is one IEEE chain.

    Scale shape: one median agg per type, one broadcast of the
    |types|-row medians, one map-side-combined moment agg — the
    a_anova_f plan plus a broadcast."""
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        percentile_expr,
    )

    t = load_tables(spark, sf_dir, ["events"])
    e = ensure_parallelism(t["events"])
    med = e.groupBy("event_type").agg(
        percentile_expr(e, "value", 0.5).alias("med")
    )
    zm = F.round(
        F.abs(F.col("value") - F.col("med")) * F.lit(1_000_000.0), 0
    ).cast("long")
    g = (
        e.join(F.broadcast(med), "event_type")
        .select("event_type", zm.alias("zm"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("ni"),
            F.sum("zm").alias("si"),
            F.sum(
                (F.col("zm") * F.col("zm")).cast("decimal(38,0)")
            ).alias("qi"),
        )
    )
    tu = F.round(
        F.col("si").cast("double") * F.col("si").cast("double") / F.col("ni"),
        0,
    ).cast("decimal(38,0)")
    agg = g.select("ni", "si", "qi", tu.alias("tu")).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("n"),
        F.sum("si").alias("s"),
        F.sum("qi").alias("q"),
        F.sum("tu").alias("t_u"),
    )
    s_d, q_d, t_d = (
        F.col("s").cast("double"),
        F.col("q").cast("double"),
        F.col("t_u").cast("double"),
    )
    n, k = F.col("n"), F.col("k")
    ssb = t_d - s_d * s_d / n
    ssw = q_d - t_d
    fstat = (ssb / (k - F.lit(1))) / (ssw / (n - k))
    ok = (k > 1) & (n > k) & (ssw > 0)
    return agg.select(
        k.cast("long").alias("k_groups"),
        n.cast("long").alias("n"),
        F.when(ok, F.round(fstat, 6) + F.lit(0.0)).alias("f_bf"),
    )


def _a_levene_bf_sql() -> str:
    return """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
), z AS (
  SELECT e.event_type,
    CAST(round(abs(e.value - m.med) * 1000000.0, 0) AS BIGINT) AS zm
  FROM events e JOIN med m USING (event_type)
), g AS (
  SELECT event_type, COUNT(*) AS ni, CAST(SUM(zm) AS BIGINT) AS si,
    CAST(SUM(zm * zm) AS DECIMAL(38,0)) AS qi
  FROM z GROUP BY 1
), a AS (
  SELECT COUNT(*) AS k, CAST(SUM(ni) AS BIGINT) AS n,
    CAST(SUM(si) AS BIGINT) AS s,
    CAST(SUM(qi) AS DECIMAL(38,0)) AS q,
    CAST(SUM(CAST(round(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / ni, 0)
      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS t_u
  FROM g
)
SELECT CAST(k AS BIGINT) AS k_groups, n,
  CASE WHEN k > 1 AND n > k AND CAST(q AS DOUBLE) - CAST(t_u AS DOUBLE) > 0
    THEN round(((CAST(t_u AS DOUBLE)
        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (k - 1))
      / ((CAST(q AS DOUBLE) - CAST(t_u AS DOUBLE)) / (n - k)), 6) + 0.0
  END AS f_bf
FROM a
"""


def a_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD pairwise comparisons (Tukey 1949, public): after
    a_anova_f says "some type means differ", the studentized-range
    q statistic for EVERY type pair — q = |x̄ᵢ − x̄ⱼ| /
    sqrt(MSE/2 · (1/nᵢ + 1/nⱼ)) with MSE pooled within-group variance —
    the post-hoc table that says WHICH pairs differ.

    Determinism: per-type moments are exact DECIMAL(18,6) sums; MSE
    reuses a_anova_f's unit-exact fold (per-group s²/n micro-rounded
    before the cross-group Σ); the pair frame is |types|² rows of one
    identical IEEE chain each, means displayed via round_mean_micro.

    Scale shape: one map-side-combined groupBy(event_type), a 1-row
    MSE broadcast, a |types|² crossJoin — constant-size tail at any
    corpus size."""
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        round_mean_micro,
    )

    t = load_tables(spark, sf_dir, ["events"])
    v = F.col("value").cast("decimal(18,6)")
    g = t["events"].groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum(v).alias("si"),
        F.sum(v * v).alias("qi"),
    )
    term_u = F.round(
        F.col("si").cast("double")
        * F.col("si").cast("double")
        / F.col("ni")
        * F.lit(1_000_000.0),
        0,
    ).cast("long")
    mse = (
        g.select("ni", "qi", term_u.alias("tu"))
        .agg(
            F.sum("ni").alias("n"),
            F.count(F.lit(1)).alias("k"),
            F.sum("qi").alias("q"),
            F.sum("tu").alias("t_u"),
        )
        .select(
            (
                (F.col("q").cast("double") - F.col("t_u") / F.lit(1e6))
                / (F.col("n") - F.col("k"))
            ).alias("mse")
        )
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("ni").alias("na"),
        F.col("si").alias("sa"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("ni").alias("nb"),
        F.col("si").alias("sb"),
    )
    pairs = (
        a.crossJoin(b)
        .where(F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(mse))
    )
    diff = (
        F.col("sa").cast("double") / F.col("na")
        - F.col("sb").cast("double") / F.col("nb")
    )
    se = F.sqrt(
        F.col("mse")
        / F.lit(2.0)
        * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
    )
    ok = (F.col("mse") > 0) & (F.col("na") > 0) & (F.col("nb") > 0)
    return pairs.select(
        "type_a",
        "type_b",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        round_mean_micro(F.col("sa"), F.col("na")).alias("mean_a"),
        round_mean_micro(F.col("sb"), F.col("nb")).alias("mean_b"),
        F.when(ok, F.round(F.abs(diff) / se, 6) + F.lit(0.0)).alias(
            "q_stat"
        ),
    ).orderBy("type_a", "type_b")


def _a_tukey_hsd_sql() -> str:
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        sql_round_mean_micro,
    )

    mean_a = sql_round_mean_micro("sa", "na")
    mean_b = sql_round_mean_micro("sb", "nb")
    return f"""
WITH g AS (
  SELECT event_type, COUNT(*) AS ni,
    SUM(CAST(value AS DECIMAL(18,6))) AS si,
    SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
      AS qi
  FROM events GROUP BY 1
), mse_t AS (
  SELECT (CAST(SUM(qi) AS DOUBLE)
      - CAST(SUM(CAST(round(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / ni
          * 1000000.0, 0) AS BIGINT)) AS BIGINT) / 1000000.0)
      / (SUM(ni) - COUNT(*)) AS mse
  FROM g
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    a.ni AS na, a.si AS sa, b.ni AS nb, b.si AS sb, mse
  FROM g a JOIN g b ON a.event_type < b.event_type CROSS JOIN mse_t
)
SELECT type_a, type_b,
  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  {mean_a} AS mean_a, {mean_b} AS mean_b,
  CASE WHEN mse > 0 AND na > 0 AND nb > 0 THEN
    round(abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
      / sqrt(mse / 2.0 * (1.0 / na + 1.0 / nb)), 6) + 0.0
  END AS q_stat
FROM pairs ORDER BY type_a, type_b
"""


def a_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann pseudo-median per event type (Hodges & Lehmann
    1963, public): the median of all Walsh averages (xᵢ+xⱼ)/2, i ≤ j,
    over the type's DAILY mean series — the robust location estimate
    the rank family (a_mann_whitney, w_theil_sen) centers on, immune
    to the outlier days that drag the plain mean.

    Determinism: daily means are exact micro half-away divisions
    (round_mean_micro → an exact integer number of micros); Walsh
    sums are exact BIGINTs; the median over them is the engine-exact
    interpolated percentile of integers (a .5-micro result at worst —
    one exact IEEE division by 2e6 at the end).

    Scale shape: the Walsh frame is |days|² per type
    (calendar-bounded like w_theil_sen, never data-bounded); daily
    means come from ONE map-side-combined (type, day) agg."""
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        percentile_expr,
    )

    t = load_tables(spark, sf_dir, ["events"])
    v = F.col("value").cast("decimal(18,6)")
    daily = t["events"].groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(v).alias("s"), F.count(F.lit(1)).alias("c"))
    micro = (F.col("s") * F.lit(1_000_000)).cast("long")
    dm = daily.select(
        "event_type",
        "day",
        (
            F.when(micro < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.call_function(
                "div",
                F.lit(2) * F.abs(micro) + F.col("c"),
                F.lit(2) * F.col("c"),
            )
        ).alias("mm"),
    )
    a = dm.select(
        "event_type", F.col("day").alias("da"), F.col("mm").alias("ma")
    )
    b = dm.select(
        "event_type", F.col("day").alias("db"), F.col("mm").alias("mb")
    )
    walsh = a.join(b, "event_type").where(F.col("da") <= F.col("db")).select(
        "event_type", (F.col("ma") + F.col("mb")).alias("ws")
    )
    out = walsh.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_walsh"),
        percentile_expr(walsh, "ws", 0.5).alias("med2"),
    )
    return out.select(
        "event_type",
        F.col("n_walsh").cast("long").alias("n_walsh"),
        (F.col("med2") / F.lit(2_000_000.0)).alias("hl_estimate"),
    ).orderBy("event_type")


def _a_hodges_lehmann_sql() -> str:
    return """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS micro,
    COUNT(*) AS c
  FROM events GROUP BY 1, 2
), dm AS (
  SELECT event_type, day,
    (CASE WHEN micro < 0 THEN -1 ELSE 1 END)
      * ((2 * abs(micro) + c) // (2 * c)) AS mm
  FROM daily
), walsh AS (
  SELECT a.event_type, a.mm + b.mm AS ws
  FROM dm a JOIN dm b
    ON a.event_type = b.event_type AND a.day <= b.day
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_walsh,
  quantile_cont(ws, 0.5) / 2000000.0 AS hl_estimate
FROM walsh GROUP BY event_type ORDER BY event_type
"""


_PH_DELTA_MICRO = 500_000  # δ = 0.5 in micro units
# λ = 2500: sized to the series' excursion scale (m − min random-walks
# at σ·√n ≈ 2.8k–6.4k on this data) so alarms are RARE but present at
# both test SFs — λ = 50 fired on 95% of rows (vacuous), λ ≥ 5000
# never fires at sf0.01 (also vacuous).
_PH_LAMBDA_MICRO = 2_500_000_000


def w_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley mean-drift detector per symbol (Page 1954 /
    Hinkley 1971, public): mₜ = Σᵢ≤ₜ (xᵢ − x̄ᵢ − δ) with x̄ᵢ the
    running mean, Mₜ = min mₛ, alarm when mₜ − Mₜ > λ — the
    sequential upward-drift monitor, w_cusum's running-mean twin
    (CUSUM tracks a FIXED baseline; PH tracks the self-updating
    mean).

    Determinism: running sums are exact DECIMAL(18,6); each per-row
    term xₜ − Sₜ/t − δ is micro-rounded to BIGINT (one IEEE division
    off exact values), so the mₜ prefix fold and running min are
    exact integers; the alarm compare is integer vs integer.

    Scale shape: three frames of the family's ONE window sort per
    symbol (prefix sum, prefix fold, running min) — no extra
    shuffle."""
    t = load_tables(spark, sf_dir, ["events"])
    w = _tick_w()
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    v = F.col("value").cast("decimal(18,6)")
    base = t["events"].select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.sum(v).over(wcum).alias("s"),
        F.count(F.lit(1)).over(wcum).alias("t"),
    )
    term = (
        F.round(
            (
                F.col("value")
                - F.col("s").cast("double") / F.col("t")
            )
            * F.lit(1_000_000.0),
            0,
        ).cast("long")
        - F.lit(_PH_DELTA_MICRO)
    )
    stepped = base.select(
        "event_id", "event_type", "ts", "value", term.alias("tm")
    )
    m = F.sum("tm").over(wcum).alias("m")
    stepped = stepped.select(
        "event_id", "event_type", "ts", "value", "tm", m
    )
    mmin = F.min("m").over(wcum)
    return stepped.select(
        "event_id",
        "event_type",
        "value",
        (F.col("m") / F.lit(1_000_000.0)).alias("ph_stat"),
        (mmin / F.lit(1_000_000.0)).alias("ph_min"),
        ((F.col("m") - mmin) > F.lit(_PH_LAMBDA_MICRO)).alias("alarm"),
    )


def _w_page_hinkley_sql() -> str:
    return f"""
WITH pre AS (
  SELECT event_id, event_type, ts, value,
    SUM(CAST(value AS DECIMAL(18,6))) OVER w AS s,
    COUNT(*) OVER w AS t
  FROM events
  WINDOW w AS ({_TICK_W_SQL}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), stepped AS (
  SELECT event_id, event_type, ts, value,
    CAST(round((value - CAST(s AS DOUBLE) / t) * 1000000.0, 0) AS BIGINT)
      - {_PH_DELTA_MICRO} AS tm
  FROM pre
), folded AS (
  SELECT event_id, event_type, ts, value,
    SUM(tm) OVER w AS m
  FROM stepped
  WINDOW w AS ({_TICK_W_SQL}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, event_type, value,
  m / 1000000.0 AS ph_stat,
  MIN(m) OVER w / 1000000.0 AS ph_min,
  (m - MIN(m) OVER w) > {_PH_LAMBDA_MICRO} AS alarm
FROM folded
WINDOW w AS ({_TICK_W_SQL}
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


R8_QUERIES.update(
    {
        "a_levene_bf": a_levene_bf,
        "a_tukey_hsd": a_tukey_hsd,
        "a_hodges_lehmann": a_hodges_lehmann,
        "w_page_hinkley": w_page_hinkley,
    }
)
_R8_ORACLES.update(
    {
        "a_levene_bf": _a_levene_bf_sql,
        "a_tukey_hsd": _a_tukey_hsd_sql,
        "a_hodges_lehmann": _a_hodges_lehmann_sql,
        "w_page_hinkley": _w_page_hinkley_sql,
    }
)


# ------------------------------------------------- dq / graph batch C


def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series continuity audit per (symbol, day): hours of the
    day with NO ticks — the gap census a market-data pipeline runs
    before trusting candles (the reference ingests by poll loop,
    src/main.py:24-27, so dropped polls = silent holes).  Per (type,
    day): hours present, hours missing, and the LONGEST contiguous
    missing run (computed from consecutive present-hour deltas plus
    the leading/trailing edges — no 24-row grid join needed).

    Determinism: pure integer arithmetic on distinct hour numbers.

    Scale shape: one (type, day, hour) distinct agg (map-side
    combined), one lag window over <= 24 rows per (type, day) group,
    one group agg — |types|×|days| rows out."""
    t = load_tables(spark, sf_dir, ["events"])
    hrs = (
        ensure_parallelism(t["events"])
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type", "day").orderBy("h")
    gap = hrs.select(
        "event_type",
        "day",
        "h",
        (F.col("h") - F.coalesce(F.lag("h").over(w), F.lit(-1)) - 1).alias(
            "gap_before"
        ),
    )
    return (
        gap.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("hours_present"),
            (F.lit(24) - F.count(F.lit(1))).alias("hours_missing"),
            F.greatest(
                F.max("gap_before"), F.lit(23) - F.max("h")
            ).alias("max_gap_run"),
        )
        .select(
            "event_type",
            "day",
            F.col("hours_present").cast("long").alias("hours_present"),
            F.col("hours_missing").cast("long").alias("hours_missing"),
            F.col("max_gap_run").cast("long").alias("max_gap_run"),
        )
        .orderBy("event_type", "day")
    )


DQ_SEQUENCE_GAPS_SQL = """
WITH hrs AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
    CAST(hour(ts) AS INT) AS h
  FROM events
), gap AS (
  SELECT event_type, day, h,
    h - coalesce(lag(h) OVER (PARTITION BY event_type, day ORDER BY h),
                 -1) - 1 AS gap_before
  FROM hrs
)
SELECT event_type, day,
  CAST(COUNT(*) AS BIGINT) AS hours_present,
  CAST(24 - COUNT(*) AS BIGINT) AS hours_missing,
  CAST(greatest(MAX(gap_before), 23 - MAX(h)) AS BIGINT) AS max_gap_run
FROM gap GROUP BY 1, 2 ORDER BY 1, 2
"""


def g_preferential_attachment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preferential-attachment link prediction (Barabási & Albert
    1999 lineage, public) on the co-purchase graph: score(u,v) =
    deg(u)·deg(v) for every 2-hop candidate pair — the hub-biased
    baseline g_adamic_adar's degree-discounted score is judged
    against (same candidate set, opposite inductive bias).  Top-30 by
    (score desc, u, v) with the is_edge flag.

    Determinism: all-integer (degrees and products).

    Scale shape: g_adamic_adar's support-pruned wedge join
    (session-cached edge build) generates candidates; degrees join at
    PAIR grain after the wedge agg (two broadcastable |nodes|-row
    joins), so the wedge stage shuffles only (pu, pv)."""
    from kp_crypto_market_analytics_spark.operators.windows import top_k
    from kp_crypto_market_analytics_spark.queries_mining import (
        _copurchase_edges,
    )

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = edges.select(
        F.col("u").alias("n"), F.col("v").alias("m")
    ).unionByName(edges.select(F.col("v").alias("n"), F.col("u").alias("m")))
    deg = adj.groupBy(F.col("m").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    cand = (
        adj.alias("x")
        .join(
            adj.alias("y"),
            (F.col("x.n") == F.col("y.n")) & (F.col("x.m") < F.col("y.m")),
        )
        .select(F.col("x.m").alias("pu"), F.col("y.m").alias("pv"))
        .groupBy("pu", "pv")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    du = deg.select(F.col("node").alias("pu"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("pv"), F.col("deg").alias("dv"))
    scored = (
        cand.join(F.broadcast(du), "pu")
        .join(F.broadcast(dv), "pv")
        .join(
            edges.select(
                F.col("u").alias("pu"), F.col("v").alias("pv"),
                F.lit(True).alias("e"),
            ),
            ["pu", "pv"],
            "left",
        )
        .select(
            F.col("pu").alias("u"),
            F.col("pv").alias("v"),
            F.col("common").cast("long").alias("common"),
            (F.col("du") * F.col("dv")).cast("long").alias("pa_score"),
            F.coalesce("e", F.lit(False)).alias("is_edge"),
        )
    )
    return top_k(
        scored,
        [F.col("pa_score").desc(), F.col("u").asc(), F.col("v").asc()],
        30,
    ).select("u", "v", "common", "pa_score", "is_edge")


G_PREF_ATTACH_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
), adj AS MATERIALIZED (
  SELECT u AS n, v AS m FROM edges UNION ALL SELECT v, u FROM edges
), deg AS MATERIALIZED (
  SELECT m AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1
), cand AS (
  SELECT x.m AS pu, y.m AS pv, CAST(COUNT(*) AS BIGINT) AS common
  FROM adj x JOIN adj y ON x.n = y.n AND x.m < y.m
  GROUP BY 1, 2
)
SELECT pu AS u, pv AS v, common,
  CAST(du.deg * dv.deg AS BIGINT) AS pa_score,
  coalesce(e.is_edge, FALSE) AS is_edge
FROM cand
JOIN deg du ON du.node = pu
JOIN deg dv ON dv.node = pv
LEFT JOIN (SELECT u, v, TRUE AS is_edge FROM edges) e
  ON e.u = pu AND e.v = pv
ORDER BY pa_score DESC, u ASC, v ASC
LIMIT 30
"""


def g_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node (Watts & Strogatz 1998,
    public) on the co-purchase graph: c(v) = 2·tri(v) / (deg(v)·
    (deg(v)−1)) — how close each part's neighborhood is to a clique,
    the per-node refinement of g_triangle_count's global census.
    Top-30 nodes by (coeff desc, triangles desc, node) among deg ≥ 2
    nodes.

    Determinism: all-integer counts; the coefficient is one double
    division of exact integers.

    Scale shape: the SAME degree-ordered orientation as
    g_triangle_count (out-degree bounded O(√m), so the wedge join
    never explodes on hubs); each closed wedge is unpivoted to its 3
    member nodes (explode of a 3-element literal array) and counted
    map-side."""
    from kp_crypto_market_analytics_spark.operators.windows import top_k
    from kp_crypto_market_analytics_spark.queries_mining import (
        _copurchase_edges,
    )

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionByName(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    ordered = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ordered.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    ).localCheckpoint(eager=True)
    wedges = (
        oriented.alias("a")
        .join(
            oriented.alias("b"),
            (F.col("a.src") == F.col("b.src"))
            & (
                (F.col("a.ddeg") < F.col("b.ddeg"))
                | (
                    (F.col("a.ddeg") == F.col("b.ddeg"))
                    & (F.col("a.dst") < F.col("b.dst"))
                )
            ),
        )
        .select(
            F.col("a.src").alias("c"),
            F.col("a.dst").alias("x"),
            F.col("b.dst").alias("y"),
        )
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("x"), F.col("dst").alias("y")),
        ["x", "y"],
    )
    tri_nodes = closed.select(
        F.explode(F.array("c", "x", "y")).alias("n")
    ).groupBy("n").agg(F.count(F.lit(1)).alias("tri"))
    out = (
        deg.where(F.col("deg") >= 2)
        .join(tri_nodes, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("deg").cast("long").alias("deg"),
            F.coalesce("tri", F.lit(0)).cast("long").alias("triangles"),
            (
                F.round(
                    F.lit(2.0)
                    * F.coalesce("tri", F.lit(0)).cast("double")
                    / (F.col("deg") * (F.col("deg") - 1)),
                    6,
                )
                + F.lit(0.0)
            ).alias("coeff"),
        )
    )
    return top_k(
        out,
        [F.col("coeff").desc(), F.col("triangles").desc(),
         F.col("node").asc()],
        30,
    ).select("node", "deg", "triangles", "coeff")


G_CLUSTERING_COEFF_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
), deg AS MATERIALIZED (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges) GROUP BY 1
), oriented AS MATERIALIZED (
  SELECT CASE WHEN (d1.deg < d2.deg) OR (d1.deg = d2.deg AND u < v)
              THEN u ELSE v END AS src,
         CASE WHEN (d1.deg < d2.deg) OR (d1.deg = d2.deg AND u < v)
              THEN v ELSE u END AS dst,
         CASE WHEN (d1.deg < d2.deg) OR (d1.deg = d2.deg AND u < v)
              THEN d2.deg ELSE d1.deg END AS ddeg
  FROM edges JOIN deg d1 ON d1.n = edges.u JOIN deg d2 ON d2.n = edges.v
), closed AS (
  SELECT a.src AS c, a.dst AS x, b.dst AS y
  FROM oriented a JOIN oriented b
    ON a.src = b.src
   AND ((a.ddeg < b.ddeg) OR (a.ddeg = b.ddeg AND a.dst < b.dst))
  JOIN oriented o ON o.src = a.dst AND o.dst = b.dst
), tri_nodes AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS tri
  FROM (SELECT unnest([c, x, y]) AS n FROM closed) GROUP BY 1
)
SELECT deg.n AS node, deg, coalesce(tri, 0) AS triangles,
  round(2.0 * CAST(coalesce(tri, 0) AS DOUBLE) / (deg * (deg - 1)), 6)
    + 0.0 AS coeff
FROM deg LEFT JOIN tri_nodes USING (n)
WHERE deg >= 2
ORDER BY coeff DESC, triangles DESC, node ASC
LIMIT 30
"""


R8_QUERIES.update(
    {
        "dq_sequence_gaps": dq_sequence_gaps,
        "g_preferential_attachment": g_preferential_attachment,
        "g_clustering_coeff": g_clustering_coeff,
    }
)
_R8_ORACLES.update(
    {
        "dq_sequence_gaps": lambda: DQ_SEQUENCE_GAPS_SQL,
        "g_preferential_attachment": lambda: G_PREF_ATTACH_SQL,
        "g_clustering_coeff": lambda: G_CLUSTERING_COEFF_SQL,
    }
)


# ----------------------------------------------- t_dsir_weights (batch D)

_DSIR_BUCKETS = 4096
_DSIR_TARGET = "src4"  # the high-quality/target slice


def t_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, 'Data Selection with
    Importance Resampling', public): score every raw-corpus document
    by log p_target/p_raw under hashed-unigram bag-of-words models
    (4096 buckets, add-one smoothing; target = the 'src4' slice), then
    report the per-source resampling census — docs, mean log-weight,
    and how many clear the global top-decile selection bar.  The
    data-selection step quality-focused pretraining pipelines run
    between dedup and tokenization.

    Determinism: bucket counts are exact integers; each bucket's
    smoothed log-ratio is one identical IEEE chain micro-rounded to
    BIGINT; per-doc log-weights are exact integer sums of those; the
    selection bar is the engine-exact interpolated 90th percentile of
    integers; mean log-weight is the exact micro half-away division.

    Scale shape: one token explode feeding a map-side-combined
    (bucket, side) agg; the 4096-row log-ratio table BROADCASTS back
    onto the token stream (never a shuffle on tokens); per-doc sums
    are map-side combined; census is |sources| rows."""
    from kp_crypto_market_analytics_spark.functions.text import hash64
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        percentile_expr,
        round_mean_micro,
    )

    t = load_tables(spark, sf_dir, ["documents"])
    toks = (
        ensure_parallelism(t["documents"])
        .select(
            "doc_id",
            "source",
            F.explode(F.split(_norm_text_col(), " ")).alias("tok"),
        )
        .select(
            "doc_id",
            "source",
            F.pmod(hash64(F.col("tok")), F.lit(_DSIR_BUCKETS)).alias("f"),
        )
        .localCheckpoint(eager=True)
    )
    is_t = F.col("source") == _DSIR_TARGET
    bc = toks.groupBy("f").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~is_t, 1).otherwise(0)).alias("cr"),
    )
    tot = bc.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    lr_micro = F.round(
        (
            F.log(
                (F.col("ct") + 1).cast("double")
                / (F.col("nt") + F.lit(_DSIR_BUCKETS)).cast("double")
            )
            - F.log(
                (F.col("cr") + 1).cast("double")
                / (F.col("nr") + F.lit(_DSIR_BUCKETS)).cast("double")
            )
        )
        * F.lit(1_000_000.0),
        0,
    ).cast("long")
    lrt = bc.crossJoin(F.broadcast(tot)).select("f", lr_micro.alias("lr"))
    docw = (
        toks.where(~is_t)
        .join(F.broadcast(lrt), "f")
        .groupBy("doc_id", "source")
        .agg(F.sum("lr").alias("logw"))
    )
    bar = docw.agg(percentile_expr(docw, "logw", 0.9).alias("p90"))
    return (
        docw.crossJoin(F.broadcast(bar))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("logw").alias("s_logw"),
            F.sum(
                F.when(F.col("logw") >= F.col("p90"), 1).otherwise(0)
            ).alias("n_selected"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            # s_logw is ALREADY integer micros → pure int64 half-away
            # division (no decimal cast, no double round-trip)
            (
                (
                    F.when(F.col("s_logw") < 0, F.lit(-1)).otherwise(
                        F.lit(1)
                    )
                    * F.call_function(
                        "div",
                        F.lit(2) * F.abs(F.col("s_logw"))
                        + F.col("n_docs"),
                        F.lit(2) * F.col("n_docs"),
                    )
                )
                / F.lit(1_000_000.0)
            ).alias("mean_logw"),
            F.col("n_selected").cast("long").alias("n_selected"),
        )
        .orderBy("source")
    )


def _norm_text_col():
    return F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))


def _t_dsir_weights_sql() -> str:
    h = H60.format(x="tok")
    mean_lw = (
        "(CASE WHEN SUM(logw) < 0 THEN -1 ELSE 1 END"
        " * ((2 * abs(SUM(logw)) + COUNT(*)) // (2 * COUNT(*))))"
        " / 1000000.0"
    )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, source,
    {h} % {_DSIR_BUCKETS} AS f
  FROM (SELECT doc_id, source,
          unnest(string_split({NORM_TEXT_SQL}, ' ')) AS tok
        FROM documents)
), bc AS (
  SELECT f,
    SUM(CASE WHEN source = '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS ct,
    SUM(CASE WHEN source <> '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS cr
  FROM toks GROUP BY 1
), tot AS (
  SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM bc
), lrt AS (
  SELECT f, CAST(round((
      ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + {_DSIR_BUCKETS} AS DOUBLE))
    - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + {_DSIR_BUCKETS} AS DOUBLE))
    ) * 1000000.0, 0) AS BIGINT) AS lr
  FROM bc CROSS JOIN tot
), docw AS MATERIALIZED (
  SELECT doc_id, source, CAST(SUM(lr) AS BIGINT) AS logw
  FROM toks JOIN lrt USING (f)
  WHERE source <> '{_DSIR_TARGET}'
  GROUP BY 1, 2
), bar AS (
  SELECT quantile_cont(logw, 0.9) AS p90 FROM docw
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  {mean_lw} AS mean_logw,
  CAST(SUM(CASE WHEN logw >= p90 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_selected
FROM docw CROSS JOIN bar
GROUP BY source ORDER BY source
"""


_ISO_SAMPLE_MOD = 97
_ISO_EMB_D = 64


def e_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy census (Ethayarajh 2019 lineage, public):
    the distribution of PAIRWISE cosine similarity over the
    deterministic 1/97 vector sample — 0.2-wide histogram bins plus
    the overall mean/std on every row.  Anisotropic (cone-shaped)
    embedding spaces — where random pairs cosine ≈ 0.9 — break
    cosine-threshold dedup and ANN pruning; this is the audit that
    catches it before sim_* thresholds are tuned.

    Determinism: per-dimension products fold through DECIMAL(28,12)
    (the e_matryoshka_prefix recipe); each pair's cosine is one
    identical IEEE chain micro-rounded to BIGINT, so bin counts and
    the Σ/Σ² moments are exact integers.

    Scale shape: sample filter precedes the explode; the pair frame
    is |sample|² skinny rows (the audit's definition), everything
    after is a 10-row census."""
    from kp_crypto_market_analytics_spark.functions.vectors import (
        to_double_array,
    )

    t = load_tables(spark, sf_dir, ["embeddings"])
    s = (
        t["embeddings"]
        .where(F.col("vec_id") % _ISO_SAMPLE_MOD == 0)
        .select("vec_id", to_double_array("embedding").alias("x"))
    )
    dims = s.select(
        "vec_id", F.posexplode("x").alias("i0", "xv")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "xv")
    pairs = (
        dims.alias("a")
        .join(
            dims.alias("b"),
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("u"),
            F.col("b.vec_id").alias("v"),
            (F.col("a.xv") * F.col("b.xv")).cast("decimal(28,12)").alias("dp"),
            (F.col("a.xv") * F.col("a.xv")).cast("decimal(28,12)").alias("na"),
            (F.col("b.xv") * F.col("b.xv")).cast("decimal(28,12)").alias("nb"),
        )
    )
    cos = (
        F.sum("dp").cast("double")
        / F.sqrt(F.sum("na").cast("double") * F.sum("nb").cast("double"))
    )
    per_pair = pairs.groupBy("u", "v").agg(
        F.round(cos * F.lit(1_000_000.0), 0).cast("long").alias("cm")
    )
    binned = per_pair.select(
        "cm",
        F.least(
            F.greatest(
                F.call_function(
                    "div",
                    F.col("cm") + F.lit(1_000_000),
                    F.lit(200_000),
                ),
                F.lit(0),
            ),
            F.lit(9),
        ).alias("bin"),
    )
    stats = binned.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cm").alias("s"),
        # cm² ≤ 1e12 per term fits int64, but the Σ outgrows it on a
        # corpus-scale sample — decimal(38,0) like the oracle's HUGEINT
        F.sum((F.col("cm") * F.col("cm")).cast("decimal(38,0)")).alias(
            "q"
        ),
    )
    mean = F.col("s").cast("double") / (F.col("n") * F.lit(1e6))
    sd = F.sqrt(
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n")
        )
        / (F.col("n") - F.lit(1))
    ) / F.lit(1e6)
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("bin").cast("long").alias("bin"),
            # integer-over-ten: DuckDB parses the 0.2 literal as
            # DECIMAL (exact) while Spark folds it as a double, a
            # 1-ULP structural divergence on bins 2/3/7 — both
            # engines agree on CAST(int AS DOUBLE)/10
            ((F.col("bin") * 2 - 10).cast("double") / F.lit(10.0)).alias(
                "lo"
            ),
            ((F.col("bin") * 2 - 8).cast("double") / F.lit(10.0)).alias(
                "hi"
            ),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            (F.round(mean, 6) + F.lit(0.0)).alias("mean_cos"),
            (F.round(sd, 6) + F.lit(0.0)).alias("sd_cos"),
        )
        .orderBy("bin")
    )


def _e_isotropy_sql() -> str:
    return f"""
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
  FROM embeddings WHERE vec_id % {_ISO_SAMPLE_MOD} = 0
), idx AS (
  SELECT vec_id, x, unnest(generate_series(1, {_ISO_EMB_D})) AS i FROM s
), dimv AS (
  SELECT vec_id, i, x[i] AS xv FROM idx
), pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v,
    CAST(a.xv * b.xv AS DECIMAL(28,12)) AS dp,
    CAST(a.xv * a.xv AS DECIMAL(28,12)) AS na,
    CAST(b.xv * b.xv AS DECIMAL(28,12)) AS nb
  FROM dimv a JOIN dimv b ON a.i = b.i AND a.vec_id < b.vec_id
), per_pair AS MATERIALIZED (
  SELECT u, v,
    CAST(round(CAST(SUM(dp) AS DOUBLE)
      / sqrt(CAST(SUM(na) AS DOUBLE) * CAST(SUM(nb) AS DOUBLE))
      * 1000000.0, 0) AS BIGINT) AS cm
  FROM pairs GROUP BY u, v
), binned AS (
  SELECT cm,
    least(greatest((cm + 1000000) // 200000, 0), 9) AS bin
  FROM per_pair
), stats AS (
  SELECT COUNT(*) AS n, CAST(SUM(cm) AS BIGINT) AS s,
    CAST(SUM(cm * cm) AS DECIMAL(38,0)) AS q
  FROM binned
)
SELECT CAST(bin AS BIGINT) AS bin,
  CAST(bin * 2 - 10 AS DOUBLE) / CAST(10 AS DOUBLE) AS lo,
  CAST(bin * 2 - 8 AS DOUBLE) / CAST(10 AS DOUBLE) AS hi,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  round(CAST(s AS DOUBLE) / (n * 1e6), 6) + 0.0 AS mean_cos,
  round(sqrt((CAST(q AS DOUBLE)
      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)) / 1e6, 6)
    + 0.0 AS sd_cos
FROM binned CROSS JOIN stats
GROUP BY bin, n, s, q ORDER BY bin
"""


R8_QUERIES.update(
    {
        "t_dsir_weights": t_dsir_weights,
        "e_isotropy": e_isotropy,
    }
)
_R8_ORACLES.update(
    {
        "t_dsir_weights": _t_dsir_weights_sql,
        "e_isotropy": _e_isotropy_sql,
    }
)


# ------------------------------------------------------------ batch E


def a_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test per event type (Jarque & Bera 1980,
    public): JB = n/6 · (S² + (K−3)²/4) from sample skewness S and
    kurtosis K — the gate a_anova_f/a_welch_ttest users run first,
    since both assume roughly normal arms.

    Determinism: two-pass central moments — the exact micro mean is
    broadcast back, deviations are MILLI-rounded BIGINTs (milli keeps
    d⁴ sums inside DECIMAL(38,0): micro⁴ would need 10⁴⁸), and Σd²/
    Σd³/Σd⁴ fold as exact decimals; S/K/JB are one IEEE chain over
    those exact sums, rounded with −0.0 normalized.

    Scale shape: two map-side-combined aggs over the fact table with a
    |types|-row broadcast between them — no window, no join at row
    grain."""
    t = load_tables(spark, sf_dir, ["events"])
    e = ensure_parallelism(t["events"])
    v = F.col("value").cast("decimal(18,6)")
    m = e.groupBy("event_type").agg(
        F.sum(v).alias("s"), F.count(F.lit(1)).alias("n")
    )
    micro = (F.col("s") * F.lit(1_000_000)).cast("long")
    mean_micro = (
        F.when(micro < 0, F.lit(-1)).otherwise(F.lit(1))
        * F.call_function(
            "div", F.lit(2) * F.abs(micro) + F.col("n"), F.lit(2) * F.col("n")
        )
    )
    means = m.select(
        "event_type", F.col("n"), mean_micro.alias("mu_micro")
    )
    d_milli = F.round(
        (F.col("value") - F.col("mu_micro") / F.lit(1_000_000.0))
        * F.lit(1_000.0),
        0,
    ).cast("long")
    dev = e.join(F.broadcast(means), "event_type").select(
        "event_type", "n", d_milli.alias("d")
    )
    # d ≤ ~3e5 milli ⇒ d² ≤ 9e10 (int64-safe), d³ ≤ 2.7e16 (int64-
    # safe), but d⁴ ≤ 8.1e21 OVERFLOWS int64 — square the squares in
    # DECIMAL(19,0) so the widest product is born decimal.
    d2 = F.col("d") * F.col("d")
    g = dev.select(
        "event_type", "n", "d", d2.alias("d2")
    ).groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("d2").cast("decimal(38,0)")).alias("m2"),
        # Born-decimal the cube like m4: d²·d in int64 silently wraps
        # beyond |d| ~ 3e5 milli under non-ANSI while the oracle's
        # HUGEINT raises — decimal(19,0)×bigint keeps the product
        # exact at any deviation scale (ADVICE r8).
        F.sum(F.col("d2").cast("decimal(19,0)") * F.col("d")).cast(
            "decimal(38,0)"
        ).alias("m3"),
        F.sum(
            F.col("d2").cast("decimal(19,0)")
            * F.col("d2").cast("decimal(19,0)")
        ).alias("m4"),
    )
    n = F.col("n")
    v2 = F.col("m2").cast("double") / n
    skew = (F.col("m3").cast("double") / n) / F.pow(v2, F.lit(1.5))
    kurt = (F.col("m4").cast("double") / n) / (v2 * v2)
    jb = n / F.lit(6.0) * (
        skew * skew + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0)) / F.lit(4.0)
    )
    ok = (n > 3) & (v2 > 0)
    return g.select(
        "event_type",
        n.cast("long").alias("n"),
        F.when(ok, F.round(skew, 6) + F.lit(0.0)).alias("skewness"),
        F.when(ok, F.round(kurt, 6) + F.lit(0.0)).alias("kurtosis"),
        F.when(ok, F.round(jb, 6) + F.lit(0.0)).alias("jb_stat"),
    ).orderBy("event_type")


A_JARQUE_BERA_SQL = """
WITH m AS (
  SELECT event_type,
    CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS micro,
    COUNT(*) AS n
  FROM events GROUP BY 1
), means AS (
  SELECT event_type, n,
    (CASE WHEN micro < 0 THEN -1 ELSE 1 END)
      * ((2 * abs(micro) + n) // (2 * n)) AS mu_micro
  FROM m
), dev AS (
  SELECT e.event_type, n,
    CAST(round((e.value - mu_micro / 1000000.0) * 1000.0, 0) AS BIGINT)
      AS d
  FROM events e JOIN means USING (event_type)
), g AS (
  SELECT event_type, MAX(n) AS n,
    CAST(SUM(d * d) AS DECIMAL(38,0)) AS m2,
    CAST(SUM(CAST(d * d AS HUGEINT) * d) AS DECIMAL(38,0)) AS m3,
    CAST(SUM(CAST(d * d AS HUGEINT) * (d * d)) AS DECIMAL(38,0)) AS m4
  FROM dev GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
  CASE WHEN n > 3 AND CAST(m2 AS DOUBLE) / n > 0 THEN
    round((CAST(m3 AS DOUBLE) / n)
      / pow(CAST(m2 AS DOUBLE) / n, 1.5), 6) + 0.0 END AS skewness,
  CASE WHEN n > 3 AND CAST(m2 AS DOUBLE) / n > 0 THEN
    round((CAST(m4 AS DOUBLE) / n)
      / ((CAST(m2 AS DOUBLE) / n) * (CAST(m2 AS DOUBLE) / n)), 6) + 0.0
  END AS kurtosis,
  CASE WHEN n > 3 AND CAST(m2 AS DOUBLE) / n > 0 THEN
    round(n / 6.0 * (
      ((CAST(m3 AS DOUBLE) / n) / pow(CAST(m2 AS DOUBLE) / n, 1.5))
      * ((CAST(m3 AS DOUBLE) / n) / pow(CAST(m2 AS DOUBLE) / n, 1.5))
      + ((CAST(m4 AS DOUBLE) / n)
         / ((CAST(m2 AS DOUBLE) / n) * (CAST(m2 AS DOUBLE) / n)) - 3.0)
      * ((CAST(m4 AS DOUBLE) / n)
         / ((CAST(m2 AS DOUBLE) / n) * (CAST(m2 AS DOUBLE) / n)) - 3.0)
      / 4.0), 6) + 0.0 END AS jb_stat
FROM g ORDER BY event_type
"""


# Primary keys audited per table (the reference's db/schema.sql PKs
# mapped onto the test corpus + the extension tables).
_PK_SPEC = [
    ("orders", ["o_orderkey"]),
    ("customer", ["c_custkey"]),
    ("part", ["p_partkey"]),
    ("supplier", ["s_suppkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]


def dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across EVERY table the engine
    serves (reference PKs per db/schema.sql:1-37 — candles (symbol,
    tf, open_time), trades (symbol, trade_id) — mapped to the test
    corpus's keys): per table, row count, distinct key count,
    duplicate rows, and null-key rows.  The first dq gate any ingest
    runs; a duplicate PK means the upsert path (S13/S14) would
    corrupt.

    Determinism: all-integer counts; multi-column keys count via the
    multi-arg count_distinct form, which drops rows where ANY key
    component is null — matching the oracle's COUNT(DISTINCT CASE WHEN
    nn THEN key END), so null keys are counted separately and
    n_dup_rows can never go negative (ADVICE r8: the struct form
    counted null-component keys as distinct).

    Scale shape: one map-side-combined agg PER table, unioned —
    each table scans once, only its key columns read."""
    t = load_tables(spark, sf_dir, [name for name, _ in _PK_SPEC])
    out = None
    for name, keys in _PK_SPEC:
        df = t[name]
        kc = [F.col(k) for k in keys]
        nn = F.lit(True)
        for k in keys:
            nn = nn & F.col(k).isNotNull()
        row = df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(*kc).cast("long").alias("n_keys"),
            F.sum(F.when(~nn, 1).otherwise(0)).cast("long").alias(
                "n_null_keys"
            ),
        ).select(
            "table_name",
            "n_rows",
            "n_keys",
            (F.col("n_rows") - F.col("n_keys") - F.col("n_null_keys"))
            .cast("long")
            .alias("n_dup_rows"),
            "n_null_keys",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


def _dq_pk_uniqueness_sql() -> str:
    parts = []
    for name, keys in _PK_SPEC:
        key_tuple = (
            f"({', '.join(keys)})" if len(keys) > 1 else keys[0]
        )
        nn = " AND ".join(f"{k} IS NOT NULL" for k in keys)
        parts.append(
            f"SELECT '{name}' AS table_name,"
            f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COUNT(DISTINCT CASE WHEN {nn} THEN {key_tuple} END)"
            f"   AS BIGINT) AS n_keys,"
            f" CAST(COUNT(*)"
            f"   - COUNT(DISTINCT CASE WHEN {nn} THEN {key_tuple} END)"
            f"   - SUM(CASE WHEN {nn} THEN 0 ELSE 1 END) AS BIGINT)"
            f"   AS n_dup_rows,"
            f" CAST(SUM(CASE WHEN {nn} THEN 0 ELSE 1 END) AS BIGINT)"
            f"   AS n_null_keys"
            f" FROM {name}"
        )
    return " UNION ALL ".join(parts) + " ORDER BY table_name"


_VOCAB_COVER_KS = [10, 100, 1000]


def t_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what share of total token
    OCCURRENCES do the top-10/100/1000 token types cover?  The table
    a tokenizer-vocabulary decision reads (diminishing-returns point
    of growing the vocab) — the cumulative twin of t_zipf_fit's slope.

    Determinism: ranks come from TakeOrdered over the (vocab-bounded)
    type-frequency table with the token string as tiebreaker;
    coverage is an exact integer ppm division.

    Scale shape: one explode → map-side-combined type count (frame is
    VOCABULARY-bounded, not corpus-bounded), a k-row TakeOrdered per
    cutoff, one 1-row total broadcast."""
    from kp_crypto_market_analytics_spark.operators.windows import top_k

    t = load_tables(spark, sf_dir, ["documents"])
    freq = (
        ensure_parallelism(t["documents"])
        .select(F.explode(F.split(_norm_text_col(), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cf"))
        .localCheckpoint(eager=True)
    )
    tot = freq.agg(
        F.sum("cf").alias("t_occ"), F.count(F.lit(1)).alias("t_types")
    )
    out = None
    for k in _VOCAB_COVER_KS:
        topk = top_k(
            freq, [F.col("cf").desc(), F.col("tok").asc()], k
        ).agg(
            F.lit(k).cast("long").alias("top_k"),
            F.count(F.lit(1)).alias("n_types"),
            F.coalesce(F.sum("cf"), F.lit(0)).alias("occ"),
        )
        out = topk if out is None else out.unionByName(topk)
    share = F.call_function(
        "div",
        F.lit(2) * F.col("occ") * F.lit(1_000_000) + F.col("t_occ"),
        F.lit(2) * F.col("t_occ"),
    )
    return (
        out.crossJoin(F.broadcast(tot))
        .select(
            "top_k",
            F.col("n_types").cast("long").alias("n_types"),
            F.col("occ").cast("long").alias("occurrences"),
            F.col("t_occ").cast("long").alias("total_occurrences"),
            F.col("t_types").cast("long").alias("total_types"),
            share.cast("long").alias("coverage_ppm"),
        )
        .orderBy("top_k")
    )


def _t_vocab_coverage_sql() -> str:
    parts = []
    for k in _VOCAB_COVER_KS:
        parts.append(
            f"""SELECT CAST({k} AS BIGINT) AS top_k,
  CAST(COUNT(*) AS BIGINT) AS n_types,
  CAST(coalesce(SUM(cf), 0) AS BIGINT) AS occ
FROM (SELECT cf FROM freq ORDER BY cf DESC, tok ASC LIMIT {k})"""
        )
    body = " UNION ALL ".join(parts)
    return f"""
WITH freq AS MATERIALIZED (
  SELECT tok, COUNT(*) AS cf FROM (
    SELECT unnest(string_split({NORM_TEXT_SQL}, ' ')) AS tok
    FROM documents
  ) GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cf) AS BIGINT) AS t_occ,
    CAST(COUNT(*) AS BIGINT) AS t_types
  FROM freq
)
SELECT top_k, n_types, occ AS occurrences, t_occ AS total_occurrences,
  t_types AS total_types,
  CAST((2 * occ * 1000000 + t_occ) // (2 * t_occ) AS BIGINT)
    AS coverage_ppm
FROM ({body}) CROSS JOIN tot
ORDER BY top_k
"""


R8_QUERIES.update(
    {
        "a_jarque_bera": a_jarque_bera,
        "dq_pk_uniqueness": dq_pk_uniqueness,
        "t_vocab_coverage": t_vocab_coverage,
    }
)
_R8_ORACLES.update(
    {
        "a_jarque_bera": lambda: A_JARQUE_BERA_SQL,
        "dq_pk_uniqueness": _dq_pk_uniqueness_sql,
        "t_vocab_coverage": _t_vocab_coverage_sql,
    }
)


# ------------------------------------------------------------ batch F


def ti_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sortino ratio per symbol (Sortino & Price 1994, public): mean
    daily-close log return over the target-0 DOWNSIDE deviation
    sqrt(Σ min(r,0)² / n) — the risk-adjusted return that only
    penalizes losses, ti_sharpe's asymmetric sibling (same daily
    return series as ti_beta).

    Determinism: returns are micro-rounded BIGINTs; the downside sum
    of squares folds exactly (micro² in int64 at these magnitudes —
    |r|~0.5 ⇒ 2.5e11 per term); mean and ratio are one IEEE chain.

    Scale shape: the ti_beta daily-close plan — one per-day
    row_number, one |days|-frame lag, one |types|-row agg."""
    t = load_tables(spark, sf_dir, ["events"])
    rn = F.row_number().over(
        Window.partitionBy("event_type", F.to_date("ts")).orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    closes = (
        t["events"]
        .withColumn("__rn", rn)
        .where((F.col("__rn") == 1) & (F.col("value") > 0))
        .select(
            "event_type", F.to_date("ts").alias("day"),
            F.col("value").alias("close"),
        )
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    rets = (
        closes.withColumn("prev", F.lag("close").over(wd))
        .where(F.col("prev") > 0)
        .select(
            "event_type",
            F.round(
                F.log(F.col("close") / F.col("prev")) * F.lit(1_000_000.0), 0
            )
            .cast("long")
            .alias("rm"),
        )
    )
    g = rets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rm").alias("s"),
        F.sum(
            F.when(F.col("rm") < 0, F.col("rm") * F.col("rm")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("dq"),
    )
    n = F.col("n")
    mean_r = F.col("s").cast("double") / (n * F.lit(1e6))
    dd = F.sqrt(F.col("dq").cast("double") / (n * F.lit(1e12)))
    ok = (n > 1) & (F.col("dq") > 0)
    return g.select(
        "event_type",
        n.cast("long").alias("n_days"),
        (F.round(mean_r, 6) + F.lit(0.0)).alias("mean_ret"),
        F.when(ok, F.round(dd, 6) + F.lit(0.0)).alias("downside_dev"),
        F.when(ok, F.round(mean_r / dd, 6) + F.lit(0.0)).alias("sortino"),
    ).orderBy("event_type")


TI_SORTINO_SQL = """
WITH closes AS (
  SELECT event_type, day, close FROM (
    SELECT event_type, CAST(ts AS DATE) AS day, value AS close,
      row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                         ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND close > 0
), rets AS (
  SELECT event_type,
    CAST(round(ln(close / prev) * 1000000.0, 0) AS BIGINT) AS rm
  FROM (
    SELECT event_type, day, close,
      lag(close) OVER (PARTITION BY event_type ORDER BY day) AS prev
    FROM closes
  ) WHERE prev > 0
), g AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(rm) AS BIGINT) AS s,
    CAST(SUM(CASE WHEN rm < 0 THEN rm * rm ELSE 0 END) AS BIGINT) AS dq
  FROM rets GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
  round(CAST(s AS DOUBLE) / (n * 1e6), 6) + 0.0 AS mean_ret,
  CASE WHEN n > 1 AND dq > 0 THEN
    round(sqrt(CAST(dq AS DOUBLE) / (n * 1e12)), 6) + 0.0
  END AS downside_dev,
  CASE WHEN n > 1 AND dq > 0 THEN
    round((CAST(s AS DOUBLE) / (n * 1e6))
        / sqrt(CAST(dq AS DOUBLE) / (n * 1e12)), 6) + 0.0
  END AS sortino
FROM g ORDER BY event_type
"""


def ti_calmar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calmar ratio per symbol (Young 1991, public): annualized mean
    daily-close return over the maximum peak-to-trough drawdown of
    the close series — return per unit of worst-case pain, the
    drawdown-denominated sibling of ti_sharpe/ti_sortino.

    Determinism: drawdowns are micro-rounded off the exact running
    max of raw closes; returns are micro ints; the ratio is one IEEE
    chain over the exact integers.

    Scale shape: ONE |days|-frame per symbol (daily closes) serves
    the running max, the lag returns, and the final agg."""
    t = load_tables(spark, sf_dir, ["events"])
    rn = F.row_number().over(
        Window.partitionBy("event_type", F.to_date("ts")).orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    closes = (
        t["events"]
        .withColumn("__rn", rn)
        .where((F.col("__rn") == 1) & (F.col("value") > 0))
        .select(
            "event_type", F.to_date("ts").alias("day"),
            F.col("value").alias("close"),
        )
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    runmax = F.max("close").over(
        wd.rowsBetween(Window.unboundedPreceding, 0)
    )
    frame = closes.select(
        "event_type",
        "day",
        F.round(
            (F.lit(1.0) - F.col("close") / runmax) * F.lit(1_000_000.0), 0
        )
        .cast("long")
        .alias("ddm"),
        F.lag("close").over(wd).alias("prev"),
        "close",
    )
    rm = F.when(
        F.col("prev") > 0,
        F.round(
            F.log(F.col("close") / F.col("prev")) * F.lit(1_000_000.0), 0
        ).cast("long"),
    )
    g = frame.select("event_type", "ddm", rm.alias("rm")).groupBy(
        "event_type"
    ).agg(
        F.count("rm").alias("n"),
        F.sum("rm").alias("s"),
        F.max("ddm").alias("maxdd"),
    )
    n = F.col("n")
    ann = F.col("s").cast("double") / (n * F.lit(1e6)) * F.lit(365.0)
    mdd = F.col("maxdd") / F.lit(1e6)
    ok = (n > 0) & (F.col("maxdd") > 0)
    return g.select(
        "event_type",
        n.cast("long").alias("n_days"),
        (F.col("maxdd") / F.lit(1_000_000.0)).alias("max_drawdown"),
        F.when(ok, F.round(ann / mdd, 6) + F.lit(0.0)).alias("calmar"),
    ).orderBy("event_type")


TI_CALMAR_SQL = """
WITH closes AS (
  SELECT event_type, day, close FROM (
    SELECT event_type, CAST(ts AS DATE) AS day, value AS close,
      row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                         ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND close > 0
), frame AS (
  SELECT event_type, day,
    CAST(round((1.0 - close / MAX(close) OVER w) * 1000000.0, 0)
      AS BIGINT) AS ddm,
    CASE WHEN lag(close) OVER (PARTITION BY event_type ORDER BY day) > 0
      THEN CAST(round(ln(close
        / lag(close) OVER (PARTITION BY event_type ORDER BY day))
        * 1000000.0, 0) AS BIGINT) END AS rm
  FROM closes
  WINDOW w AS (PARTITION BY event_type ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), g AS (
  SELECT event_type, COUNT(rm) AS n, CAST(SUM(rm) AS BIGINT) AS s,
    MAX(ddm) AS maxdd
  FROM frame GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
  maxdd / 1000000.0 AS max_drawdown,
  CASE WHEN n > 0 AND maxdd > 0 THEN
    round((CAST(s AS DOUBLE) / (n * 1e6) * 365.0)
        / (maxdd / 1e6), 6) + 0.0
  END AS calmar
FROM g ORDER BY event_type
"""


_MSTTR_SEG = 50


def t_msttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean segmental type-token ratio per source (Johnson 1944
    lineage, public): split each document's token stream into
    consecutive 50-token segments, TTR = distinct/50 per FULL
    segment, MSTTR = mean over segments — the length-invariant
    lexical-diversity measure (plain TTR collapses as docs grow; the
    Gopher-style quality stack reads this next to t_word_entropy).

    Determinism: distinct counts are integers; MSTTR = Σdistinct /
    (50·segments) as one exact ppm division.

    Scale shape: one posexplode with the segment id derived
    arithmetically, one (doc, seg) distinct agg (map-side combined),
    one |sources|-row census."""
    t = load_tables(spark, sf_dir, ["documents"])
    toks = F.split(_norm_text_col(), " ")
    pos = (
        ensure_parallelism(t["documents"])
        .select("doc_id", "source", F.posexplode(toks).alias("p", "tok"))
        .select(
            "doc_id",
            "source",
            F.call_function("div", F.col("p"), F.lit(_MSTTR_SEG)).alias(
                "seg"
            ),
            "tok",
        )
    )
    segs = pos.groupBy("doc_id", "source", "seg").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.countDistinct("tok").alias("n_types"),
    ).where(F.col("n_tok") == _MSTTR_SEG)
    share = F.call_function(
        "div",
        F.lit(2) * F.col("s_types") * F.lit(1_000_000)
        + F.lit(_MSTTR_SEG) * F.col("n_segs"),
        F.lit(2) * F.lit(_MSTTR_SEG) * F.col("n_segs"),
    )
    return (
        segs.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_segs"),
            F.sum("n_types").alias("s_types"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_segs").cast("long").alias("n_segs"),
            (share / F.lit(1_000_000.0)).alias("msttr"),
        )
        .orderBy("source")
    )


T_MSTTR_SQL = f"""
WITH pos AS (
  SELECT doc_id, source, (i - 1) // {_MSTTR_SEG} AS seg, l[i] AS tok
  FROM (
    SELECT doc_id, source, string_split({NORM_TEXT_SQL}, ' ') AS l,
      unnest(generate_series(1, len(string_split({NORM_TEXT_SQL}, ' '))))
        AS i
    FROM documents
  )
), segs AS (
  SELECT doc_id, source, seg, COUNT(*) AS n_tok,
    COUNT(DISTINCT tok) AS n_types
  FROM pos GROUP BY 1, 2, 3
  HAVING COUNT(*) = {_MSTTR_SEG}
)
SELECT source,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_segs,
  ((2 * SUM(n_types) * 1000000 + {_MSTTR_SEG} * COUNT(*))
    // (2 * {_MSTTR_SEG} * COUNT(*))) / 1000000.0 AS msttr
FROM segs GROUP BY source ORDER BY source
"""


def mm_dedup_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed storage census for binary payload BLOCKS:
    each document's payload is segmented into 16-word-aligned blocks
    (the multimodal stand-in for blob segments — the CHUNK_WORDS grid
    t_paragraph_dedup defines), deduped exactly by block digest, and
    reported per size class (decimal-digit buckets of byte length) —
    block count, unique digests, duplicate blocks, raw vs deduped
    bytes, and the ppm a CAS layer saves.  Whole-payload digests never
    collide on this corpus (dedup_exact), so the BLOCK grain is where
    dedup has teeth — exactly how chunked CAS (restic/borg-style)
    works for large media blobs.

    Determinism: digests are md5 hex over the block's hex encoding
    (the mm_binary_meta digest), all counts exact integers, the
    saving an exact ppm division.

    Scale shape: payload blocks never shuffle whole — one map-side
    digest projection, a (digest)-grain agg carrying 16-byte keys, a
    |buckets|-row census."""
    from kp_crypto_market_analytics_spark.queries_corpus import (
        CHUNK_WORDS,
        _toks_df,
    )

    toks = _toks_df(spark, sf_dir)
    n_chunks = (
        F.ceil(F.size("toks") / F.lit(float(CHUNK_WORDS)))
    ).cast("int")
    block = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice("toks", i * CHUNK_WORDS + 1, CHUNK_WORDS)
            ),
        )
    )
    payload = F.encode(F.col("block"), "UTF-8")
    d = toks.select(block.alias("block")).select(
        F.md5(F.hex(payload)).alias("digest"),
        F.octet_length(payload).alias("nb"),
    )
    per_digest = d.groupBy("digest").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("nb").alias("nb")
    )
    bucket = F.length(F.col("nb").cast("string"))
    per_b = per_digest.groupBy(bucket.alias("size_digits")).agg(
        F.sum("cnt").alias("n_payloads"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.col("cnt") * F.col("nb")).alias("raw_bytes"),
        F.sum("nb").alias("unique_bytes"),
    )
    saved = F.call_function(
        "div",
        F.lit(2)
        * (F.col("raw_bytes") - F.col("unique_bytes"))
        * F.lit(1_000_000)
        + F.col("raw_bytes"),
        F.lit(2) * F.col("raw_bytes"),
    )
    return per_b.select(
        F.col("size_digits").cast("long").alias("size_digits"),
        F.col("n_payloads").cast("long").alias("n_payloads"),
        F.col("n_unique").cast("long").alias("n_unique"),
        (F.col("n_payloads") - F.col("n_unique"))
        .cast("long")
        .alias("n_dup"),
        F.col("raw_bytes").cast("long").alias("raw_bytes"),
        F.col("unique_bytes").cast("long").alias("unique_bytes"),
        saved.cast("long").alias("saved_ppm"),
    ).orderBy("size_digits")


def _mm_dedup_bytes_sql() -> str:
    from kp_crypto_market_analytics_spark.queries_corpus import (
        CHUNK_WORDS,
    )

    return MM_DEDUP_BYTES_SQL_T.format(
        cw=CHUNK_WORDS, norm_text=NORM_TEXT_SQL
    )


MM_DEDUP_BYTES_SQL_T = """
WITH norm AS (
  SELECT doc_id, string_split({norm_text}, ' ') AS l FROM documents
), idx AS (
  SELECT doc_id, l,
    unnest(generate_series(1,
      CAST(ceil(len(l) / {cw}.0) AS BIGINT))) AS i
  FROM norm
), blocks AS (
  SELECT array_to_string(l[(i - 1) * {cw} + 1 : i * {cw}], ' ') AS block
  FROM idx
), d AS (
  SELECT md5(hex(encode(block))) AS digest,
    octet_length(encode(block)) AS nb
  FROM blocks
), per_digest AS (
  SELECT digest, COUNT(*) AS cnt, MAX(nb) AS nb FROM d GROUP BY 1
), per_b AS (
  SELECT length(CAST(nb AS VARCHAR)) AS size_digits,
    CAST(SUM(cnt) AS BIGINT) AS n_payloads,
    CAST(COUNT(*) AS BIGINT) AS n_unique,
    CAST(SUM(cnt * nb) AS BIGINT) AS raw_bytes,
    CAST(SUM(nb) AS BIGINT) AS unique_bytes
  FROM per_digest GROUP BY 1
)
SELECT CAST(size_digits AS BIGINT) AS size_digits, n_payloads, n_unique,
  n_payloads - n_unique AS n_dup, raw_bytes, unique_bytes,
  CAST((2 * (raw_bytes - unique_bytes) * 1000000 + raw_bytes)
    // (2 * raw_bytes) AS BIGINT) AS saved_ppm
FROM per_b ORDER BY size_digits
"""


R8_QUERIES.update(
    {
        "ti_sortino": ti_sortino,
        "ti_calmar": ti_calmar,
        "t_msttr": t_msttr,
        "mm_dedup_bytes": mm_dedup_bytes,
    }
)
_R8_ORACLES.update(
    {
        "ti_sortino": lambda: TI_SORTINO_SQL,
        "ti_calmar": lambda: TI_CALMAR_SQL,
        "t_msttr": lambda: T_MSTTR_SQL,
        "mm_dedup_bytes": _mm_dedup_bytes_sql,
    }
)
