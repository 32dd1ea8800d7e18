"""Round-3 mining family: feature hashing, link prediction, sequence
transition models, and period-over-period rank movement.

- ``t_hashed_features``  — the hashing trick (Weinberger et al. 2009,
  public): tokens → fixed 1024-bucket feature space via the portable
  60-bit md5 hash; per-bucket mass + collision width, top-50.  The
  fixed-dimension vectorization step a 100 TB text pipeline uses when
  a vocabulary table would be a shuffle-heavy join.
- ``g_jaccard_sim``      — neighborhood-Jaccard link prediction on the
  co-purchase graph: common-neighbor wedges over the edge list, J =
  |N(u)∩N(v)| / |N(u)∪N(v)|, top-30 candidate links.
- ``a_markov_transition`` — first-order Markov transition matrix over
  per-user event sequences: P(next_type | cur_type) with exact
  half-away micro-rounding — the session-flow model product analytics
  builds on top of ``w_sessionize``.
- ``q_rank_movers``      — part revenue rank, first half (orderdate <
  1998) vs second half, biggest rank movers — the period-over-period
  ranking report every BI deployment runs.

Reference anchors: t_hashed_features generalizes the reference's
fixed-width feature frames (`src/analytics/binance_analysis.py:380-420`
builds fixed-column stat tables); a_markov_transition is the
event-sequence analog of its OHLC state rollups; q_rank_movers mirrors
its period-comparison report shape (`binance_analysis.py:604-651`).

Determinism: hashing is the md5-based hash64 (engine-portable); wedge
and transition counts are exact integers; the only doubles are single
divisions of BIGINTs (round 6) or exact micro-rounded means; every
top-k carries a unique tiebreaker.

Scale shape: feature hashing aggregates bucket mass map-side (shuffle
= 1024 rows × partitions); the wedge join is bounded by Σ deg² over
the support-pruned edge list (degree-cap lever documented); the
transition matrix rides ONE (user) exchange for the lag and a
|types|²-sized agg; rank movers is two partial aggs + one join on
partkey."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.operators.aggregates import (
    round_mean_micro,
    sql_round_mean_micro,
)
from kp_crypto_market_analytics_spark.session import load_tables

# ------------------------------------------------------ t_hashed_features

_HF_BUCKETS = 1024


def t_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick feature space over the corpus: every token maps to
    bucket = hash64(tok·salt) mod 1024; output the top-50 buckets by
    token mass with their collision width (distinct tokens sharing the
    bucket) — the collision audit that sizes the hash dimension.

    Shuffle = 1024 bucket rows (partial agg absorbs the explode);
    count_distinct of tokens per bucket shuffles (bucket, token) pairs
    bounded by |vocab|, not |tokens|."""
    from kp_crypto_market_analytics_spark.functions.text import hash64
    from kp_crypto_market_analytics_spark.operators.windows import top_k

    t = load_tables(spark, sf_dir, ["documents"])
    toks = t["documents"].select(
        F.explode(
            F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " ")
        ).alias("tok")
    )
    agg = (
        toks.select(
            F.pmod(hash64(F.concat(F.col("tok"), F.lit("#hf"))), F.lit(_HF_BUCKETS)).alias(
                "bucket"
            ),
            "tok",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_distinct("tok").alias("n_distinct"),
        )
    )
    return top_k(
        agg, [F.col("n_tokens").desc(), F.col("bucket").asc()], 50
    ).select("bucket", "n_tokens", "n_distinct")


def _t_hashed_features_sql() -> str:
    return f"""
WITH toks AS (
  SELECT unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                ' ')) AS tok
  FROM documents
), b AS (
  SELECT CAST('0x' || substr(md5(tok || '#hf'), 1, 15) AS BIGINT)
           % {_HF_BUCKETS} AS bucket,
         tok
  FROM toks
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct
FROM b GROUP BY bucket
ORDER BY n_tokens DESC, bucket LIMIT 50
"""


# --------------------------------------------------------- g_jaccard_sim

_SUPPORT = 2


def g_jaccard_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard on the co-purchase
    graph: for every pair with ≥1 common neighbor, J = common /
    (deg_u + deg_v − common); top-30 by (J desc, u, v) with an
    ``is_edge`` flag (high-J non-edges are the recommendations).

    The wedge join is bounded by Σ deg(n)² over the support-pruned
    edge list — the same hub exposure as g_triangle_count, where
    degree-ordered orientation is the documented lever; here the full
    (x, y) candidate set IS the output domain, so the lever at 100 TB
    is a degree cap on wedge centers (drop n with deg > D; hubs
    contribute near-zero Jaccard anyway).  All-integer until the one
    final division."""
    li = (
        load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= _SUPPORT)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    adj = edges.select(F.col("u").alias("n"), F.col("v").alias("m")).unionByName(
        edges.select(F.col("v").alias("n"), F.col("u").alias("m"))
    )
    deg = adj.groupBy(F.col("m").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    wedge = (
        adj.alias("x")
        .join(adj.alias("y"), (F.col("x.n") == F.col("y.n")) & (F.col("x.m") < F.col("y.m")))
        .groupBy(F.col("x.m").alias("pu"), F.col("y.m").alias("pv"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    scored = (
        wedge.join(deg.select(F.col("node").alias("pu"), F.col("deg").alias("du")), "pu")
        .join(deg.select(F.col("node").alias("pv"), F.col("deg").alias("dv")), "pv")
        .join(
            edges.select(
                F.col("u").alias("pu"), F.col("v").alias("pv"), F.lit(True).alias("e")
            ),
            ["pu", "pv"],
            "left",
        )
        .select(
            F.col("pu").alias("u"),
            F.col("pv").alias("v"),
            "common",
            F.round(
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
            F.coalesce("e", F.lit(False)).alias("is_edge"),
        )
    )
    from kp_crypto_market_analytics_spark.operators.windows import top_k

    return top_k(
        scored, [F.col("jaccard").desc(), F.col("u").asc(), F.col("v").asc()], 30
    ).select("u", "v", "common", "jaccard", "is_edge")


def _g_jaccard_sim_sql() -> str:
    return f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_SUPPORT}
), adj AS (
  SELECT u AS n, v AS m FROM edges UNION ALL SELECT v, u FROM edges
), deg AS (
  SELECT m AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1
), wedge AS (
  SELECT x.m AS pu, y.m AS pv, CAST(COUNT(*) AS BIGINT) AS common
  FROM adj x JOIN adj y ON x.n = y.n AND x.m < y.m
  GROUP BY 1, 2
)
SELECT pu AS u, pv AS v, common,
  round(CAST(common AS DOUBLE) / CAST(du.deg + dv.deg - common AS DOUBLE), 6)
    AS jaccard,
  coalesce(e.is_edge, FALSE) AS is_edge
FROM wedge
JOIN deg du ON du.node = wedge.pu
JOIN deg dv ON dv.node = wedge.pv
LEFT JOIN (SELECT u, v, TRUE AS is_edge FROM edges) e
  ON e.u = wedge.pu AND e.v = wedge.pv
ORDER BY jaccard DESC, u, v LIMIT 30
"""


# ---------------------------------------------------- a_markov_transition

def a_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | cur_type) with exact transition counts —
    the session-flow model (what users do after a click) a product
    pipeline derives from the same ordered stream w_sessionize cuts.

    One (user) exchange for the lead window; the (cur, next) agg is
    |types|² rows; probabilities are exact micro-rounded means of
    BIGINT counts (round_mean_micro — the structural-tie-safe path)."""
    t = load_tables(spark, sf_dir, ["events"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        t["events"]
        .select(
            "user_id",
            F.col("event_type").alias("cur_type"),
            "ts",
            "event_id",
        )
        .withColumn("next_type", F.lead("cur_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = trans.groupBy("cur_type").agg(F.sum("n").alias("row_n"))
    return (
        trans.join(F.broadcast(row_tot), "cur_type")
        .select(
            "cur_type",
            "next_type",
            "n",
            round_mean_micro(F.col("n").cast("decimal(18,6)"), F.col("row_n")).alias(
                "p"
            ),
        )
        .orderBy("cur_type", "next_type")
    )


def _a_markov_transition_sql() -> str:
    p = sql_round_mean_micro("CAST(n AS DECIMAL(18,6))", "row_n")
    return f"""
WITH seq AS (
  SELECT user_id, event_type AS cur_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type
  FROM events
), trans AS (
  SELECT cur_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT cur_type, CAST(SUM(n) AS BIGINT) AS row_n FROM trans GROUP BY 1
)
SELECT t.cur_type, next_type, n, {p} AS p
FROM trans t JOIN tot ON tot.cur_type = t.cur_type
ORDER BY t.cur_type, next_type
"""


# -------------------------------------------------------- q_rank_movers

_MOVERS_SPLIT = "1998-01-01"
_MOVERS_TOPK = 20


def q_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period revenue rank movement: rank parts by revenue
    in orders before vs since 1998, top-20 biggest movers (|Δrank|
    desc) among parts sold in BOTH halves.  Revenue folds through
    DECIMAL(18,6) (exact ⇒ rank ties impossible beyond the explicit
    partkey tiebreaker); ranks are row_numbers over (revenue desc,
    partkey) — total order, engine-identical.

    Plan: the lineitem⋈orders date split is ONE scan each half with
    the filter pushed to the orders side of a broadcast-key join; the
    rank windows run over |parts|-sized aggregates, not facts."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    li = t["lineitem"].select(
        "l_orderkey",
        "l_partkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
        ).cast("decimal(18,6)").alias("rev"),
    )
    od = t["orders"].select(
        "o_orderkey",
        (F.col("o_orderdate") < F.lit(_MOVERS_SPLIT).cast("timestamp")).alias("first_half"),
    )
    j = li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))

    def half(flag: bool, rank_name: str) -> DataFrame:
        agg = (
            j.where(F.col("first_half") == flag)
            .groupBy("l_partkey")
            .agg(F.sum("rev").alias("rev"))
        )
        w = Window.orderBy(F.col("rev").desc(), F.col("l_partkey").asc())
        return agg.select(
            "l_partkey",
            F.col("rev").cast("double").alias(f"rev_{rank_name}"),
            F.row_number().over(w).cast("long").alias(f"rank_{rank_name}"),
        )

    a, b = half(True, "a"), half(False, "b")
    return (
        a.join(b, "l_partkey")
        .select(
            "l_partkey",
            "rank_a",
            "rank_b",
            (F.col("rank_a") - F.col("rank_b")).alias("rank_delta"),
            F.round("rev_a", 2).alias("rev_first"),
            F.round("rev_b", 2).alias("rev_second"),
        )
        .orderBy(
            F.abs(F.col("rank_delta")).desc(),
            F.col("l_partkey").asc(),
        )
        .limit(_MOVERS_TOPK)
    )


def _q_rank_movers_sql() -> str:
    rev = (
        "CAST(CAST(l_extendedprice AS DECIMAL(18,6))"
        " * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))"
        " AS DECIMAL(18,6))"
    )
    return f"""
WITH j AS (
  SELECT l_partkey, {rev} AS rev,
    o_orderdate < TIMESTAMP '{_MOVERS_SPLIT} 00:00:00' AS first_half
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), ha AS (
  SELECT l_partkey, CAST(SUM(rev) AS DOUBLE) AS rev_a,
    CAST(row_number() OVER (ORDER BY SUM(rev) DESC, l_partkey) AS BIGINT)
      AS rank_a
  FROM j WHERE first_half GROUP BY l_partkey
), hb AS (
  SELECT l_partkey, CAST(SUM(rev) AS DOUBLE) AS rev_b,
    CAST(row_number() OVER (ORDER BY SUM(rev) DESC, l_partkey) AS BIGINT)
      AS rank_b
  FROM j WHERE NOT first_half GROUP BY l_partkey
)
SELECT ha.l_partkey, rank_a, rank_b, rank_a - rank_b AS rank_delta,
  round(rev_a, 2) AS rev_first, round(rev_b, 2) AS rev_second
FROM ha JOIN hb ON ha.l_partkey = hb.l_partkey
ORDER BY abs(rank_a - rank_b) DESC, ha.l_partkey LIMIT {_MOVERS_TOPK}
"""


MINING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "t_hashed_features": t_hashed_features,
    "g_jaccard_sim": g_jaccard_sim,
    "a_markov_transition": a_markov_transition,
    "q_rank_movers": q_rank_movers,
}

MINING_ORACLES: dict[str, str] = {
    "t_hashed_features": _t_hashed_features_sql(),
    "g_jaccard_sim": _g_jaccard_sim_sql(),
    "a_markov_transition": _a_markov_transition_sql(),
    "q_rank_movers": _q_rank_movers_sql(),
}
