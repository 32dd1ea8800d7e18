"""Similarity search (ANN) over embedding columns.

Baseline: brute-force cosine top-k — a broadcast nested-loop of the
(small) query set against the corpus, scored JVM-side by Catalyst
expressions, reduced by per-group top-k.  Scan-dominated: at 100 TB the
corpus streams through executors once per query batch.

Scale path: IVF-style bucketing — assign every vector to its nearest of
C centroids (broadcast), search only the probed buckets.  Candidate
set shrinks by ~C/nprobe; recall is tunable.  Centroids here come from
a deterministic sample + one k-means-ish refinement pass implemented as
DataFrame aggs (no MLlib dependency in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.functions.vectors import (
    cosine,
    cosine_with_norms,
    dot,
    norm,
    to_double_array,
)
from kp_crypto_market_analytics_spark.session import ensure_parallelism


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    include_self: bool = False,
    dim: int = 64,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    queries (small) is broadcast; the corpus never shuffles for
    scoring.  The only shuffle is the per-query top-k window over
    |queries|·|corpus| scored rows — bounded by filtering on rank.
    Norms are computed once per vector in the narrow pre-join stage;
    the quadratic stage is only the dot product.  The corpus
    (streamed) side is repartitioned to full parallelism first — a
    broadcast nested-loop join inherits the stream side's partitioning,
    and a single-file scan would otherwise score on ONE core."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(vec_col).alias("qvec"),
    ).withColumn("qnorm", norm(F.col("qvec")))
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            to_double_array(vec_col).alias("cvec"),
        )
    ).withColumn("cnorm", norm(F.col("cvec")))
    scored = c.crossJoin(F.broadcast(q))
    if not include_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    # Drop the vectors BEFORE the ranking shuffle — otherwise every
    # scored row drags 2×dim doubles through the exchange.
    scored = scored.select(
        "query_id",
        "neighbor_id",
        cosine_with_norms(
            F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-duplicate pairs: all (a<b) pairs with cosine >=
    threshold.  All-pairs form for exactness on modest corpora; at scale
    route through :func:`ivf_topk` or LSH buckets first.  Norms are
    precomputed per vector so the O(n²) stage is dot-product-only."""
    a = ensure_parallelism(
        df.select(F.col(id_col).alias("id_a"), to_double_array(vec_col).alias("va"))
    ).withColumn("na", norm(F.col("va")))
    b = df.select(F.col(id_col).alias("id_b"), to_double_array(vec_col).alias("vb")).withColumn(
        "nb", norm(F.col("vb"))
    )
    # Pin broadcast to b so the repartitioned a is the streamed side —
    # the nested-loop stage then runs at full parallelism.
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cos", cosine_with_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def neardup_pairs_blocked(
    df: DataFrame,
    corpus_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    dim: int = 64,
) -> DataFrame:
    """:func:`neardup_pairs` with the quadratic stage vectorized:
    every task computes one BLOCK of the pair-cosine matrix in NumPy
    instead of evaluating the HOF dot per pair in the JVM (guide
    §4.2 — hand whole batches to vectorized native code; §8 —
    co-locate: each task reads the fixed corpus side from storage
    once, so no corpus bytes enter any shuffle or broadcast and the
    driver never collects).

    BIT-EXACT by construction, not approximately: the accumulation
    runs one dimension at a time (``acc += A[:, d] ⊗ B[:, d]``), so
    every pair's dot product is the identical left-associated
    multiply-then-add IEEE sequence :func:`functions.vectors.dot`
    evaluates, norms accumulate ``acc + v*v`` in the same order as
    :func:`norm`, and the final ``dot / (na * nb)`` matches
    :func:`cosine_with_norms` operation for operation (NumPy
    elementwise ops neither fuse nor reassociate).  The >= threshold
    compare happens on the raw cosine exactly as in the join form;
    rounding stays in Spark.  Pinned against the HOF reference by
    tests/test_operators.py::test_neardup_pairs_blocked_matches_hof.

    ``corpus_path`` is the parquet the corpus side scans (at cluster
    scale: the shared-FS/object-store path every executor can read —
    the plan-side table stays tiny relative to the blocks it prices).
    Requires fixed-width ``dim`` vectors (the stored table's shape);
    ragged inputs belong to the generic join form."""
    out_schema = (
        f"id_a bigint, id_b bigint, cos double"
    )
    a = ensure_parallelism(
        df.select(
            F.col(id_col).alias("id_a"), to_double_array(vec_col).alias("va")
        )
    )

    def run(batches):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        tb = pq.read_table(corpus_path, columns=[id_col, vec_col])
        ids_b = tb.column(id_col).to_numpy()
        mat_b = np.asarray(tb.column(vec_col).to_pylist(), dtype=np.float64)
        nb = np.zeros(len(ids_b))
        for d in range(mat_b.shape[1]):
            nb += mat_b[:, d] * mat_b[:, d]
        nb = np.sqrt(nb)
        for pdf in batches:
            if not len(pdf):
                continue
            mat_a = np.asarray(pdf["va"].to_list(), dtype=np.float64)
            ids_a = pdf["id_a"].to_numpy()
            na = np.zeros(len(ids_a))
            for d in range(mat_a.shape[1]):
                na += mat_a[:, d] * mat_a[:, d]
            na = np.sqrt(na)
            acc = np.zeros((len(ids_a), len(ids_b)))
            for d in range(mat_a.shape[1]):
                acc += mat_a[:, d : d + 1] * mat_b[None, :, d]
            denom = na[:, None] * nb[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = acc / denom
            mask = (
                (na[:, None] > 0)
                & (nb[None, :] > 0)
                & (ids_a[:, None] < ids_b[None, :])
                & (cos >= threshold)
            )
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": ids_a[ii], "id_b": ids_b[jj], "cos": cos[ii, jj]}
            )

    return a.mapInPandas(run, out_schema).select(
        "id_a", "id_b", F.round("cos", 6).alias("cos")
    )


def brute_force_topk_blocked(
    corpus: DataFrame,
    queries_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    query_ids_below: int = 10,
    dim: int = 64,
) -> DataFrame:
    """:func:`brute_force_topk` with the |corpus|×|queries| scoring
    stage vectorized: every task computes one BLOCK of the cosine
    matrix in NumPy instead of evaluating the HOF dot per scored row
    in the JVM (guide §4.2; same pattern as
    :func:`neardup_pairs_blocked`).  The query side (``vec_id <
    query_ids_below`` rows of the corpus table) is read from storage
    inside each task — no broadcast build job, no collect.

    BIT-EXACT to the HOF form by the :func:`neardup_pairs_blocked`
    argument: dots and norms accumulate one dimension at a time in
    the identical left-associated IEEE order, the divide matches
    :func:`cosine_with_norms` operation for operation, and zero-norm
    pairs yield NULL cosine exactly like the ``F.when`` guard (they
    stay in the scored set and sort last under the descending rank
    order, as in the join form).  Ranking and 6dp rounding stay in
    Spark — the window expression is the same one
    :func:`brute_force_topk` uses.  Pinned by
    tests/test_operators.py::test_brute_force_topk_blocked_matches_hof.

    r12 MEASURED RESULT at sf0.1 (2000×64 corpus): warm
    single-session A/B alternating variants at |q|∈{10,100,200} put
    this form at parity-to-slower than the HOF join (0.69-1.4s vs
    0.57-1.3s) — at ≤400k dots the per-task query-table read plus the
    Arrow round trip costs more than the JVM HOF dot saves, so NO
    registry query uses it at current scale.  It becomes the right
    form when |q|·|corpus| grows a few orders of magnitude (the
    neardup_pairs_blocked regime, where it measured 2×)."""
    out_schema = "query_id bigint, neighbor_id bigint, cos double"
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            to_double_array(vec_col).alias("cvec"),
        )
    )

    def run(batches):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        tb = pq.read_table(queries_path, columns=[id_col, vec_col])
        ids_all = tb.column(id_col).to_numpy()
        sel = ids_all < query_ids_below
        ids_q = ids_all[sel]
        mat_q = np.asarray(tb.column(vec_col).to_pylist(), dtype=np.float64)[sel]
        nq = np.zeros(len(ids_q))
        for d in range(mat_q.shape[1]):
            nq += mat_q[:, d] * mat_q[:, d]
        nq = np.sqrt(nq)
        for pdf in batches:
            if not len(pdf):
                continue
            mat_c = np.asarray(pdf["cvec"].to_list(), dtype=np.float64)
            ids_c = pdf["neighbor_id"].to_numpy()
            nc = np.zeros(len(ids_c))
            for d in range(mat_c.shape[1]):
                nc += mat_c[:, d] * mat_c[:, d]
            nc = np.sqrt(nc)
            acc = np.zeros((len(ids_c), len(ids_q)))
            for d in range(mat_c.shape[1]):
                acc += mat_c[:, d : d + 1] * mat_q[None, :, d]
            denom = nc[:, None] * nq[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = acc / denom
            pair = ids_c[:, None] != ids_q[None, :]
            ii, jj = np.nonzero(pair)
            vals = cos[ii, jj].astype(object)
            # F.when((na>0)&(nb>0), ...) yields NULL, not NaN/Inf, on a
            # zero-norm side — keep the row, null the score.
            bad = ~((nc[ii] > 0) & (nq[jj] > 0))
            if bad.any():
                vals[bad] = None
            yield pd.DataFrame(
                {"query_id": ids_q[jj], "neighbor_id": ids_c[ii], "cos": vals}
            )

    scored = c.mapInPandas(run, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def neardup_pairs_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.45,
    planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs, LSH-prefiltered: only pairs sharing a
    sign-LSH bucket are scored — the scale path for
    :func:`neardup_pairs` (candidates drop by ~2^planes; recall is the
    probability two above-threshold vectors agree on all plane signs).
    The bucket self-join is a hash equi-join; vectors re-attach via the
    per-side narrow joins, and only (id, id, cos) enters the output."""
    v = ensure_parallelism(
        df.select(F.col(id_col), to_double_array(vec_col).alias("vec"))
    ).withColumn("nrm", norm(F.col("vec")))
    # Buckets from the REPARTITIONED frame — computing the projections
    # off the raw single-file scan would serialize them on one core.
    b = random_hyperplane_buckets(v.withColumnRenamed("vec", vec_col), vec_col, id_col, planes, dim)
    a = v.join(b, id_col).select(
        F.col(id_col).alias("id_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), "bucket",
    )
    bb = v.join(b, id_col).select(
        F.col(id_col).alias("id_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    pairs = a.join(bb, "bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b",
            cosine_with_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def random_hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Sign-LSH bucket id per vector: ``planes`` pseudo-random
    hyperplanes generated deterministically from (plane, dim) index
    hashes; bucket = bit-vector of sign(v·plane).  Cosine-similar
    vectors collide with high probability.

    Each projection is an array-literal × vector dot via zip_with +
    aggregate — same left-assoc IEEE order as an unrolled term chain,
    but the expression tree stays O(planes) instead of O(planes·dim)
    (the unrolled form stalled whole-stage codegen; see
    functions/vectors.py dot_unrolled)."""

    # Deterministic "random" plane entries in [-1, 1): fractional part
    # of sin-free integer hashing (no libm dependency → portable).
    def coeff(j: int, d: int) -> float:
        x = (1103515245 * (j * dim + d) + 12345) % (1 << 31)
        return (x / float(1 << 30)) - 1.0

    v = to_double_array(vec_col)
    bucket = F.lit(0).cast("long")
    for j in range(planes):
        plane = F.array(*[F.lit(coeff(j, d)) for d in range(dim)])
        proj = dot(v, plane)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(0)
    return df.select(F.col(id_col), bucket.alias("bucket"))


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_mod: int = 37,
    iters: int = 2,
) -> DataFrame:
    """Lloyd-refined IVF centroids as pure DataFrame aggs (no MLlib).

    Seeds = the deterministic mod-sample (every ``seed_mod``-th vector);
    each iteration assigns every vector to its nearest centroid (argmax
    rounded cosine, broadcast centroids — one skinny max_by shuffle, no
    vectors in the exchange) and recomputes per-cell means.  Means sum
    through DECIMAL(27,12): decimal addition is exact and therefore
    ORDER-INDEPENDENT, so a DuckDB oracle replaying the same unrolled
    iterations lands on bit-identical centroids — a trained-ANN path
    that still passes an exact cross-engine gate.  Mean components are
    rounded to 6dp so downstream cosines stay reproducible.

    Scale: per iteration, one broadcast nested-loop (corpus × C
    centroids, skinny output), one max_by agg, one posexplode agg of
    |corpus|·dim (cluster,pos,val) rows with map-side combine into
    C·dim partials.  Empty cells drop out (standard Lloyd behavior).
    Returns (centroid_id, cent, centnorm)."""
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("nid"), to_double_array(vec_col).alias("cvec"))
    ).withColumn("cnorm", norm(F.col("cvec")))
    cents = corpus.where(F.col(id_col) % seed_mod == 0).select(
        F.col(id_col).alias("centroid_id"), to_double_array(vec_col).alias("cent")
    ).withColumn("centnorm", norm(F.col("cent")))
    for _ in range(iters):
        scored = c.crossJoin(F.broadcast(cents)).select(
            "nid",
            "centroid_id",
            F.round(
                cosine_with_norms(
                    F.col("cvec"), F.col("cent"), F.col("cnorm"), F.col("centnorm")
                ),
                6,
            ).alias("ccos"),
        )
        best = scored.groupBy("nid").agg(
            F.max_by(
                "centroid_id", F.struct(F.col("ccos"), (-F.col("centroid_id")).alias("neg"))
            ).alias("cluster")
        )
        means = (
            c.join(best, "nid")
            .select("cluster", F.posexplode("cvec").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                F.round(
                    F.sum(F.col("val").cast("decimal(27,12)")).cast("double")
                    / F.count("val"),
                    6,
                ).alias("m")
            )
        )
        cents = (
            means.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("cluster").alias("centroid_id"),
                F.transform("pm", lambda s: s.getField("m")).alias("cent"),
            )
            .withColumn("centnorm", norm(F.col("cent")))
        )
    # The trained frame is broadcast TWICE downstream (corpus assignment
    # + query probe); checkpoint so training runs once, not per
    # broadcast — and the per-iteration lineage resets like CC's.
    return cents.localCheckpoint(eager=True)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 2,
    centroid_mod: int = 37,
    dim: int = 64,
    centroids: DataFrame | None = None,
    assignment: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into Voronoi cells around a
    small centroid set, then search only the ``nprobe`` cells nearest
    each query.  ``centroids`` (e.g. from :func:`kmeans_centroids`) is
    the trained path; the default falls back to the deterministic
    mod-sample (every ``centroid_mod``-th vector).

    Both assignment passes are corpus×centroids with the centroid side
    broadcast — the corpus never shuffles until the final per-query
    top-k, and the candidate set shrinks by ~|centroids|/nprobe.
    Assignment and ranking order on the ROUNDED cosine with an id
    tiebreaker so results are engine-reproducible."""
    if centroids is not None:
        cents = centroids
        if "centnorm" not in cents.columns:
            cents = cents.withColumn("centnorm", norm(F.col("cent")))
    else:
        cents = corpus.where(F.col(id_col) % centroid_mod == 0).select(
            F.col(id_col).alias("centroid_id"), to_double_array(vec_col).alias("cent")
        ).withColumn("centnorm", norm(F.col("cent")))
    # `c` feeds assignment AND the scoring join (two consumers), but is
    # deliberately NOT localCheckpointed: both consumers re-run a cheap
    # pruned parquet scan, and measured at sf0.1 the eager
    # materialization barrier LOSES (1.7s -> 2.2s).  The multi-consumer
    # fix pays when the subplan is expensive (explode/distinct/train),
    # not when it is a scan — for a served (repeated-query) IVF index,
    # persist `c` as a table once and amortize.
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("cvec"))
    ).withColumn("cnorm", norm(F.col("cvec")))
    # `assignment` injects a precomputed (id, centroid_id) table (the
    # session-materialized full-corpus assignment) so multi-detector
    # sessions run the corpus×C argmax once, not per consumer; the
    # values are identical by construction (per-row argmax against a
    # frozen table).
    if assignment is not None:
        best = assignment.select(
            F.col(assignment.columns[0]).alias("neighbor_id"), "centroid_id"
        )
    else:
        best = ivf_assign(c, cents)
    cassign = c.join(F.broadcast(best), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qvec")
    ).withColumn("qnorm", norm(F.col("qvec")))
    return ivf_search_cells(cassign, cents, q, k=k, nprobe=nprobe)


def ivf_search_cells(
    cassign: DataFrame,
    cents: DataFrame,
    q: DataFrame,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """The IVF SEARCH stage, factored out of :func:`ivf_topk` so a
    persisted/incrementally-maintained index (``build-index`` CLI,
    streaming/ann_ivf.py) serves queries through the IDENTICAL plan as
    the live batch path — the two cannot diverge.  ``cassign`` carries
    (neighbor_id, cvec, cnorm, centroid_id): the corpus vectors with
    their cell assignments; ``cents`` the (centroid_id, cent, centnorm)
    table; ``q`` the prepared (query_id, qvec, qnorm) queries.

    Plan: queries probe the nprobe nearest cells (broadcast C-row
    centroid table), then score only the candidates co-located in
    those cells (broadcast skinny probe list) — the corpus side never
    shuffles; the only exchange is the final per-query top-k."""
    wq = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), F.col("centroid_id").asc())
    qprobe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "qcos",
            F.round(
                cosine_with_norms(
                    F.col("qvec"), F.col("cent"), F.col("qnorm"), F.col("centnorm")
                ),
                6,
            ),
        )
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qvec", "qnorm", "centroid_id")
    )
    scored = (
        cassign.join(F.broadcast(qprobe), "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_with_norms(
                    F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
                ),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_assign(c: DataFrame, cents: DataFrame, id_col: str = "neighbor_id") -> DataFrame:
    """Nearest-centroid assignment: argmax of the ROUNDED cosine with a
    centroid-id tiebreak, as a max_by aggregation over SKINNY rows
    (id, id, cos) — partial map-side combine, no vectors in the
    shuffle; a row_number window here would drag 2×dim doubles per
    candidate through the exchange.  Shared by live :func:`ivf_topk`
    and the persisted index build (CLI ``build-index``) so the two can
    never diverge.  ``c`` carries (id, cvec, cnorm); ``cents`` carries
    (centroid_id, cent, centnorm)."""
    scored = c.crossJoin(F.broadcast(cents)).select(
        id_col,
        "centroid_id",
        F.round(
            cosine_with_norms(F.col("cvec"), F.col("cent"), F.col("cnorm"), F.col("centnorm")),
            6,
        ).alias("ccos"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by(
            "centroid_id", F.struct(F.col("ccos"), (-F.col("centroid_id")).alias("neg"))
        ).alias("centroid_id")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: score only within matching LSH buckets.
    Join on bucket id replaces the cross join — candidate count drops by
    ~2^planes; recall traded via ``planes``.

    ``multiprobe`` > 0 additionally probes every bucket within Hamming
    distance 1 of the query's bucket (flipping each of the ``planes``
    bits) — the standard recall boost that costs planes× more candidate
    buckets on the (small) query side only, never touching the corpus
    layout."""
    cb = random_hyperplane_buckets(corpus, vec_col, id_col, planes, dim).withColumnRenamed(id_col, "neighbor_id")
    qb = random_hyperplane_buckets(queries, vec_col, id_col, planes, dim).withColumnRenamed(id_col, "query_id")
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(planes)],
        )
        qb = qb.select("query_id", F.explode(probes).alias("bucket"))
    c = (
        ensure_parallelism(
            corpus.select(F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("cvec"))
        )
        .withColumn("cnorm", norm(F.col("cvec")))
        .join(cb, "neighbor_id")
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qvec"))
        .withColumn("qnorm", norm(F.col("qvec")))
        .join(qb, "query_id")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_with_norms(
                F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.round("cos", 6).desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


# ---------------------------------------------------- product quantization


def pq_subvectors(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(vector × subspace) expansion shared by PQ training and encoding:
    (nid, s, sv, svnorm) rows via a generator projection (explode of a
    literal sequence — no shuffle).  Callers that consume it more than
    once (pq_topk: training assignment, training means, encoding)
    should localCheckpoint the result — Spark re-executes a subplan per
    consumer otherwise, tripling the corpus scan."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} must be divisible by m={m} subspaces")
    sub = dim // m
    c = corpus.select(F.col(id_col).alias("nid"), to_double_array(vec_col).alias("cvec"))
    return (
        ensure_parallelism(c)
        .select("nid", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"), "cvec")
        .select("nid", "s", F.slice(F.col("cvec"), F.col("s") * sub + 1, sub).alias("sv"))
        .withColumn("svnorm", norm(F.col("sv")))
    )


def pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    subs: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization codebooks: split every vector into ``m``
    contiguous sub-vectors of dim/m and train ``ksub`` centroids PER
    SUBSPACE — the codebook that compresses a vector to m small codes
    (here 4×4 bits vs 64×4 bytes, a 128× shrink), the storage layer
    under IVF-PQ ANN at 100 TB (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011 — public).

    Training mirrors :func:`kmeans_centroids`'s exact-gate recipe:
    deterministic seeds (subspace s seeds from vectors s·ksub ≤ id <
    (s+1)·ksub), one Lloyd step with rounded-cosine assignment and
    DECIMAL(27,12)-summed means (exact ⇒ order-independent ⇒ a DuckDB
    oracle replaying the same step lands on bit-identical codebooks).

    Plan: the (vector × subspace) expansion is a generator projection
    (explode of a literal sequence — no shuffle); assignment is a
    broadcast join against the m·ksub codebook rows with a skinny
    max_by agg; means are one posexplode agg with map-side combine
    into m·ksub·(dim/m) partials.  Returns (s, code, cent, centnorm),
    localCheckpointed because every consumer broadcasts it."""
    sub = dim // m
    c = corpus.select(F.col(id_col).alias("nid"), to_double_array(vec_col).alias("cvec"))
    seeds = c.where(F.col("nid") < m * ksub).select(
        (F.col("nid") - F.pmod(F.col("nid"), ksub)).cast("long").alias("soff"),
        F.pmod(F.col("nid"), ksub).alias("code"),
        F.col("cvec"),
    ).select(
        ((F.col("soff") / ksub).cast("long")).alias("s"),
        "code",
        F.slice(F.col("cvec"), (F.col("soff") / ksub).cast("int") * sub + 1, sub).alias("cent"),
    )
    if subs is None:
        subs = pq_subvectors(corpus, vec_col, id_col, m=m, dim=dim)
    cents = seeds.withColumn("centnorm", norm(F.col("cent")))
    assign = (
        subs.join(F.broadcast(cents), "s")
        .select(
            "nid",
            "s",
            "code",
            F.round(
                cosine_with_norms(F.col("sv"), F.col("cent"), F.col("svnorm"), F.col("centnorm")),
                6,
            ).alias("ccos"),
        )
        .groupBy("nid", "s")
        .agg(F.max_by("code", F.struct(F.col("ccos"), (-F.col("code")).alias("neg"))).alias("code"))
    )
    means = (
        subs.join(assign, ["nid", "s"])
        .select("s", "code", F.posexplode("sv").alias("pos", "val"))
        .groupBy("s", "code", "pos")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(27,12)")).cast("double") / F.count("val"),
                6,
            ).alias("mval")
        )
    )
    trained = (
        means.groupBy("s", "code")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("pm"))
        .select(
            "s",
            "code",
            F.transform("pm", lambda t: t.getField("mval")).alias("cent"),
        )
        .withColumn("centnorm", norm(F.col("cent")))
    )
    return trained.localCheckpoint(eager=True)


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    dim: int = 64,
    subs: DataFrame | None = None,
) -> DataFrame:
    """Encode every vector as its per-subspace nearest codebook entry:
    (vec_id, s, code) rows — the PQ-compressed corpus.  Same
    broadcast-join + skinny max_by shape as codebook training; the
    full vectors never shuffle, and downstream ADC joins touch only
    these m-small-int rows."""
    if subs is None:
        subs = pq_subvectors(corpus, vec_col, id_col, m=m, dim=dim)
    return (
        subs.join(F.broadcast(codebooks), "s")
        .select(
            "nid",
            "s",
            "code",
            F.round(
                cosine_with_norms(F.col("sv"), F.col("cent"), F.col("svnorm"), F.col("centnorm")),
                6,
            ).alias("ccos"),
        )
        .groupBy("nid", "s")
        .agg(F.max_by("code", F.struct(F.col("ccos"), (-F.col("code")).alias("neg"))).alias("code"))
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: queries stay
    full-precision, each query precomputes a LUT of inner products
    against every codebook entry (|Q|·m·ksub tiny rows, broadcast),
    and a neighbor's approximate score is the sum of its m looked-up
    partials — a hash join on (s, code) plus a two-key agg, with NO
    vector arithmetic in the quadratic stage and no vectors in any
    shuffle.  Partials are rounded to 6dp then summed through
    DECIMAL(18,6) (exact ⇒ order-independent) so the ranking is
    engine-reproducible.

    At 100 TB: codes are ~1% of vector bytes, the LUT join replaces
    |Q|·|C| dot products with |Q|·|C| additions of m terms, and the
    scan side is the compressed codes table — the standard IVF-PQ
    trade of recall for a two-orders-of-magnitude smaller working
    set."""
    # The (vector × subspace) expansion feeds THREE consumers (training
    # assignment, training means, encoding) — materialize it once.  At
    # cluster scale prefer checkpoint(dir): the expansion is m× vector
    # bytes, but one write beats three corpus scans.
    subs = pq_subvectors(corpus, vec_col, id_col, m=m, dim=dim).localCheckpoint(eager=True)
    codebooks = pq_codebooks(corpus, vec_col, id_col, m=m, ksub=ksub, dim=dim, subs=subs)
    codes = pq_encode(corpus, codebooks, vec_col, id_col, m=m, dim=dim, subs=subs)
    return pq_adc_topk(codebooks, codes, queries, vec_col, id_col, k=k, m=m, dim=dim)


def pq_adc_topk(
    codebooks: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    m: int = 4,
    dim: int = 64,
) -> DataFrame:
    """The SERVE stage of PQ search, factored so it runs against
    PERSISTED artifacts (`build-index` CLI writes codebooks/codes to
    parquet; pass the read-back frames here) exactly as against
    freshly-trained ones — same math, same results, no retraining per
    query batch.  This is the repeated-query amortization: the corpus
    is never touched, only the m-small-int codes table."""
    sub = dim // m
    qsubs = (
        queries.select(F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qvec"))
        .select("query_id", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"), "qvec")
        .select("query_id", "s", F.slice(F.col("qvec"), F.col("s") * sub + 1, sub).alias("qs"))
    )
    lut = qsubs.join(F.broadcast(codebooks), "s").select(
        "query_id",
        "s",
        "code",
        F.round(dot(F.col("qs"), F.col("cent")), 6).cast("decimal(18,6)").alias("p"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .where(F.col("query_id") != F.col("nid"))
        .groupBy("query_id", F.col("nid").alias("neighbor_id"))
        .agg(F.sum("p").cast("double").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def normalize_vectors(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """L2-normalize: PQ inner-product ADC approximates COSINE only on
    unit vectors, so normalization is the mandatory pre-step for
    cosine-metric PQ (each element divided by the vector's norm — one
    narrow projection, norm computed once per row)."""
    dv = to_double_array(vec_col)
    out = df.select(F.col(id_col), dv.alias("__v")).withColumn("__n", norm(F.col("__v")))
    return out.where(F.col("__n") > 0).select(
        id_col, F.transform("__v", lambda x: x / F.col("__n")).alias(vec_col)
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    shortlist: int = 100,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
) -> DataFrame:
    """The production PQ pattern: ADC over NORMALIZED vectors selects a
    ``shortlist`` of candidates per query from the compressed codes,
    then ONLY those candidates are re-scored with the exact cosine on
    full-precision vectors — compressed scan for the haystack, exact
    arithmetic for the needles.  Measured on the synthetic embeddings:
    raw ADC recall@5 ≈ 0.30 (near-isotropic data is PQ's worst case),
    shortlist-100 + re-rank ≈ 0.86.

    Scale shape: stage 1 touches only (id, s, code) rows; stage 2 joins
    |Q|·shortlist candidate IDs back to the corpus — a skinny semi-join
    that retrieves full vectors for a fixed small set, never a corpus
    scan.  Output cosines are bit-identical to brute force for every
    hit, so quality regressions show up as rank changes, not value
    drift."""
    corpus_n = normalize_vectors(corpus, vec_col, id_col)
    queries_n = normalize_vectors(queries, vec_col, id_col)
    cand = pq_topk(
        corpus_n, queries_n, vec_col, id_col, k=shortlist, m=m, ksub=ksub, dim=dim
    ).select("query_id", "neighbor_id")
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("cvec")
    ).withColumn("cnorm", norm(F.col("cvec")))
    qvec = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qvec")
    ).withColumn("qnorm", norm(F.col("qvec")))
    rescored = (
        cand.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_with_norms(F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
