"""Streaming ANN index maintenance (VERDICT r10 ask #4): the last
batch-only LLM-pipeline operator given the continuous-ingest
treatment.  ``build-index`` materializes the IVF serving artifacts
once; this module keeps them CURRENT as embeddings arrive — a
``foreachBatch`` loop that assigns each micro-batch to the FROZEN
trained centroids and commits the assignments to the serving index
(the streaming/dedup_lsh.py freeze-and-probe pattern).

Freeze contract: the centroid table is trained ONCE at deployment
(operators.similarity.kmeans_centroids — the same artifact
``build-index`` writes and ``sim_ivf_trained`` searches) and never
moves during ingest.  That freeze is what makes the stream replayable
AND what makes the incrementally-built index equal the batch-built
one vector-for-vector: assignment is per-row against a constant
broadcast table, so the union of per-batch assignments IS the batch
assignment (gated cross-engine by ``sim_ivf_stream_parity`` in
queries_r11.py; pinned emission-for-emission by
tests/test_sinks_streaming.py::test_ivf_index_stream_matches_gated_fold).
Re-training (centroid drift repair) is a periodic OFFLINE job that
publishes a new frozen centroid table and re-runs the assignment —
the standard IVF maintenance split.

The serving index lives in the manifest-committed table
(sinks/manifest_table.py), partitioned by ingest batch with batch
min/max stats: a trigger crash before the manifest publish exposes
nothing to a concurrent serving read, replayed merges republish
identical content (last-write-wins on vec id), and the loop compacts
past a live-commit threshold so serving reads stay O(1) unions.

Scale shape per trigger: |batch| × C broadcast nested-loop (C = the
small centroid count) into one skinny max_by agg — no corpus-side
shuffle, state grows one (id, vector, cell) row per arrival.  Serving
(:func:`serve_ivf_topk`) reads the index and runs the IDENTICAL
search stage as the live batch path (operators.similarity.
ivf_search_cells — factored out so the two cannot diverge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kp_crypto_market_analytics_spark.functions.vectors import (
    norm,
    to_double_array,
)
from kp_crypto_market_analytics_spark.operators.similarity import (
    ivf_assign,
    ivf_search_cells,
)


def ivf_assign_batch(
    batch_df: DataFrame,
    cents: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One ingest step, batch-side core: assign the arriving vectors to
    their nearest FROZEN centroid.  Thin adapter over
    operators.similarity.ivf_assign — the SAME assignment the batch
    index build (``build-index`` CLI) and live ``ivf_topk`` run, so
    the streaming loop cannot drift from the gated batch family.
    Returns (vec_id, centroid_id, cvec, cnorm) — the serving-index row:
    vectors ride along so the index alone answers searches."""
    c = batch_df.select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(vec_col).alias("cvec"),
    ).withColumn("cnorm", norm(F.col("cvec")))
    best = ivf_assign(c, cents)
    return (
        c.join(F.broadcast(best), "neighbor_id")
        .select(
            F.col("neighbor_id").alias(id_col),
            "centroid_id",
            "cvec",
            "cnorm",
        )
    )


def ivf_ingest_batch(
    batch_df: DataFrame,
    epoch_id: int,
    cents: DataFrame,
    index_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    compact_max_live: int | None = 16,
) -> None:
    """One trigger of the index-maintenance loop (module-level so the
    replay semantics are directly testable): assign the batch to the
    frozen centroids and COMMIT the assignments to the manifest-table
    index.  foreachBatch is at-least-once; the merge is last-write-wins
    on the vec id, so a replayed epoch republishes identical content —
    and the commit point is one manifest file, so a crash mid-write
    exposes nothing to concurrent serving reads."""
    from kp_crypto_market_analytics_spark.sinks.manifest_table import (
        compact,
        merge_into,
    )

    spark = batch_df.sparkSession
    assigned = ivf_assign_batch(batch_df, cents, vec_col, id_col)
    merge_into(
        spark,
        index_dir,
        assigned.withColumn("batch", F.lit(epoch_id).cast("long")),
        key=[id_col],
        partition_by=["batch"],
        stats_cols=["batch"],
    )
    if compact_max_live is not None:
        compact(spark, index_dir, max_live_commits=compact_max_live)


def ivf_index_stream(
    embeddings: DataFrame,
    cents: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    compact_max_live: int | None = 16,
) -> StreamingQuery:
    """Maintain the IVF serving index over an embedding stream: per
    micro-batch, assign arrivals to the frozen ``cents`` and commit
    (vec_id, centroid_id, cvec, cnorm, batch) rows to the manifest
    table at ``index_dir``."""

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        ivf_ingest_batch(
            batch_df,
            epoch_id,
            cents,
            index_dir,
            vec_col=vec_col,
            id_col=id_col,
            compact_max_live=compact_max_live,
        )

    return (
        embeddings.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def serve_ivf_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    cents: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Answer top-k searches FROM the incrementally-maintained index:
    read the manifest table (latest published commit set — never a
    half-written epoch) and run the identical search stage as the
    live batch path (ivf_search_cells).  With the centroids frozen,
    results are bit-identical to batch ``ivf_topk`` over the same
    corpus — the property the parity tests pin."""
    from kp_crypto_market_analytics_spark.sinks.manifest_table import (
        read_table,
    )

    index = read_table(spark, index_dir)
    if index is None:
        raise FileNotFoundError(f"no published index manifest under {index_dir}")
    cassign = index.select(
        F.col(id_col).alias("neighbor_id"), "centroid_id", "cvec", "cnorm"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qvec")
    ).withColumn("qnorm", norm(F.col("qvec")))
    return ivf_search_cells(cassign, cents, q, k=k, nprobe=nprobe)
