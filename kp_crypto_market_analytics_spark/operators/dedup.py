"""Deduplication operators for training-data pipelines.

Five dedup families, each a pure DataFrame plan designed for the 100 TB
shape of the problem:

- exact:        hash-groupBy on a normalized fingerprint (1 shuffle).
- ngram-jaccard: shingle-explode → inverted-index self-join → exact
                 Jaccard.  Frequency-capped postings bound the join
                 blowup (a shingle shared by k docs emits k² pairs).
- minhash-LSH:  shingle → R minhashes → B bands → bucket-join.  Only
                 band-collisions are compared — candidate generation is
                 linear in corpus size, not quadratic.
- simhash:      64-bit weighted token hash; near-dups share bands of
                 the fingerprint.
- embedding:    cosine over normalized vectors via the similarity module.

Hashing uses the md5-derived portable hash64 (functions.text.hash64) so
results are engine-reproducible; swap F.xxhash64 for raw speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.functions.text import (
    char_shingles,
    fingerprint_md5,
    hash64,
    word_shingles,
)
from kp_crypto_market_analytics_spark.session import ensure_parallelism

MERSENNE31 = (1 << 31) - 1


def exact_dedup(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized-text fingerprint, keeping the smallest
    id per group (deterministic survivor).  min() aggregation — partial
    map-side combine makes the shuffle carry one row per distinct hash
    per partition."""
    return (
        ensure_parallelism(df)
        .withColumn("__fp", fingerprint_md5(text))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__fp")
    )


def _shingle_sets(df: DataFrame, text: str, id_col: str, k: int, use_words: bool) -> DataFrame:
    sh = word_shingles(text, k) if use_words else char_shingles(text, k)
    return (
        ensure_parallelism(df.select(F.col(id_col).alias("doc"), F.col(text)))
        .select("doc", F.explode(sh).alias("shingle"))
        .distinct()
    )


def _jaccard_direct_join(sets: DataFrame, threshold: float) -> DataFrame:
    """Naive inverted-index Jaccard: self-join postings on the shingle,
    count intersections, |A∪B| = |A|+|B|−|A∩B|.  Each shingle shared by
    d docs emits d² join rows, so this is only safe when document
    frequency is bounded (the ``max_shingle_freq`` capped regime)."""
    # The capped postings feed three consumers (sizes + both join
    # sides); materialize once.
    sets = sets.localCheckpoint(eager=True)
    sizes = sets.groupBy("doc").agg(F.count(F.lit(1)).alias("set_size"))
    a = sets.select(F.col("doc").alias("doc_a"), "shingle")
    b = sets.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    out = (
        inter.join(
            sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("set_size", "size_a"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("set_size", "size_b"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter_size") / (F.col("size_a") + F.col("size_b") - F.col("inter_size")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "inter_size", "size_a", "size_b", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    use_words: bool = True,
    max_shingle_freq: int | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all qualifying pairs.

    Prefix-filtered similarity join (AllPairs/PPJoin, Bayardo et al.
    WWW'07): dictionary-encode shingles, self-join only each doc's
    df-ascending PREFIX (n - ceil(t*n) + 1 shingles) to generate
    candidates, then verify every candidate exactly with packed-bitmap
    intersection counts.  Output is identical to the naive inverted-
    index join (pairs sharing >=1 shingle, |A∪B| = |A|+|B|−|A∩B|) but
    the df**2 blowup on stop-shingles never happens.  ``max_shingle_freq``
    additionally drops ultra-common shingles BEFORE sizing/jaccard
    (df-style stopword cap — an intentional approximation, see
    dedup_ngram_capped).  ``sets`` injects a shared (doc, shingle) frame
    so multi-detector audits (dedup_lsh_recall) shingle the corpus
    once."""
    if sets is None:
        sets = _shingle_sets(df, text, id_col, k, use_words)
    if max_shingle_freq is not None:
        freq = sets.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        sets = (
            sets.join(freq.where(F.col("__df") <= max_shingle_freq), "shingle")
            .drop("__df")
        )
        # The cap ALREADY bounds the candidate join (a shingle emits at
        # most max_shingle_freq**2 pairs), so the prefix+bitmap
        # machinery below would be pure fixed overhead here (measured
        # +2.2s per query at sf0.1).  Use the direct inverted-index
        # join for the capped regime.
        return _jaccard_direct_join(sets, threshold)
    # The shingle-set subplan feeds several consumers (vocabulary,
    # document frequency, prefixes, bitmaps); without materialization
    # the CPU-heavy explode+distinct re-executes for each (measured
    # 7.9s -> 2.9s warm at sf0.1 with the checkpoint).
    sets = sets.localCheckpoint(eager=True)

    # Dictionary-encode shingles to dense int ids.  The vocabulary is a
    # DISTINCT over shingles — bounded by alphabet**k for char shingles
    # (~531k for k=4 over [a-z ]) but CORPUS-vocabulary-sized for word
    # shingles (10⁸+ on web corpora) — so the dense ids come from a
    # range-partitioned rank (per-range row_number + broadcast
    # |ranges|-row offsets), never a single-partition sort: the encode
    # stays distributed even when word-grams feed it at 100 TB.
    from kp_crypto_market_analytics_spark.operators.layout import (
        range_partitioned_rank,
    )

    vocab = range_partitioned_rank(
        sets.select("shingle").distinct(), ["shingle"], out_col="__rk"
    ).select("shingle", (F.col("__rk") - 1).cast("int").alias("__sid"))
    # Broadcast the vocabulary ONLY for char shingles, where it is
    # alphabet-bounded (~531k for k=4 over [a-z ]) and the broadcast
    # skips a full shuffle of the (doc, shingle) frame.  Word-gram
    # vocabularies are corpus-sized (10⁸+ on web corpora) — a
    # broadcast there would OOM the driver long before the encode
    # mattered — so that mode takes a plain equi-join and lets AQE
    # pick the strategy from the checkpointed vocab's runtime size
    # (still broadcast at test SFs, shuffle join at web scale).
    enc_vocab = vocab if use_words else F.broadcast(vocab)
    ints = (
        sets.join(enc_vocab, "shingle")
        .select("doc", F.col("__sid").alias("sid"))
        .localCheckpoint(eager=True)
    )

    # AllPairs/PPJoin prefix filter (Bayardo et al., WWW'07): order each
    # doc's shingles by ascending global document frequency; any pair
    # with jaccard >= t MUST share a shingle within each doc's first
    # n - ceil(t*n) + 1 shingles under that order.  Self-joining only
    # the prefixes keeps the candidate join near-linear on Zipfian
    # corpora (rare shingles land in prefixes; the df**2 blowup on
    # stop-shingles disappears) while remaining EXACT — the bitmap
    # verify below recomputes the true intersection for every candidate.
    dfreq = ints.groupBy("sid").agg(F.count(F.lit(1)).alias("__df"))
    doc_w = Window.partitionBy("doc").orderBy("__df", "sid")
    ranked = ints.join(F.broadcast(dfreq), "sid").select(
        "doc",
        "sid",
        F.row_number().over(doc_w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("doc")).alias("__n"),
    )
    # ceil(t*n) in EXACT integer arithmetic: float ceil rounds up past
    # exact products for thresholds like 0.07 (0.07*100 = 7.000...01 in
    # IEEE double -> ceil 8), shortening the prefix below the safe
    # bound and silently dropping qualifying pairs.  Rationalize the
    # threshold to ppm (exact for any threshold specified to <= 6
    # decimals) and ceil by integer division.
    thr_ppm = round(threshold * 1_000_000)
    ceil_tn = F.expr(
        f"(CAST(__n AS BIGINT) * {thr_ppm} + 999999) div 1000000"
    )
    prefix = ranked.where(F.col("__rn") <= F.col("__n") - ceil_tn + 1).select(
        "doc", "sid"
    )
    cand = (
        prefix.select(F.col("doc").alias("doc_a"), "sid")
        .join(prefix.select(F.col("doc").alias("doc_b"), "sid"), "sid")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    # Exact verification via packed 64-bit bitmaps over the dictionary
    # ids: inter = sum(bit_count(a & b)) with zip_with — whole-stage
    # codegen, no per-pair hashing.  Bitmap width is vocabulary-
    # proportional while candidate count is inversely related to
    # vocabulary size (a tiny vocabulary makes every pair a candidate
    # but also makes bitmaps a few words wide; a huge vocabulary fattens
    # bitmaps but the prefix filter then prunes almost every pair), so
    # per-pair cost stays bounded in both regimes.  Measured at sf0.1
    # (5k docs, 985 distinct char-4-grams, 11.9M candidate pairs):
    # 159s (raw inverted-index join) -> ~20s end-to-end, identical rows.
    # From the CHECKPOINTED ints (every vocab id appears there by
    # construction) — reading vocab again would re-run its global sort.
    n_words = ints.agg(((F.max("sid") / 64).cast("int") + 1).alias("__nw"))
    doc_words = ints.groupBy(
        "doc", (F.col("sid") / 64).cast("int").alias("__w")
    ).agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(sid % 64 AS INT))")).alias("__mask"))
    bitmaps = (
        doc_words.groupBy("doc")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("__w", "__mask"))).alias("__mm"),
            F.sum(F.bit_count("__mask")).alias("set_size"),
        )
        .crossJoin(F.broadcast(n_words))
        .select(
            "doc",
            "set_size",
            F.transform(
                F.sequence(F.lit(0), F.col("__nw") - 1),
                lambda i: F.coalesce(F.col("__mm")[i], F.lit(0).cast("long")),
            ).alias("__bits"),
        )
    )
    out = (
        cand.join(
            bitmaps.select(
                F.col("doc").alias("doc_a"),
                F.col("__bits").alias("__bits_a"),
                F.col("set_size").alias("size_a"),
            ),
            "doc_a",
        )
        .join(
            bitmaps.select(
                F.col("doc").alias("doc_b"),
                F.col("__bits").alias("__bits_b"),
                F.col("set_size").alias("size_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "inter_size",
            F.aggregate(
                F.zip_with(
                    "__bits_a",
                    "__bits_b",
                    lambda x, y: F.bit_count(x.bitwiseAND(y)).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn(
            "jaccard",
            F.col("inter_size") / (F.col("size_a") + F.col("size_b") - F.col("inter_size")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "inter_size", "size_a", "size_b", "jaccard")


def ngram_jaccard_pairs_blocked(
    spark,
    sets_path: str,
    threshold: float,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard over a MATERIALIZED distinct
    (doc, shingle) posting table, with the quadratic stage vectorized:
    every task computes one BLOCK of the pairwise intersection-count
    matrix as a NumPy/BLAS matmul over the 0/1 doc×shingle incidence
    matrix instead of driving a multi-stage shuffle pipeline (guide
    §4.2 — hand whole batches to vectorized native code; §8 — each
    task reads the fixed corpus side from ``sets_path`` once, so no
    posting bytes enter any shuffle or broadcast and the driver never
    collects).

    EXACT, with a cleaner argument than the cosine kernels need:
    every quantity until the final division is a small INTEGER
    (posting-overlap counts via integer sort/count — no floating
    accumulation at all); set sizes are exact posting counts; the
    Jaccard division ``inter / (size_a + size_b − inter)`` divides
    exact integer-valued doubles, which IEEE 754 rounds identically
    in NumPy and the JVM, and the ``>= threshold`` compare uses the
    same Python float both engines see.  The kernel emits only the
    integer triple; the DECLARED division/filter/rounding run in
    Spark, byte-identical to :func:`_jaccard_direct_join`'s tail.
    Pinned by tests/test_operators.py::
    test_ngram_jaccard_blocked_matches_prefix_bitmap.

    The kernel runs the SAME AllPairs/PPJoin algorithm as the Spark
    plan (Bayardo et al. WWW'07), vectorized: each doc's shingles are
    ordered by ascending global document frequency, only the first
    n − ceil(t·n) + 1 ("prefix") postings enter candidate generation
    (any pair with jaccard ≥ t must share a prefix shingle under a
    common total order — prefixes computed with the same exact
    integer-ppm ceil as the Spark plan), and every candidate is
    verified exactly with packed-uint64 bitmap popcounts.  Two
    rejected cuts, both measured on the 4× scaling synth corpus
    before landing: a dense |docs|×|vocab| BLAS matmul priced its
    n²·|vocab| term at 23 s (vs ~10 s for the join plan), and an
    unfiltered inverted-index emission priced the Σ df² stop-shingle
    term at 53 s — the prefix filter is load-bearing at scale, in the
    kernel exactly as in the join plan.  The candidate SET may differ
    from the Spark plan's (the df tie-order differs) but both are
    supersets of the qualifying pairs and verification is exact, so
    the output is row-identical.  Memory per task: posting arrays +
    the n_docs × vocab/64 uint64 bitmap matrix + candidate keys.  For
    corpora whose prefix-candidate volume outgrows a task, the
    prefix-filter + bitmap JOIN plan (:func:`ngram_jaccard_pairs`,
    still what the full eval-tier variant runs) remains the route."""
    out_schema = (
        "doc_a bigint, doc_b bigint, inter_size bigint, "
        "size_a bigint, size_b bigint"
    )
    thr_ppm = round(threshold * 1_000_000)

    def run(batches):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        import pyarrow.compute as pc

        tb = pq.read_table(sets_path, columns=["doc", "shingle"])
        doc_arr = tb.column("doc").to_numpy()
        docs_u, doc_inv = np.unique(doc_arr, return_inverse=True)
        # Shingle ids via Arrow's C++ hash encode — np.unique over
        # millions of Python-object strings dominated the per-task
        # setup (measured on the 4× synth corpus).  First-occurrence
        # order is as good as sorted order here: any consistent total
        # order yields a qualifying-pair-superset candidate set, and
        # verification is exact.
        enc = pc.dictionary_encode(tb.column("shingle").combine_chunks())
        gid = enc.indices.to_numpy().astype(np.int64)
        n_docs = len(docs_u)
        n_rows = len(doc_inv)
        sizes = np.bincount(doc_inv, minlength=n_docs).astype(np.int64)
        n_groups = int(gid.max()) + 1 if n_rows else 0
        dfreq = np.bincount(gid, minlength=n_groups).astype(np.int64)

        # --- packed bitmaps: bits[doc, w] has bit (g % 64) set for
        # every posting (doc, g) with g // 64 == w.  Built with one
        # sort + bitwise_or.reduceat (no slow ufunc.at scatter).
        n_words = (n_groups + 63) // 64 if n_groups else 1
        bits = np.zeros((n_docs, n_words), dtype=np.uint64)
        if n_rows:
            w = (gid >> 6).astype(np.int64)
            bit = (np.uint64(1) << (gid & 63).astype(np.uint64))
            cell = doc_inv.astype(np.int64) * n_words + w
            o3 = np.argsort(cell, kind="stable")
            cell_s, bit_s = cell[o3], bit[o3]
            gstart = np.flatnonzero(
                np.concatenate([[True], cell_s[1:] != cell_s[:-1]])
            )
            masks = np.bitwise_or.reduceat(bit_s, gstart)
            bits.ravel()[cell_s[gstart]] = masks
        popcnt = np.array(
            [bin(i).count("1") for i in range(256)], dtype=np.uint8
        )

        # --- per-doc df-ascending prefixes (exact integer ceil, same
        # ppm arithmetic as the Spark plan).
        o2 = np.lexsort((gid, dfreq[gid], doc_inv))
        d2, g2 = doc_inv[o2], gid[o2]
        cums = np.cumsum(sizes)
        pos_in_doc = np.arange(n_rows, dtype=np.int64) - np.repeat(
            cums - sizes, sizes
        )
        ceil_tn = (sizes * thr_ppm + 999_999) // 1_000_000
        pref_len = sizes - ceil_tn + 1
        keep = pos_in_doc < np.repeat(pref_len, sizes)
        pdoc, pgid = d2[keep].astype(np.int64), g2[keep]

        # Prefix postings grouped by shingle for candidate generation.
        o4 = np.argsort(pgid, kind="stable")
        pg_s, pd_s = pgid[o4], pdoc[o4]
        counts = np.bincount(pg_s, minlength=n_groups)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
            np.int64
        )

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc"].to_numpy()
            rows = np.searchsorted(docs_u, ids)
            amask = np.isin(pd_s, rows)
            a_doc = pd_s[amask]
            a_gid = pg_s[amask]
            if not len(a_doc):
                continue
            # candidates: block-doc prefix rows × co-PREFIX posters of
            # the same shingle (concatenated-ranges emission).
            reps = counts[a_gid]
            offsets = starts[a_gid]
            cum = np.cumsum(reps)
            total = int(cum[-1])
            out_idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(cum - reps, reps)
                + np.repeat(offsets, reps)
            )
            pa_ = np.repeat(a_doc, reps)
            pb_ = pd_s[out_idx]
            # docs_u is ascending, so index order == id order.
            sel = pa_ < pb_
            uk = np.unique(pa_[sel] * n_docs + pb_[sel])
            if not len(uk):
                continue
            ai = uk // n_docs
            bi = uk % n_docs
            # exact bitmap-popcount verification, chunked to bound the
            # AND matrix.
            step = max(1, 16_000_000 // max(1, n_words * 8))
            outs = []
            for lo in range(0, len(ai), step):
                hi = min(lo + step, len(ai))
                band = bits[ai[lo:hi]] & bits[bi[lo:hi]]
                inter = (
                    popcnt[band.view(np.uint8)]
                    .reshape(hi - lo, n_words * 8)
                    .sum(axis=1, dtype=np.int64)
                )
                union = (
                    sizes[ai[lo:hi]] + sizes[bi[lo:hi]] - inter
                ).astype(np.float64)
                jac = inter.astype(np.float64) / union
                m2 = jac >= threshold
                if m2.any():
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_a": docs_u[ai[lo:hi][m2]],
                                "doc_b": docs_u[bi[lo:hi][m2]],
                                "inter_size": inter[m2],
                                "size_a": sizes[ai[lo:hi][m2]],
                                "size_b": sizes[bi[lo:hi][m2]],
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    # Explicit repartition, not ensure_parallelism: AQE coalesces the
    # post-distinct exchange of this tiny driving frame to ONE
    # partition at runtime (the pre-execution partition count the
    # helper checks looks fine), which would serialize the whole
    # quadratic kernel onto one core.  A user-specified repartition(n)
    # is exempt from AQE coalescing; sizing by defaultParallelism is
    # scale-adaptive (total cores here, cluster cores in production).
    driving = (
        spark.read.parquet(sets_path)
        .select("doc")
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism)
    )
    out = driving.mapInPandas(run, out_schema).withColumn(
        "jaccard",
        F.col("inter_size")
        / (F.col("size_a") + F.col("size_b") - F.col("inter_size")),
    )
    # The kernel already filtered on the identical division/compare;
    # the declared Spark-side filter is kept so the emitted plan states
    # the query's contract (it removes no additional rows).
    return out.where(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "inter_size", "size_a", "size_b", "jaccard"
    )


def lsh_bands_for_threshold(threshold: float, rows_per_band: int = 4) -> int:
    """Derive the LSH band count from the target Jaccard threshold
    (VERDICT r8 ask #1): the banding S-curve's midpoint is
    s* = (1/b)^(1/r), so placing it at 5/6 of the target threshold
    gives b = ceil((1/(5/6·t))^r) — for t=0.6, r=4 that is b=16
    (64 hashes), with expected recall at J=t of 1-(1-t^r)^b ≈ 0.89.
    The 5/6 margin keeps the midpoint safely below the threshold so
    borderline true pairs (J barely over t) still collide with high
    probability."""
    import math

    s_star = threshold * 5.0 / 6.0
    return int(math.ceil((1.0 / s_star) ** rows_per_band))


def minhash_signatures(
    df: DataFrame,
    text: str,
    id_col: str,
    num_hashes: int = 32,
    k: int = 3,
    use_words: bool = True,
    sets: DataFrame | None = None,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """MinHash signature per document: minᵢ((aⱼ·h(sᵢ)+bⱼ) mod p) for j in
    1..R over the doc's shingle set.  One explode + one groupBy — the
    signature aggregation is R min() columns with map-side partials.

    (a, b) coefficients are fixed odd/offset constants derived from j —
    deterministic across runs and engines.

    ``max_shingle_freq`` (r9) applies the SAME df-cap the exact capped
    Jaccard detector uses (``ngram_jaccard_pairs``): shingles appearing
    in more than that many docs are dropped before hashing, so the
    signatures estimate exactly the boilerplate-insensitive Jaccard the
    truth metric is defined over.  Hashing the full set instead made
    banding recall collapse on templated corpora (measured 0.14 at
    sf0.1 even at 64 hashes / 16 bands): template shingles dominate the
    minima while the truth ignores them.  Docs whose every shingle is
    over-cap drop out of the signature table entirely — boilerplate-
    only docs are the exact/fingerprint pipeline's job (dedup_exact),
    the documented division of labor."""
    if sets is None:
        sets = _shingle_sets(df, text, id_col, k, use_words)
    if max_shingle_freq is not None:
        freq = sets.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        sets = (
            sets.join(freq.where(F.col("__df") <= max_shingle_freq), "shingle")
            .drop("__df")
        )
    # Reduce the 60-bit base hash mod 2^31-1 BEFORE the affine map:
    # a*h then stays under 2^37 — no int64 overflow under ANSI mode.
    # Project the md5-derived base hash ONCE, then aggregate plain
    # arithmetic: hash exprs inside agg slots run interpreted and
    # re-evaluate per slot (~R× the md5 cost; the r7 pitfall).
    hs = sets.select(
        "doc", (hash64(F.col("shingle")) % F.lit(MERSENNE31)).alias("__h")
    )
    aggs = []
    for j in range(num_hashes):
        a = 2 * j + 1
        b = 104729 * (j + 1)
        aggs.append(
            F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MERSENNE31)).alias(
                f"mh_{j}"
            )
        )
    return hs.groupBy(F.col("doc").alias(id_col)).agg(*aggs)


def lsh_band_buckets(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(doc, bucket) rows of the LSH banding: each signature explodes
    into one struct-keyed bucket per band (band index + that band's
    minhash rows).  Shared by the pair generators and the bucket-cap
    audit so the banding can never drift between them."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [
            F.col(f"mh_{j}").alias(f"h{i}")
            for i, j in enumerate(range(b * rows_per_band, (b + 1) * rows_per_band))
        ]
        band_cols.append(F.struct(F.lit(b).alias("band"), *cols).alias(f"__band_{b}"))
    return sig.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array(*band_cols)).alias("bucket"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    use_words: bool = True,
    sets: DataFrame | None = None,
    sig: DataFrame | None = None,
    max_bucket_size: int | None = None,
    max_shingle_freq: int | None = None,
    overcap: str = "drop",
) -> DataFrame:
    """MinHash + LSH banding: docs agreeing on ALL rows of any band
    become candidate pairs; estimated Jaccard = fraction of matching
    minhashes.  The band bucket-join replaces the quadratic all-pairs
    comparison — candidates are generated per bucket only.  Pass
    ``sig`` (``minhash_signatures`` output) to reuse an
    already-computed signature frame.

    ``max_bucket_size`` is the boilerplate-bucket blowup lever
    (SCALING.md, MinHash row): a bucket holding B docs emits B²/2
    candidate pairs, so one boilerplate template shared by 100k docs
    would emit 5·10⁹ pairs from a single bucket.  ``overcap`` decides
    what happens to over-cap buckets:

    - ``"drop"`` — the bucket is removed from pair generation (the r8
      behavior; the drop is observable via the bucket-cap census);
    - ``"star"`` (r9) — the bucket emits STAR edges (bucket-min doc ↔
      every other member): B−1 edges instead of B(B−1)/2, so
      generation stays linear in bucket size while every same-bucket
      pair remains CONNECTED in the emitted candidate graph (both
      endpoints link to the rep) — downstream connected-components
      clustering unions the bucket exactly as if all pairs had been
      emitted.  Star output adds a ``tier`` column: ``'pair'`` edges
      are direct verification candidates, ``'star'`` edges are
      cluster-merge witnesses of bucket co-membership (their
      est_jaccard estimates rep↔member similarity, not every member
      pair).  A pair reachable both ways keeps tier ``'pair'``.

    A single window count on the bucket key decides, adding one
    shuffle and no join."""
    if sig is None:
        # sig is consumed three times (band buckets + both sides of the
        # estimate join) and is tiny (|docs| × num_hashes longs) while
        # its lineage is the expensive shingle explode — persist is a
        # clear win here, unlike wide fact frames (see
        # e3_anomaly_pipeline note).
        sig = minhash_signatures(
            df, text, id_col, num_hashes, k, use_words, sets=sets,
            max_shingle_freq=max_shingle_freq,
        ).persist()

    buckets = lsh_band_buckets(sig, id_col, num_hashes, bands)
    if max_bucket_size is not None and overcap == "star":
        wb = Window.partitionBy("bucket")
        sized = buckets.withColumn("__bn", F.count(F.lit(1)).over(wb)).withColumn(
            "__rep", F.min("doc").over(wb)
        )
        under = sized.where(F.col("__bn") <= max_bucket_size)
        pair_cand = (
            under.alias("x")
            .join(under.alias("y"), F.col("x.bucket") == F.col("y.bucket"))
            .where(F.col("x.doc") < F.col("y.doc"))
            .select(
                F.col("x.doc").alias("doc_a"),
                F.col("y.doc").alias("doc_b"),
                F.lit("pair").alias("tier"),
            )
        )
        star_cand = sized.where(
            (F.col("__bn") > max_bucket_size) & (F.col("doc") != F.col("__rep"))
        ).select(
            F.col("__rep").alias("doc_a"),
            F.col("doc").alias("doc_b"),
            F.lit("star").alias("tier"),
        )
        cand = (
            pair_cand.unionByName(star_cand)
            .groupBy("doc_a", "doc_b")
            .agg(F.min("tier").alias("tier"))
        )
    else:
        if max_bucket_size is not None:
            wb = Window.partitionBy("bucket")
            buckets = (
                buckets.withColumn("__bn", F.count(F.lit(1)).over(wb))
                .where(F.col("__bn") <= max_bucket_size)
                .drop("__bn")
            )
        cand = (
            buckets.alias("x")
            .join(buckets.alias("y"), F.col("x.bucket") == F.col("y.bucket"))
            .where(F.col("x.doc") < F.col("y.doc"))
            .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
            .distinct()
        )
    sa = sig.select(F.col(id_col).alias("doc_a"), *[F.col(f"mh_{j}").alias(f"a_{j}") for j in range(num_hashes)])
    sb = sig.select(F.col(id_col).alias("doc_b"), *[F.col(f"mh_{j}").alias(f"b_{j}") for j in range(num_hashes)])
    est = None
    for j in range(num_hashes):
        term = F.when(F.col(f"a_{j}") == F.col(f"b_{j}"), 1).otherwise(0)
        est = term if est is None else est + term
    out_cols = ["doc_a", "doc_b"] + (
        ["tier"] if overcap == "star" and max_bucket_size is not None else []
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", est / F.lit(num_hashes))
        .select(*out_cols, "est_jaccard")
    )


def incremental_lsh_pairs(
    df: DataFrame,
    is_new,
    text: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 2,
    k: int = 4,
    use_words: bool = False,
    sig: DataFrame | None = None,
    max_bucket_size: int | None = None,
    max_shingle_freq: int | None = None,
    overcap: str = "drop",
    persisted_out: list | None = None,
) -> DataFrame:
    """Incremental near-dup ingest: candidate pairs where at least one
    side belongs to the NEW batch (``is_new`` boolean column expr) —
    the production path that dedups today's documents against the
    standing corpus without re-comparing old×old.
    ``max_bucket_size`` applies the same boilerplate-bucket cap as
    ``minhash_lsh_pairs``: ``overcap="drop"`` removes over-cap buckets,
    ``overcap="star"`` routes them to rep↔member star edges (kept when
    either side is new), preserving the seam property EXACTLY — the
    incremental output equals the full star generator restricted to
    pairs touching the new batch, because every emitted edge IS a pair
    and the restriction distributes over the union of tiers.

    The band bucket-join is NEW-batch × whole-corpus: the probe side is
    |batch| rows, so each ingest costs O(batch × bucket-mates), not
    O(corpus²); old×old pairs (already resolved by previous runs) never
    form.  In a deployment the corpus-side signatures come from a
    persisted signature table (the `build-index` pattern —
    kp_crypto_market_analytics_spark/__main__.py) and only the batch
    side is hashed fresh; the plan shape here is identical with both
    sides derived from one scan.  Pass ``sig`` to start from such a
    persisted signature table instead of hashing the corpus.

    ``persisted_out`` (ADVICE r10): the flagged signature frame is
    persist()ed here (read by the bucket join AND both estimator
    sides); pass a list to receive every frame this call persisted so
    a long-lived caller (the streaming ingest loop) can unpersist
    exactly its OWN frames per trigger instead of clearing the whole
    session cache out from under concurrent queries."""
    rows_per_band = num_hashes // bands
    flags = df.select(F.col(id_col), is_new.alias("__new"))
    if sig is None:
        sig = minhash_signatures(
            df, text, id_col, num_hashes, k, use_words,
            max_shingle_freq=max_shingle_freq,
        )
    sig = sig.join(flags, id_col).persist()
    if persisted_out is not None:
        persisted_out.append(sig)

    band_cols = []
    for b in range(bands):
        cols = [
            F.col(f"mh_{j}").alias(f"h{i}")
            for i, j in enumerate(range(b * rows_per_band, (b + 1) * rows_per_band))
        ]
        band_cols.append(F.struct(F.lit(b).alias("band"), *cols).alias(f"__band_{b}"))
    buckets = sig.select(
        F.col(id_col).alias("doc"),
        F.col("__new").alias("new"),
        F.explode(F.array(*band_cols)).alias("bucket"),
    )
    # Restrict to buckets the NEW batch touches before any sizing
    # window or self-join: an untouched (old-only) bucket can emit
    # nothing — pair candidates require a new probe row, and star
    # edges require a new member or a new rep, both absent.  All
    # members of a touched bucket survive the semi-join, so bucket
    # sizes, reps, and rep_new flags are computed over the bucket's
    # FULL membership — output is row-identical (the oracle-gated
    # parity rows prove it).  This is what makes the per-trigger cost
    # O(batch + bucket-mates): without it the sizing window recounts
    # the entire accumulated store every trigger (measured flat-vs-
    # store-size only because a fixed floor hid the O(store) term —
    # SCALING_INGEST_r11.json).  The semi-join and the window share
    # the bucket hash partitioning, so the big side shuffles once
    # either way; AQE broadcasts the batch's small key set in a real
    # ingest.
    touched = buckets.where(F.col("new")).select("bucket").distinct()
    buckets = buckets.join(touched, "bucket", "left_semi")
    star = overcap == "star" and max_bucket_size is not None
    if star:
        wb = Window.partitionBy("bucket")
        sized = buckets.withColumn("__bn", F.count(F.lit(1)).over(wb)).withColumn(
            "__rep", F.min("doc").over(wb)
        ).withColumn("__rep_new", F.max(F.when(F.col("doc") == F.col("__rep"), F.col("new"))).over(wb))
        under = sized.where(F.col("__bn") <= max_bucket_size)
        probe = under.where(F.col("new"))
        pair_cand = (
            probe.alias("x")
            .join(under.alias("y"), F.col("x.bucket") == F.col("y.bucket"))
            .where(F.col("x.doc") != F.col("y.doc"))
            .select(
                F.least("x.doc", "y.doc").alias("doc_a"),
                F.greatest("x.doc", "y.doc").alias("doc_b"),
                F.lit("pair").alias("tier"),
            )
        )
        star_cand = (
            sized.where(
                (F.col("__bn") > max_bucket_size)
                & (F.col("doc") != F.col("__rep"))
                & (F.col("new") | F.col("__rep_new"))
            )
            .select(
                F.col("__rep").alias("doc_a"),
                F.col("doc").alias("doc_b"),
                F.lit("star").alias("tier"),
            )
        )
        cand = (
            pair_cand.unionByName(star_cand)
            .groupBy("doc_a", "doc_b")
            .agg(F.min("tier").alias("tier"))
        )
    else:
        if max_bucket_size is not None:
            wb = Window.partitionBy("bucket")
            buckets = (
                buckets.withColumn("__bn", F.count(F.lit(1)).over(wb))
                .where(F.col("__bn") <= max_bucket_size)
                .drop("__bn")
            )
        probe = buckets.where(F.col("new"))
        cand = (
            probe.alias("x")
            .join(buckets.alias("y"), F.col("x.bucket") == F.col("y.bucket"))
            .where(F.col("x.doc") != F.col("y.doc"))
            .select(
                F.least("x.doc", "y.doc").alias("doc_a"),
                F.greatest("x.doc", "y.doc").alias("doc_b"),
            )
            .distinct()
        )
    sa = sig.select(F.col(id_col).alias("doc_a"), F.col("__new").alias("new_a"), *[F.col(f"mh_{j}").alias(f"a_{j}") for j in range(num_hashes)])
    sb = sig.select(F.col(id_col).alias("doc_b"), F.col("__new").alias("new_b"), *[F.col(f"mh_{j}").alias(f"b_{j}") for j in range(num_hashes)])
    est = None
    for j in range(num_hashes):
        term = F.when(F.col(f"a_{j}") == F.col(f"b_{j}"), 1).otherwise(0)
        est = term if est is None else est + term
    out_cols = ["doc_a", "doc_b", "new_a", "new_b"] + (["tier"] if star else [])
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", est / F.lit(num_hashes))
        .select(*out_cols, "est_jaccard")
    )


def winnow_fingerprints(
    df: DataFrame,
    text: str,
    id_col: str,
    k: int = 5,
    window: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    rolling hash of char k-grams, keep the minimum hash of every
    ``window`` consecutive grams, dedup the selections.  Guarantees any
    shared substring of length >= k+window-1 yields a shared
    fingerprint — the standard local document fingerprinting scheme.

    Plan: posexplode shingles → window-min per doc → distinct.  The
    per-doc window is one shuffle on doc then narrow; whole-stage
    codegen covers the exploded hash + window.  (An all-in-row
    array-expression variant — transform/slice/array_min — avoids the
    shuffle but runs ~50× slower: Spark higher-order functions are
    interpreted per element, outside codegen.  Measured, not guessed.)
    Fingerprint density ~2/(window+1) of positions."""
    return winnow_positions(df, text, id_col, k, window).distinct()


def winnow_positions(
    df: DataFrame,
    text: str,
    id_col: str,
    k: int = 5,
    window: int = 8,
) -> DataFrame:
    """Pre-dedup winnowing: one (id, fp) row per shingle position.
    Callers that aggregate per doc should consume THIS and dedup inside
    the aggregation (countDistinct) — the window's hash partitioning on
    doc is reused by a doc-keyed groupBy, so the whole pipeline is a
    single shuffle; a row-level distinct() would add a second."""
    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.posexplode(char_shingles(text, k)).alias("pos", "shingle"),
    )
    w = Window.partitionBy("doc").orderBy("pos").rowsBetween(-(window - 1), 0)
    return toks.withColumn("fp", F.min(hash64(F.col("shingle"))).over(w)).select(
        F.col("doc").alias(id_col), "fp"
    )


def simhash(
    df: DataFrame,
    text: str,
    id_col: str,
    bits: int = 64,
    toks: DataFrame | None = None,
) -> DataFrame:
    """SimHash fingerprint: sign-sum of token-hash bits.

    Plan: explode tokens → per-(doc, bit) weighted votes via shiftright
    masks → reassemble the fingerprint with a sum of bit columns.  Kept
    to 64 bits in one LongType column.  ``toks`` injects a shared
    (doc, tok) frame (the session-materialized tokenize-once silver
    table) so the raw-text normalize+split pass is skipped — the
    stored arrays come from the IDENTICAL expression, so the votes are
    bit-equal."""
    if toks is None:
        toks = ensure_parallelism(df).select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), " ")).alias("tok"),
        )
    h = hash64(F.col("tok"))
    votes = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"bit_{i}")
        for i in range(min(bits, 60))
    ]
    agg = toks.groupBy("doc").agg(*votes)
    fp = F.lit(0).cast("long")
    for i in range(min(bits, 60)):
        fp = fp + F.when(F.col(f"bit_{i}") > 0, F.lit(1).cast("long") * (1 << i)).otherwise(0)
    return agg.select(F.col("doc").alias(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    max_hamming: int = 3,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 60-bit fingerprint into
    max_hamming+1 chunks (pigeonhole: any pair within the Hamming radius
    agrees on >=1 chunk), bucket-join on chunks, verify exact Hamming
    distance with bit_count(xor).  Pass ``sig`` (``simhash`` output) to
    reuse an already-computed signature frame."""
    if sig is None:
        # The signature frame (tiny: id + one long) backs BOTH sides of
        # the bucket self-join; materialize so the explode+bit-agg
        # pipeline runs once (same multi-consumer lesson as
        # ngram_jaccard_pairs).
        sig = simhash(df, text, id_col).localCheckpoint(eager=True)
    return hamming_band_pairs(sig, id_col, "simhash", max_hamming)


def hamming_band_pairs(
    sig: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bits: int = 60,
) -> DataFrame:
    """Generic banded Hamming-radius self-join over ANY 64-bit-or-less
    fingerprint column (SimHash fingerprints, perceptual image hashes,
    audio chromaprints): split the fingerprint into ``max_hamming + 1``
    chunks (pigeonhole: a pair within the radius agrees on >= 1 chunk),
    hash-join on chunk buckets, verify with bit_count(xor).  Never an
    all-pairs comparison; candidate volume is governed by bucket
    collision rates exactly as in MinHash-LSH banding."""
    chunks = max_hamming + 1
    width = bits // chunks
    bands = sig.select(
        F.col(id_col).alias("doc"),
        F.col(hash_col).alias("__h"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftright(hash_col, i * width).bitwiseAND(F.lit((1 << width) - 1)).alias("val"),
                )
                for i in range(chunks)
            ])
        ).alias("bucket"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), F.col("x.bucket") == F.col("y.bucket"))
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("doc_a"),
            F.col("y.doc").alias("doc_b"),
            F.col("x.__h").alias("sh_a"),
            F.col("y.__h").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def capped_shingle_sets_materialized(
    spark,
    sf_dir: str,
    k: int = 4,
    use_words: bool = False,
    max_shingle_freq: int = 50,
) -> DataFrame:
    """Session-materialized df-capped DISTINCT (doc, shingle) postings
    over ``documents`` — the shared input of the whole lexical dedup
    family at the production parameters (char-4-grams, df <= 50).

    r11 optimization (guide §2.4, share one derived dataset): three
    independent builds each re-ran the identical normalize → shingle
    explode → distinct → df-count → cap-join pipeline over the full
    corpus (the single most expensive scan shape in the dedup family):
    the MinHash signature build (_minhash_sigs), the capped-Jaccard
    pair build (capped_jaccard_pairs_materialized), and the directed
    containment query (dedup_containment).  The postings are a
    deterministic pure function of the corpus, and (long, string) rows
    round-trip temp parquet exactly, so serving all three from one
    materialization changes no value."""
    from kp_crypto_market_analytics_spark.operators.materialize import (
        session_materialized,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    def build() -> DataFrame:
        docs = load_tables(spark, sf_dir, ["documents"])["documents"]
        sets = _shingle_sets(docs, "text", "doc_id", k, use_words)
        freq = sets.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        return sets.join(
            freq.where(F.col("__df") <= max_shingle_freq), "shingle"
        ).drop("__df")

    key = (
        f"capped_shingles:{sf_dir}:k={k}:words={use_words}"
        f":cap={max_shingle_freq}"
    )
    return session_materialized(spark, key, build)


def capped_jaccard_pairs_materialized(
    spark,
    sf_dir: str,
    k: int = 4,
    threshold: float = 0.6,
    use_words: bool = False,
    max_shingle_freq: int | None = 50,
) -> DataFrame:
    """Session-materialized capped n-gram Jaccard pair set over the
    ``documents`` table.

    Four registry queries (dedup_ngram_capped, dedup_clusters,
    dedup_canonical, and dedup_lsh_recall's truth side) derive the
    identical df-capped pair set; each build is the full
    shingle-explode + prefix-filter + bitmap-verify pipeline — the
    most expensive derivation in the dedup family.  Build it once per
    (session, sf_dir, params) and serve the rest from a temp-parquet
    materialization (see operators/materialize.py for the
    parquet-over-persist rationale).  Columns: doc_a, doc_b,
    inter_size, size_a, size_b, jaccard.
    """
    from kp_crypto_market_analytics_spark.operators.materialize import (
        session_materialized,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    def build() -> DataFrame:
        # Production parameters ride the shared capped-postings
        # materialization (one corpus shingle pass per session);
        # non-default parameterizations keep the self-contained build.
        if (k, use_words, max_shingle_freq) == (4, False, 50):
            sets = capped_shingle_sets_materialized(
                spark, sf_dir, k=k, use_words=use_words,
                max_shingle_freq=max_shingle_freq,
            )
            return _jaccard_direct_join(sets, threshold)
        docs = load_tables(spark, sf_dir, ["documents"])["documents"]
        return ngram_jaccard_pairs(
            docs,
            "text",
            "doc_id",
            k=k,
            threshold=threshold,
            use_words=use_words,
            max_shingle_freq=max_shingle_freq,
        )

    key = (
        f"jaccard_pairs:{sf_dir}:k={k}:t={threshold}"
        f":words={use_words}:cap={max_shingle_freq}"
    )
    return session_materialized(spark, key, build)


def cluster_labels_materialized(spark, sf_dir: str) -> DataFrame:
    """Session-materialized (doc_id, cluster_id) connected-component
    labeling of the capped-Jaccard near-dup graph over ALL documents
    (min doc_id per component).

    r11 optimization: four registry queries (dedup_clusters,
    dedup_canonical, t_train_split, t_corpus_pipeline) each re-ran the
    IDENTICAL iterative min-label propagation — O(diameter) shuffle
    rounds with a localCheckpoint + convergence action per round — on
    the same materialized edge set with the same node set (every
    document).  The labels are a deterministic pure-integer function
    of the pair graph, so computing them once per session and serving
    the rest from a temp-parquet materialization changes no value
    (guide §2.4: shared derived dataset)."""
    from kp_crypto_market_analytics_spark.operators.materialize import (
        session_materialized,
    )
    from kp_crypto_market_analytics_spark.session import load_tables

    def build() -> DataFrame:
        docs = load_tables(spark, sf_dir, ["documents"])["documents"]
        edges = capped_jaccard_pairs_materialized(spark, sf_dir).select(
            "doc_a", "doc_b"
        )
        nodes = docs.select(F.col("doc_id").alias("doc"))
        return connected_component_labels(edges, nodes, "doc").select(
            F.col("doc").alias("doc_id"), "cluster_id"
        )

    return session_materialized(
        spark, f"cluster_labels:{sf_dir}:k=4:t=0.6:cap=50", build
    )


def connected_component_labels(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str = "doc",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 10,
    strict: bool = True,
    pointer_jump: bool = False,
) -> DataFrame:
    """Connected components over a near-dup pair graph: every node gets
    the MIN node id of its component — the canonical "cluster then keep
    one representative" step after any pair-generating dedup (MinHash /
    SimHash / embedding).

    Iterative min-label propagation: each round joins labels across
    (symmetrized) edges and keeps the per-node min.  Rounds needed =
    graph diameter (near-dup clusters are shallow); each round is one
    shuffle of the label table.  AQE handles the shrinking label side.
    Convergence is checked with a per-round changed-count action —
    an O(diameter)-round distributed algorithm, not a driver loop over
    rows.

    If labels are still changing after ``max_iters`` rounds (component
    diameter > max_iters, e.g. a chain-shaped duplicate family), the
    labels are WRONG — ``strict=True`` (default) raises rather than
    returning them silently; ``strict=False`` returns the partial
    labels for callers that cap rounds deliberately."""
    # Iterative algorithms MUST truncate lineage per round.  persist()
    # alone caches DATA but the logical plan still references the prior
    # round's labels TWICE (neighbor join + left join), so the plan tree
    # doubles per round — O(2^rounds) nodes that stall Catalyst and OOM
    # the driver past ~12 rounds.  localCheckpoint(eager) materializes
    # AND resets the plan to a leaf, keeping every round O(1) plan size;
    # it also stops round N's action re-running the (often expensive)
    # edge-generation join.  On a cluster where executor loss matters,
    # swap for checkpoint(dir) — same semantics, reliable storage.
    # Checkpoints here are EAGER (re-measured r11): a lazy variant
    # (materialize via the round's convergence count) A/B'd faster on
    # a single warm call (4.6s -> 3.0s) but fresh-JVM isolates of the
    # loop consumers turned bimodal and far slower (dedup_clusters
    # 29.8s/39.0s lazy vs 10.6s eager min-of-2) — an unmaterialized
    # checkpoint RDD consumed by the next round's join AND the
    # convergence count races its own block materialization across
    # concurrent stages.  Eager's one extra job per round is the
    # cheaper, *predictable* cost.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).localCheckpoint(eager=True)
    changed = -1
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # The changed flag rides along in the SAME pass (final label <
        # old label ⟺ a neighbor or the pointer improved it), so the
        # convergence count is a cheap scan of the checkpointed frame
        # instead of an extra old-vs-new join per round.
        half = (
            labels.join(neighbor_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
                F.col("label").alias("__old"),
            )
        )
        if pointer_jump:
            # Optional pointer-jumping second half-step (the classic
            # Shiloach-Vishkin shortcut): label := min(label,
            # label[label]).  Every label value IS a node id present
            # in the label table, so the lookup is a self-join; reach
            # roughly doubles per round, collapsing O(diameter) rounds
            # to O(log diameter) at the cost of one extra join per
            # round — same fixpoint, bit-identical labeling.  Off by
            # default: the near-dup / co-purchase graphs this engine
            # labels are shallow (diameter <= ~8 measured at sf0.1),
            # where the per-round join overhead exceeds the one round
            # saved (A/B measured 3.7s vs 4.3s on g_wcc's graph);
            # enable for deep chain-shaped graphs.
            ptr = half.select(
                F.col("node").alias("__pn"), F.col("label").alias("__pl")
            )
            new_label = F.least(
                F.col("label"),
                F.coalesce(F.col("__pl"), F.col("label")),
            )
            stepped = (
                half.join(ptr, half["label"] == F.col("__pn"), "left")
                .select(
                    "node",
                    new_label.alias("label"),
                    (new_label < F.col("__old")).alias("__chg"),
                )
                .localCheckpoint(eager=True)
            )
        else:
            stepped = half.select(
                "node",
                "label",
                (F.col("label") < F.col("__old")).alias("__chg"),
            ).localCheckpoint(eager=True)
        changed = stepped.where(F.col("__chg")).count()
        labels = stepped.drop("__chg")
        if changed == 0:
            break
    if changed != 0 and strict:
        raise RuntimeError(
            f"connected_component_labels did not converge in {max_iters} rounds "
            f"({changed} labels still changing) — component diameter exceeds "
            f"max_iters; raise max_iters (rounds needed = graph diameter)"
        )
    return labels.select(F.col("node").alias(node_col), F.col("label").alias("cluster_id"))


def _semantic_clustered(
    emb: DataFrame,
    cents: DataFrame,
    vec_col: str,
    id_col: str,
    assign: DataFrame | None = None,
) -> DataFrame:
    """Nearest-centroid cluster assignment carrying the vector:
    (cluster_id, vid, cvec, cnorm).  The centroid table broadcasts for
    assignment (operators.similarity.ivf_assign — skinny max_by rows,
    no vectors in that exchange); the returned frame is what shuffles
    ONCE hashed on cluster_id into the within-cell comparison.
    ``assign`` injects a precomputed (id, centroid_id) table (the
    session-materialized full-corpus assignment shared with the IVF
    search family) so the corpus×C argmax runs once per session —
    identical values by construction (per-row argmax on a frozen
    centroid table)."""
    from kp_crypto_market_analytics_spark.functions.vectors import (
        norm,
        to_double_array,
    )
    from kp_crypto_market_analytics_spark.operators.similarity import ivf_assign

    c = ensure_parallelism(
        emb.select(F.col(id_col).alias("vid"), to_double_array(vec_col).alias("cvec"))
    ).withColumn("cnorm", norm(F.col("cvec")))
    if assign is None:
        assign = ivf_assign(c, cents, id_col="vid")
    else:
        assign = assign.select(
            F.col(assign.columns[0]).alias("vid"), "centroid_id"
        )
    return c.join(assign, "vid").select(
        F.col("centroid_id").alias("cluster_id"), "vid", "cvec", "cnorm"
    )


def _semantic_pairs(clustered: DataFrame, tau: float) -> DataFrame:
    """Within-cell (a<b) pairs with 6dp-rounded cosine >= tau."""
    from kp_crypto_market_analytics_spark.functions.vectors import cosine_with_norms

    a = clustered.select(
        "cluster_id",
        F.col("vid").alias("id_a"),
        F.col("cvec").alias("va"),
        F.col("cnorm").alias("na"),
    )
    b = clustered.select(
        "cluster_id",
        F.col("vid").alias("id_b"),
        F.col("cvec").alias("vb"),
        F.col("cnorm").alias("nb"),
    )
    return (
        a.join(b, "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster_id",
            "id_a",
            "id_b",
            F.round(
                cosine_with_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= tau)
    )


def _semantic_pairs_blocked(clustered: DataFrame, tau: float) -> DataFrame:
    """:func:`_semantic_pairs` with the within-cell quadratic stage
    vectorized: one hash shuffle moves each vector to its cell ONCE
    (the self-join form shipped both sides), then each cell's pair
    block computes in NumPy instead of a JVM HOF dot per pair (guide
    §4.2; the r11 neardup_pairs_blocked pattern keyed by cluster
    cell, VERDICT r11 ask #1).

    BIT-EXACT: dots/norms accumulate dimension at a time in the same
    left-associated IEEE order as :func:`functions.vectors.dot` /
    ``norm``, the divide matches ``cosine_with_norms``, and zero-norm
    pairs drop exactly like the ``F.when`` null guard under the
    ``>= tau`` filter.  The 6dp ROUNDING and the ``>= tau`` compare
    stay in Spark: the kernel pre-filters on the RAW cosine with a
    1e-6 slack (any pair whose rounded cosine reaches tau has raw
    cosine > tau - 5e-7, so nothing is lost; false admits are removed
    by the identical Spark round-compare).  Pinned by tests/
    test_operators.py::test_semantic_pairs_blocked_matches_hof."""
    schema = "cluster_id bigint, id_a bigint, id_b bigint, cos double"
    slack = tau - 1e-6

    def cell(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vid"].to_numpy()
        mat = np.asarray(pdf["cvec"].to_list(), dtype=np.float64)
        cid = pdf["cluster_id"].to_numpy()
        n = np.zeros(len(ids))
        for d in range(mat.shape[1]):
            n += mat[:, d] * mat[:, d]
        n = np.sqrt(n)
        frames = []
        # A-rows in bounded blocks so an over-size cell cannot build a
        # cell²-doubles matrix in one allocation.
        step = 1024
        for lo in range(0, len(ids), step):
            hi = min(lo + step, len(ids))
            acc = np.zeros((hi - lo, len(ids)))
            for d in range(mat.shape[1]):
                acc += mat[lo:hi, d : d + 1] * mat[None, :, d]
            denom = n[lo:hi, None] * n[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = acc / denom
            mask = (
                (n[lo:hi, None] > 0)
                & (n[None, :] > 0)
                & (ids[lo:hi, None] < ids[None, :])
                & (cos >= slack)
            )
            ii, jj = np.nonzero(mask)
            if len(ii):
                frames.append(
                    pd.DataFrame(
                        {
                            "cluster_id": cid[lo + ii],
                            "id_a": ids[lo + ii],
                            "id_b": ids[jj],
                            "cos": cos[ii, jj],
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(
                {"cluster_id": [], "id_a": [], "id_b": [], "cos": []}
            ).astype(
                {"cluster_id": "int64", "id_a": "int64", "id_b": "int64",
                 "cos": "float64"}
            )
        return pd.concat(frames, ignore_index=True)

    return (
        clustered.select("cluster_id", "vid", "cvec")
        .groupBy("cluster_id")
        .applyInPandas(cell, schema)
        .select("cluster_id", "id_a", "id_b", F.round("cos", 6).alias("cos"))
        .where(F.col("cos") >= tau)
    )


def semantic_neardup_pairs(
    emb: DataFrame,
    cents: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tau: float = 0.35,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): assign every embedding to its nearest k-means
    centroid, then compare pairs ONLY within a cluster cell — cosine >=
    ``tau`` marks a semantic duplicate.  Returns the raw within-cell
    pairs (cluster_id, id_a, id_b, cos); the greedy min-id keep rule
    lives in :func:`semantic_dedup_census`.

    Scale shape: candidate generation is linear in corpus size (the
    quadratic stage is bounded per cell at (n/C)²) — C is the knob that
    keeps cells small, and an over-size cell is the same blowup the LSH
    bucket cap guards (route over-cap cells to a sampled or
    hierarchical second pass; same lever as minhash_lsh_pairs
    max_bucket_size).  Cross-engine exactness: assignment uses the
    rounded-cosine argmax with centroid-id tiebreak, and the pair
    filter compares the 6dp-rounded cosine — both replayed verbatim by
    the DuckDB oracle."""
    return _semantic_pairs(_semantic_clustered(emb, cents, vec_col, id_col), tau)


def semantic_dedup_census(
    emb: DataFrame,
    cents: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tau: float = 0.35,
    assign: DataFrame | None = None,
) -> DataFrame:
    """Per-cluster SemDeDup census: (cluster_id, n_vecs, n_pairs,
    n_dropped, n_kept), one row per non-empty cell, ordered by cell.

    The keep rule is the greedy min-id survivor: a vector is DROPPED
    iff some smaller-id vector in its cell sits within the tau-ball
    (count(DISTINCT id_b) over qualifying pairs).  One assignment pass
    feeds both the cell sizes and the pair stage, so the census costs
    the detector run plus two skinny aggregates."""
    clustered = _semantic_clustered(emb, cents, vec_col, id_col, assign=assign)
    sizes = clustered.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_vecs"))
    stats = (
        _semantic_pairs_blocked(clustered, tau)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("id_b").alias("n_dropped"),
        )
    )
    return (
        sizes.join(stats, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_vecs",
            F.coalesce(F.col("n_pairs"), F.lit(0).cast("long")).alias("n_pairs"),
            F.coalesce(F.col("n_dropped"), F.lit(0).cast("long")).alias("n_dropped"),
            (
                F.col("n_vecs")
                - F.coalesce(F.col("n_dropped"), F.lit(0).cast("long"))
            ).alias("n_kept"),
        )
        .orderBy("cluster_id")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    k: int = 4,
    threshold_pct: int = 80,
    use_words: bool = False,
    max_shingle_freq: int | None = 50,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Directed n-gram CONTAINMENT C(a→b) = |A∩B| / |A| (Broder 1997)
    — the contamination/subset relation Jaccard misses: a short
    benchmark prompt pasted inside a long training document scores
    near-1.0 containment but low Jaccard, so eval-set decontamination
    must threshold on containment, not similarity.  Emits BOTH
    directions of every qualifying ordered pair (doc_a = the contained
    side).

    ``threshold_pct`` is an integer percent and the filter runs on
    pure int64 arithmetic (inter·100 >= size_a·pct), so no float
    boundary can flip a pair between engines.

    Scale: same df-capped inverted-index bound as the capped-Jaccard
    regime — a shingle kept by the cap joins <= cap² candidate rows,
    and the doc payloads never shuffle (only (doc, shingle) postings
    do)."""
    if sets is None:
        sets = _shingle_sets(df, text, id_col, k, use_words)
    if max_shingle_freq is not None:
        freq = sets.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        sets = (
            sets.join(freq.where(F.col("__df") <= max_shingle_freq), "shingle")
            .drop("__df")
        )
    # Postings feed sizes + both join sides; materialize once.
    sets = sets.localCheckpoint(eager=True)
    sizes = sets.groupBy("doc").agg(F.count(F.lit(1)).alias("set_size"))
    a = sets.select(F.col("doc").alias("doc_a"), "shingle")
    b = sets.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    # The intersection is symmetric; containment is not — evaluate the
    # unordered intersection once, then both directions.
    both = inter.unionByName(
        inter.select(
            F.col("doc_b").alias("doc_a"),
            F.col("doc_a").alias("doc_b"),
            "inter_size",
        )
    )
    return (
        both.join(
            sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("set_size", "size_a"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("set_size", "size_b"),
            "doc_b",
        )
        .where(F.col("inter_size") * 100 >= F.col("size_a") * threshold_pct)
    )
