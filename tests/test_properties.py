"""Property-based tests (hypothesis): operator semantics vs naive
Python reference implementations on randomized inputs.  Few examples
per property (each round-trips through Spark), unbounded deadline."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def keyed_series(draw):
    n_right = draw(st.integers(1, 8))
    n_left = draw(st.integers(1, 12))
    rights = sorted(set(draw(st.lists(st.integers(0, 1000), min_size=n_right, max_size=n_right))))
    lefts = sorted(set(draw(st.lists(st.integers(0, 1000), min_size=n_left, max_size=n_left))))
    return rights, lefts


@given(keyed_series())
@settings(**SETTINGS)
def test_asof_join_matches_naive(spark, series):
    from kp_crypto_market_analytics_spark.operators.joins import as_of_join

    rights, lefts = series
    left = spark.createDataFrame(
        [("K", i, t) for i, t in enumerate(lefts)], "key string, lid long, lts long"
    ).withColumn("lts", F.timestamp_seconds("lts"))
    right = spark.createDataFrame(
        [("K", t, float(t) * 2) for t in rights], "key string, rts long, rval double"
    ).withColumn("rts", F.timestamp_seconds("rts"))
    out = as_of_join(left, right, left_ts="lts", right_ts="rts", keys=["key"]).collect()
    got = {r["lid"]: r["rval"] for r in out}
    for i, t in enumerate(lefts):
        past = [rt for rt in rights if rt <= t]
        expected = float(max(past)) * 2 if past else None
        assert got[i] == expected, (t, rights)


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=30),
    st.integers(10, 500),
)
@settings(**SETTINGS)
def test_sessionize_gap_invariants(spark, times, gap):
    from kp_crypto_market_analytics_spark.operators.windows import sessionize

    times = sorted(set(times))
    df = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(times)], "user_id long, event_id long, ts long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    out = sessionize(df, "user_id", "ts", gap_seconds=gap, tiebreak="event_id").collect()
    by_time = sorted(out, key=lambda r: r["event_id"])
    # Invariants (inclusive boundary, matching session_window's merge
    # of touching windows): consecutive events in the same session have
    # gap <= threshold; a session boundary implies gap > threshold; ids
    # are 1-based contiguous.
    for prev, cur in zip(by_time, by_time[1:]):
        delta = times[cur["event_id"]] - times[prev["event_id"]]
        if cur["session_id"] == prev["session_id"]:
            assert delta <= gap
        else:
            assert delta > gap
            assert cur["session_id"] == prev["session_id"] + 1
    assert by_time[0]["session_id"] == 1


@given(
    st.text(alphabet="abcdef ", min_size=30, max_size=80),
    st.text(alphabet="uvwxyz ", min_size=30, max_size=80),
    st.text(alphabet="mnopqr", min_size=12, max_size=20),
)
@settings(**SETTINGS)
def test_winnow_planted_substring_shared(spark, a_pre, b_pre, common):
    # Winnowing guarantee (k=5, w=8): any shared substring of length >=
    # k + w - 1 = 12 yields >= 1 shared fingerprint.
    from kp_crypto_market_analytics_spark.operators.dedup import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, a_pre + common), (2, b_pre + common)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", k=5, window=8).collect()
    s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert s1 & s2


@given(st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=40))
@settings(**SETTINGS)
def test_salted_agg_equals_plain(spark, values):
    from kp_crypto_market_analytics_spark.operators.aggregates import salted_agg

    df = spark.createDataFrame(
        [("G", i, float(v)) for i, v in enumerate(values)], "k string, id long, v double"
    )
    g1, fin = salted_agg(df, ["k"], "id", 4)
    out = fin(
        g1.agg(F.sum(F.col("v").cast("decimal(28,10)")).alias("s"), F.count("v").alias("n")),
        [F.sum("s").cast("double").alias("s"), F.sum("n").alias("n")],
    ).collect()[0]
    import decimal

    expected = float(sum(decimal.Decimal(v).quantize(decimal.Decimal("1e-10")) for v in map(str, values)))
    assert out["n"] == len(values)
    assert abs(out["s"] - expected) < 1e-6


@given(
    st.lists(
        st.tuples(
            st.integers(1_500_000_000_000, 2_000_000_000_000),  # epoch ms
            st.booleans(),  # encode as ms-string vs ISO string
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_heuristic_time_parse_roundtrip(spark, items):
    # F2: every value — whether serialized as an epoch-ms string or an
    # ISO timestamp string — must parse back to the second-truncated
    # original (ISO form drops sub-second precision).
    from kp_crypto_market_analytics_spark.functions.market import heuristic_time_parse
    import datetime as dt

    rows = []
    for i, (ms, as_ms) in enumerate(items):
        ms = (ms // 1000) * 1000  # second-aligned so both encodings agree
        t = dt.datetime.utcfromtimestamp(ms / 1000)
        enc = str(ms) if as_ms else t.strftime("%Y-%m-%d %H:%M:%S")
        rows.append((i, enc, t))
    df = spark.createDataFrame(rows, "i long, enc string, expected timestamp")
    out = df.withColumn("parsed", heuristic_time_parse("enc")).collect()
    for r in out:
        assert r["parsed"] == r["expected"], (r["enc"], r["parsed"], r["expected"])


def test_heuristic_time_parse_malformed_is_null_under_ansi(spark):
    # errors='coerce' parity (binance_analysis.py:107-119 +
    # dropna(subset=['open_time'])): malformed strings must become null
    # — not throw — even under ANSI mode, which is ON in the driver's
    # session (try_to_timestamp in the ISO branch; try_cast in the
    # epoch-ms branch).
    from kp_crypto_market_analytics_spark.functions.market import heuristic_time_parse

    rows = [
        (0, "not-a-time"),
        (1, "2024-13-45 99:99:99"),  # parses as nothing valid
        (2, ""),
        (3, "1700000000000"),  # valid epoch ms
        (4, "2024-05-01 12:30:00"),  # valid ISO
    ]
    df = spark.createDataFrame(rows, "i long, enc string")
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = {r["i"]: r["parsed"] for r in
               df.withColumn("parsed", heuristic_time_parse("enc")).collect()}
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.ansi.enabled", prev)
    assert out[0] is None and out[1] is None and out[2] is None
    assert out[3] is not None and out[4] is not None


@given(
    st.lists(st.floats(-100.0, 100.0, allow_nan=False), min_size=2, max_size=12)
    .filter(lambda v: any(x != 0 for x in v)),
)
@settings(**SETTINGS)
def test_quantize_roundtrip_error_bound(spark, vec):
    # Symmetric int8 quantization invariant: every element's
    # dequantization error is <= scale/2 (round-to-nearest), and the
    # quantized magnitudes stay within 127.
    from kp_crypto_market_analytics_spark.functions.vectors import (
        abs_max,
        dequantize,
        quantize_symmetric,
    )

    df = spark.createDataFrame([(0, [float(x) for x in vec])], "i long, v array<double>")
    df = df.withColumn("scale", abs_max(F.col("v")) / F.lit(127.0))
    df = df.withColumn("q", quantize_symmetric(F.col("v"), F.col("scale")))
    df = df.withColumn("dq", dequantize(F.col("q"), F.col("scale")))
    row = df.collect()[0]
    assert all(abs(q) <= 127 for q in row["q"])
    for orig, deq in zip(vec, row["dq"]):
        assert abs(orig - deq) <= row["scale"] / 2 + 1e-12


@given(st.integers(1, 30), st.integers(1, 15))
@settings(**SETTINGS)
def test_stratified_sample_exact_counts(spark, n_per_stratum, k):
    # Fixed-k stratified sampling: exactly min(k, |stratum|) rows per
    # stratum, rn contiguous from 1, membership deterministic.
    from kp_crypto_market_analytics_spark.functions.text import hash64
    from pyspark.sql import Window

    rows = [(s * 100 + i, f"s{s}") for s in range(3) for i in range(n_per_stratum)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    h = hash64(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    out = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .collect()
    )
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["rn"])
    assert set(by_src) == {"s0", "s1", "s2"}
    for rns in by_src.values():
        assert sorted(rns) == list(range(1, min(k, n_per_stratum) + 1))


@given(
    st.lists(
        st.tuples(st.integers(0, (1 << 62) - 1), st.integers(1, 1 << 20)),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_idiv_matches_python_floordiv(spark, pairs):
    # _idiv (Spark's integral `div`) must equal Python's exact // over
    # the full long range — beyond 2^53, where any double-mediated path
    # (floor(a/b) or (a - pmod)/b) rounds the numerator itself.
    from kp_crypto_market_analytics_spark.queries_ext import _idiv

    df = spark.createDataFrame(pairs, "a: long, b: long")
    got = [r.q for r in df.select(_idiv(F.col("a"), F.col("b")).alias("q")).collect()]
    assert got == [a // b for a, b in pairs]


def test_weighted_sample_biases_toward_token_mass(spark):
    # The weighted sample's mean token count must exceed the corpus
    # mean — that bias is the operator's entire purpose (uniform
    # sampling would match the corpus mean in expectation).
    from kp_crypto_market_analytics_spark.functions.text import token_count
    from kp_crypto_market_analytics_spark.queries import QUERIES
    from kp_crypto_market_analytics_spark.session import load_tables

    rows = QUERIES["t_weighted_sample"](spark, "/root/testdata/sf0.001").collect()
    samp_mean = sum(r.n_tokens for r in rows) / len(rows)
    docs = load_tables(spark, "/root/testdata/sf0.001", ["documents"])["documents"]
    corp_mean = docs.select(F.avg(token_count("text"))).first()[0]
    assert samp_mean > corp_mean


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 9), st.floats(0.1, 100.0)),
        min_size=2,
        max_size=40,
    ),
    st.integers(0, 9),
)
@settings(**SETTINGS)
def test_incremental_rollup_split_invariant(spark, rows, split):
    # Merging partial rollups from ANY split of the input must equal the
    # single-pass rollup exactly — the algebraic property incremental
    # maintenance rests on (decimal sums are exact => associative).
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        merge_partial_rollups,
        partial_rollup,
    )

    df = spark.createDataFrame(
        [(k, d, round(v, 3)) for k, d, v in rows], "k: int, d: int, v: double"
    )
    full = merge_partial_rollups(partial_rollup(df, ["k", "d"], "v"), ["k", "d"])
    lo = partial_rollup(df.where(F.col("d") < split), ["k", "d"], "v")
    hi = partial_rollup(df.where(F.col("d") >= split), ["k", "d"], "v")
    merged = merge_partial_rollups(lo.unionByName(hi), ["k", "d"])
    key = ["k", "d"]
    a = {tuple(r[c] for c in key): (r.n_rows, r.avg_value, r.min_value, r.max_value)
         for r in full.collect()}
    b = {tuple(r[c] for c in key): (r.n_rows, r.avg_value, r.min_value, r.max_value)
         for r in merged.collect()}
    assert a == b


def test_resample_ffill_fills_planted_gap(spark):
    # A key with observations at buckets 0 and 3 must come back with
    # buckets 1 and 2 synthesized: n_events=0, filled=1, ff_value carried
    # from bucket 0.
    import datetime as dt

    from kp_crypto_market_analytics_spark.operators.windows import resample_ffill

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", base, 10.0),
        ("a", base + dt.timedelta(seconds=950), 40.0),  # bucket 3 (300s steps)
    ]
    df = spark.createDataFrame(rows, "k: string, ts: timestamp, v: double")
    out = {r.bucket: r for r in resample_ffill(df, "k", "ts", "v").collect()}
    assert len(out) == 4
    buckets = sorted(out)
    for i, bkt in enumerate(buckets):
        r = out[bkt]
        if i in (1, 2):
            assert r.n_events == 0 and r.filled == 1 and r.ff_value == 10.0
        else:
            assert r.n_events == 1 and r.filled == 0


def test_approx_distinct_conf_switch_error_bound(spark):
    # Under APPROX_DISTINCT_CONF the same query runs on HLL++ sketches;
    # the estimate must land within ~3x the configured rsd of the exact
    # count (rsd=0.02 → allow 6%).
    from kp_crypto_market_analytics_spark.operators.aggregates import (
        APPROX_DISTINCT_CONF,
    )
    from kp_crypto_market_analytics_spark.queries import QUERIES

    exact = {
        r.event_type: r.n_users
        for r in QUERIES["a_distinct_users"](spark, "/root/testdata/sf0.01").collect()
    }
    spark.conf.set(APPROX_DISTINCT_CONF, "true")
    try:
        approx = {
            r.event_type: r.n_users
            for r in QUERIES["a_distinct_users"](spark, "/root/testdata/sf0.01").collect()
        }
    finally:
        spark.conf.unset(APPROX_DISTINCT_CONF)
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.06 * n), (k, n, approx[k])


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-10**9, max_value=10**9),  # micro numerator
            st.integers(min_value=1, max_value=10**6),       # denominator
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_round_mean_micro_is_half_away_exact(spark, pairs):
    # round_mean_micro must equal Fraction-exact round-half-away-from-
    # zero at 6 dp for ANY scale-6 numerator / positive int denominator
    # — the property the whole mean-parity recipe rests on.
    from fractions import Fraction

    from kp_crypto_market_analytics_spark.operators.aggregates import (
        round_mean_micro,
    )

    df = spark.createDataFrame(
        [(i, m, d) for i, (m, d) in enumerate(pairs)], "i long, micro long, den long"
    )
    got = {
        r["i"]: r["v"]
        for r in df.select(
            "i",
            round_mean_micro(
                (F.col("micro") / F.lit(1000000.0)).cast("decimal(18,6)"),
                F.col("den"),
            ).alias("v"),
        ).collect()
    }
    for i, (m, d) in enumerate(pairs):
        frac = Fraction(m, d * 1000000)  # true mean
        scaled = frac * 1000000
        q = scaled.numerator // scaled.denominator
        rem2 = 2 * (scaled - q)
        # half-away: round magnitude up at >= .5 for positives; mirror
        # for negatives via the sign-split form used in the operator
        sign = -1 if m < 0 else 1
        mag = Fraction(abs(m), d * 1000000) * 1000000
        qa = mag.numerator // mag.denominator
        if (mag - qa) * 2 >= 1:
            qa += 1
        expect = sign * qa / 1000000.0
        assert got[i] == expect, (m, d, got[i], expect)


@given(
    st.integers(min_value=-10**8, max_value=10**8),
    st.integers(min_value=-10**8, max_value=10**8),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=49),
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gapfill_micro_interpolation_bounded(spark, pm, nm, span, off):
    # The integer micro-unit interpolation must stay within [pm, nm]
    # (monotone segment) for any 6-dp endpoints and any interior point.
    off = min(off, span - 1) if span > 1 else 0
    b, pb, nb = off + 1, 0, span + 1
    num = (nm - pm) * (b - pb)
    den = nb - pb
    q = (2 * abs(num) + den) // (2 * den)
    interp = (pm + (1 if num >= 0 else -1) * q) / 1e6
    lo, hi = min(pm, nm) / 1e6, max(pm, nm) / 1e6
    assert lo - 5e-7 <= interp <= hi + 5e-7


@given(
    st.lists(st.integers(1, 10**9), min_size=1, max_size=40),
    st.lists(st.integers(0, 3), min_size=40, max_size=40),
)
@settings(**SETTINGS)
def test_ddsketch_fold_is_partition_invariant(spark, values, bids):
    # The law a_ddsketch_stream_parity gates on real data, on random
    # inputs and random batch assignments: per-batch bucket histograms
    # folded by count-sum equal the histogram built directly over the
    # union, bucket-for-bucket — for ANY partition of the stream.
    from kp_crypto_market_analytics_spark.queries_quality import _dds_buckets

    rows = [(bids[i % len(bids)], v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "bid int, v long")
    folded = (
        _dds_buckets(df, ["bid"])
        .groupBy("key")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    direct = _dds_buckets(df.select("v"), []).collect()
    assert {(r["key"], r["n"]) for r in folded} == {
        (r["key"], r["n"]) for r in direct
    }


@given(
    st.lists(st.text(alphabet="abcdef0123456789", min_size=1, max_size=8), min_size=1, max_size=40),
    st.lists(st.integers(0, 3), min_size=40, max_size=40),
)
@settings(**SETTINGS)
def test_hll_fold_is_partition_invariant(spark, users, bids):
    # The law a_hll_stream_parity gates: per-batch register frames
    # folded by element-wise max equal the registers built directly
    # over the union — for ANY partition of the stream.
    from kp_crypto_market_analytics_spark.queries_ext import _hll_registers

    rows = [(bids[i % len(bids)], u) for i, u in enumerate(users)]
    df = spark.createDataFrame(rows, "bid int, u string")
    folded = (
        _hll_registers(df, ["bid"])
        .groupBy("idx")
        .agg(F.max("m").alias("m"))
        .collect()
    )
    direct = _hll_registers(df.select("u"), []).collect()
    assert {(r["idx"], r["m"]) for r in folded} == {
        (r["idx"], r["m"]) for r in direct
    }
