"""Round-11 operator tests: PII redaction invariants (VERDICT r10 ask
#5) beyond the oracle-gated census — conservation (untouched text is
byte-identical), corpus-wide rescan-zero, and idempotence."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SFD = "/root/testdata/sf0.001"


def test_pii_redact_conservation_and_rescan_zero(spark):
    from kp_crypto_market_analytics_spark.operators.redact import (
        pii_redact,
        redact_text,
    )
    from kp_crypto_market_analytics_spark.queries_r11 import _pii_augmented

    aug = _pii_augmented(spark, SFD)
    red = pii_redact(aug)

    joined = (
        aug.select("doc_id", F.col("text").alias("orig"))
        .join(red, "doc_id")
        .localCheckpoint(eager=True)
    )
    n_docs = aug.count()
    assert joined.count() == n_docs

    hits = F.col("n_emails") + F.col("n_urls") + F.col("n_digit_runs")
    # conservation: every document WITHOUT a PII hit is byte-identical
    untouched = joined.where(hits == 0)
    assert untouched.where(F.col("text") != F.col("orig")).count() == 0
    assert untouched.count() > 0

    # every document WITH a hit actually changed and carries a token
    touched = joined.where(hits > 0)
    assert touched.count() > 0
    assert touched.where(F.col("text") == F.col("orig")).count() == 0
    assert (
        touched.where(
            ~(
                F.col("text").contains("<EMAIL>")
                | F.col("text").contains("<URL>")
                | F.col("text").contains("<DIGITS>")
            )
        ).count()
        == 0
    )

    # rescan-zero holds CORPUS-WIDE (the gated census only shows the
    # touched slice): zero residual hits on every redacted document
    assert joined.where(F.col("residual_hits") != 0).count() == 0

    # idempotence: redacting already-redacted text is a no-op (the
    # replacement tokens are inert under every pattern in the chain)
    assert (
        joined.where(redact_text(F.col("text")) != F.col("text")).count()
        == 0
    )


def test_pii_redact_plants_all_three_classes(spark):
    # the planted contact line exercises every pattern class — guard
    # the census against a pattern silently going vacuous
    from kp_crypto_market_analytics_spark.queries_r11 import t_pii_redact

    rows = t_pii_redact(spark, SFD).collect()
    assert rows, "no planted PII found"
    for r in rows:
        assert r["n_emails"] >= 1 and r["n_urls"] >= 1, r
        assert r["n_digit_runs"] >= 1, r
        assert r["residual_hits"] == 0, r
        assert r["chars_redacted"] != 0, r
