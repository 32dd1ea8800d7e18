"""Streaming deduplication (S14's idempotence semantic expressed
inside the stream, not just at the sink).

Two tiers, matching Structured Streaming's state model:

- ``dedup_exact_stream``: dropDuplicatesWithinWatermark on the PK —
  duplicates arriving within the watermark horizon are dropped with
  BOUNDED state (keys older than the watermark are evicted).  This is
  the streaming analog of the reference's ON CONFLICT DO NOTHING arm.
- ``dedup_content_stream``: same, keyed on the md5 content fingerprint
  (functions.text.fingerprint_md5) — streaming exact-dedup for
  document pipelines: near-arrival duplicate texts collapse before
  they ever reach storage; historical duplicates are the batch
  operators' job (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kp_crypto_market_analytics_spark.functions.text import fingerprint_md5


def dedup_exact_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop PK duplicates within the watermark horizon.  State =
    distinct keys seen in the horizon — bounded, unlike a global
    dropDuplicates on a stream (which grows forever)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)


def dedup_content_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Content-fingerprint streaming dedup: md5 of normalized text as
    the dedup key.  The fingerprint column stays in the output so a
    downstream batch pass can reconcile across horizons."""
    with_fp = docs.withColumn("fp", fingerprint_md5(text_col))
    return dedup_exact_stream(with_fp, ["fp"], ts_col, watermark)
