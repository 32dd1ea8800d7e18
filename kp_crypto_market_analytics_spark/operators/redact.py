"""PII redaction transform (VERDICT r10 ask #5): the scrub pass the
``t_pii_scan`` census only DETECTED.  A training-data pipeline ships
the transform — masked text flows to the corpus, the census flows to
the audit log — so the redactor is a first-class operator with the
same RE2-safe patterns as the scan, applied as a deterministic
``regexp_replace`` chain (pure Catalyst expressions, no UDF; the
whole pass stays inside whole-stage codegen and scales as one
narrow map over the corpus — no shuffle, no state).

Chain order is load-bearing: emails first (an email contains digit
runs and dots the later patterns must not see), then URLs (a URL may
contain digit runs), then standalone long digit runs.  Replacement
tokens are pattern-inert by construction (no '@', no scheme, no
digits), so a rescan of the redacted text with the same patterns
finds ZERO residual hits — the invariant the gated census proves
in-query and tests pin.

Reference anchor: extends t_pii_scan (queries_ext.py) — same planted
classes, same patterns; the scan is the detection half, this is the
transform half.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) in APPLICATION ORDER.  Patterns are
# RE2-safe (no backrefs/lookaround) so the same strings run verbatim
# in Spark (Java regex) and DuckDB (RE2) — the cross-engine contract
# t_pii_scan established.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("digits", r"[0-9]{9,}", "<DIGITS>"),
)


def redact_text(col: Column) -> Column:
    """The masked text: the PII_PATTERNS chain applied in order.
    Spark's regexp_replace replaces every occurrence (global), matching
    DuckDB's regexp_replace(..., 'g')."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def residual_hits(col: Column) -> Column:
    """Total pattern hits remaining in (already-redacted) text — the
    rescan-zero invariant: must be 0 for every document, because the
    replacement tokens are inert under every pattern in the chain."""
    total = F.lit(0)
    for _, pat, _ in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(col, F.lit(pat), 0))
    return total


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact ``text_col`` in place and append the per-document audit
    columns: per-class hit counts (counted BEFORE masking), the
    redacted-character delta, and the rescan residual.  One narrow
    projection — the transform a 100 TB scrub pass maps over every
    shard with no shuffle."""
    t = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }
    red = redact_text(t)
    return df.select(
        *[c for c in df.columns if c != text_col],
        counts["email"].alias("n_emails"),
        counts["url"].alias("n_urls"),
        counts["digits"].alias("n_digit_runs"),
        (F.length(t) - F.length(red)).alias("chars_redacted"),
        residual_hits(red).alias("residual_hits"),
        red.alias(text_col),
    )
