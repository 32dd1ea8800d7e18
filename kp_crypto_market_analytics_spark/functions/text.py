"""Text-analysis column expressions for the training-data pipeline.

All pure Catalyst expressions (JVM-side, codegen'd) — language ID,
quality scoring, token counting, fingerprints, shingling.  Designed so
the same arithmetic is expressible in ANSI SQL for the DuckDB oracle
(replace-based substring counting instead of engine-specific regex
helpers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language marker lexicons for the n-gram/stopword heuristic
# language-ID.  Deliberately tiny and deterministic: the point is the
# *operator* (scalable scoring over marker hits), not lexicon quality.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "with", "fast"],
    "de": ["der", "und", "die", "nicht", "schnell"],
    "es": ["el", "los", "con", "rapido", "datos"],
    "fr": ["le", "les", "avec", "rapide", "donnees"],
    "zh": ["的", "数据", "快", "表", "行"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]


def occurrence_count(text: Column | str, needle: str) -> Column:
    """Count non-overlapping occurrences of ``needle`` via the
    replace-length trick: (len(x) - len(replace(x, n, ''))) / len(n).

    Chosen over regexp so the identical expression runs in any ANSI SQL
    oracle; stays inside whole-stage codegen.
    """
    c = F.col(text) if isinstance(text, str) else text
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def token_count(text: Column | str) -> Column:
    """Whitespace token count.  Single-space-delimited corpus assumption
    is normalized first (collapse runs of whitespace)."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        occurrence_count(norm, " ") + 1
    )


def word_token_count_bpe_ish(text: Column | str) -> Column:
    """Token count under a BPE-ish regex: words, numbers, or single
    non-space symbols — approximates subword tokenizer pre-splitting."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.filter(
            F.split(c, r"(?<=\W)|(?=\W)"),
            lambda t: F.trim(t) != "",
        )
    )


def stopword_hits(text: Column | str, words: list[str] | None = None) -> Column:
    """Total occurrences of stopwords as space-delimited tokens."""
    c = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    total = F.lit(0).cast("long")
    for w in words or STOPWORDS:
        total = total + occurrence_count(padded, f" {w} ")
    return total


def quality_score(text: Column | str) -> Column:
    """THE quality heuristic, defined once for every gated consumer
    (t_quality_score, t_corpus_filter's quality gate, dedup_canonical's
    survivor choice): 0.5·min(tokens/100, 1) + 0.5·min(5·stopword
    ratio, 1), rounded to 6dp; null for token-free docs.  Three oracle
    SQL strings mirror this formula — change it here and them
    together."""
    toks = token_count(text)
    hits = stopword_hits(text)
    ratio = F.when(toks > 0, hits / toks)
    return F.round(
        F.least(toks / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(ratio * 5, F.lit(1.0)) * 0.5,
        6,
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit score per language (heuristic language ID)."""
    c = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        score = F.lit(0).cast("long")
        for m in markers:
            if m.isascii():
                score = score + occurrence_count(padded, f" {m} ")
            else:
                score = score + occurrence_count(padded, m)
        out[lang] = score
    return out


def fingerprint_md5(text: Column | str) -> Column:
    """Exact-dedup document fingerprint: md5 of whitespace-normalized
    lowercase text.  md5 is bit-identical across engines → oracle-safe."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def hash64(col: Column | str) -> Column:
    """Portable 60-bit integer hash: first 15 hex digits of md5.

    Used as the base hash for MinHash/SimHash so the DuckDB oracle can
    reproduce it exactly (CAST('0x'||substr(md5(x),1,15) AS BIGINT)).
    xxhash64 would be faster but is Spark-specific; at 100 TB swap in
    F.xxhash64 and drop oracle parity.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_py(s: str) -> int:
    """Driver/state-side Python twin of :func:`hash64` — the SAME
    60-bit md5 value, for streaming keyed-state operators whose
    emissions must merge bit-for-bit with engine-built sketches
    (streaming/hll.py, streaming/countmin.py)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Array of all k-char shingles (positions 1..len-k+1) of the
    normalized text.  Expressed with sequence+transform — no explode yet,
    callers explode lazily so Catalyst can pipeline it."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(k)),
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Array of n-word shingles (token n-grams) of normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))), " ")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(n), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
