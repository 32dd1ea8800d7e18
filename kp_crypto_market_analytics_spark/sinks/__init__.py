"""Sinks: partitioned parquet, key-based upsert, CSV/JSON artifacts
(SURVEY.md §2.1 S13-S17)."""
