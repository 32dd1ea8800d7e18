"""Sources: REST collectors (driver-side fetch → DataFrame) and
tolerant file scans (SURVEY.md §2.1 S1-S12)."""
