"""Batch analytics pipeline (the reference's binance_analysis.py main
flow re-expressed as one cached DataFrame DAG + branched aggregates)."""
