"""kp_crypto_market_analytics_spark — a PySpark-native analytics engine.

Re-expresses the computational surface of the reference pipeline
(nukk44/kp-crypto-market-analytics: crypto-market ETL + batch analytics,
see SURVEY.md) as an idiomatic Spark DataFrame/SQL engine, extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design principles (100 TB first):
- Declarative DataFrame/SQL plans; Catalyst/Tungsten pick physical strategy.
- Built-in JVM expressions in hot paths; Pandas UDFs only where numpy is
  genuinely required (vector math); no row-at-a-time Python UDFs.
- Broadcast small dimensions, partition/bucket big facts, AQE on.
"""

from kp_crypto_market_analytics_spark.session import get_spark

__all__ = ["get_spark"]
