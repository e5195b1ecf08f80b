"""kinesis_test_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference streaming consumer
(`rtacconi/kinesis-test`, surveyed in SURVEY.md) as an idiomatic Spark
engine: declarative DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the ingest path, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
the north star mandates.

Layout:
    session.py    — SparkSession factory (AQE, Arrow, UTC, tuned shuffles)
    sources/      — batch table loaders + streaming source builders
    operators/    — relational core, dedup, similarity, text, multimodal
    functions/    — scalar function families (string/url/date/array/json)
    streaming/    — Structured Streaming pipelines (ingest→dedup→sink)
    plans/        — plan introspection helpers (pushdown/broadcast checks)
    registry.py   — query + DuckDB-oracle registry backing __spark_entry__
"""

__version__ = "0.1.0"
