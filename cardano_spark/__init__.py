"""cardano_spark — a PySpark-native analytics & ETL engine.

Re-expresses the capabilities of the reference batch-ETL system
(Eugene2710/cardano, surveyed in SURVEY.md) as an idiomatic Spark
engine: declarative DataFrame lineage (raw JSON -> normalized tables
-> idempotent merge sink), watermark-driven incrementality, and a
Spark SQL analytics surface — plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
columns) the reference never had.

Layout
------
- ``session``    SparkSession factory with scale-aware defaults
- ``catalog``    loaders for the synthetic test tables
- ``schemas``    single-source-of-truth StructTypes (mirrors
                 ``database_management/cardano/cardano_tables.py``)
- ``operators``  relational / dedup / similarity / text / multimodal ops
- ``functions``  scalar column expressions (SURVEY §2.9 C1-C12)
- ``sources``    JSON/CSV/parquet readers, incremental file listing,
                 rate-limited HTTP fetch-map
- ``sinks``      idempotent merge sink (staging + anti-join / ON CONFLICT)
- ``pipelines``  provider->raw->transformed->merged pipelines (E1-E3)
- ``plans``      the query inventory + DuckDB oracle SQL
- ``streaming``  Structured Streaming variants of the incremental loads
"""

__version__ = "0.1.0"
