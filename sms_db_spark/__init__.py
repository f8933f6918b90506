"""sms_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tmo1/sms-db (reference: /root/reference),
re-expressed Spark-first and extended with large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
  schemas     — canonical StructTypes for the two-table store (ref sms-db.pl:49,53)
  session     — tuned SparkSession factory (AQE, Arrow, UTC)
  tables      — parquet test-table loaders
  functions/  — scalar expression + hashing helpers (ref §2.2 operators)
  plans/      — named query surface with DuckDB oracle twins
  sources/    — XML / Bugle / Signal importer normalizers (ref sms-db.pl:63-229)
  sinks/      — SQLite store writer + XML export (ref sms-db.pl:235-313)
  operators/  — dedup, similarity, text-analysis, multimodal extensions
  streaming/  — incremental ingest as Structured Streaming
"""

__version__ = "0.1.0"
DATABASE_VERSION = 2  # parity with ref sms-db.pl:38 (PRAGMA user_version = 2)
