"""Sinks: parquet store, JDBC-to-SQLite, single-document XML export."""
