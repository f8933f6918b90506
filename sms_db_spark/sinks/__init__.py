"""Sinks: parquet store, SQLite store writer, single-document XML export."""
