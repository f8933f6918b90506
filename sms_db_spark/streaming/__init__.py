"""Structured Streaming ingest: the reference's incremental multi-invocation
accumulation pattern (README.md:39-43) as a stream."""
