"""Bucketed table layout: pre-shuffle data ONCE at write time so repeated
joins/aggregations on the bucket key run with ZERO exchanges.

This is the storage-side half of the scale story (README rule 2): at
100 TB the canonical store is written bucketed by its join key
(messages._id / parts.message_id), so the flagship messages x parts join
— and every J10/J11-shaped query after it — never shuffles the fact
tables again. Spark persists bucket metadata in the session catalog;
both sides bucketed by the same key and count -> SortMergeJoin with no
Exchange (verified by tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Write df as a parquet table bucketed (and sorted) by bucket_col.

    n_buckets at real scale: size so one bucket of the largest co-bucketed
    table fits an executor's memory (e.g. 100 TB / 16384 buckets ~ 6 GB).
    """
    writer = (
        df.write.format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
