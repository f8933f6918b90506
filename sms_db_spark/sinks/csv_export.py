"""CSV export (SURVEY §2.1 S7): the documented `sqlite3 -csv` query
(README.md:103-105 — messages ⋈ parts, content_type LIKE 'text%', ordered
by timestamp) as a distributed CSV write.

Scale note: coalesce(1) reproduces the reference's single-file contract;
for a 100 TB export drop the coalesce and write a sharded directory (the
default Spark shape) — the frame is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def text_export_frame(messages: DataFrame, parts: DataFrame) -> DataFrame:
    """The documented export join (README.md:105), ordered + total-order
    tiebroken so the CSV is byte-stable run-to-run."""
    return (
        messages.join(parts, messages._id == parts.message_id)
        .filter(F.col("content_type").like("text%"))
        .select(
            F.col("timestamp"),
            F.col("sender_address"),
            F.col("sender_name"),
            F.col("recipient_address"),
            F.col("recipient_name"),
            F.col("text"),
        )
        .orderBy("timestamp", "sender_address", "text")
    )


def export_csv(messages: DataFrame, parts: DataFrame, path: str, single_file: bool = True) -> None:
    frame = text_export_frame(messages, parts)
    if single_file:
        frame = frame.coalesce(1)
    frame.write.mode("overwrite").option("header", "true").csv(path)
