"""The ONE per-batch metrics-log protocol, shared by every streaming
monitor (quality, drift): each batch owns the `batch_id=<n>` partition
of a parquet log and overwrites it wholesale, so foreachBatch's
at-least-once replay is an idempotent upsert; partitions numbered above
the current batch — possible only after a checkpoint reset restarted
numbering — are dropped, so two numbering epochs never interleave.

A batch that legitimately logs nothing (report=None) still runs the
hygiene: its OWN partition is purged too, because a same-numbered
partition can only be a previous numbering epoch's report and leaving
it would splice pre-reset data into the new epoch's log.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..fsutil import hadoop_fs, numbered_child_dirs


def append_batch_report(
    sess: SparkSession, log_dir: str, batch_id: int, report: DataFrame | None
) -> None:
    """Land one batch's report (or None) under the log protocol."""
    if report is not None:
        part = os.path.join(log_dir, f"batch_id={batch_id}")
        report.coalesce(1).write.mode("overwrite").parquet(part)
    jvm, fs = hadoop_fs(sess, log_dir)
    for bid, name in numbered_child_dirs(sess, log_dir, "batch_id="):
        if bid > batch_id or (report is None and bid == batch_id):
            # a silently-failed delete leaves a stale epoch spliced into
            # the log — the exact corruption this protocol exists to stop
            if not fs.delete(jvm.org.apache.hadoop.fs.Path(f"{log_dir}/{name}"), True):
                raise RuntimeError(f"metrics-log purge failed deleting {log_dir}/{name}")


def read_batch_log(
    spark: SparkSession, log_dir: str, columns: list[str], fallback_schema: str
) -> DataFrame:
    """All per-batch reports; an empty/new log yields an empty frame,
    not an error — monitors must be safe to query at stream bootstrap.
    basePath keeps batch_id as a partition column."""
    from pyspark.sql.utils import AnalysisException

    try:
        return (
            spark.read.option("basePath", log_dir)
            .parquet(os.path.join(log_dir, "batch_id=*"))
            .select(*columns)
        )
    except AnalysisException:
        return spark.createDataFrame([], fallback_schema)
