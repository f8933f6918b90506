"""Hive-partitioned store layout: the time-axis half of the storage scale
story (bucketing in sinks/bucketed.py is the join-key half).

At 100 TB the canonical store and the events stream are written
partitioned by a coarse time key (daily). Every timestamp-ranged query —
Q4's BETWEEN (querying.md:25), the export's ORDER BY timestamp scan
(sms-db.pl:242,255), incremental re-imports — then touches only the
matching partition directories: partition PRUNING happens at file-listing
time, before a single row is read. With ~1000 daily partitions over
100 TB, a one-week query scans ~0.7% of the data.

Partition key guidance: daily keys keep file counts bounded (hourly x
years explodes the Hive metastore listing); within a partition, files are
sorted by the fine-grained timestamp at write time so min/max row-group
stats (parquet predicate pushdown) prune the residual range.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_day(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    repartition_by_day: bool = True,
) -> None:
    """Write df as parquet partitioned by the UTC day of ts_col.

    repartition_by_day co-locates each day's rows into one task before the
    write — without it every task writes a file into every day directory
    (tasks x days small files, the classic partitioned-write mistake).
    Skew note: at real scale a hot day can exceed one task; add a salt
    column to the repartition (not the layout) to split it.
    """
    out = df.withColumn("event_date", F.to_date(F.col(ts_col)))
    if repartition_by_day:
        out = out.repartition("event_date")
    (
        out.sortWithinPartitions(ts_col)
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan the partitioned store; `event_date` predicates prune
    directories (visible as PartitionFilters in the physical plan)."""
    return spark.read.parquet(path)


def day_slice(spark: SparkSession, path: str, start_date: str, end_date: str) -> DataFrame:
    """The canonical pruned range scan: BETWEEN on the partition key."""
    df = read_partitioned(spark, path)
    return df.filter(
        (F.col("event_date") >= F.lit(start_date)) & (F.col("event_date") <= F.lit(end_date))
    )


def partition_dirs(path: str) -> list[str]:
    return sorted(d for d in os.listdir(path) if d.startswith("event_date="))


def backfill_day(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Idempotent single-partition backfill: rewrite ONLY the day
    directories present in df, leaving every other partition's files
    untouched (byte-identical, not rewritten).

    Dynamic partition overwrite is THE correction workflow at 100 TB: a
    bad upstream day is recomputed and re-landed without touching the
    other ~999 partitions — static overwrite mode would instead drop the
    whole table root. The mode is passed as a PER-WRITE option, so no
    session conf changes and the caller's overwrite semantics elsewhere
    are untouched.
    """
    out = df.withColumn("event_date", F.to_date(F.col(ts_col)))
    (
        out.repartition("event_date")
        .sortWithinPartitions(ts_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(path)
    )
