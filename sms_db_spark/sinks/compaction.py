"""Small-file compaction: rewrite a fragmented parquet store into
target-size files without changing its rows or its partition layout.

The day-2 write-path problem every 100 TB store develops: streaming
ingest (streaming/ingest.py appends one file set per microbatch),
partitioned writes without repartitioning, and incremental re-imports
(the reference's per-backup-file invocations, README.md:39-43) all
fragment a store into files far below the scan-efficient size. Each
parquet file costs a listing entry, a footer read, and a scheduling
unit — at 10^6 files the METADATA dominates the query, before a single
row is read.

Spark-first shape: compaction is just `read → repartition(n) → write`,
letting the parquet scan coalesce splits and the shuffle-free coalesce
(or a hash repartition when re-clustering) size the output. The value
here is the sizing policy and the safety contract:

  - target file count = ceil(input_bytes / target_bytes), measured from
    the actual file listing (never guessed from row counts);
  - `coalesce`, not `repartition`, when only merging (no shuffle: each
    output task reads whole input files);
  - partitioned stores compact per partition directory, preserving the
    Hive layout (and pruning) exactly;
  - write-new-then-swap: the rewrite lands in a staging dir and replaces
    the store only after success — readers never see a half-compacted
    store, and a failed compaction leaves the original untouched.

At real scale this runs as the background maintenance job per partition
(newest partitions fragment; old ones are already compact — the
`fragmentation` report is what picks targets)."""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..fsutil import atomic_swap, hadoop_fs

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # the HDFS-block-sized default


def _data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of every parquet data file under path, recursively."""
    jvm, fs = hadoop_fs(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(path), True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet") and not name.startswith("_"):
            out.append((st.getPath().toString(), st.getLen()))
    return out


def fragmentation_report(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """The pick-targets report: file count, total bytes, mean file size,
    and the file count a compaction would produce.

    A Hive-partitioned store can never have fewer files than partition
    directories, so the achievable target is bounded below by the
    number of distinct partition dirs — without that bound a compacted
    partitioned store would report fragmented forever and every
    maintenance cycle would rewrite it again."""
    files = _data_files(spark, path)
    total = sum(b for _, b in files)
    n_dirs = len({f.rsplit("/", 1)[0] for f, _ in files if "=" in f.rsplit("/", 2)[-2]})
    floor_files = max(1, n_dirs)
    n_after = max(floor_files, math.ceil(total / target_bytes)) if files else 0
    return {
        "n_files": len(files),
        "total_bytes": total,
        "mean_bytes": total // len(files) if files else 0,
        "n_partition_dirs": n_dirs,
        "n_files_after": n_after,
        "fragmented": len(files) > n_after,
    }


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    partition_cols: list[str] | None = None,
) -> dict:
    """Rewrite the store at `path` into ceil(bytes/target) files (per
    partition directory when partition_cols is given), atomically via a
    staging dir + rename swap. Returns the before/after report.

    Rows are preserved exactly (tests pin count + content hash); only
    the file layout changes. Coalesce keeps the rewrite shuffle-free.
    """
    report = fragmentation_report(spark, path, target_bytes)
    if not report["fragmented"]:
        return {**report, "compacted": False}
    jvm, fs = hadoop_fs(spark, path)
    staged = path.rstrip("/") + ".compacting"
    backup = path.rstrip("/") + ".precompact"
    df = spark.read.parquet(path)
    if partition_cols:
        # per-partition sizing: repartition by the layout keys so each
        # partition directory is written by its own task set, then let
        # partitionBy reproduce the exact Hive layout
        (
            df.repartition(report["n_files_after"], *[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(staged)
        )
    else:
        df.coalesce(report["n_files_after"]).write.mode("overwrite").parquet(staged)
    # verify BEFORE swapping: a failed rewrite must never replace the store
    n_in = spark.read.parquet(path).count()
    n_out = spark.read.parquet(staged).count()
    if n_in != n_out:
        fs.delete(jvm.org.apache.hadoop.fs.Path(staged), True)
        raise RuntimeError(f"compaction row mismatch: {n_in} != {n_out}")
    atomic_swap(spark, path, staged, backup)
    after = fragmentation_report(spark, path, target_bytes)
    return {**report, "compacted": True, "n_files_final": after["n_files"]}
