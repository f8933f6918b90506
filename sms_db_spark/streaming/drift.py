"""Streaming distribution-drift monitor: q136's integer-TVD report
evaluated per microbatch against a precomputed REFERENCE profile of the
standing corpus — the continuous version of gate-on-distribution-shift,
and the distribution-level sibling of streaming/quality.py exactly as
q136 is q127's in batch.

The 100 TB discipline is in what gets compared: the standing corpus is
profiled ONCE (one map-side-combined groupBy per feature, folding 100 TB
to a |buckets|-row table) and carried as plain rows; each microbatch
then aggregates only ITSELF and full-outer-joins its bucket counts
against those few reference rows. No per-batch corpus rescan, no state
beyond the reference profile — the monitor's working set is bytes.

The arithmetic is `maintenance._drift_from_counts` — the SAME function
q136 runs, not a re-implementation — so a microbatch's tvd_milli equals
what q136 would report for that window by construction (pinned by
tests/test_streaming_drift.py). Integer milli-proportions make reports
diffable byte-for-byte across batches and engines.

Log protocol = metricslog.append_batch_report, the ONE implementation
shared with streaming/quality.py: each batch overwrites its own
`batch_id=<n>` partition (replay-idempotent), partitions numbered above
the current batch — possible only after a checkpoint reset restarted
numbering — are dropped so two numbering epochs never interleave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DRIFT_FEATURES is maintenance's: q136 and this monitor iterate the ONE
# list, so adding a feature extends batch and continuous reporting together
from ..operators.maintenance import DRIFT_FEATURES, _drift_from_counts
from .curation import DOCS_SCHEMA  # noqa: F401 (one wire schema for doc drops)
from .metricslog import append_batch_report, read_batch_log


def reference_profile(docs: DataFrame) -> dict[str, list[tuple[str, int]]]:
    """Profile the standing corpus once: per feature, its (bucket, count)
    table as plain rows. This is the ONLY pass over the corpus the
    monitor ever makes; the result is |buckets|-sized and serializable,
    so it can be computed at deploy time and shipped to the stream."""
    out: dict[str, list[tuple[str, int]]] = {}
    for name, bucket_fn in DRIFT_FEATURES:
        rows = (
            docs.select(bucket_fn().cast("string").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        out[name] = [(r.bucket, r.cnt) for r in rows]
    return out


def batch_drift(
    batch: DataFrame, ref: dict[str, list[tuple[str, int]]]
) -> DataFrame:
    """One microbatch's per-feature drift report vs the reference
    profile. The batch aggregates to its own bucket table; a full-outer
    join with zero-fill makes one-sided buckets count toward the TVD
    (a bucket the corpus has never seen is pure drift, and vice versa)."""
    spark = batch.sparkSession
    reports = None
    for name, bucket_fn in DRIFT_FEATURES:
        batch_counts = (
            batch.select(bucket_fn().cast("string").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt_a"))
        )
        ref_counts = spark.createDataFrame(
            ref[name], "bucket string, cnt_b long"
        )
        # NULL-SAFE join: q136 groups all NULL buckets into one row; an
        # equi-join would leave NULL keys unmatched and split that row
        # into two one-sided ones, inflating the TVD
        counts = (
            batch_counts.alias("a")
            .join(
                ref_counts.alias("b"),
                F.col("a.bucket").eqNullSafe(F.col("b.bucket")),
                "full_outer",
            )
            .select(
                F.coalesce("a.bucket", "b.bucket").alias("bucket"),
                F.coalesce("a.cnt_a", F.lit(0)).alias("cnt_a"),
                F.coalesce("b.cnt_b", F.lit(0)).alias("cnt_b"),
            )
        )
        report = _drift_from_counts(counts, name)
        reports = report if reports is None else reports.unionByName(report)
    return reports


def append_drift(
    batch: DataFrame,
    batch_id: int,
    ref: dict[str, list[tuple[str, int]]],
    log_dir: str,
) -> None:
    """Idempotent per-batch append under the shared log protocol
    (metricslog.append_batch_report). Empty microbatches log nothing —
    an empty window has no distribution, and a NULL-TVD row would
    poison trailing-window alerting math — but the protocol's hygiene
    still runs, so a reset's stale same/higher-numbered partitions are
    purged even when the new epoch's first batch is empty."""
    report = None if batch.isEmpty() else batch_drift(batch, ref)
    append_batch_report(batch.sparkSession, log_dir, batch_id, report)


def read_drift_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """All per-batch drift reports; empty frame at stream bootstrap."""
    return read_batch_log(
        spark,
        log_dir,
        ["batch_id", "feature", "n_a", "n_b", "n_buckets", "tvd_milli", "top_bucket"],
        "batch_id int, feature string, n_a bigint, n_b bigint,"
        " n_buckets bigint, tvd_milli bigint, top_bucket string",
    )


def stream_drift_monitor(
    spark: SparkSession,
    drop_dir: str,
    ref: dict[str, list[tuple[str, int]]],
    log_dir: str,
    checkpoint_dir: str,
):
    """Watch drop_dir for document batches; maintain the drift log."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(drop_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: append_drift(b, bid, ref, log_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
