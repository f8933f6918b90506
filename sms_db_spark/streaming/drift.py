"""Streaming distribution-drift monitor: q136's integer-TVD report
evaluated per microbatch against a precomputed REFERENCE profile of the
standing corpus — the continuous version of gate-on-distribution-shift,
and the distribution-level sibling of streaming/quality.py exactly as
q136 is q127's in batch.

The 100 TB discipline is in what gets compared: the standing corpus is
profiled ONCE — one scan computing every feature's bucket column in the
same projection, one map-side-combined groupBy folding 100 TB to a
|features × buckets|-row table — and carried as plain rows; each
microbatch then scans only ITSELF (also once, all features) and merges
its bucket counts with those few reference rows by plain dict union.
No per-batch corpus rescan, no per-feature rescan of anything, no
state beyond the reference profile — the monitor's working set is
bytes.

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
from .shards import apply_shard_batch, skip_shard_batch


def reference_profile(docs: DataFrame) -> dict[str, list[tuple[str, int]]]:
    """Profile the standing corpus in ONE scan: per feature, its
    (bucket, count) table as plain rows. Every feature's bucket column
    is computed in the same projection (explode of a per-row
    feature/bucket struct array), so N monitored features still cost
    one pass over 100 TB, not N; the result is |features × buckets|
    rows — serializable, computable at deploy time, shippable to the
    stream. Raises on an empty corpus: a distribution over nothing is
    not a reference, and logging drift against it would produce the
    NULL-TVD rows the append guard exists to keep out."""
    rows = _bucket_counts(docs)
    if not rows:
        raise ValueError(
            "reference corpus is empty — cannot profile a distribution over no rows"
        )
    out: dict[str, list[tuple[str, int]]] = {name: [] for name, _ in DRIFT_FEATURES}
    for r in rows:
        out[r.feature].append((r.bucket, r.cnt))
    return out


def _bucket_counts(df: DataFrame):
    """(feature, bucket, cnt) rows for ALL monitored features in one
    scan: per row, an array of (feature, bucket) structs is exploded,
    then one map-side-combined groupBy folds to |features × buckets|."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("feature"),
                    fn().cast("string").alias("bucket"),
                )
                for name, fn in DRIFT_FEATURES
            ]
        )
    )
    return (
        df.select(pairs.alias("p"))
        .groupBy(F.col("p.feature").alias("feature"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )


def batch_drift(
    batch: DataFrame, ref: dict[str, list[tuple[str, int]]]
) -> DataFrame | None:
    """One microbatch's per-feature drift report vs the reference
    profile, or None for an empty batch (no distribution to compare).

    The batch is scanned ONCE for all features (`_bucket_counts` — the
    streaming hot path re-reads no input file per feature and needs no
    separate isEmpty probe). The bucket-count merge with the reference
    is a plain dict union over the two tiny tables — zero-fill for
    one-sided buckets, so a bucket the corpus has never seen is pure
    drift, and NULL buckets stay ONE key exactly as q136's groupBy
    treats them. Only the merged |buckets|-row table goes back to
    Spark, where `_drift_from_counts` — q136's own arithmetic — runs."""
    spark = batch.sparkSession
    batch_rows = _bucket_counts(batch)
    if not batch_rows:
        return None
    by_feature: dict[str, dict] = {name: {} for name, _ in DRIFT_FEATURES}
    for r in batch_rows:
        by_feature[r.feature][r.bucket] = r.cnt
    reports = None
    for name, _ in DRIFT_FEATURES:
        cnt_a = by_feature[name]
        cnt_b = dict(ref[name])
        merged = [
            (bucket, cnt_a.get(bucket, 0), cnt_b.get(bucket, 0))
            for bucket in set(cnt_a) | set(cnt_b)
        ]
        counts = spark.createDataFrame(
            merged, "bucket string, cnt_a long, cnt_b long"
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
    append_batch_report(
        batch.sparkSession, log_dir, batch_id, batch_drift(batch, ref)
    )


# Gate threshold: total-variation distance in milli-units (0..1000).
# 1000 = fully disjoint distributions; a healthy microbatch of the same
# corpus sits near sampling noise. The default is deliberately generous
# — the gate exists to stop wholesale shift (a crawler pointed at the
# wrong source, a language filter dropped), not to flap on noise.
DEFAULT_MAX_TVD_MILLI = 300


def drift_gated_shard_batch(
    batch: DataFrame,
    batch_id: int,
    ref: dict[str, list[tuple[str, int]]],
    log_dir: str,
    shard_dir: str,
    n_shards: int,
    key: str,
    max_tvd_milli: int = DEFAULT_MAX_TVD_MILLI,
) -> dict:
    """Drift-verdict gating composed into the day-2 chain: the drift
    report is computed and logged FIRST (the log records quarantined
    batches too — that is the alerting surface), then the batch reaches
    `apply_shard_batch` ONLY if every monitored feature's TVD against
    the reference profile stays under `max_tvd_milli`. This mirrors the
    quality gate's contract (test_day2_pipeline: audit verdict pauses
    the upsert): the gate DECIDES, the materializer never sees a
    quarantined batch, and because the skip happens before any shard
    write, a drifted batch leaves the layout and its manifest
    byte-identical — pinned by test_streaming_drift.

    Replay safety: a quarantined batch re-delivered by foreachBatch
    recomputes the same verdict (the reference profile is fixed rows),
    and the log append is idempotent per batch_id — so at-least-once
    delivery cannot sneak a quarantined batch in on the second try.

    A batch that does NOT land still runs the layout's landing hygiene
    (`skip_shard_batch`): after a checkpoint reset, the new epoch's
    first batch may be empty or quarantined, and skipping the purge
    would leave the dead epoch's directories and manifest entries for
    later clean batches to splice against (they only purge ids >=
    their own). Gate decisions must not weaken the exactly-once layout.

    Returns {'applied', 'empty', 'max_tvd_milli', 'worst_feature'} —
    bounded driver metadata, same shape discipline as the manifests.
    """
    report = batch_drift(batch, ref)
    append_batch_report(batch.sparkSession, log_dir, batch_id, report)
    if report is None:  # empty window: nothing to judge, nothing to shard
        skip_shard_batch(batch.sparkSession, shard_dir, batch_id)
        return {
            "applied": False,
            "empty": True,
            "max_tvd_milli": None,
            "worst_feature": None,
        }
    # |features| rows of already-tiny aggregate — bounded metadata
    worst = max(
        report.select("feature", "tvd_milli").collect(),
        key=lambda r: (r.tvd_milli, r.feature),
    )
    verdict = {
        "applied": False,
        "empty": False,
        "max_tvd_milli": int(worst.tvd_milli),
        "worst_feature": worst.feature,
    }
    if worst.tvd_milli >= max_tvd_milli:
        # quarantined: the layout never sees the rows, but its epoch
        # hygiene still runs
        skip_shard_batch(batch.sparkSession, shard_dir, batch_id)
        return verdict
    apply_shard_batch(batch, batch_id, shard_dir, n_shards, key)
    return {**verdict, "applied": True}


def stream_gated_shards(
    spark: SparkSession,
    drop_dir: str,
    ref: dict[str, list[tuple[str, int]]],
    log_dir: str,
    shard_dir: str,
    checkpoint_dir: str,
    n_shards: int,
    key: str,
    max_tvd_milli: int = DEFAULT_MAX_TVD_MILLI,
):
    """streaming/shards.stream_shards with the drift gate in front:
    watch drop_dir for document batches, log drift per batch, and
    materialize only undrifted batches into the shard layout."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(drop_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: drift_gated_shard_batch(
                b, bid, ref, log_dir, shard_dir, n_shards, key, max_tvd_milli
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


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
