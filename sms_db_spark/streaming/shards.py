"""Streaming training-shard materialization: the batch shard writer
(sinks/shards.py) run continuously — each microbatch lands its rows in
the same hash-derived shard layout, and the integrity manifest is
maintained incrementally because BOTH of its measures are additive
(counts sum; the content checksum is a sum of row hashes), so
per-batch stats merge to exactly the one-shot batch writer's manifest.
That additive-merge law is the same contract as the register sketches
and the CDC upsert state, applied to the trainer handoff — and it is
pinned by test: stream N drops, the merged manifest equals
write_training_shards' manifest on the same corpus. The layout, hash,
and checksum definitions are IMPORTED from sinks/shards.py (one
implementation), so the law cannot drift apart silently.

Layout: `_shard=K/_batch=B` (two partition levels). The shard level is
what the trainer consumes; the batch level is the exactly-once unit:

  - a REPLAYED or re-numbered microbatch first removes EVERY
    `_batch=B` directory for its own id and every id above it (same-id
    stale data from a pre-reset epoch can hide in shards the new
    batch's rows don't reach — dynamic overwrite alone would miss
    them), then appends its partitions fresh and replaces its manifest
    entry: at-least-once delivery cannot double-land rows or
    double-count stats, and two numbering epochs never mix;
  - the cleanup walk is manifest-gated: in steady state (no recorded
    batch id >= the current one) no tree listing happens at all — the
    O(shards x batches) walk runs only in the replay/reset case that
    created the stale dirs.

Manifest IO is Hadoop-FS + atomic rename (fsutil.read_text /
write_text_atomic): works on HDFS/S3A and a crash can never leave a
truncated manifest for the replay to trip over.

Maintenance note: the generic compactor is NOT aware of this two-level
layout and must not run on it. Cold shards are folded offline by
rewriting one `_shard=K` subtree into a single batch directory and
collapsing that shard's per-batch manifest entries into one — the
stats are additive, so the collapse is exact."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import hadoop_fs, read_text, write_text_atomic
from ..sinks.shards import check_shard_input, row_hash_col, shard_transform
from .windows import EVENT_SCHEMA  # noqa: F401 (one wire schema, see windows.py)

STREAM_MANIFEST = "_stream_manifest.json"


def _load_manifest(spark: SparkSession, shard_dir: str) -> dict:
    text = read_text(spark, os.path.join(shard_dir, STREAM_MANIFEST))
    return json.loads(text) if text else {"batches": {}}


def apply_shard_batch(
    batch: DataFrame, batch_id: int, shard_dir: str, n_shards: int, key: str
) -> None:
    """Land one microbatch into the shard layout, idempotently."""
    sess = batch.sparkSession
    check_shard_input(batch, key)
    manifest = _load_manifest(sess, shard_dir)
    jvm, fs = hadoop_fs(sess, shard_dir)
    base = jvm.org.apache.hadoop.fs.Path(shard_dir)
    # Own-batch landing MUST be idempotent regardless of manifest state:
    # a crash between the data append and the manifest write leaves
    # `_batch=<batch_id>` data with NO manifest entry, so a manifest-gated
    # purge would skip it and the replay would append the same rows twice
    # (permanent checksum failure). Always clear this id's dirs first —
    # one glob over `_shard=*/_batch=<batch_id>`, O(n_shards), cheap.
    if fs.exists(base):
        own = fs.globStatus(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(shard_dir, "_shard=*", f"_batch={batch_id}")
            )
        )
        for st in own or []:
            fs.delete(st.getPath(), True)
    stale_ids = {int(b) for b in manifest["batches"] if int(b) > batch_id}
    if stale_ids:
        # checkpoint reset: batch numbering restarted, so directories from
        # ids ABOVE the current one are a dead epoch — purge them all.
        # This walk stays manifest-gated (steady state never pays it);
        # dirs a crash orphaned above batch_id without a manifest entry
        # are unreachable to the restarted numbering only until it
        # re-reaches that id, at which point the own-id glob above
        # clears them.
        if fs.exists(base):
            for sh in fs.listStatus(base):
                if not sh.isDirectory() or not sh.getPath().getName().startswith(
                    "_shard="
                ):
                    continue
                for bt in fs.listStatus(sh.getPath()):
                    name = bt.getPath().getName()
                    if (
                        name.startswith("_batch=")
                        and int(name.split("=", 1)[1]) > batch_id
                    ):
                        fs.delete(bt.getPath(), True)
    sharded = (
        shard_transform(batch, n_shards, key)
        .withColumn("_batch", F.lit(batch_id))
        .localCheckpoint(eager=True)  # stats and write read the same rows
    )
    stats = (
        sharded.withColumn("_rh", row_hash_col(sharded.columns))
        .groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_rh").cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()
    )
    (
        sharded.write.mode("append")  # its own _batch dirs were purged above
        .partitionBy("_shard", "_batch")
        .parquet(shard_dir)
    )
    manifest["n_shards"] = n_shards
    manifest["key"] = key
    manifest["batches"] = {
        b: v for b, v in manifest["batches"].items() if int(b) < batch_id
    }
    manifest["batches"][str(batch_id)] = {
        str(int(r._shard)): {"n_rows": int(r.n_rows), "checksum": int(r.checksum)}
        for r in stats
    }
    write_text_atomic(
        sess,
        os.path.join(shard_dir, STREAM_MANIFEST),
        json.dumps(manifest, sort_keys=True, indent=1),
    )


def merged_manifest(spark: SparkSession, shard_dir: str) -> dict:
    """Fold the per-batch stats to the batch writer's manifest shape —
    counts and checksums are additive, so this is exact, not an estimate."""
    m = _load_manifest(spark, shard_dir)
    shards: dict = {}
    for per_batch in m["batches"].values():
        for sid, s in per_batch.items():
            cur = shards.setdefault(sid, {"n_rows": 0, "checksum": 0})
            cur["n_rows"] += s["n_rows"]
            cur["checksum"] += s["checksum"]
    return {
        "n_shards": m.get("n_shards"),
        "key": m.get("key"),
        "total_rows": sum(s["n_rows"] for s in shards.values()),
        "shards": shards,
    }


def verify_stream_shards(spark: SparkSession, shard_dir: str) -> dict:
    """The same integrity gate as sinks/shards.verify_shards, against the
    merged streaming manifest."""
    from ..sinks.shards import _shard_stats

    want = merged_manifest(spark, shard_dir)["shards"]
    got = _shard_stats(spark, shard_dir)
    bad = [int(s) for s in want if s in got and got[s] != want[s]]
    missing = [int(s) for s in want if s not in got]
    extra = sorted(int(s) for s in set(got) - set(want))
    return {
        "ok": not bad and not missing and not extra,
        "bad_shards": sorted(bad),
        "missing_shards": sorted(missing),
        "extra_shards": extra,
    }


def stream_shards(
    spark: SparkSession,
    drop_dir: str,
    shard_dir: str,
    checkpoint_dir: str,
    n_shards: int,
    key: str,
    schema=None,
):
    """Watch drop_dir for record batches (parquet); maintain the shard
    layout + incremental manifest. Returns the started StreamingQuery."""
    stream = spark.readStream.schema(schema or EVENT_SCHEMA).parquet(drop_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: apply_shard_batch(b, bid, shard_dir, n_shards, key)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
