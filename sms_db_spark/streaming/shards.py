"""Streaming training-shard materialization: the batch shard writer
(sinks/shards.py) run continuously — each microbatch lands its rows in
the same hash-derived shard layout, and the integrity manifest is
maintained incrementally because BOTH of its measures are additive
(counts sum; the content checksum is a sum of row hashes), so
per-batch stats merge to exactly the one-shot batch writer's manifest.
That additive-merge law is the same contract as the register sketches
and the CDC upsert state, applied to the trainer handoff — and it is
pinned by test: stream N drops, the merged manifest equals
write_training_shards' manifest on the same corpus.

Layout: `_shard=K/_batch=B` (two partition levels). The shard level is
what the trainer consumes; the batch level is the exactly-once unit:

  - a REPLAYED microbatch rewrites exactly its own `_batch=B`
    partitions (per-write dynamic partition overwrite — the
    backfill_day mechanism) and replaces its own manifest entry, so
    at-least-once delivery cannot double-land rows or double-count
    stats;
  - after a CHECKPOINT RESET restarts numbering, data partitions and
    manifest entries with batch ids above the current one are dropped
    (the upsert/quality stale-epoch hygiene), so two numbering epochs
    never mix.

At scale, periodic compaction (sinks/compaction.py) folds the
accumulated `_batch=B` sub-files of cold shards into target-size files
without touching the manifest totals (content is checksum-invariant
under re-layout)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import hadoop_fs
from ..operators.sketches import _h60
from .upsert import EVENT_SCHEMA  # noqa: F401 (drop-dir schema re-export)

STREAM_MANIFEST = "_stream_manifest.json"


def _load_manifest(shard_dir: str) -> dict:
    p = os.path.join(shard_dir, STREAM_MANIFEST)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {"batches": {}}


def apply_shard_batch(
    batch: DataFrame, batch_id: int, shard_dir: str, n_shards: int, key: str
) -> None:
    """Land one microbatch into the shard layout, idempotently."""
    sess = batch.sparkSession
    keyed = batch.withColumn("_kh", _h60(F.col(key).cast("string")))
    sharded = (
        keyed.withColumn("_shard", F.pmod(F.col("_kh"), F.lit(n_shards)))
        .withColumn("_batch", F.lit(batch_id))
        .repartitionByRange(n_shards, "_shard")
        .sortWithinPartitions("_kh")
        .drop("_kh")
    )
    data_cols = sorted(c for c in batch.columns if not c.startswith("_"))
    row_hash = _h60(
        F.concat_ws(
            "\x01",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in data_cols],
        )
    )
    # stats BEFORE the write, from the same checkpointed rows the write
    # lands (a microbatch frame is already deterministic within foreachBatch)
    sharded = sharded.localCheckpoint(eager=True)
    stats = (
        sharded.withColumn("_rh", row_hash)
        .groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_rh").cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()
    )
    (
        sharded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")  # replay rewrites only its _batch
        .partitionBy("_shard", "_batch")
        .parquet(shard_dir)
    )
    # stale-epoch hygiene: data + manifest entries above this batch id can
    # only exist after a checkpoint reset — drop both
    jvm, fs = hadoop_fs(sess, shard_dir)
    base = jvm.org.apache.hadoop.fs.Path(shard_dir)
    if fs.exists(base):
        for sh in fs.listStatus(base):
            if not sh.isDirectory() or not sh.getPath().getName().startswith("_shard="):
                continue
            for bt in fs.listStatus(sh.getPath()):
                name = bt.getPath().getName()
                if name.startswith("_batch=") and int(name.split("=", 1)[1]) > batch_id:
                    fs.delete(bt.getPath(), True)
    manifest = _load_manifest(shard_dir)
    manifest["n_shards"] = n_shards
    manifest["key"] = key
    manifest["batches"] = {
        b: v for b, v in manifest["batches"].items() if int(b) <= batch_id
    }
    manifest["batches"][str(batch_id)] = {
        str(int(r._shard)): {"n_rows": int(r.n_rows), "checksum": int(r.checksum)}
        for r in stats
    }
    with open(os.path.join(shard_dir, STREAM_MANIFEST), "w") as fh:
        json.dump(manifest, fh, sort_keys=True, indent=1)


def merged_manifest(shard_dir: str) -> dict:
    """Fold the per-batch stats to the batch writer's manifest shape —
    counts and checksums are additive, so this is exact, not an estimate."""
    m = _load_manifest(shard_dir)
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

    want = merged_manifest(shard_dir)["shards"]
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
