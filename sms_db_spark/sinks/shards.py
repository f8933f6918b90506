"""Training-shard writer: materialize a curated corpus as N balanced,
deterministically-shuffled shards plus an integrity manifest — the
handoff artifact from the data pipeline to the trainer.

What a trainer needs from the materialization step, each made explicit:
  - decorrelation from ingestion order (a crawl's temporal/domain
    clustering must not become batch structure): records are shuffled by
    a HASH of their stable key, not by random() — so the shuffle is
    reproducible run-to-run and stable under corpus growth, the same
    property q77/q78 use for splits/sampling (sms-db.pl's re-runnable
    imports, lifted to training prep);
  - balanced shards (stragglers in the data-loading path waste
    accelerator time): shard = key-hash mod N, uniform by construction;
  - a MANIFEST with per-shard row counts and order-insensitive content
    checksums, so the trainer can verify what it is about to consume
    without trusting the filesystem (half-copied shards, a lost file,
    or a partial overwrite all surface as a checksum mismatch BEFORE
    a multi-day run starts).

Scale shape: one hash shuffle (the repartition to shards); the within-
shard sort is per-partition; the manifest aggregation is map-side
combined (one decimal sum + count per shard). At 100 TB none of this
touches the driver beyond N manifest rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_training_manifest.json"


def _h60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def write_training_shards(
    df: DataFrame, path: str, n_shards: int, key: str
) -> dict:
    """Write df as n_shards hash-sharded, hash-ordered parquet shards
    under path (dirs `shard=K`), plus the manifest. Returns the manifest
    dict. `key` must be a stable unique record id (doc_id-like): it
    drives the shuffle, the shard assignment, and the checksum."""
    keyed = df.withColumn("_kh", _h60(F.col(key).cast("string")))
    sharded = keyed.withColumn("_shard", F.pmod(F.col("_kh"), F.lit(n_shards)))
    (
        sharded.repartition(n_shards, "_shard")
        .sortWithinPartitions("_kh")  # reproducible record order per shard
        .drop("_kh")
        .write.mode("overwrite")
        .partitionBy("_shard")
        .parquet(path)
    )
    stats = (
        sharded.groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_kh").cast("decimal(38,0)")).alias("checksum"),  # order-insensitive, exact (decimal: 2^60-sized terms overflow int64)
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "key": key,
        "total_rows": int(sum(r.n_rows for r in stats)),
        "shards": {
            int(r._shard): {"n_rows": int(r.n_rows), "checksum": int(r.checksum)}
            for r in stats
        },
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, sort_keys=True, indent=1)
    return manifest


def verify_shards(spark: SparkSession, path: str) -> dict:
    """Recompute per-shard counts and checksums from the actual files and
    compare with the manifest: the pre-training integrity gate. Returns
    {'ok': bool, 'bad_shards': [...], 'missing_shards': [...]}."""
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    key = manifest["key"]
    got = {
        int(r._shard): (int(r.n_rows), int(r.checksum))
        for r in spark.read.parquet(path)
        .withColumn("_kh", _h60(F.col(key).cast("string")))
        .groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_kh").cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()
    }
    bad, missing = [], []
    for sid, want in manifest["shards"].items():
        sid = int(sid)
        if sid not in got:
            missing.append(sid)
        elif got[sid] != (want["n_rows"], want["checksum"]):
            bad.append(sid)
    extra = sorted(set(got) - {int(s) for s in manifest["shards"]})
    return {
        "ok": not bad and not missing and not extra,
        "bad_shards": sorted(bad),
        "missing_shards": sorted(missing),
        "extra_shards": extra,
    }
