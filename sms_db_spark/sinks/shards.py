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
    accelerator time): shard = key-hash mod N, uniform by construction,
    and the write is range-partitioned on the shard id so each shard is
    exactly one task's output — no birthday-collision stragglers;
  - a MANIFEST with per-shard row counts and order-insensitive CONTENT
    checksums (hash over every column, not just the key), so the
    trainer can verify what it is about to consume without trusting the
    filesystem: a half-copied shard, a lost file, or stale rows smuggled
    in under the same ids all surface as a mismatch BEFORE a multi-day
    run starts. Stats are recomputed from the WRITTEN files (the same
    read path verify_shards uses), so the manifest can never disagree
    with the bytes on disk, and the upstream pipeline executes once.

The column names `_shard` and `_batch` are RESERVED bookkeeping (the
only names excluded from the content checksum); input frames carrying
them are refused rather than silently half-checksummed. Manifest IO
goes through the Hadoop FS API (fsutil.read_text / write_text_atomic):
works on HDFS/S3A, and the atomic write means a crash can never leave
a truncated manifest.

Layout note: shard directories are named `_shard=K` (Spark's hidden-path
filter exempts names containing '='; the bare `_training_manifest.json`
relies on the opposite behavior to stay invisible to the parquet scan).

Scale shape: one range shuffle (the shard write); the within-shard sort
is per-partition; the manifest aggregation over the written files is
map-side combined (one decimal sum + count per shard). At 100 TB none
of this touches the driver beyond N manifest rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import read_text, write_text_atomic
from ..operators.sketches import _h60

MANIFEST_NAME = "_training_manifest.json"
RESERVED_COLS = ("_shard", "_batch")


def check_shard_input(df: DataFrame, key: str) -> None:
    """The shared input contract: no reserved bookkeeping columns, and a
    total (non-null) shard key."""
    clash = [c for c in df.columns if c in RESERVED_COLS]
    if clash:
        raise ValueError(
            f"shard writer: input columns {clash} collide with reserved "
            "bookkeeping names"
        )
    if df.filter(F.col(key).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"shard writer: NULL {key!r} keys — shard assignment and the "
            "reproducible shuffle need a total, non-null key"
        )


def row_hash_col(columns: list[str]) -> Column:
    """THE content-hash definition (single implementation: manifest
    build, verification, and the streaming writer must always agree):
    null-safe concat of every non-reserved column, sorted by name."""
    data_cols = sorted(c for c in columns if c not in RESERVED_COLS)
    return _h60(
        F.concat_ws(
            "\x01",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in data_cols],
        )
    )


def shard_transform(df: DataFrame, n_shards: int, key: str) -> DataFrame:
    """THE shard layout definition: hash-assigned `_shard`, rows
    range-partitioned one-shard-per-task and hash-ordered within."""
    return (
        df.withColumn("_kh", _h60(F.col(key).cast("string")))
        .withColumn("_shard", F.pmod(F.col("_kh"), F.lit(n_shards)))
        # range partitioning: exactly one shard per write task (hash
        # partitioning would birthday-collide shards into the same task)
        .repartitionByRange(n_shards, "_shard")
        .sortWithinPartitions("_kh")  # reproducible record order per shard
        .drop("_kh")
    )


def shard_stats(df: DataFrame) -> dict:
    """Per-shard (n_rows, content checksum) of a `_shard`-tagged frame."""
    rows = (
        df.withColumn("_rh", row_hash_col(df.columns))
        .groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_rh").cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()
    )
    return {
        str(int(r._shard)): {"n_rows": int(r.n_rows), "checksum": int(r.checksum)}
        for r in rows
    }


def _shard_stats(spark: SparkSession, path: str) -> dict:
    """shard_stats over the files on disk — shared by the manifest build
    and verify_shards so the two can never use different definitions of
    'content'."""
    return shard_stats(spark.read.parquet(path))


def write_training_shards(df: DataFrame, path: str, n_shards: int, key: str) -> dict:
    """Write df as n_shards hash-sharded, hash-ordered parquet shards
    under path (dirs `_shard=K`), plus the manifest. Returns the
    manifest dict, JSON-identical to the stored file (shard ids are
    string keys). `key` must be a stable, NON-NULL unique record id
    (doc_id-like): it drives the shuffle and the shard assignment."""
    check_shard_input(df, key)
    (
        shard_transform(df, n_shards, key)
        .write.mode("overwrite")
        .partitionBy("_shard")
        .parquet(path)
    )
    shards = _shard_stats(df.sparkSession, path)
    manifest = {
        "n_shards": n_shards,
        "key": key,
        "total_rows": int(sum(s["n_rows"] for s in shards.values())),
        "shards": shards,
    }
    write_text_atomic(
        df.sparkSession,
        os.path.join(path, MANIFEST_NAME),
        json.dumps(manifest, sort_keys=True, indent=1),
    )
    return manifest


def verify_shards(spark: SparkSession, path: str) -> dict:
    """Recompute per-shard counts and content checksums from the actual
    files and compare with the manifest: the pre-training integrity
    gate. Returns {'ok': bool, 'bad_shards': [...], 'missing_shards':
    [...], 'extra_shards': [...]}."""
    text = read_text(spark, os.path.join(path, MANIFEST_NAME))
    if text is None:
        raise FileNotFoundError(
            f"no training manifest at {os.path.join(path, MANIFEST_NAME)} — "
            "the store was never written by write_training_shards (or the "
            "manifest was lost): integrity cannot be verified"
        )
    manifest = json.loads(text)
    got = _shard_stats(spark, path)
    bad, missing = [], []
    for sid, want in manifest["shards"].items():
        if sid not in got:
            missing.append(int(sid))
        elif got[sid] != want:
            bad.append(int(sid))
    extra = sorted(int(s) for s in set(got) - set(manifest["shards"]))
    return {
        "ok": not bad and not missing and not extra,
        "bad_shards": sorted(bad),
        "missing_shards": sorted(missing),
        "extra_shards": extra,
    }
