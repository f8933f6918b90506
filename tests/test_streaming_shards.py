"""Streaming shard materialization: the additive manifest law (merged
per-batch stats == the one-shot batch writer's manifest), idempotent
replay, checkpoint-reset hygiene, and the integrity gate end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sms_db_spark.sinks.shards import write_training_shards
from sms_db_spark.streaming.shards import (
    apply_shard_batch,
    merged_manifest,
    stream_shards,
    verify_stream_shards,
)
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
N = 8

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_streamed_manifest_equals_batch_writer(spark, tmp_path):
    docs = _docs(spark)
    batch_dir = str(tmp_path / "batch")
    want = write_training_shards(docs, batch_dir, N, key="doc_id")

    drop, shard_dir, ckpt = tmp_path / "drop", str(tmp_path / "stream"), tmp_path / "ckpt"
    for k in (2, 0, 1):  # out-of-order arrival
        docs.filter(F.col("doc_id") % 3 == k).write.mode("append").parquet(str(drop))
        q = stream_shards(
            spark, str(drop), shard_dir, str(ckpt), N, "doc_id", schema=DOC_SCHEMA
        )
        q.awaitTermination(120)

    got = merged_manifest(spark, shard_dir)
    assert got["shards"] == want["shards"]  # the additive law, exactly
    assert got["total_rows"] == want["total_rows"]
    assert verify_stream_shards(spark, shard_dir)["ok"]
    # the landed rows really are the corpus
    back = spark.read.parquet(shard_dir)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()


def test_replay_and_reset_are_idempotent(spark, tmp_path):
    docs = _docs(spark)
    shard_dir = str(tmp_path / "stream")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    apply_shard_batch(first, 0, shard_dir, N, "doc_id")
    apply_shard_batch(second, 1, shard_dir, N, "doc_id")
    before = merged_manifest(spark, shard_dir)
    # at-least-once: the LAST batch is re-delivered
    apply_shard_batch(second, 1, shard_dir, N, "doc_id")
    assert merged_manifest(spark, shard_dir) == before
    assert verify_stream_shards(spark, shard_dir)["ok"]

    # checkpoint reset: everything reprocessed as batch 0 — stale batch-1
    # data AND manifest entries must vanish
    apply_shard_batch(docs, 0, shard_dir, N, "doc_id")
    got = merged_manifest(spark, shard_dir)
    batch_ref = write_training_shards(docs, str(tmp_path / "ref"), N, key="doc_id")
    assert got["shards"] == batch_ref["shards"]
    assert verify_stream_shards(spark, shard_dir)["ok"]
    assert spark.read.parquet(shard_dir).count() == docs.count()


def test_reset_with_smaller_footprint_purges_same_id_stragglers(spark, tmp_path):
    """The nasty reset case: the re-numbered batch 0 touches FEWER shards
    than the pre-reset batch 0 did — its stale rows hide in shards the
    new batch never writes, where a dynamic overwrite would never look."""
    docs = _docs(spark)
    shard_dir = str(tmp_path / "stream")
    apply_shard_batch(docs, 0, shard_dir, N, "doc_id")  # full footprint
    # reset: reprocessed batch 0 is a narrow slice (likely missing shards)
    narrow = docs.filter(F.col("doc_id") < 20)
    apply_shard_batch(narrow, 0, shard_dir, N, "doc_id")
    assert spark.read.parquet(shard_dir).count() == narrow.count()
    got = merged_manifest(spark, shard_dir)
    ref = write_training_shards(narrow, str(tmp_path / "ref"), N, key="doc_id")
    assert got["shards"] == ref["shards"]
    assert verify_stream_shards(spark, shard_dir)["ok"]


def test_replay_after_crash_between_append_and_manifest(spark, tmp_path):
    """The crash window ADVICE r4 flagged: data for batch B landed but
    the process died BEFORE the manifest write. The replay of B finds no
    manifest entry for it — the own-batch purge must NOT be gated on the
    manifest, or the replay double-appends B's rows (permanent checksum
    failure). Simulated by deleting B's manifest entry while leaving its
    data on disk."""
    import json
    import os

    from sms_db_spark.fsutil import read_text, write_text_atomic
    from sms_db_spark.streaming.shards import STREAM_MANIFEST

    docs = _docs(spark)
    shard_dir = str(tmp_path / "stream")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    apply_shard_batch(first, 0, shard_dir, N, "doc_id")
    apply_shard_batch(second, 1, shard_dir, N, "doc_id")
    # crash simulation: batch 1's data is on disk, its manifest entry gone
    mpath = os.path.join(shard_dir, STREAM_MANIFEST)
    manifest = json.loads(read_text(spark, mpath))
    del manifest["batches"]["1"]
    write_text_atomic(spark, mpath, json.dumps(manifest))
    # foreachBatch replays batch 1 (checkpoint never advanced past it)
    apply_shard_batch(second, 1, shard_dir, N, "doc_id")
    assert spark.read.parquet(shard_dir).count() == docs.count()  # no dupes
    got = merged_manifest(spark, shard_dir)
    ref = write_training_shards(docs, str(tmp_path / "ref"), N, key="doc_id")
    assert got["shards"] == ref["shards"]
    assert verify_stream_shards(spark, shard_dir)["ok"]


def test_verify_shards_missing_manifest_is_loud(spark, tmp_path):
    """A store with data but no manifest must raise a clear integrity
    error, not TypeError from json.loads(None) (ADVICE r4)."""
    import pytest

    from sms_db_spark.sinks.shards import verify_shards

    docs = _docs(spark)
    path = str(tmp_path / "noman")
    docs.limit(10).write.parquet(path)
    with pytest.raises(FileNotFoundError, match="no training manifest"):
        verify_shards(spark, path)


def test_streaming_refuses_null_keys_and_reserved_columns(spark, tmp_path):
    import pytest

    docs = _docs(spark)
    with pytest.raises(ValueError, match="NULL"):
        apply_shard_batch(
            docs.withColumn("doc_id", F.lit(None).cast("long")),
            0,
            str(tmp_path / "a"),
            N,
            "doc_id",
        )
    with pytest.raises(ValueError, match="reserved"):
        apply_shard_batch(
            docs.withColumn("_shard", F.lit(1)), 0, str(tmp_path / "b"), N, "doc_id"
        )
