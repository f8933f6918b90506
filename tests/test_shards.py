"""Training-shard writer: balanced hash shards, run-to-run deterministic
manifest, integrity verification that actually catches tampering."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from sms_db_spark.sinks.shards import (
    MANIFEST_NAME,
    verify_shards,
    write_training_shards,
)
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
N = 8


def test_shards_balanced_deterministic_and_complete(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_training_shards(docs, p1, N, key="doc_id")
    m2 = write_training_shards(docs, p2, N, key="doc_id")
    # deterministic: identical manifest for identical input
    assert m1 == m2
    assert m1["total_rows"] == docs.count()
    assert len(m1["shards"]) == N
    counts = [s["n_rows"] for s in m1["shards"].values()]
    # hash balance: no shard more than 2x the smallest on 500 rows
    assert max(counts) <= 2 * min(counts), counts
    # no row lost or duplicated across shards
    back = spark.read.parquet(p1)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # ingestion order decorrelated: shard 0 is not a doc_id prefix
    ids0 = sorted(
        r.doc_id for r in back.filter(F.col("_shard") == 0).select("doc_id").collect()
    )
    assert ids0 != list(range(len(ids0)))


def test_verify_passes_then_catches_tampering(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, N, key="doc_id")
    assert verify_shards(spark, path)["ok"]

    # lose one shard directory entirely -> missing
    victim = os.path.join(path, "_shard=3")
    shutil.rmtree(victim)
    report = verify_shards(spark, path)
    assert not report["ok"] and report["missing_shards"] == [3]

    # rebuild, then corrupt a shard by dropping one of its files
    write_training_shards(docs, path, N, key="doc_id")
    sdir = os.path.join(path, "_shard=5")
    parquet_files = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
    os.remove(os.path.join(sdir, parquet_files[0]))
    report = verify_shards(spark, path)
    assert not report["ok"] and 5 in report["bad_shards"] + report["missing_shards"]

    # rebuild, then smuggle in CONTENT changes that keep ids and counts:
    # the checksum must cover every column, not just the key
    write_training_shards(docs, path, N, key="doc_id")
    sdir = os.path.join(path, "_shard=2")
    tampered = (
        spark.read.parquet(sdir)
        .withColumn("text", F.concat(F.col("text"), F.lit(" [stale]")))
        .localCheckpoint(eager=True)
    )
    tampered.coalesce(1).write.mode("overwrite").parquet(sdir)
    report = verify_shards(spark, path)
    assert not report["ok"] and report["bad_shards"] == [2], report


def test_refuses_null_keys(spark, tmp_path):
    import pytest

    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "doc_id", F.lit(None).cast("long")
    )
    with pytest.raises(ValueError, match="NULL"):
        write_training_shards(docs, str(tmp_path / "s"), N, key="doc_id")
