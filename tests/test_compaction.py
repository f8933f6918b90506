"""Compaction: rows and partition layout preserved exactly, file count
drops to the size-derived target, the no-op path leaves a compact store
untouched, and a partitioned store keeps its pruning directories."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sms_db_spark.sinks.compaction import compact, fragmentation_report
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _content_hash(df):
    return (
        df.select(F.sha2(F.concat_ws("\x01", *[F.col(c).cast("string") for c in sorted(df.columns)]), 256).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"))
        .collect()[0]
        .s
    )


def _fragment(spark, df, path, n):
    df.repartition(n).write.mode("overwrite").parquet(path)


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    store = str(tmp_path / "store")
    orders = load_table(spark, SF_DIR, "orders")
    _fragment(spark, orders, store, 40)
    before = fragmentation_report(spark, store, target_bytes=1 << 20)
    assert before["n_files"] == 40 and before["fragmented"]
    h_before = _content_hash(spark.read.parquet(store))

    result = compact(spark, store, target_bytes=1 << 20)
    assert result["compacted"]
    after = fragmentation_report(spark, store, target_bytes=1 << 20)
    assert after["n_files"] == before["n_files_after"] < 40
    assert spark.read.parquet(store).count() == orders.count()
    assert _content_hash(spark.read.parquet(store)) == h_before
    # staging/backup dirs are gone after the swap
    assert not os.path.exists(store + ".compacting")
    assert not os.path.exists(store + ".precompact")


def test_compact_noop_on_compact_store(spark, tmp_path):
    store = str(tmp_path / "store")
    load_table(spark, SF_DIR, "orders").coalesce(1).write.parquet(store)
    files = sorted(os.listdir(store))
    result = compact(spark, store, target_bytes=1 << 30)
    assert not result["compacted"]
    assert sorted(os.listdir(store)) == files  # untouched, not rewritten


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    store = str(tmp_path / "store")
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    # worst-case fragmentation: every task writes into every day dir
    ev.repartition(8).write.partitionBy("event_date").parquet(store)
    dirs_before = {d for d in os.listdir(store) if d.startswith("event_date=")}
    n_rows = ev.count()

    result = compact(spark, store, target_bytes=1 << 20, partition_cols=["event_date"])
    assert result["compacted"]
    assert {d for d in os.listdir(store) if d.startswith("event_date=")} == dirs_before
    got = spark.read.parquet(store)
    assert got.count() == n_rows
    # pruning still works: one day's slice reads only its directory
    one_day = got.select("event_date").first().event_date
    assert (
        got.filter(F.col("event_date") == one_day).count()
        == ev.filter(F.col("event_date") == one_day).count()
    )


def test_compact_partitioned_is_idempotent(spark, tmp_path):
    """The fragmented guard must respect the partition-directory lower
    bound: a second maintenance run on an already-compacted partitioned
    store is a NO-OP, not another full rewrite."""
    store = str(tmp_path / "store")
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.repartition(8).write.partitionBy("event_date").parquet(store)
    first = compact(spark, store, target_bytes=1 << 20, partition_cols=["event_date"])
    assert first["compacted"]
    report = fragmentation_report(spark, store, target_bytes=1 << 20)
    assert report["n_partition_dirs"] > 1
    assert not report["fragmented"], report
    second = compact(spark, store, target_bytes=1 << 20, partition_cols=["event_date"])
    assert not second["compacted"]
