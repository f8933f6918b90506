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


def test_interrupted_swap_recovers_at_entry(spark, tmp_path):
    """Crash between atomic_swap's renames leaves the store at the
    backup path; the next maintenance run must restore it before doing
    anything else."""
    import shutil

    store = str(tmp_path / "store")
    orders = load_table(spark, SF_DIR, "orders")
    orders.repartition(10).write.parquet(store)
    n = orders.count()
    # simulate the crash window: store moved aside, nothing landed
    shutil.move(store, store + ".precompact")
    result = compact(spark, store, target_bytes=1 << 20)
    assert spark.read.parquet(store).count() == n
    assert not os.path.exists(store + ".precompact")
    assert "n_files" in result  # compaction proceeded after recovery


def test_partitioned_compaction_splits_hot_partition(spark, tmp_path):
    """A hot partition must compact to ~ceil(bytes/target) files, not
    one giant single-task file."""
    store = str(tmp_path / "store")
    ev = load_table(spark, SF_DIR, "events")
    # one hot day: 300 UNIQUE variants of its rows (replication alone
    # compresses away under zstd) so the dir's REAL parquet bytes span
    # several multiples of the target
    base = ev.withColumn("event_date", F.to_date("ts"))
    hot_day = base.select("event_date").first().event_date
    hot = (
        base.filter(F.col("event_date") == hot_day)
        .crossJoin(spark.range(300).withColumnRenamed("id", "_c"))
        .withColumn("event_id", F.col("event_id") * 1000 + F.col("_c"))
        .withColumn("value", F.col("value") + F.col("_c").cast("double") / 7.0)
        .withColumn("props", F.concat(F.col("props"), F.md5(F.col("_c").cast("string"))))
        .drop("_c")
    )
    skewed = base.filter(F.col("event_date") != hot_day).unionByName(hot)
    skewed.repartition(8).write.partitionBy("event_date").parquet(store)
    n = skewed.count()

    report = fragmentation_report(spark, store, target_bytes=64 * 1024)
    result = compact(spark, store, target_bytes=64 * 1024, partition_cols=["event_date"])
    assert result["compacted"]
    assert spark.read.parquet(store).count() == n
    hot_dir = os.path.join(store, f"event_date={hot_day}")
    hot_files = [f for f in os.listdir(hot_dir) if f.endswith(".parquet")]
    assert len(hot_files) > 1, (report, hot_files)
    # and the rewrite converged: second run is a no-op
    assert not compact(
        spark, store, target_bytes=64 * 1024, partition_cols=["event_date"]
    )["compacted"]
