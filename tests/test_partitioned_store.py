"""Partitioned store layout (sinks/partitioned.py): pruning is real —
a day-ranged query must list only the matching partition directories."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from sms_db_spark.sinks import partitioned
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_day_partitioned_write_prunes(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    store = str(tmp_path / "events_by_day")
    partitioned.write_partitioned_by_day(events, store)

    dirs = partitioned.partition_dirs(store)
    assert len(dirs) > 1, "testdata spans multiple days; expected multiple partitions"

    lo, hi = "2024-01-02", "2024-01-03"
    sliced = partitioned.day_slice(spark, store, lo, hi)

    # 1. semantic equivalence with the unpartitioned filter
    expected = events.filter(F.to_date("ts").between(lo, hi)).count()
    assert sliced.count() == expected > 0

    # 2. the pruning is in the PLAN (listing-time, not post-scan filter)
    plan = _plan(sliced)
    assert "PartitionFilters" in plan and "event_date" in plan

    # 3. and in the FILES actually read at execution time (inputFiles() is
    # logical-plan level and sees the unpruned listing — input_file_name()
    # reflects the physical scan)
    touched = {r[0] for r in sliced.select(F.input_file_name()).distinct().collect()}
    assert touched
    for f in touched:
        assert "event_date=2024-01-02" in f or "event_date=2024-01-03" in f


def test_partitioned_roundtrip_preserves_rows(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    store = str(tmp_path / "events_rt")
    partitioned.write_partitioned_by_day(events, store)
    back = partitioned.read_partitioned(spark, store)
    assert back.count() == events.count()
    # fine-grained ts column survives intact (partition col is additive)
    assert back.agg(F.sum(F.unix_micros("ts"))).first()[0] == events.agg(
        F.sum(F.unix_micros("ts"))
    ).first()[0]


def test_backfill_day_touches_only_its_partition(spark, tmp_path):
    """Dynamic partition overwrite: re-landing one corrected day must
    leave every other day's files byte-identical (same names, same
    mtimes) — the 1-of-1000-partitions correction workflow."""
    import os

    from pyspark.sql import functions as F

    from sms_db_spark.sinks.partitioned import (
        backfill_day,
        partition_dirs,
        write_partitioned_by_day,
    )
    from sms_db_spark.tables import load_table

    store = str(tmp_path / "store")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    write_partitioned_by_day(ev, store)
    dirs = partition_dirs(store)
    assert len(dirs) > 2
    target = dirs[1]
    day = target.split("=", 1)[1]

    def snapshot(skip):
        out = {}
        for d in partition_dirs(store):
            if d == skip:
                continue
            p = os.path.join(store, d)
            out[d] = {(f, os.path.getmtime(os.path.join(p, f))) for f in os.listdir(p)}
        return out

    before = snapshot(target)
    corrected = ev.filter(F.to_date("ts") == day).withColumn(
        "value", F.col("value") * 2
    )
    n_target = corrected.count()
    backfill_day(corrected, store)

    # untouched partitions: identical file sets AND mtimes
    assert snapshot(target) == before
    # the target partition now holds exactly the corrected rows
    got = spark.read.parquet(store).filter(F.col("event_date") == day)
    assert got.count() == n_target
    orig_sum = ev.filter(F.to_date("ts") == day).agg(F.sum("value")).collect()[0][0]
    new_sum = got.agg(F.sum("value")).collect()[0][0]
    assert abs(new_sum - 2 * orig_sum) < 1e-6


def test_store_survives_schema_evolution(spark, tmp_path):
    """Additive schema evolution on the partitioned store: new batches
    may carry new columns; mergeSchema reads serve old rows with NULLs
    in the added column and new rows fully — no rewrite of history.
    (The at-scale contract: adding a quality-score column to a 100 TB
    store must not touch existing files.)"""
    import os

    from pyspark.sql import functions as F

    from sms_db_spark.tables import load_table

    store = str(tmp_path / "store")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    v1 = docs.filter(F.col("doc_id") < 100)
    v1.write.parquet(store)
    files_before = set(os.listdir(store))

    v2 = (
        docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
        .withColumn("quality_score", (F.col("n_chars") % 100).cast("double"))
    )
    v2.write.mode("append").parquet(store)

    got = spark.read.option("mergeSchema", "true").parquet(store)
    assert "quality_score" in got.columns
    assert got.count() == v1.count() + v2.count()
    old = got.filter(F.col("doc_id") < 100)
    assert old.filter(F.col("quality_score").isNotNull()).count() == 0
    new = got.filter(F.col("doc_id") >= 100)
    assert new.filter(F.col("quality_score").isNull()).count() == 0
    # history untouched: v1's files are byte-identical (same names present)
    assert files_before - {"_SUCCESS"} <= set(os.listdir(store))
