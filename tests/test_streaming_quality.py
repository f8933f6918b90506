"""Streaming quality monitor: per-microbatch metrics equal the batch
audit computed on the same slice, replays don't double-log, and the
deliberately-planted bad rows surface as failing constraints."""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.streaming.quality import (
    append_metrics,
    audit_batch,
    read_metrics,
    stream_quality_monitor,
)
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def test_stream_metrics_match_batch_audit_per_drop(spark, tmp_path):
    drop, log, ckpt = tmp_path / "drop", tmp_path / "log", tmp_path / "ckpt"
    ev = _events(spark)
    slices = [ev.filter(F.col("event_id") % 2 == k) for k in (0, 1)]
    for s in slices:
        s.write.mode("append").parquet(str(drop))
        q = stream_quality_monitor(spark, str(drop), str(log), str(ckpt))
        q.awaitTermination(120)
    logged = read_metrics(spark, str(log)).collect()
    assert {r.batch_id for r in logged} == {0, 1}
    for bid, s in enumerate(slices):
        want = {
            r.check_name: (r.violations, r.total, r.passed)
            for r in audit_batch(s).collect()
        }
        got = {
            r.check_name: (r.violations, r.total, r.passed)
            for r in logged
            if r.batch_id == bid
        }
        assert got == want and len(got) == 4


def test_replay_does_not_double_log(spark, tmp_path):
    log = str(tmp_path / "log")
    ev = _events(spark)
    append_metrics(ev, 0, log)
    append_metrics(ev, 0, log)  # at-least-once redelivery
    rows = read_metrics(spark, log).collect()
    assert len(rows) == 4  # one row per constraint, not eight


def test_bad_rows_fail_their_constraint(spark, tmp_path):
    log = str(tmp_path / "log")
    ev = _events(spark)
    bad = ev.withColumn(
        "event_type",
        F.when(F.col("event_id") % 50 == 0, F.lit("bogus")).otherwise(
            F.col("event_type")
        ),
    )
    append_metrics(bad, 7, log)
    rows = {r.check_name: r for r in read_metrics(spark, log).collect()}
    assert rows["accepted_values_event_type"].passed == 0
    assert rows["accepted_values_event_type"].violations > 0
    assert rows["unique_event_id"].passed == 1


def test_empty_batch_logs_zero_violations_not_null(spark, tmp_path):
    log = str(tmp_path / "log")
    append_metrics(_events(spark).limit(0), 3, log)
    rows = read_metrics(spark, log).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.violations == 0 and r.passed == 1 and r.total == 0


def test_checkpoint_reset_drops_stale_metric_partitions(spark, tmp_path):
    log = str(tmp_path / "log")
    ev = _events(spark)
    append_metrics(ev.filter(F.col("event_id") % 2 == 0), 0, log)
    append_metrics(ev.filter(F.col("event_id") % 2 == 1), 1, log)
    # checkpoint wiped; the restarted stream reprocesses ALL data as batch 0
    append_metrics(ev, 0, log)
    rows = read_metrics(spark, log).collect()
    assert {r.batch_id for r in rows} == {0}  # the stale epoch is gone
    total = {r.check_name: r.total for r in rows}
    assert all(t == ev.count() for t in total.values())


def test_read_metrics_on_empty_log_returns_empty_frame(spark, tmp_path):
    got = read_metrics(spark, str(tmp_path / "nolog"))
    assert got.count() == 0
    assert got.columns == ["batch_id", "check_name", "violations", "total", "passed"]


def _events(spark):
    from sms_db_spark.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def _poison(df):
    return df.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("user_id")),
    )


def test_gated_upsert_quarantines_poisoned_batch(spark, tmp_path):
    """First-class composition of the day-2 law: the verdict pauses the
    merge, the state equals the fold over exactly the batches that
    passed, and the log records the quarantined batch's failure."""
    from sms_db_spark.streaming.quality import quality_gated_upsert_batch
    from sms_db_spark.streaming.upsert import (
        changelog,
        read_upsert_store,
        reduce_changes,
    )

    log, store = str(tmp_path / "log"), str(tmp_path / "store")
    events = _events(spark)
    slices = [events.filter(F.col("event_id") % 3 == k) for k in range(3)]
    slices[1] = _poison(slices[1])
    verdicts = [
        quality_gated_upsert_batch(s, bid, log, store)
        for bid, s in enumerate(slices)
    ]
    assert [v["applied"] for v in verdicts] == [True, False, True]
    assert verdicts[1]["failed_checks"] == ["completeness_user_id"]
    good = slices[0].unionByName(slices[2])
    want = reduce_changes(changelog(good))
    got = spark.read.parquet(f"{store}/state-2")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert read_upsert_store(spark, store).count() > 0
    logged = {(r.batch_id, r.check_name): r.passed for r in read_metrics(spark, log).collect()}
    assert logged[(1, "completeness_user_id")] == 0
    assert logged[(0, "completeness_user_id")] == 1


def test_gated_upsert_reset_with_quarantined_epoch_start(spark, tmp_path):
    """Epoch-splice regression (upsert side): when the new numbering
    epoch STARTS with quarantined batches, the dead epoch's snapshots
    must not survive to be merged as a later clean batch's
    predecessor."""
    from sms_db_spark.streaming.quality import quality_gated_upsert_batch
    from sms_db_spark.streaming.upsert import apply_batch, changelog, reduce_changes

    log, store = str(tmp_path / "log"), str(tmp_path / "store")
    events = _events(spark)
    # old epoch: three batches merge normally
    for bid in range(3):
        apply_batch(events.filter(F.col("event_id") % 3 == bid), bid, store)
    # checkpoint reset: the new epoch's first TWO batches are poisoned
    v0 = quality_gated_upsert_batch(_poison(events.filter(F.col("event_id") % 4 == 0)), 0, log, store)
    v1 = quality_gated_upsert_batch(_poison(events.filter(F.col("event_id") % 4 == 1)), 1, log, store)
    assert v0["applied"] is False and v1["applied"] is False
    clean2 = events.filter(F.col("event_id") % 4 == 2)
    v2 = quality_gated_upsert_batch(clean2, 2, log, store)
    assert v2["applied"] is True
    # state is the clean batch ALONE — no dead-epoch snapshot spliced in
    want = reduce_changes(changelog(clean2))
    got = spark.read.parquet(f"{store}/state-2")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_gated_upsert_end_to_end(spark, tmp_path):
    from sms_db_spark.streaming.quality import stream_gated_upsert
    from sms_db_spark.streaming.upsert import changelog, reduce_changes

    drop = tmp_path / "drop"
    log, store, ckpt = (
        str(tmp_path / "log"), str(tmp_path / "store"), str(tmp_path / "ckpt"),
    )
    events = _events(spark)
    clean = events.filter(F.col("event_id") % 2 == 0)
    poisoned = _poison(events.filter(F.col("event_id") % 2 == 1))
    for s in (clean, poisoned):
        s.write.mode("append").parquet(str(drop))
        q = stream_gated_upsert(spark, str(drop), log, store, ckpt)
        q.awaitTermination(120)
    want = reduce_changes(changelog(clean))
    got = spark.read.parquet(f"{store}/state-0")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert {r.batch_id for r in read_metrics(spark, log).collect()} == {0, 1}
