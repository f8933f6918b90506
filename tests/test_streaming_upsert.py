"""Streaming CDC upsert: out-of-order microbatched changelog folds to
EXACTLY q126's batch snapshot (merge-law parity), replays of a batch_id
are idempotent (no double-counted changes), and deletes tombstone until
a later upsert resurrects the key."""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.operators.maintenance import q126_scd_upsert
from sms_db_spark.streaming.upsert import (
    apply_batch,
    read_upsert_store,
    stream_upsert,
)
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def _batch_expected(spark):
    return {
        r.user_id: (r.current_value, r.updated_at, r.n_changes)
        for r in q126_scd_upsert(spark, SF_DIR).collect()
    }


def test_out_of_order_stream_matches_batch(spark, tmp_path):
    drop, store, ckpt = tmp_path / "drop", tmp_path / "store", tmp_path / "ckpt"
    ev = _events(spark)
    # three drops deliberately NOT in time order: modulo slicing interleaves
    # every user's timeline across all three microbatches
    for k in (1, 2, 0):
        ev.filter(F.col("event_id") % 3 == k).write.mode("append").parquet(str(drop))
        q = stream_upsert(spark, str(drop), str(store), str(ckpt))
        q.awaitTermination(120)
    got = {
        r.user_id: (r.current_value, r.updated_at, r.n_changes)
        for r in read_upsert_store(spark, str(store)).collect()
    }
    assert got == _batch_expected(spark)


def test_replay_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    ev = _events(spark)
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    apply_batch(first, 0, store)
    apply_batch(second, 1, store)
    before = {
        (r.user_id, r.current_value, r.n_changes)
        for r in read_upsert_store(spark, store).collect()
    }
    # at-least-once delivery: the LAST batch is re-applied with the same id
    apply_batch(second, 1, store)
    after = {
        (r.user_id, r.current_value, r.n_changes)
        for r in read_upsert_store(spark, store).collect()
    }
    assert after == before


def test_delete_tombstones_and_resurrection(spark, tmp_path):
    store = str(tmp_path / "store")
    ev = _events(spark)
    # pick a user whose last event is an error (deleted in q126's output)
    last = (
        ev.withColumn(
            "rn",
            F.expr(
                "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)"
            ),
        )
        .filter("rn = 1 AND event_type = 'error'")
        .select("user_id")
        .first()
    )
    assert last is not None, "fixture needs at least one deleted user"
    uid = last.user_id
    apply_batch(ev, 0, store)
    assert read_upsert_store(spark, store).filter(F.col("user_id") == uid).count() == 0
    # a later upsert resurrects the key; n_changes keeps the full history
    n_before = ev.filter(F.col("user_id") == uid).count()
    resurrect = spark.createDataFrame(
        [(10_000_000, uid, "click", 1.5, None)],
        "event_id long, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.expr("timestamp'2030-01-01 00:00:00'")).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    apply_batch(resurrect, 1, store)
    row = read_upsert_store(spark, store).filter(F.col("user_id") == uid).first()
    assert row is not None and row.current_value == 1.5
    assert row.n_changes == n_before + 1


def test_checkpoint_reset_discards_stale_state(spark, tmp_path):
    """After a checkpoint reset restarts batch numbering at 0, the old
    higher-numbered snapshots must not keep winning read_upsert_store."""
    store = str(tmp_path / "store")
    ev = _events(spark)
    apply_batch(ev.filter(F.col("event_id") % 2 == 0), 0, store)
    apply_batch(ev.filter(F.col("event_id") % 2 == 1), 1, store)
    # checkpoint wiped; the stream reprocesses everything from batch 0
    apply_batch(ev, 0, store)
    got = {
        r.user_id: (r.current_value, r.updated_at, r.n_changes)
        for r in read_upsert_store(spark, str(store)).collect()
    }
    assert got == _batch_expected(spark)
