"""Day-2 composition test: the maintenance pieces chained end-to-end on
one corpus — quality gate → (gated) CDC upsert → small-file compaction →
Z-order clustering → training-shard materialization + integrity verify —
asserting row conservation at every stage and manifest verification at
the end. Each piece is unit-tested elsewhere; THIS test pins the
composition: the gate's verdict actually pauses the merge, the compactor
preserves the upsert snapshot bit-for-bit, and the shard manifest
verifies over the store the chain produced (VERDICT r4 item 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.sinks.clustered import write_zordered
from sms_db_spark.sinks.compaction import compact, fragmentation_report
from sms_db_spark.sinks.shards import verify_shards, write_training_shards
from sms_db_spark.streaming.quality import audit_batch
from sms_db_spark.streaming.upsert import (
    apply_batch,
    changelog,
    read_upsert_store,
    reduce_changes,
)
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _content_sum(df):
    """Order-insensitive content checksum (the shard writers' trick)."""
    from sms_db_spark.sinks.shards import row_hash_col

    return df.agg(
        F.sum(row_hash_col(df.columns).cast("decimal(38,0)")).alias("s")
    ).collect()[0].s


def test_quality_gated_upsert_compact_zorder_shard_chain(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    # three microbatches; batch 1 is POISONED (nulled user_ids) and must
    # be quarantined by the quality gate, never reaching the store
    slices = [events.filter(F.col("event_id") % 3 == k) for k in range(3)]
    slices[1] = slices[1].withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("user_id")),
    )
    store = str(tmp_path / "state")

    merged_ids = []
    for bid, batch in enumerate(slices):
        checks = {r.check_name: r for r in audit_batch(batch).collect()}
        if all(r.passed == 1 for r in checks.values()):
            apply_batch(batch, bid, store)
            merged_ids.append(bid)
        else:  # the gate's pause, honored by the merge
            assert checks["completeness_user_id"].passed == 0
    assert merged_ids == [0, 2], "only the clean batches may merge"

    # the state equals q126's fold over exactly the batches that passed
    good = slices[0].unionByName(slices[2])
    want = reduce_changes(changelog(good))
    got_state = spark.read.parquet(f"{store}/state-2")
    assert got_state.exceptAll(want).count() == 0
    assert want.exceptAll(got_state).count() == 0

    snapshot = read_upsert_store(spark, store).localCheckpoint(eager=True)
    n, checksum = snapshot.count(), _content_sum(snapshot)
    assert n > 0

    # land the snapshot fragmented, then compact: rows and content survive
    frag = str(tmp_path / "snap")
    snapshot.repartition(16).write.parquet(frag)
    report = compact(spark, frag, target_bytes=1 << 30)
    assert report["compacted"] is True
    compacted = spark.read.parquet(frag)
    assert compacted.count() == n
    assert _content_sum(compacted) == checksum
    assert fragmentation_report(spark, frag, 1 << 30)["n_files"] < 16

    # Z-order the compacted store: co-location changes, content doesn't
    zdir = str(tmp_path / "zorder")
    write_zordered(compacted, zdir, "user_id", "n_changes", n_files=4)
    zed = spark.read.parquet(zdir)
    assert zed.count() == n
    assert _content_sum(zed) == checksum

    # trainer handoff: shard the clustered store and verify the manifest
    sdir = str(tmp_path / "shards")
    manifest = write_training_shards(zed, sdir, 4, key="user_id")
    assert manifest["total_rows"] == n
    assert verify_shards(spark, sdir)["ok"]
    back = spark.read.parquet(sdir).drop("_shard")
    assert back.count() == n
    assert _content_sum(back) == checksum
