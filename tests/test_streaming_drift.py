"""Streaming drift monitor: a microbatch's report equals q136's for the
same window (shared `_drift_from_counts` arithmetic), the log protocol
is replay-idempotent with reset hygiene, and never-seen buckets count
as pure drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.operators.maintenance import (
    DELTA_BATCH_SOURCES,
    q136_corpus_drift,
)
from sms_db_spark.streaming.drift import (
    append_drift,
    batch_drift,
    read_drift_log,
    reference_profile,
    stream_drift_monitor,
)
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def _key(r):
    return (r.feature, r.n_a, r.n_b, r.n_buckets, r.tvd_milli, r.top_bucket)


def test_batch_drift_matches_q136_for_the_same_window(spark):
    """Reference = standing corpus, microbatch = today's arrivals —
    exactly q136's two windows — must reproduce q136's report
    byte-for-byte, feature by feature."""
    docs = _docs(spark)
    in_delta = F.col("source").isin(*DELTA_BATCH_SOURCES)
    ref = reference_profile(docs.filter(~in_delta))
    got = sorted((_key(r) for r in batch_drift(docs.filter(in_delta), ref).collect()))
    want = sorted(_key(r) for r in q136_corpus_drift(spark, SF_DIR).collect())
    assert got == want


def test_stream_logs_per_batch_reports(spark, tmp_path):
    drop, log, ckpt = tmp_path / "drop", tmp_path / "log", tmp_path / "ckpt"
    docs = _docs(spark)
    ref = reference_profile(docs)
    slices = [docs.filter(F.col("doc_id") % 2 == k) for k in (0, 1)]
    for s in slices:
        s.write.mode("append").parquet(str(drop))
        q = stream_drift_monitor(spark, str(drop), ref, str(log), str(ckpt))
        q.awaitTermination(120)
    logged = read_drift_log(spark, str(log)).collect()
    assert {r.batch_id for r in logged} == {0, 1}
    for bid, s in enumerate(slices):
        want = sorted(_key(r) for r in batch_drift(s, ref).collect())
        got = sorted(_key(r) for r in logged if r.batch_id == bid)
        assert got == want and len(got) == 2  # one row per feature


def test_replay_does_not_double_log(spark, tmp_path):
    log = str(tmp_path / "log")
    docs = _docs(spark)
    ref = reference_profile(docs)
    append_drift(docs, 0, ref, log)
    append_drift(docs, 0, ref, log)  # at-least-once redelivery
    assert read_drift_log(spark, log).count() == 2  # one row per feature


def test_empty_batch_logs_nothing(spark, tmp_path):
    log = str(tmp_path / "log")
    docs = _docs(spark)
    ref = reference_profile(docs)
    append_drift(docs.limit(0), 5, ref, log)
    assert read_drift_log(spark, log).count() == 0


def test_checkpoint_reset_drops_stale_partitions(spark, tmp_path):
    log = str(tmp_path / "log")
    docs = _docs(spark)
    ref = reference_profile(docs)
    append_drift(docs.filter(F.col("doc_id") % 2 == 0), 0, ref, log)
    append_drift(docs.filter(F.col("doc_id") % 2 == 1), 1, ref, log)
    # checkpoint wiped; restarted stream reprocesses everything as batch 0
    append_drift(docs, 0, ref, log)
    rows = read_drift_log(spark, log).collect()
    assert {r.batch_id for r in rows} == {0}
    want = sorted(_key(r) for r in batch_drift(docs, ref).collect())
    assert sorted(_key(r) for r in rows) == want


def test_never_seen_bucket_is_pure_drift(spark, tmp_path):
    """A batch wholly in a language the corpus has never seen is 100%
    drift on the lang feature, and the novel bucket is named."""
    docs = _docs(spark)
    ref = reference_profile(docs)
    novel = docs.limit(10).withColumn("lang", F.lit("zz"))
    rows = {r.feature: r for r in batch_drift(novel, ref).collect()}
    assert rows["lang"].tvd_milli == 1000
    assert rows["lang"].top_bucket == "zz"


def test_null_bucket_parity_with_q136(spark, tmp_path):
    """q136 groups all NULL buckets into ONE row; the monitor's
    full-outer join must be NULL-safe or a NULL bucket present on both
    sides splits into two one-sided rows and inflates the TVD."""
    import shutil
    import tempfile

    from sms_db_spark.operators.maintenance import q136_corpus_drift

    docs = _docs(spark).withColumn(
        "lang",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string")).otherwise(
            F.col("lang")
        ),
    )
    d = tempfile.mkdtemp(prefix="driftnull-")
    try:
        docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        want = sorted(_key(r) for r in q136_corpus_drift(spark, d).collect())
    finally:
        shutil.rmtree(d, ignore_errors=True)
    in_delta = F.col("source").isin(*DELTA_BATCH_SOURCES)
    ref = reference_profile(docs.filter(~in_delta))
    got = sorted(_key(r) for r in batch_drift(docs.filter(in_delta), ref).collect())
    assert got == want


def test_empty_first_batch_after_reset_still_purges(spark, tmp_path):
    """A checkpoint reset whose NEW epoch opens with an EMPTY batch must
    still drop the old epoch's same/higher-numbered partitions — an
    early return before the hygiene would splice pre-reset reports into
    the new epoch's log."""
    log = str(tmp_path / "log")
    docs = _docs(spark)
    ref = reference_profile(docs)
    append_drift(docs.filter(F.col("doc_id") % 2 == 0), 0, ref, log)
    append_drift(docs.filter(F.col("doc_id") % 2 == 1), 1, ref, log)
    # checkpoint wiped; the restarted stream's first batch is empty
    append_drift(docs.limit(0), 0, ref, log)
    assert read_drift_log(spark, log).count() == 0


def test_empty_reference_corpus_refuses_to_profile(spark):
    """A distribution over no rows is not a reference; profiling must
    fail at deploy time, not poison the log with NULL TVDs later."""
    import pytest

    with pytest.raises(ValueError, match="empty"):
        reference_profile(_docs(spark).limit(0))


def test_drift_gate_quarantines_shifted_batch(spark, tmp_path):
    """The day-2 composition (VERDICT r5 item 4): a distribution-shifted
    batch is logged but NEVER reaches apply_shard_batch — the shard
    layout and its manifest are byte-identical before and after the
    quarantined batch, while clean batches keep materializing."""
    from sms_db_spark.fsutil import read_text
    from sms_db_spark.streaming.drift import drift_gated_shard_batch
    from sms_db_spark.streaming.shards import (
        STREAM_MANIFEST,
        merged_manifest,
        verify_stream_shards,
    )

    log, shards = str(tmp_path / "log"), str(tmp_path / "shards")
    docs = _docs(spark)
    ref = reference_profile(docs)

    clean0 = docs.filter(F.col("doc_id") % 3 == 0)
    # poisoned: the language distribution collapses to one never-seen
    # bucket — the "crawler pointed at the wrong source" failure
    poisoned = docs.filter(F.col("doc_id") % 3 == 1).withColumn(
        "lang", F.lit("xx")
    )
    clean2 = docs.filter(F.col("doc_id") % 3 == 2)

    v0 = drift_gated_shard_batch(clean0, 0, ref, log, shards, 4, "doc_id")
    assert v0["applied"] is True and v0["max_tvd_milli"] < 300
    manifest_before = read_text(spark, f"{shards}/{STREAM_MANIFEST}")

    v1 = drift_gated_shard_batch(poisoned, 1, ref, log, shards, 4, "doc_id")
    assert v1["applied"] is False and v1["worst_feature"] == "lang"
    assert v1["max_tvd_milli"] >= 300
    # the layout never saw the drifted batch: manifest bytes unchanged,
    # no _batch=1 directory anywhere
    assert read_text(spark, f"{shards}/{STREAM_MANIFEST}") == manifest_before
    assert not list(tmp_path.glob("shards/_shard=*/_batch=1"))

    # the gate's log still records the quarantined batch (the alert)
    logged = {r.batch_id for r in read_drift_log(spark, log).collect()}
    assert logged == {0, 1}

    # the chain keeps flowing for clean data and the store verifies
    v2 = drift_gated_shard_batch(clean2, 2, ref, log, shards, 4, "doc_id")
    assert v2["applied"] is True
    assert verify_stream_shards(spark, shards)["ok"]
    want = clean0.count() + clean2.count()
    assert merged_manifest(spark, shards)["total_rows"] == want


def test_drift_gate_empty_batch_applies_nothing(spark, tmp_path):
    from sms_db_spark.streaming.drift import drift_gated_shard_batch

    log, shards = str(tmp_path / "log"), str(tmp_path / "shards")
    docs = _docs(spark)
    ref = reference_profile(docs)
    v = drift_gated_shard_batch(docs.limit(0), 0, ref, log, shards, 4, "doc_id")
    assert v == {
        "applied": False, "empty": True,
        "max_tvd_milli": None, "worst_feature": None,
    }
    assert not (tmp_path / "shards").exists()


def test_stream_gated_shards_end_to_end(spark, tmp_path):
    """The streaming entry: two drops (one clean, one poisoned) through
    stream_gated_shards — only the clean batch lands in the layout."""
    from sms_db_spark.streaming.drift import stream_gated_shards
    from sms_db_spark.streaming.shards import merged_manifest

    drop, log = tmp_path / "drop", str(tmp_path / "log")
    shards, ckpt = str(tmp_path / "shards"), str(tmp_path / "ckpt")
    docs = _docs(spark)
    ref = reference_profile(docs)
    clean = docs.filter(F.col("doc_id") % 2 == 0)
    poisoned = docs.filter(F.col("doc_id") % 2 == 1).withColumn("lang", F.lit("zz"))
    for s in (clean, poisoned):
        s.write.mode("append").parquet(str(drop))
        q = stream_gated_shards(
            spark, str(drop), ref, log, shards, ckpt, 4, "doc_id"
        )
        q.awaitTermination(120)
    assert merged_manifest(spark, shards)["total_rows"] == clean.count()
    logged = {r.batch_id for r in read_drift_log(spark, log).collect()}
    assert logged == {0, 1}


def test_quarantined_first_batch_after_reset_still_purges_dead_epoch(spark, tmp_path):
    """The reset-splice hole: if the new numbering epoch's FIRST batch
    is quarantined (or empty), the gate must still run the layout's
    landing hygiene — otherwise the dead epoch's same/lower-numbered
    directories and manifest entries survive (later clean batches purge
    only ids >= their own) and splice into the new epoch while
    verify_stream_shards stays green."""
    from sms_db_spark.streaming.drift import drift_gated_shard_batch
    from sms_db_spark.streaming.shards import (
        apply_shard_batch,
        merged_manifest,
        verify_stream_shards,
    )

    log, shards = str(tmp_path / "log"), str(tmp_path / "shards")
    docs = _docs(spark)
    ref = reference_profile(docs)
    # old epoch: three clean batches land
    for bid in range(3):
        apply_shard_batch(
            docs.filter(F.col("doc_id") % 3 == bid), bid, shards, 4, "doc_id"
        )
    # checkpoint reset; the NEW epoch's batch 0 is drifted -> quarantined
    poisoned = docs.filter(F.col("doc_id") % 2 == 0).withColumn("lang", F.lit("xx"))
    v0 = drift_gated_shard_batch(poisoned, 0, ref, log, shards, 4, "doc_id")
    assert v0["applied"] is False
    # the dead epoch must be gone already, not waiting for a clean batch
    assert not list(tmp_path.glob("shards/_shard=*/_batch=*"))
    assert merged_manifest(spark, shards)["total_rows"] == 0
    # new epoch's clean batch 1 lands alone — nothing spliced
    clean1 = docs.filter(F.col("doc_id") % 2 == 1)
    v1 = drift_gated_shard_batch(clean1, 1, ref, log, shards, 4, "doc_id")
    assert v1["applied"] is True
    assert merged_manifest(spark, shards)["total_rows"] == clean1.count()
    assert verify_stream_shards(spark, shards)["ok"]
    batches = {p.name for p in tmp_path.glob("shards/_shard=*/_batch=*")}
    assert batches == {"_batch=1"}


def test_skip_shard_batch_is_noop_on_fresh_store(spark, tmp_path):
    from sms_db_spark.streaming.shards import skip_shard_batch

    shards = tmp_path / "shards"
    skip_shard_batch(spark, str(shards), 3)
    assert not shards.exists()
