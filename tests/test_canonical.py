"""Dedup core + id assignment + counters (the reference's central
guarantees: README.md:113-115 idempotence, sms-db.pl:233 reconciliation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.sources.canonical import dense_ids, finalize_import
from sms_db_spark.sources.xml_source import normalize_xml
from sms_db_spark.sources.bugle import normalize_bugle
from sms_db_spark.sources.signal import normalize_signal
from tests.fixtures import bugle_frames, signal_frames, xml_frames


def test_first_import_counts(spark):
    m, p = normalize_xml(*xml_frames(spark))
    res = finalize_import(m, p)
    assert res.total == 5
    assert res.inserted == 5
    assert res.duplicates == 0
    assert res.total_parts == 6
    # seen = inserted + duplicate + ignored (sms-db.pl:233 reconciliation)
    assert res.total == res.inserted + res.duplicates + res.ignored


def test_dense_ids_are_dense_and_ordered(spark):
    m, p = normalize_xml(*xml_frames(spark))
    res = finalize_import(m, p)
    ids = [r["_id"] for r in res.messages.orderBy("_id").collect()]
    assert ids == list(range(1, 6))
    part_ids = [r["_id"] for r in res.parts.orderBy("_id").collect()]
    assert part_ids == list(range(1, 7))


def test_parts_fk_integrity(spark):
    m, p = normalize_xml(*xml_frames(spark))
    res = finalize_import(m, p)
    orphans = res.parts.join(
        res.messages.select(F.col("_id").alias("message_id")), "message_id", "left_anti"
    )
    assert orphans.count() == 0


def test_dedup_idempotence(spark):
    """import twice ≡ once — the reference's core guarantee (README.md:113-115)."""
    m, p = normalize_xml(*xml_frames(spark))
    first = finalize_import(m, p)
    second = finalize_import(m, p, existing_messages=first.messages, existing_parts=first.parts)
    assert second.inserted == 0
    assert second.duplicates == 5
    assert second.messages.count() == 5
    assert second.parts.count() == 6


def test_incremental_append_across_sources(spark):
    xm, xp = normalize_xml(*xml_frames(spark))
    store = finalize_import(xm, xp)
    bm, bp = normalize_bugle(*bugle_frames(spark))
    store2 = finalize_import(bm, bp, store.messages, store.parts)
    assert store2.inserted == 3
    assert store2.messages.count() == 8
    sm, sp, ign = normalize_signal(*signal_frames(spark))
    store3 = finalize_import(sm, sp, store2.messages, store2.parts, ignored_count=ign)
    assert store3.ignored == 4
    assert store3.total == 4 + 4  # 2 sms + 2 mms staged + 4 ignored
    assert store3.messages.count() == 12
    # ids stay dense across appends
    ids = [r["_id"] for r in store3.messages.orderBy("_id").collect()]
    assert ids == list(range(1, 13))
    # hash uniqueness (the UNIQUE constraint, sms-db.pl:49)
    assert store3.messages.select("hash").distinct().count() == 12


def test_within_batch_dup_first_wins(spark):
    m, p = normalize_xml(*xml_frames(spark))
    doubled_m = m.unionByName(m.withColumn("local_id", F.col("local_id") + 1000))
    doubled_p = p.unionByName(p.withColumn("local_id", F.col("local_id") + 1000))
    res = finalize_import(doubled_m, doubled_p)
    assert res.inserted == 5
    assert res.duplicates == 5
    # keepers are the low local_ids (staging order ≙ insert order)
    assert res.messages.count() == 5


def test_dense_ids_helper_multi_partition(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k")).repartition(7)
    out = dense_ids(df, ["k"], "_id", start=1)
    rows = out.orderBy("k").collect()
    assert [r["_id"] for r in rows] == list(range(1, 1001))
