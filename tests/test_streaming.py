"""Structured Streaming ingest: idempotent accumulation (README.md:39-43
re-expressed as a stream, SURVEY.md §2.7)."""

from __future__ import annotations

from sms_db_spark.sources.canonical import with_message_hash
from sms_db_spark.sources.xml_source import normalize_xml
from sms_db_spark.streaming.ingest import STAGED_HASHED_SCHEMA, stream_ingest
from tests.fixtures import xml_frames


def _hashed_batch(spark):
    m, p = normalize_xml(*xml_frames(spark))
    return with_message_hash(m, p).select(*[f.name for f in STAGED_HASHED_SCHEMA.fields])


def test_stream_ingest_dedups_across_batches(spark, tmp_path):
    drop = tmp_path / "drop"
    store = tmp_path / "store"
    ckpt = tmp_path / "ckpt"
    batch = _hashed_batch(spark)

    batch.write.mode("append").parquet(str(drop))
    q = stream_ingest(spark, str(drop), str(store), str(ckpt)).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert spark.read.parquet(str(store)).count() == 5

    # drop the same batch again (a re-run of the same backup file) → no new rows
    batch.write.mode("append").parquet(str(drop))
    q = stream_ingest(spark, str(drop), str(store), str(ckpt)).trigger(availableNow=True).start()
    q.awaitTermination(120)
    stored = spark.read.parquet(str(store))
    assert stored.count() == 5
    assert stored.select("hash").distinct().count() == 5
