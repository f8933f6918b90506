"""Watermarked stream-stream interval join (streaming/joins.py):
batch/stream parity on the same inputs, exactly-once pair emission
across checkpointed runs, and interval bounds respected.
"""

from __future__ import annotations

import datetime as dt

from sms_db_spark.streaming.joins import attribution_join, stream_attribution_join
from sms_db_spark.streaming.windows import EVENT_SCHEMA


def _ts(h, m):
    return dt.datetime(2024, 3, 1, h, m, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


VIEWS = [
    (1, _ts(10, 0), 7, "view", 0.0, None),
    (2, _ts(10, 5), 7, "view", 0.0, None),
    (3, _ts(10, 0), 8, "view", 0.0, None),
]
PURCHASES = [
    (101, _ts(10, 10), 7, "purchase", 9.99, None),   # matches views 1 and 2
    (102, _ts(10, 45), 7, "purchase", 5.00, None),   # 40min after view 2: outside window
    (103, _ts(10, 20), 9, "purchase", 1.00, None),   # no view for user 9
]
EXPECTED = {(1, 101), (2, 101)}


def test_batch_attribution_join_semantics(spark):
    got = attribution_join(
        spark.createDataFrame(VIEWS, EVENT_SCHEMA),
        spark.createDataFrame(PURCHASES, EVENT_SCHEMA),
    ).collect()
    assert {(r.view_id, r.purchase_id) for r in got} == EXPECTED
    for r in got:
        assert r.view_ts <= r.purchase_ts <= r.view_ts + dt.timedelta(minutes=30)


def test_stream_join_matches_batch_and_emits_once(spark, tmp_path):
    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purch")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _write(spark, vdir, VIEWS)
    _write(spark, pdir, PURCHASES)
    q = stream_attribution_join(spark, vdir, pdir, out, ckpt)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out).collect()
    assert {(r.view_id, r.purchase_id) for r in got1} == EXPECTED  # parity with batch

    # second incremental run: one new purchase for user 8 inside its view's
    # window — only the NEW pair appears (checkpointed state, no re-emit)
    _write(spark, pdir, [(104, _ts(10, 25), 8, "purchase", 2.50, None)])
    q = stream_attribution_join(spark, vdir, pdir, out, ckpt)
    q.awaitTermination(120)

    got2 = spark.read.parquet(out).collect()
    pairs2 = [(r.view_id, r.purchase_id) for r in got2]
    assert sorted(pairs2) == sorted(pairs2)  # no dup rows: set == list
    assert len(pairs2) == len(set(pairs2))
    assert set(pairs2) == EXPECTED | {(3, 104)}
