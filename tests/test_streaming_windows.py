"""Event-time windowed streaming agg (streaming/windows.py): watermark
drops late data; append-mode windows are final."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sms_db_spark.streaming.windows import EVENT_SCHEMA, stream_windowed_counts, windowed_counts


def _ts(h, m):
    return dt.datetime(2024, 3, 1, h, m, 0)


def _write_batch(spark, drop_dir, rows, name):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(drop_dir)
    _ = name


def test_watermark_drops_late_rows_and_windows_are_final(spark, tmp_path):
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: six rows in window [10:00,10:10) + one at 11:00 that advances
    # the committed watermark to 10:40 (11:00 - 20 min)
    rows1 = [(i, _ts(10, i), 1, "click", 1.0, None) for i in range(6)]
    rows1.append((100, _ts(11, 0), 1, "click", 1.0, None))
    _write_batch(spark, drop, rows1, "b1")
    q = stream_windowed_counts(spark, drop, out, ckpt)
    q.awaitTermination(120)

    # run 2: a LATE row for the 10:00 window (behind the 10:40 watermark →
    # must be dropped) plus a 12:00 row that pushes the watermark past every
    # earlier window end so they all flush
    rows2 = [(200, _ts(10, 2), 1, "click", 1.0, None), (300, _ts(12, 0), 1, "click", 1.0, None)]
    _write_batch(spark, drop, rows2, "b2")
    q = stream_windowed_counts(spark, drop, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    w1 = got.filter(F.col("window_start") == _ts(10, 0)).collect()
    assert len(w1) == 1, f"window [10:00,10:10) should have flushed exactly once, got {w1}"
    # 6 on-time rows; the late row 200 was dropped by the watermark
    assert w1[0].n_events == 6
    assert w1[0].total_value == 6.0


def test_batch_twin_matches_streaming_semantics_when_nothing_late(spark):
    rows = [(i, _ts(9, i % 30), i % 3, "view", float(i), None) for i in range(30)]
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = windowed_counts(events, "10 minutes", "20 minutes").collect()
    # 30 rows spread over minutes 0..29 → three 10-minute windows
    assert {r.window_start.minute for r in out} == {0, 10, 20}
    assert sum(r.n_events for r in out) == 30
