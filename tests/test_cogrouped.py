"""Cogrouped as-of edge semantics: the pandas path must survive the key
groups the oracle data doesn't stress — a user with events but no
orders (empty right frame), orders but no events (empty left), and an
order dated exactly at the event time (inclusive bound)."""

from __future__ import annotations

import datetime

from sms_db_spark.operators.cogrouped import ASOF_SCHEMA, _merge_asof_group


def _run_cogroup(spark, events_rows, orders_rows):
    e = spark.createDataFrame(events_rows, "user_id long, ts timestamp, event_id long")
    o = spark.createDataFrame(
        orders_rows, "user_id long, t timestamp, o_orderkey long"
    )
    return (
        e.groupBy("user_id")
        .cogroup(o.groupBy("user_id"))
        .applyInPandas(_merge_asof_group, schema=ASOF_SCHEMA)
        .orderBy("event_id")
        .collect()
    )


def test_empty_sides_and_inclusive_bound(spark):
    t0 = datetime.datetime(2024, 1, 10)
    rows = _run_cogroup(
        spark,
        [
            (1, t0, 100),  # user 1: order dated exactly at ts → inclusive match
            (2, t0, 200),  # user 2: no orders at all → dropped
            (3, t0, 300),  # user 3: only later orders → dropped
        ],
        [
            (1, t0, 11),
            (3, t0 + datetime.timedelta(days=5), 31),
            (4, t0, 41),  # user 4: orders but no events → no output
        ],
    )
    assert [(r.event_id, r.key, r.asof_orderkey) for r in rows] == [(100, 1, 11)]


def test_same_date_tie_takes_largest_orderkey(spark):
    t0 = datetime.datetime(2024, 1, 10)
    rows = _run_cogroup(
        spark,
        [(1, t0 + datetime.timedelta(days=1), 100)],
        [(1, t0, 7), (1, t0, 9), (1, t0, 8)],
    )
    assert [(r.event_id, r.asof_orderkey) for r in rows] == [(100, 9)]
