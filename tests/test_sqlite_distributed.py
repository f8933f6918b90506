"""The self-routing SQLite reader: big rowid tables take the
distributed rowid-range scan, small/WITHOUT-ROWID tables stay on the
driver path, and both produce identical schema-first frames."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import sms_db_spark.sources.sqlite_io as sio

SCHEMA = T.StructType(
    [
        T.StructField("rowid", T.LongType(), True),
        T.StructField("_id", T.LongType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("ghost_col", T.StringType(), True),  # absent on disk
    ]
)

N = 120_000  # above DISTRIBUTED_ROWS_THRESHOLD


@pytest.fixture(scope="module")
def big_db(tmp_path_factory):
    db = str(tmp_path_factory.mktemp("sqlite") / "big.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE messages (_id INTEGER PRIMARY KEY, body TEXT, ts INT, payload BLOB)"
    )
    con.executemany(
        "INSERT INTO messages VALUES (?, ?, ?, ?)",
        (
            (i, f"body {i}", 1577836800000 + i, b"\xff\xd8" + i.to_bytes(4, "big"))
            for i in range(N)
        ),
    )
    con.execute("CREATE TABLE norowid (k TEXT PRIMARY KEY, v INT) WITHOUT ROWID")
    con.executemany(
        "INSERT INTO norowid VALUES (?, ?)", ((f"k{i}", i) for i in range(5))
    )
    con.commit()
    con.close()
    return db


def test_big_table_routes_to_distributed_scan(spark, big_db):
    df = sio.read_sqlite_table(spark, big_db, "messages", SCHEMA)
    # range scan: one partition per rowid slice, not a single local list
    assert df.rdd.getNumPartitions() > 1
    assert df.count() == N
    agg = df.agg(
        F.min("_id"), F.max("_id"), F.count_distinct("_id"), F.sum("ts")
    ).collect()[0]
    assert (agg[0], agg[1], agg[2]) == (0, N - 1, N)
    assert agg[3] == sum(1577836800000 + i for i in range(N))


def test_distributed_equals_driver_path(spark, big_db, monkeypatch):
    dist = sio.read_sqlite_table(spark, big_db, "messages", SCHEMA)
    monkeypatch.setattr(sio, "DISTRIBUTED_ROWS_THRESHOLD", N + 1)
    drv = sio.read_sqlite_table(spark, big_db, "messages", SCHEMA)
    assert drv.rdd.getNumPartitions() >= 1
    assert dist.exceptAll(drv).count() == 0
    assert drv.exceptAll(dist).count() == 0


def test_distributed_schema_first_nulls_and_blobs(spark, big_db):
    row = (
        sio.read_sqlite_table(spark, big_db, "messages", SCHEMA)
        .filter(F.col("_id") == 7)
        .collect()[0]
    )
    assert row.ghost_col is None  # absent column -> NULL, same as driver path
    assert row.rowid == 7  # _id INTEGER PRIMARY KEY aliases the rowid
    assert bytes(row.payload) == b"\xff\xd8" + (7).to_bytes(4, "big")


def test_without_rowid_table_stays_on_driver_path(spark, big_db):
    schema = T.StructType(
        [
            T.StructField("rowid", T.LongType(), True),
            T.StructField("k", T.StringType(), True),
            T.StructField("v", T.LongType(), True),
        ]
    )
    df = sio.read_sqlite_table(spark, big_db, "norowid", schema)
    rows = {r.k: (r.rowid, r.v) for r in df.collect()}
    assert rows == {f"k{i}": (None, i) for i in range(5)}
