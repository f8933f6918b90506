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


def _mkdb(path, n, offset=0):
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE messages (_id INTEGER PRIMARY KEY, body TEXT, ts INT, payload BLOB)")
    con.executemany(
        "INSERT INTO messages VALUES (?, ?, ?, ?)",
        ((i, f"body {offset + i}", offset + i, None) for i in range(n)),
    )
    con.commit()
    con.close()


def test_same_basename_dbs_do_not_collide(spark, tmp_path, monkeypatch):
    """Signal layouts pin fixed filenames — two different backups named
    database.sqlite in one session must each be read correctly (addFile
    keys by basename; the reader ships under unique names)."""
    monkeypatch.setattr(sio, "DISTRIBUTED_ROWS_THRESHOLD", 50)
    monkeypatch.setattr(sio, "ROWS_PER_RANGE_TASK", 100)
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(); b_dir.mkdir()
    _mkdb(str(a_dir / "database.sqlite"), 300, offset=0)
    _mkdb(str(b_dir / "database.sqlite"), 300, offset=1_000_000)
    sub = T.StructType(
        [T.StructField("_id", T.LongType()), T.StructField("ts", T.LongType())]
    )
    da = sio.read_sqlite_table(spark, str(a_dir / "database.sqlite"), "messages", sub)
    db = sio.read_sqlite_table(spark, str(b_dir / "database.sqlite"), "messages", sub)
    assert da.agg(F.min("ts"), F.max("ts")).collect()[0][:] == (0, 299)
    assert db.agg(F.min("ts"), F.max("ts")).collect()[0][:] == (1_000_000, 1_000_299)


def test_rewritten_db_is_not_served_stale(spark, tmp_path, monkeypatch):
    """Overwriting a previously-shipped db must re-ship: bounds come
    from the new file, so serving the old shipped bytes would silently
    return wrong rows."""
    import time as _time

    monkeypatch.setattr(sio, "DISTRIBUTED_ROWS_THRESHOLD", 50)
    monkeypatch.setattr(sio, "ROWS_PER_RANGE_TASK", 100)
    p = str(tmp_path / "mut.db")
    sub = T.StructType(
        [T.StructField("_id", T.LongType()), T.StructField("ts", T.LongType())]
    )
    _mkdb(p, 200, offset=0)
    first = sio.read_sqlite_table(spark, p, "messages", sub).count()
    assert first == 200
    _time.sleep(0.01)  # distinct mtime_ns
    import os as _os

    _os.remove(p)
    _mkdb(p, 260, offset=5_000)
    df = sio.read_sqlite_table(spark, p, "messages", sub)
    assert df.count() == 260
    assert df.agg(F.min("ts")).collect()[0][0] == 5_000


def test_wal_pending_frames_fall_back_to_driver_path(spark, tmp_path, monkeypatch):
    """A WAL db with uncheckpointed frames must NOT take the distributed
    path (only the main file ships; executors would miss the WAL rows)."""
    monkeypatch.setattr(sio, "DISTRIBUTED_ROWS_THRESHOLD", 50)
    p = str(tmp_path / "wal.db")
    con = sqlite3.connect(p)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE messages (_id INTEGER PRIMARY KEY, ts INT)")
    con.executemany(
        "INSERT INTO messages VALUES (?, ?)", ((i, i) for i in range(500))
    )
    con.commit()
    # an OPEN READ TRANSACTION keeps the writer's close() from
    # checkpointing and deleting the -wal sidecar
    holder = sqlite3.connect(p)
    holder.execute("BEGIN")
    holder.execute("SELECT 1 FROM messages LIMIT 1").fetchall()
    con.close()
    try:
        import os as _os

        assert _os.path.getsize(p + "-wal") > 0  # frames really pending

        def boom(*a, **k):
            raise AssertionError("distributed path taken on a WAL-pending db")

        monkeypatch.setattr(sio, "_read_sqlite_ranges", boom)
        sub = T.StructType([T.StructField("_id", T.LongType()), T.StructField("ts", T.LongType())])
        df = sio.read_sqlite_table(spark, p, "messages", sub)
        assert df.count() == 500  # driver path sees main + WAL
    finally:
        holder.close()


def test_symlinked_wal_db_still_falls_back(spark, tmp_path, monkeypatch):
    """The -wal sidecar lives next to the REAL file; a symlinked db path
    must not dodge the WAL guard (sidecar probe is realpath-based)."""
    monkeypatch.setattr(sio, "DISTRIBUTED_ROWS_THRESHOLD", 50)
    import os as _os

    real = str(tmp_path / "real.db")
    con = sqlite3.connect(real)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute("CREATE TABLE messages (_id INTEGER PRIMARY KEY, ts INT)")
    con.executemany("INSERT INTO messages VALUES (?, ?)", ((i, i) for i in range(300)))
    con.commit()
    holder = sqlite3.connect(real)
    holder.execute("BEGIN")
    holder.execute("SELECT 1 FROM messages LIMIT 1").fetchall()
    con.close()
    try:
        assert _os.path.getsize(real + "-wal") > 0
        link = str(tmp_path / "latest.db")
        _os.symlink(real, link)

        def boom(*a, **k):
            raise AssertionError("distributed path taken on a symlinked WAL-pending db")

        monkeypatch.setattr(sio, "_read_sqlite_ranges", boom)
        sub = T.StructType([T.StructField("_id", T.LongType()), T.StructField("ts", T.LongType())])
        assert sio.read_sqlite_table(spark, link, "messages", sub).count() == 300
    finally:
        holder.close()

def test_hot_rollback_journal_guard(spark, tmp_path, monkeypatch):
    """The sidecar guard must flag a HOT -journal (valid journal magic:
    a crashed writer — executors shipped only the main file would read
    the torn pages it exists to roll back, ADVICE r6) and must NOT flag
    a COLD one (zeroed header, what journal_mode=PERSIST leaves after
    every successful commit — flagging it would permanently disable the
    distributed scan for such dbs). End-to-end the guard is a BACKSTOP:
    the routing probe's own first statement triggers SQLite's
    hot-journal playback on the real file, so by ship time the main
    file is consistent either way — asserted last."""
    monkeypatch.setattr(sio, "DISTRIBUTED_ROWS_THRESHOLD", 50)
    import os as _os

    p = str(tmp_path / "crashed.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE messages (_id INTEGER PRIMARY KEY, ts INT)")
    con.executemany("INSERT INTO messages VALUES (?, ?)", ((i, i) for i in range(400)))
    con.commit()
    con.close()
    sub = T.StructType([T.StructField("_id", T.LongType()), T.StructField("ts", T.LongType())])
    hot = b"\xd9\xd5\x05\xf9\x20\xa1\x63\xd7" + b"\x00" * 504

    # COLD journal (PERSIST-mode leftover): not pending
    with open(p + "-journal", "wb") as fh:
        fh.write(b"\x00" * 512)
    assert not sio._sidecar_pending(sqlite3.connect(p), p)

    # HOT journal: pending — probed as pure file IO, before any SQL on
    # the connection could trigger recovery
    with open(p + "-journal", "wb") as fh:
        fh.write(hot)
    assert sio._sidecar_pending(sqlite3.connect(p), p)
    # a symlinked db path must not dodge the guard (realpath probe)
    link = str(tmp_path / "latest.db")
    _os.symlink(p, link)
    assert sio._sidecar_pending(sqlite3.connect(link), link)

    # end-to-end: the routing probe's first statement plays the hot
    # journal back (our fake holds zero records, so content is
    # unchanged), the sidecar is gone by routing time, and the
    # DISTRIBUTED read proceeds on the now-consistent file
    df = sio.read_sqlite_table(spark, p, "messages", sub)
    assert df.count() == 400
    assert not (
        _os.path.exists(p + "-journal") and _os.path.getsize(p + "-journal") > 0
        and open(p + "-journal", "rb").read(8) == hot[:8]
    )


def test_superseded_ship_links_bounded_to_one_pending(spark, tmp_path, monkeypatch):
    """A driver that repeatedly re-reads a rewritten db must not pin one
    shipped link per superseded version until process exit: eviction
    keeps exactly ONE generation back (in-flight fallback safety) and
    unlinks the older one at the next eviction of the same file
    (ADVICE r7). The live link and the current read stay intact."""
    import os as _os
    import time as _time

    monkeypatch.setattr(sio, "DISTRIBUTED_ROWS_THRESHOLD", 50)
    monkeypatch.setattr(sio, "ROWS_PER_RANGE_TASK", 100)
    p = str(tmp_path / "churn.db")
    sub = T.StructType(
        [T.StructField("_id", T.LongType()), T.StructField("ts", T.LongType())]
    )
    base = _os.path.basename(p)

    def links():
        return sorted(
            f for f in _os.listdir(sio._SHIP_DIR) if f.endswith("-" + base)
        )

    counts = []
    for gen in range(4):
        if _os.path.exists(p):
            _os.remove(p)
        _mkdb(p, 100 + gen, offset=gen * 10_000)
        _time.sleep(0.01)  # distinct mtime_ns
        df = sio.read_sqlite_table(spark, p, "messages", sub)
        assert df.count() == 100 + gen
        counts.append(len(links()))
    # gen 0: live only; every later gen: live + exactly one pending
    assert counts == [1, 2, 2, 2], counts
    # the pending one is the IMMEDIATELY superseded generation
    (pend,) = sio._SHIP_SUPERSEDED[_os.path.realpath(p)]
    assert pend in links()


def test_ship_maps_bounded_under_churn_and_dead_contexts(spark, tmp_path, monkeypatch):
    """Long-lived-driver growth of the ship structures is O(live dbs of
    the live context) (ADVICE r8 / VERDICT r8 item 5): churning one path
    keeps exactly one cache entry, one per-file lock, and at most one
    pending superseded link for it; entries of a DEAD SparkContext
    (another applicationId — its jobs cannot be in flight) are swept at
    the next ship, links unlinked, and their per-file locks dropped."""
    import os as _os
    import time as _time

    monkeypatch.setattr(sio, "DISTRIBUTED_ROWS_THRESHOLD", 50)
    monkeypatch.setattr(sio, "ROWS_PER_RANGE_TASK", 100)
    p = str(tmp_path / "bound.db")
    sub = T.StructType(
        [T.StructField("_id", T.LongType()), T.StructField("ts", T.LongType())]
    )
    real = None
    for gen in range(4):
        if _os.path.exists(p):
            _os.remove(p)
        _mkdb(p, 80 + gen, offset=gen * 1_000)
        _time.sleep(0.01)  # distinct mtime_ns
        assert sio.read_sqlite_table(spark, p, "messages", sub).count() == 80 + gen
        real = _os.path.realpath(p)
        # churn bound: one cache entry, one lock, ≤1 pending link for p
        assert sum(1 for k in sio._SHIP_CACHE if k[1] == real) == 1
        assert sum(1 for r in sio._SHIP_FILE_LOCKS if r == real) == 1
        assert len(sio._SHIP_SUPERSEDED.get(real, [])) <= 1
    # plant a dead-context entry (foreign applicationId) with real link
    # files: the next ship of ANY db must sweep entry, links, and lock
    import threading as _threading

    dead_main = _os.path.join(sio._SHIP_DIR, "sqlite-deadbeef-dead.db")
    dead_super = _os.path.join(sio._SHIP_DIR, "sqlite-cafebabe-dead.db")
    for f in (dead_main, dead_super):
        with open(f, "wb") as fh:
            fh.write(b"x")
    with sio._SHIP_LOCK:
        sio._SHIP_CACHE[("app-dead", "/dead/real.db", 1, 1)] = _os.path.basename(dead_main)
        sio._SHIP_SUPERSEDED["/dead/real.db"] = [_os.path.basename(dead_super)]
        sio._SHIP_FILE_LOCKS["/dead/real.db"] = _threading.Lock()
    _os.remove(p)
    _mkdb(p, 90, offset=9_000)
    _time.sleep(0.01)
    assert sio.read_sqlite_table(spark, p, "messages", sub).count() == 90
    assert not any(k[0] == "app-dead" for k in sio._SHIP_CACHE)
    assert "/dead/real.db" not in sio._SHIP_SUPERSEDED
    assert "/dead/real.db" not in sio._SHIP_FILE_LOCKS
    assert not _os.path.exists(dead_main) and not _os.path.exists(dead_super)


def test_duplicate_ship_defers_displaced_link(spark, tmp_path, monkeypatch):
    """Duplicate-ship race (ADVICE r9): the lock-map sweep can delete a
    per-file lock another thread setdefault-ed but had not yet
    acquired, so two threads can ship the SAME generation. The loser
    must not displace the winner's name (the winner's caller may still
    be resolving it, and shoving it into the pending slot would spend
    the one-generation window of the GENUINELY superseded link already
    deferred there) — the loser ADOPTS the winner's name and defers its
    own just-addFile'd link via _SHIP_SUPERSEDED, leaving the genuine
    pending link's window intact."""
    import os as _os

    p = str(tmp_path / "race.db")
    _mkdb(p, 40)
    real = _os.path.realpath(p)
    # make sure the ship dir exists before planting link files in it
    other = str(tmp_path / "other.db")
    _mkdb(other, 5)
    sio._ship_db(spark, other)
    ship_dir = sio._SHIP_DIR
    st = _os.stat(real)
    key = (spark.sparkContext.applicationId, real, st.st_mtime_ns, st.st_size)
    base = _os.path.basename(real)
    winner = f"sqlite-{'0' * 32}-{base}"
    pending = f"sqlite-{'1' * 32}-{base}"
    for n in (winner, pending):
        with open(_os.path.join(ship_dir, n), "wb") as fh:
            fh.write(b"x")

    # simulate the winner finishing between our cache recheck and our
    # insert: _ship_db calls addFile in exactly that window
    orig = spark.sparkContext.addFile

    def add_and_race(path):
        with sio._SHIP_LOCK:
            sio._SHIP_CACHE[key] = winner
            sio._SHIP_SUPERSEDED[real] = [pending]
        return orig(path)

    monkeypatch.setattr(spark.sparkContext, "addFile", add_and_race)
    try:
        name, link = sio._ship_db(spark, p)
    finally:
        monkeypatch.undo()
    # the loser adopted the winner's name: one name per generation
    assert name == winner and _os.path.exists(link)
    assert sio._SHIP_CACHE[key] == winner
    # the loser's own (never-handed-out, but addFile'd) link is
    # deferred alongside the genuine pending link — whose
    # one-generation window the race did NOT spend
    loser_links = [
        n for n in sio._SHIP_SUPERSEDED[real] if n not in (winner, pending)
    ]
    assert len(loser_links) == 1
    assert sio._SHIP_SUPERSEDED[real] == [pending, loser_links[0]]
    for n in (winner, pending, loser_links[0]):
        assert _os.path.exists(_os.path.join(ship_dir, n))
    # hygiene for later tests sharing the module-level maps
    with sio._SHIP_LOCK:
        sio._SHIP_CACHE.pop(key, None)
        sio._SHIP_SUPERSEDED.pop(real, None)
        sio._SHIP_FILE_LOCKS.pop(real, None)
