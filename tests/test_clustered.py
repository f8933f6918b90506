"""Z-order layout: rows preserved, and parquet footer stats prune files
on BOTH clustered columns — where a linear sort prunes only its own
column and reads everything for the other."""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.sinks.clustered import (
    file_column_ranges,
    files_overlapping,
    write_zordered,
)
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 16


def test_zorder_prunes_both_columns(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")

    write_zordered(li, zpath, "l_partkey", "l_suppkey", N_FILES)
    # baseline: same file count, range-sorted on l_partkey only
    li.repartitionByRange(N_FILES, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(lpath)

    assert spark.read.parquet(zpath).count() == li.count()
    # content identical, not just count
    assert (
        spark.read.parquet(zpath)
        .exceptAll(li)
        .unionAll(li.exceptAll(spark.read.parquet(zpath)))
        .count()
        == 0
    )

    zr = file_column_ranges(zpath, ["l_partkey", "l_suppkey"])
    lr = file_column_ranges(lpath, ["l_partkey", "l_suppkey"])
    assert len(zr) == len(lr) == N_FILES

    stats = {c: (li.agg(F.min(c), F.max(c)).collect()[0]) for c in ("l_partkey", "l_suppkey")}
    # a 10%-of-domain window on each column
    windows = {}
    for c in ("l_partkey", "l_suppkey"):
        lo, hi = stats[c]
        width = (hi - lo) // 10
        windows[c] = (lo + 4 * width, lo + 5 * width)

    # linear layout: perfect on its sort column, hopeless on the other
    assert files_overlapping(lr, "l_partkey", *windows["l_partkey"]) <= 4
    assert files_overlapping(lr, "l_suppkey", *windows["l_suppkey"]) == N_FILES

    # z-order: BOTH columns prune — neither window touches all files,
    # and each reads at most half the store
    za = files_overlapping(zr, "l_partkey", *windows["l_partkey"])
    zb = files_overlapping(zr, "l_suppkey", *windows["l_suppkey"])
    assert za <= N_FILES // 2, za
    assert zb <= N_FILES // 2, zb


def test_range_readers_conservative_on_unusable_stats(spark, tmp_path):
    """A file whose footer cannot answer for a column — schema-evolved
    (column absent) or empty — must read as unprunable (None range,
    counted overlapping by files_overlapping), never crash: the merge
    reader's conservatism, shared by both range readers."""
    from sms_db_spark.sinks.clustered import file_column_ranges_fs

    store = str(tmp_path / "evolved")
    spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v").coalesce(1).write.parquet(store)
    # a second file from BEFORE the v column existed
    spark.range(100, 200).selectExpr("id AS k").coalesce(1).write.mode(
        "append"
    ).parquet(store)

    for ranges in (
        file_column_ranges(store, ["k", "v"]),
        file_column_ranges_fs(spark, store, ["k", "v"]),
    ):
        assert len(ranges) == 2
        v_ranges = sorted((r["v"] for r in ranges), key=lambda x: x is not None)
        assert v_ranges[0] is None and v_ranges[1] == (0, 198)
        # k prunes normally; v's stats-less file overlaps ANY window
        assert files_overlapping(ranges, "k", 0, 10) == 1
        assert files_overlapping(ranges, "v", 500, 600) == 1
