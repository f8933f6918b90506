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


def test_cell_aligned_zorder_bound_is_structural(spark, tmp_path):
    """The r14 finding's fix candidate: write_zordered_cells must hold
    the ≤ n_files/2 window bound for EVERY aligned 10% window on BOTH
    axes at the exact scale that broke the equi-depth writer (sf0.1's
    5000 docs, where write_zordered measured 9/16 on doc_id) — and
    preserve content exactly with the cell column dropped."""
    from sms_db_spark.sinks.clustered import (
        file_column_ranges_fs,
        read_zordered_cells,
        write_zordered_cells,
    )

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    zpath = str(tmp_path / "zcells")
    write_zordered_cells(docs, zpath, "doc_id", "n_chars", N_FILES)

    back = read_zordered_cells(spark, zpath)
    assert "_zcell" not in back.columns
    assert back.exceptAll(docs).unionAll(docs.exceptAll(back)).count() == 0

    ranges = file_column_ranges_fs(spark, zpath, ["doc_id", "n_chars"])
    assert len(ranges) == N_FILES  # all 16 cells populated on this corpus

    # the structural premise the bound formula rests on: an even bit
    # split (4 strata per axis at N_FILES=16), so a 10% window spans
    # <= 2 strata and the bound is 2 * (N_FILES / strata)
    assert N_FILES == 16
    strata = 4
    bound = 2 * (N_FILES // strata)
    assert bound == N_FILES // 2

    stats = {
        c: docs.agg(F.min(c), F.max(c)).collect()[0]
        for c in ("doc_id", "n_chars")
    }
    for c in ("doc_id", "n_chars"):
        lo, hi = stats[c]
        span = hi - lo
        for tenth in range(10):  # EVERY aligned 10% window, both axes
            wlo = lo + span * tenth // 10
            whi = lo + span * (tenth + 1) // 10
            n = files_overlapping(ranges, c, wlo, whi)
            assert n <= bound, (c, tenth, n)


def test_cell_bound_survives_adversarial_skew(spark, tmp_path):
    """All mass in one quadrant — the distribution equi-depth provably
    fails: 99% of rows live in the low-(a,b) corner, so equi-depth
    cuts nearly all 16 file boundaries inside that corner and the few
    outlier rows stretch some file's doc_id range across the domain.
    The cell writer's bound must hold for EVERY aligned 10% window on
    both axes regardless, because strata are equal-WIDTH in the scaled
    domain, not equal-mass."""
    from sms_db_spark.sinks.clustered import (
        file_column_ranges_fs,
        files_overlapping,
        read_zordered_cells,
        write_zordered,
        write_zordered_cells,
    )

    # 9900 rows in [0, 1000)x[0, 1000), 100 spread over [0, 100000)^2
    df = spark.range(10000).selectExpr(
        "CASE WHEN id < 9900 THEN (id * 37) % 1000 "
        "     ELSE 1000 + (id - 9900) * 990 END AS a",
        "CASE WHEN id < 9900 THEN (id * 61) % 1000 "
        "     ELSE 1000 + (id - 9900) * 990 END AS b",
        "id AS payload",
    )
    zc, zd = str(tmp_path / "cells"), str(tmp_path / "depth")
    write_zordered_cells(df, zc, "a", "b", N_FILES)
    write_zordered(df, zd, "a", "b", N_FILES)

    back = read_zordered_cells(spark, zc)
    assert back.exceptAll(df).unionAll(df.exceptAll(back)).count() == 0

    cr = file_column_ranges_fs(spark, zc, ["a", "b"])
    dr = file_column_ranges_fs(spark, zd, ["a", "b"])
    lo, hi = 0, 1000 + 99 * 990
    bound = N_FILES // 2
    worst_cell, worst_depth = 0, 0
    for c in ("a", "b"):
        for tenth in range(10):
            wlo = lo + (hi - lo) * tenth // 10
            whi = lo + (hi - lo) * (tenth + 1) // 10
            worst_cell = max(worst_cell, files_overlapping(cr, c, wlo, whi))
            worst_depth = max(worst_depth, files_overlapping(dr, c, wlo, whi))
    assert worst_cell <= bound, worst_cell
    # and the skew really is adversarial: equi-depth breaches the same
    # bound on this corpus — a FIXTURE-VALIDITY check, not a product
    # law (ADVICE r15 #3: it rides repartitionByRange's reservoir
    # sampling, so a Spark version or sampling change could flip it
    # without any cell-writer regression). Skip-with-explanation in
    # that case instead of failing CI: the cell bound above has
    # already been asserted; the fixture just stopped DEMONSTRATING
    # the failure mode and needs a more adversarial corpus.
    if worst_depth <= bound:
        import pytest as _pytest

        _pytest.skip(
            f"equi-depth no longer breaches the prune bound on this "
            f"corpus (worst_depth={worst_depth} <= bound={bound}) — "
            f"sampling behavior changed; re-derive the skew fixture"
        )


def test_cell_aligned_zorder_rejects_non_power_of_two(spark, tmp_path):
    from sms_db_spark.sinks.clustered import write_zordered_cells
    import pytest as _pytest

    docs = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey")
    with _pytest.raises(ValueError):
        write_zordered_cells(docs, str(tmp_path / "x"), "l_partkey", "l_suppkey", 12)


def test_cell_files_cover_disjoint_z_ranges(spark, tmp_path):
    """The q160-style clustering check must hold under the cell writer:
    each file's recomputed z-values form an interval disjoint from
    every other file's (the cell label permutes the Morton prefix's
    bits, but the fixed bit SET is the same, so a cell is one
    contiguous z-range)."""
    from sms_db_spark.sinks.clustered import (
        _interleave,
        _scale,
        write_zordered_cells,
    )

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "zc4")
    write_zordered_cells(li, zpath, "l_partkey", "l_suppkey", 4)
    zed = spark.read.parquet(zpath).drop("_zcell")
    zb = zed.agg(
        F.min("l_partkey").alias("lo_a"),
        F.max("l_partkey").alias("hi_a"),
        F.min("l_suppkey").alias("lo_b"),
        F.max("l_suppkey").alias("hi_b"),
    )
    spans = (
        spark.read.parquet(zpath)
        .crossJoin(F.broadcast(zb))
        .withColumn("_xa", F.expr(_scale("l_partkey", "lo_a", "hi_a")))
        .withColumn("_xb", F.expr(_scale("l_suppkey", "lo_b", "hi_b")))
        .withColumn("_zv", _interleave("_xa", "_xb"))
        .groupBy("_zcell")
        .agg(F.min("_zv").alias("lo"), F.max("_zv").alias("hi"))
        .collect()
    )
    ivs = sorted((r.lo, r.hi) for r in spans)
    assert len(ivs) <= 4
    # STRICT <, unlike q160's <= over the equi-depth writer: there a
    # duplicate z-value can legitimately straddle a range-partition
    # cut; here a z-value belongs to exactly one cell, so any shared
    # endpoint would mean a shift off-by-one leaked a boundary value
    # into the neighboring cell
    assert all(ivs[i][1] < ivs[i + 1][0] for i in range(len(ivs) - 1)), ivs


def test_cell_writer_rejects_null_clustering_keys(spark, tmp_path):
    # a NULL key would write a __HIVE_DEFAULT_PARTITION__ file whose
    # other axis spans the whole domain — the writer must fail loudly
    from sms_db_spark.sinks.clustered import write_zordered_cells
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "a long, b int"
    )
    with _pytest.raises(Exception, match="NULL in clustering column"):
        write_zordered_cells(df, str(tmp_path / "n"), "a", "b", 4)
