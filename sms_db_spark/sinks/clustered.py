"""Z-order (Morton-curve) file clustering: lay a store out so that
predicates on EITHER of two columns prune most files.

The multi-dimensional half of the storage story (partitioning covers
the time axis, bucketing the join key): a store range-sorted on one
column prunes beautifully on that column and not at all on any other —
every file's min/max for the second column spans the whole domain. The
Z-value interleaves the bits of both columns' normalized ranks, so
files (= Z-ranges) cover small RECTANGLES of the value space, and
parquet footer min/max stats prune on both axes. This is what
`OPTIMIZE ... ZORDER BY` does in lakehouse engines; here it is ~30
lines of Catalyst expressions plus repartitionByRange.

Everything stays JVM-side and shuffle-minimal: normalization bounds
come from one tiny agg (broadcast back as literals via crossJoin), the
Z-value is a fold over 16 bit positions, and the layout write is ONE
range shuffle (repartitionByRange carries its own sampling pass).
Trade-offs at 100 TB: Z-order wins when queries filter on several
columns independently; a single dominant filter column still prefers a
plain range sort. Like compaction, this runs as a per-partition
background rewrite."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution: 2^16 cells per axis


def _scale(col: str, lo: str, hi: str) -> str:
    """Map col into [0, 2^Z_BITS): exact int64 arithmetic, monotone."""
    return (
        f"CASE WHEN {hi} = {lo} THEN CAST(0 AS BIGINT) "
        f"ELSE (CAST({col} - {lo} AS BIGINT) * {(1 << Z_BITS) - 1}) div ({hi} - {lo}) END"
    )


def _interleave(xa: str, xb: str) -> Column:
    """Morton interleave of two pre-scaled Z_BITS-wide ints (xa even bits).
    Takes COLUMN names, not expressions: the fold references each input
    2·Z_BITS times, so the scaling must be computed once per row, not
    once per bit."""
    return F.expr(
        f"aggregate(sequence(0, {Z_BITS - 1}), CAST(0 AS BIGINT), (acc, i) -> "
        f"acc + shiftleft(shiftright({xa}, i) % 2, 2 * i) "
        f"    + shiftleft(shiftright({xb}, i) % 2, 2 * i + 1))"
    )


# every column _zframe adds; writers drop exactly this set so row
# content is untouched by the layout machinery
_Z_HELPER_COLS = ("_z", "_xa", "_xb", "lo_a", "lo_b", "hi_a", "hi_b")


def _zframe(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """THE z-value construction, shared by both writers and the audits
    that recompute per-file z-spans (q160): df plus the _Z_HELPER_COLS
    — scaled ranks _xa/_xb, Morton value _z, and the bounds literals.
    One tiny agg broadcast back as a one-row BroadcastNestedLoopJoin:
    no driver literal collect, no second scan of df."""
    bounds = df.agg(
        F.min(col_a).alias("lo_a"),
        F.max(col_a).alias("hi_a"),
        F.min(col_b).alias("lo_b"),
        F.max(col_b).alias("hi_b"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_xa", F.expr(_scale(col_a, "lo_a", "hi_a")))
        .withColumn("_xb", F.expr(_scale(col_b, "lo_b", "hi_b")))
        .withColumn("_z", _interleave("_xa", "_xb"))
    )


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int
) -> None:
    """Rewrite df into n_files parquet files clustered on the Z-curve of
    (col_a, col_b). Row content is unchanged; only co-location differs.

    EQUI-DEPTH variant — kept as the balanced-file-size option: the
    range shuffle cuts the curve by data mass, so every file is the
    same size, but file boundaries need not align with Morton cells
    and the "window reads ≤ half the files" bound is only statistical
    (it broke at sf0.1 — r14 finding, SCALE.md). Audits that gate the
    prune bound use write_zordered_cells, whose bound is arithmetic;
    use this writer when downstream cares about uniform file sizes
    more than a guaranteed prune fraction."""
    (
        _zframe(df, col_a, col_b)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop(*_Z_HELPER_COLS)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered_cells(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int
) -> None:
    """Z-order layout with CELL-ALIGNED files: one file per non-empty
    equal-width Morton cell, written as `_zcell=K/` partition dirs.

    Why this exists beside write_zordered (r14 finding, SCALE.md): the
    range-partitioned writer cuts the curve EQUI-DEPTH, so file
    boundaries land wherever data mass is — the audited "10%-of-domain
    window reads ≤ half the files" bound then holds only statistically,
    and a 5000-row corpus was enough to breach it (9/16 on the doc_id
    axis). This writer's bound is ARITHMETIC: cells are equal-WIDTH in
    each scaled axis, with log2(n_files) split evenly across the two
    axes (col_b gets the extra bit, matching _interleave's bit order),
    so each axis has s strata of width 1/s of the domain; a window of
    width ≤ 1/s - 1 cell units spans at most 2 adjacent strata, hence
    at most 2·(n_files/s) files — n_files/2 for the square n_files=16
    case, at ANY corpus size and ANY distribution.

    The trade is file-size balance: a file's size is its cell's mass
    (corner cells run light, empty cells produce no file) — the
    standard cell-aligned-vs-equi-depth choice; at real scale n_files
    is thousands and cells are fine. Readers drop the `_zcell`
    partition column (read_zordered_cells) so row content and any
    downstream row-hash are untouched.

    Physical shape: one bounds agg (broadcast back, no driver
    literal), map-side cell id, one hash exchange on the cell id (a
    cell's rows land in one task, so files == non-empty cells even
    when cells share a task), `_z`-sorted within each file for
    row-group-level stats.

    NULLs in either clustering column are REJECTED (assert_true folded
    into the cell expression — no extra pass): a NULL cell would write
    a __HIVE_DEFAULT_PARTITION__ file whose OTHER axis spans the whole
    domain, silently breaking both the files==cells accounting and the
    window bound. Cluster on non-null columns, or coalesce a sentinel
    upstream where NULL is a real category.

    Wired (r15): q151's layout audit and q160's zorder hop run THIS
    writer (VERDICT r14 item 1); write_zordered stays as the
    balanced-file-size option, both on the shared _zframe helper."""
    bits_total = (n_files - 1).bit_length()
    if 1 << bits_total != n_files:
        raise ValueError(f"n_files must be a power of two, got {n_files}")
    bits_a = bits_total // 2
    bits_b = bits_total - bits_a
    cell = F.expr(
        # the cell fixes the same bit SET as the Morton prefix (top
        # bits_b of b, top bits_a of a), just concatenated instead of
        # interleaved — a label permutation of the curve's prefix
        # cells, so each cell is still ONE contiguous z-range and
        # per-file z-intervals stay pairwise disjoint (the q160-style
        # clustering check holds under this writer too). The coalesced
        # assert_true rejects NULL clustering keys loudly (see
        # docstring); it is the LEFT-most operand deliberately —
        # interpreted Add.eval short-circuits to NULL without touching
        # the right child when the left is NULL, so a guard appended
        # on the right would be skipped for exactly the rows it exists
        # to catch.
        f"coalesce(CAST(assert_true({col_a} IS NOT NULL AND {col_b} IS NOT NULL, "
        f"'write_zordered_cells: NULL in clustering column ({col_a}, {col_b})') "
        f"AS BIGINT), CAST(0 AS BIGINT)) "
        f"+ shiftleft(shiftright(_xb, {Z_BITS - bits_b}), {bits_a}) "
        f"+ shiftright(_xa, {Z_BITS - bits_a})"
    )
    (
        _zframe(df, col_a, col_b)
        .withColumn("_zcell", cell.cast("int"))
        .repartition(n_files, "_zcell")
        .sortWithinPartitions("_zcell", "_z")
        .drop(*_Z_HELPER_COLS)
        .write.mode("overwrite")
        .partitionBy("_zcell")
        .parquet(path)
    )


def read_zordered_cells(spark, path: str) -> DataFrame:
    """Read a write_zordered_cells store with the cell column dropped —
    row content identical to the input frame (downstream row-hashes,
    shard checksums, and exports see no layout artifact)."""
    return spark.read.parquet(path).drop("_zcell")


def _ranges_from_metadata(md, name: str, cols: list[str]) -> dict:
    """THE footer-metadata → per-column (min, max) extraction, shared by
    both range readers so a stats-handling fix can never apply to one
    and not the other. A column with unusable stats — zero row groups,
    absent from the file (schema evolution), or missing min/max — maps
    to None: 'cannot prune on this file', the same conservative meaning
    merge.py's key_range assigns (files_overlapping counts it as
    overlapping everything)."""
    rng: dict = {"file": name}
    if md.num_row_groups == 0:
        rng.update({c: None for c in cols})
        return rng
    idx = {md.row_group(0).column(i).path_in_schema: i for i in range(md.num_columns)}
    for c in cols:
        if c not in idx:
            rng[c] = None
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or st.min is None or st.max is None:
                mins = []
                break
            mins.append(st.min)
            maxs.append(st.max)
        rng[c] = (min(mins), max(maxs)) if mins else None
    return rng


def file_column_ranges_fs(spark, path: str, cols: list[str]) -> list[dict]:
    """file_column_ranges for any Hadoop-reachable store (HDFS/S3A, not
    just the driver's local disk): data files come from the Hadoop FS
    listing and each footer is read with pyarrow FileSystem.from_uri
    through fsutil's scheme-alias table. Driver-side by design — the
    callers are layout AUDITS over a handful of files; a million-file
    prune uses the distributed footer scan in sinks/merge.py."""
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    from ..fsutil import pyarrow_uri
    from .compaction import _data_files

    out = []
    for fpath, _bytes in sorted(_data_files(spark, path)):
        pfs, ppath = pafs.FileSystem.from_uri(pyarrow_uri(fpath))
        with pfs.open_input_file(ppath) as fh:
            md = pq.ParquetFile(fh).metadata
        out.append(_ranges_from_metadata(md, fpath.rsplit("/", 1)[-1], cols))
    return out


def file_column_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per-data-file min/max for cols, read from the parquet footers —
    exactly the stats a scan's file/row-group pruning consults."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith("_"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        out.append(_ranges_from_metadata(md, name, cols))
    return out


def files_overlapping(ranges: list[dict], col: str, lo, hi) -> int:
    """How many files a [lo, hi] predicate on col would have to read.
    A None range (unusable footer stats) cannot be pruned and counts
    as overlapping — the same conservatism as the merge prune."""
    return sum(
        1
        for r in ranges
        if r[col] is None or not (r[col][1] < lo or r[col][0] > hi)
    )
