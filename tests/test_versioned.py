"""Versioned (commit-pointer) store: the store is NEVER missing at any
crash point, commits are total replacements, orphans stay invisible,
retention protects readers, history reports truthfully."""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.fsutil import read_text, write_text_atomic
from sms_db_spark.sinks.versioned import (
    commit_version,
    current_version,
    history,
    prune_versions,
    read_current,
    rewrite_current,
)


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_commit_then_read_roundtrip(spark, tmp_path):
    store = str(tmp_path / "store")
    v1 = commit_version(spark, store, _df(spark, 10, "a"))
    assert v1 == "v00000001" and current_version(spark, store) == v1
    got = read_current(spark, store)
    assert got.count() == 10 and got.filter(F.col("tag") == "a").count() == 10


def test_recommit_is_total_replacement_old_version_still_on_disk(spark, tmp_path):
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 10, "a"))
    v2 = commit_version(spark, store, _df(spark, 3, "b"))
    assert current_version(spark, store) == v2
    assert read_current(spark, store).count() == 3
    # the old version survives until pruned: restorable + readable
    assert {h["version"]: h["status"] for h in history(spark, store)} == {
        "v00000001": "old",
        "v00000002": "live",
    }
    assert spark.read.parquet(f"{store}/_versions/v00000001").count() == 10


def test_crash_before_pointer_flip_is_invisible(spark, tmp_path):
    """Simulate a writer dying after the data write but before the
    `_HEAD` flip: the new dir exists, the pointer doesn't move, readers
    see the old version, and the NEXT commit numbers past the orphan."""
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 10, "a"))
    # crashed writer: data landed, pointer never flipped
    _df(spark, 99, "crash").write.parquet(f"{store}/_versions/v00000002")
    assert current_version(spark, store) == "v00000001"
    assert read_current(spark, store).count() == 10
    statuses = {h["version"]: h["status"] for h in history(spark, store)}
    assert statuses["v00000002"] == "orphan"
    v3 = commit_version(spark, store, _df(spark, 5, "c"))
    assert v3 == "v00000003"  # the orphan's number is burned, not reused
    assert read_current(spark, store).count() == 5


def test_store_is_never_missing_during_rewrite(spark, tmp_path):
    """rewrite_current (the no-window compaction path): before, during
    (simulated by the old version's continued existence), and after, a
    reader resolving `_HEAD` gets a complete dataset."""
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 20, "a"))
    before = read_current(spark, store)  # reader resolved pre-rewrite
    rewrite_current(spark, store, lambda d: d.filter(F.col("id") < 5).coalesce(1))
    assert before.count() == 20  # the resolved version is still readable
    assert read_current(spark, store).count() == 5


def test_pointer_flip_is_atomic_against_old_head(spark, tmp_path):
    """A crashed `_HEAD` update can never leave the pointer missing:
    write_text_atomic's overwrite-rename keeps the old pointer until the
    new one is fully in place (regression anchor for the protocol)."""
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 10, "a"))
    head = f"{store}/_HEAD"
    assert read_text(spark, head) is not None
    # the .tmp staging file from a crashed update must not confuse reads
    write_text_atomic(spark, head, read_text(spark, head))
    assert current_version(spark, store) == "v00000001"


def test_prune_keeps_newest_and_refuses_unsafe_keep(spark, tmp_path):
    import pytest

    store = str(tmp_path / "store")
    for i in range(4):
        commit_version(spark, store, _df(spark, i + 1, f"t{i}"))
    doomed = prune_versions(spark, store, keep=2)
    assert doomed == ["v00000001", "v00000002"]
    left = {h["version"] for h in history(spark, store)}
    assert left == {"v00000003", "v00000004"}
    assert read_current(spark, store).count() == 4  # live untouched
    with pytest.raises(ValueError, match="keep"):
        prune_versions(spark, store, keep=1)


def test_read_uncommitted_store_raises_loudly(spark, tmp_path):
    import pytest

    store = str(tmp_path / "store")
    # data dir exists (interrupted FIRST commit), pointer never written
    _df(spark, 7, "x").write.parquet(f"{store}/_versions/v00000001")
    with pytest.raises(FileNotFoundError, match="_HEAD"):
        read_current(spark, store)
