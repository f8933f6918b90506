"""Versioned (commit-pointer) store: the store is NEVER missing at any
crash point, commits are total replacements, unmarked crash remnants
are orphans forever (never restorable, never counted by retention),
pointer loss on a no-atomic-rename filesystem is diagnosed and
recoverable, and ordering is numeric, not lexicographic."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sms_db_spark.fsutil import hadoop_fs, read_text, write_text_atomic
from sms_db_spark.sinks.versioned import (
    commit_version,
    current_version,
    history,
    prune_versions,
    read_current,
    recover_head,
    rewrite_current,
)


def _df(spark, n, tag):
    return spark.range(n).select(F.col("id"), F.lit(tag).alias("tag"))


def _statuses(spark, store):
    return {h["version"]: h["status"] for h in history(spark, store)}


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
    assert _statuses(spark, store) == {"v00000001": "old", "v00000002": "live"}
    assert spark.read.parquet(f"{store}/_versions/v00000001").count() == 10


def test_crashed_write_is_an_orphan_forever(spark, tmp_path):
    """A dir without the _COMMITTED marker is a crashed write: invisible
    to readers, reported as orphan even after later commits number past
    it (an operator must never be told it is restorable), its number
    burned, and deleted by the first prune."""
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 10, "a"))
    # crashed writer: data landed, marker never written
    _df(spark, 99, "crash").write.parquet(f"{store}/_versions/v00000002")
    assert current_version(spark, store) == "v00000001"
    assert read_current(spark, store).count() == 10
    assert _statuses(spark, store)["v00000002"] == "orphan"
    v3 = commit_version(spark, store, _df(spark, 5, "c"))
    assert v3 == "v00000003"  # the orphan's number is burned, not reused
    # STILL an orphan after live numbered past it — not "old"/restorable
    assert _statuses(spark, store)["v00000002"] == "orphan"
    assert read_current(spark, store).count() == 5


def test_orphans_do_not_displace_retention(spark, tmp_path):
    """Retention counts COMMITTED versions only: a crash remnant newer
    than live must not push a real committed version out of the keep
    window (it gets deleted itself instead)."""
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 1, "a"))
    commit_version(spark, store, _df(spark, 2, "b"))
    _df(spark, 99, "crash").write.parquet(f"{store}/_versions/v00000003")  # orphan
    doomed = prune_versions(spark, store, keep=2)
    assert doomed == ["v00000003"]  # the orphan, not committed v1
    assert _statuses(spark, store) == {"v00000001": "old", "v00000002": "live"}


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


def test_stale_tmp_pointer_file_does_not_confuse_reads(spark, tmp_path):
    """A crashed pointer update can leave `_HEAD.tmp` behind; reads must
    keep resolving through `_HEAD` untouched."""
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 10, "a"))
    jvm, fs = hadoop_fs(spark, store)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{store}/_HEAD.tmp"), True)
    out.write(bytearray(b'{"version": "v99999999"}'))
    out.close()
    assert current_version(spark, store) == "v00000001"
    assert read_current(spark, store).count() == 10


def test_lost_pointer_is_diagnosed_and_recoverable(spark, tmp_path):
    """write_text_atomic's documented object-store fallback can crash
    between delete and rename, dropping `_HEAD`. The markers make the
    state unambiguous: read_current names the real problem (not 'no
    commit'), recover_head completes the interrupted flip forward."""
    import pytest

    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 10, "a"))
    commit_version(spark, store, _df(spark, 4, "b"))
    jvm, fs = hadoop_fs(spark, store)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{store}/_HEAD"), False)
    with pytest.raises(RuntimeError, match="recover_head"):
        read_current(spark, store)
    assert recover_head(spark, store) == "v00000002"
    assert read_current(spark, store).count() == 4
    assert recover_head(spark, store) is None  # healthy store: no-op


def test_version_ordering_is_numeric_not_lexicographic(spark, tmp_path):
    """'v100000000' < 'v99999999' lexicographically; numbering, history
    and retention must all order by the integer."""
    store = str(tmp_path / "store")
    for n, rows in ((99999999, 2), (100000000, 3)):
        name = f"v{n:08d}"
        _df(spark, rows, name).write.parquet(f"{store}/_versions/{name}")
        write_text_atomic(
            spark, f"{store}/_versions/{name}/_COMMITTED", json.dumps({"version": name})
        )
    write_text_atomic(spark, f"{store}/_HEAD", json.dumps({"version": "v100000000"}))
    assert read_current(spark, store).count() == 3
    v = commit_version(spark, store, _df(spark, 7, "next"))
    assert v == "v100000001"  # past the 9-digit max, not 99999999+1 again
    assert _statuses(spark, store) == {
        "v99999999": "old",
        "v100000000": "old",
        "v100000001": "live",
    }


def test_prune_keeps_newest_and_refuses_unsafe_keep(spark, tmp_path):
    import pytest

    store = str(tmp_path / "store")
    for i in range(4):
        commit_version(spark, store, _df(spark, i + 1, f"t{i}"))
    doomed = prune_versions(spark, store, keep=2)
    assert doomed == ["v00000001", "v00000002"]
    assert set(_statuses(spark, store)) == {"v00000003", "v00000004"}
    assert read_current(spark, store).count() == 4  # live untouched
    with pytest.raises(ValueError, match="keep"):
        prune_versions(spark, store, keep=1)


def test_read_uncommitted_store_raises_loudly(spark, tmp_path):
    import pytest

    store = str(tmp_path / "store")
    # data dir exists (interrupted FIRST commit), marker never written
    _df(spark, 7, "x").write.parquet(f"{store}/_versions/v00000001")
    with pytest.raises(FileNotFoundError, match="_HEAD"):
        read_current(spark, store)


def test_compact_current_rewrites_through_the_pointer(spark, tmp_path):
    """The versioned layout's compaction: byte-derived budget decides,
    the rewrite lands as a new committed version (rows exact, old
    version intact for in-flight readers), and a compact store is a
    no-op — the same idempotence guard as the swap-based compact."""
    from sms_db_spark.sinks.versioned import compact_current

    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 40, "a").repartition(8))
    r1 = compact_current(spark, store)
    assert r1["compacted"] is True and r1["version"] == "v00000002"
    assert r1["n_files"] == 8 and r1["n_files_after"] == 1
    got = read_current(spark, store)
    assert got.count() == 40
    assert spark.read.parquet(f"{store}/_versions/v00000001").count() == 40
    r2 = compact_current(spark, store)  # already compact: no new version
    assert r2["compacted"] is False
    assert current_version(spark, store) == "v00000002"


def test_dead_marked_version_does_not_displace_retention(spark, tmp_path):
    """A commit that crashed AFTER its marker but BEFORE the flip (head
    still on the old version, then superseded) is dead, not lineage: it
    must be reported 'dead', pruned outright, and must never push the
    previous live version — which readers may still be scanning — out
    of the keep window."""
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 10, "a"))  # v1 (live)
    # crashed flip: data + marker landed, _HEAD never moved off v1
    _df(spark, 99, "crash").write.parquet(f"{store}/_versions/v00000002")
    write_text_atomic(
        spark, f"{store}/_versions/v00000002/_COMMITTED", '{"version": "v00000002"}'
    )
    commit_version(spark, store, _df(spark, 5, "c"))  # v3 (live)
    assert _statuses(spark, store)["v00000002"] == "dead"
    doomed = prune_versions(spark, store, keep=2)
    assert doomed == ["v00000002"]  # the dead dir, NOT committed v1
    assert _statuses(spark, store) == {"v00000001": "old", "v00000003": "live"}


def test_rollback_is_append_only_and_lineage_gated(spark, tmp_path):
    """rollback serves only versions that were actually live once, and
    records itself as one more publication: the just-superseded version
    keeps its retention window (a reader may be scanning it) and can be
    rolled forward to again; a marked dir that was never published is
    refused."""
    import pytest

    from sms_db_spark.sinks.versioned import rollback

    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 10, "a"))
    commit_version(spark, store, _df(spark, 4, "b"))
    was = rollback(spark, store, "v00000001")
    assert was == "v00000002"
    assert read_current(spark, store).count() == 10
    # v2 stays lineage ("old"), NOT dead: readers may still hold it
    assert _statuses(spark, store) == {"v00000001": "live", "v00000002": "old"}
    # and rolling forward again is possible
    assert rollback(spark, store, "v00000002") == "v00000001"
    assert read_current(spark, store).count() == 4
    # a crashed flip (marked, never published) is never a valid target
    _df(spark, 9, "crash").write.parquet(f"{store}/_versions/v00000003")
    write_text_atomic(
        spark, f"{store}/_versions/v00000003/_COMMITTED", '{"version": "v00000003"}'
    )
    with pytest.raises(ValueError, match="never published"):
        rollback(spark, store, "v00000003")


def test_versioned_day2_composition(spark, tmp_path):
    """The day-2 chain on the pointer layout: ingest-commit → merged
    recommit → compact_current → prune — content exact at every step
    (full row multiset, not counts), the store readable throughout, and
    the final lineage exactly the retained tail."""
    from sms_db_spark.sinks.versioned import compact_current

    store = str(tmp_path / "store")
    day1 = _df(spark, 30, "day1")
    commit_version(spark, store, day1.repartition(6))
    day2 = _df(spark, 10, "day2").select((F.col("id") + 100).alias("id"), "tag")
    merged = read_current(spark, store).unionByName(day2)
    commit_version(spark, store, merged.repartition(8))
    want = sorted((r.id, r.tag) for r in day1.collect()) + sorted(
        (r.id, r.tag) for r in day2.collect()
    )
    assert sorted((r.id, r.tag) for r in read_current(spark, store).collect()) == sorted(want)
    r = compact_current(spark, store)
    assert r["compacted"] is True
    assert sorted((r2.id, r2.tag) for r2 in read_current(spark, store).collect()) == sorted(want)
    doomed = prune_versions(spark, store, keep=2)
    assert doomed == ["v00000001"]
    assert _statuses(spark, store) == {"v00000002": "old", "v00000003": "live"}
    assert sorted((r2.id, r2.tag) for r2 in read_current(spark, store).collect()) == sorted(want)


def test_lost_pointer_recovery_protects_all_readopted_versions(spark, tmp_path):
    """After recover_head rebuilds a lost pointer the flip log is gone,
    so ANY committed version could be reader-held — including one
    shadowed by a dead flip. Prune must delete NOTHING until `keep`
    distinct post-recovery versions exist; then the readopted set ages
    out together."""
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 1, "a"))
    commit_version(spark, store, _df(spark, 2, "b"))
    # dead flip: marker landed, _HEAD never moved (still v2)...
    _df(spark, 9, "crash").write.parquet(f"{store}/_versions/v00000003")
    write_text_atomic(
        spark, f"{store}/_versions/v00000003/_COMMITTED", '{"version": "v00000003"}'
    )
    # ...then the NEXT flip crashes on the object-store fallback: _HEAD lost
    jvm, fs = hadoop_fs(spark, store)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{store}/_HEAD"), False)
    doomed = prune_versions(spark, store, keep=2)  # runs recover_head itself
    # the dead flip must NOT displace pre-crash-live v2 from retention:
    # with the log gone, nothing readopted may be deleted yet
    assert doomed == []
    assert spark.read.parquet(f"{store}/_versions/v00000002").count() == 2
    # protection releases once keep distinct NEW versions exist
    commit_version(spark, store, _df(spark, 4, "d"))
    commit_version(spark, store, _df(spark, 5, "e"))
    doomed = prune_versions(spark, store, keep=2)
    assert doomed == ["v00000001", "v00000002", "v00000003"]
    assert _statuses(spark, store) == {"v00000004": "old", "v00000005": "live"}
    assert read_current(spark, store).count() == 5


def test_headless_history_reports_unpublished_not_dead(spark, tmp_path):
    """With the pointer (and lineage) lost, a read-only audit cannot
    know served-from-crashed; it must say 'unpublished', not condemn
    recoverable data as dead."""
    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 2, "a"))
    commit_version(spark, store, _df(spark, 3, "b"))
    jvm, fs = hadoop_fs(spark, store)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{store}/_HEAD"), False)
    assert _statuses(spark, store) == {
        "v00000001": "unpublished",
        "v00000002": "unpublished",
    }


def test_prune_bounds_lineage_and_drops_dangling_names(spark, tmp_path):
    """Rollback ping-pong appends to the lineage; prune must collapse it
    to distinct survivors (the head document stays bounded) and drop
    names whose dirs no longer exist (a pre-fix crash could have left
    them), so `_HEAD` never names a deleted version."""
    from sms_db_spark.sinks.versioned import rollback

    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 1, "a"))
    commit_version(spark, store, _df(spark, 2, "b"))
    for _ in range(3):
        rollback(spark, store, "v00000001")
        rollback(spark, store, "v00000002")
    # manufacture a lineage entry whose dir is gone (crashed old prune)
    head = json.loads(read_text(spark, f"{store}/_HEAD"))
    head["published"] = ["v00000099"] + head["published"]
    write_text_atomic(spark, f"{store}/_HEAD", json.dumps(head))
    prune_versions(spark, store, keep=2)
    after = json.loads(read_text(spark, f"{store}/_HEAD"))
    assert after["published"] == ["v00000001", "v00000002"]  # collapsed + healed
    assert read_current(spark, store).count() == 2


def test_merge_current_equals_flat_merge_and_is_rollbackable(spark, tmp_path):
    """merge_current = merge_into's exact semantics through the commit
    pointer: same stats and same resulting rows as the flat-store merge
    on identical inputs, with the pre-merge version still live-able via
    rollback (the zero-window failed-merge answer)."""
    from sms_db_spark.sinks.merge import merge_into
    from sms_db_spark.sinks.versioned import merge_current, rollback

    target = spark.range(10).select(
        "id", (F.col("id") * 10).alias("value"), F.lit("old").alias("src")
    )
    source = spark.range(5, 15).select(
        "id", (F.col("id") * 100).alias("value"), F.lit("new").alias("src")
    )
    flat = str(tmp_path / "flat")
    target.write.parquet(flat)
    flat_stats = merge_into(
        spark, flat, source, ["id"], delete_condition=F.col("s_id") == 7
    )

    store = str(tmp_path / "versioned")
    v1 = commit_version(spark, store, target)
    stats = merge_current(
        spark, store, source, ["id"], delete_condition=F.col("s_id") == 7
    )
    version = stats.pop("version")
    assert stats == flat_stats  # {'inserted':5,'updated':4,'deleted':1,'unchanged':5}
    assert stats == {"inserted": 5, "updated": 4, "deleted": 1, "unchanged": 5}
    merged = read_current(spark, store)
    flat_rows = spark.read.parquet(flat)
    assert merged.exceptAll(flat_rows).count() == 0
    assert flat_rows.exceptAll(merged).count() == 0
    # the pre-merge state never stopped existing: rollback restores it
    assert _statuses(spark, store) == {v1: "old", version: "live"}
    assert rollback(spark, store, v1) == version
    assert read_current(spark, store).exceptAll(target).count() == 0


def test_merge_current_schema_mismatch_refused_without_new_version(spark, tmp_path):
    from sms_db_spark.sinks.versioned import merge_current

    import pytest

    store = str(tmp_path / "store")
    v1 = commit_version(spark, store, _df(spark, 5, "a"))
    bad = spark.range(3).select("id", F.lit(1).alias("unexpected"))
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_current(spark, store, bad, ["id"])
    # refusal happened BEFORE any commit: the store is untouched
    assert current_version(spark, store) == v1
    assert _statuses(spark, store) == {v1: "live"}


def test_merge_current_recovers_lost_pointer_at_entry(spark, tmp_path):
    """merge_current is a writer entry point: a pointer lost to the
    object-store fallback must be repaired there, not refused by
    read_current (the module's run-recovery-at-every-writer-entry
    contract)."""
    from sms_db_spark.sinks.versioned import merge_current

    store = str(tmp_path / "store")
    commit_version(spark, store, _df(spark, 5, "a"))
    jvm, fs = hadoop_fs(spark, store)
    assert fs.delete(jvm.org.apache.hadoop.fs.Path(f"{store}/_HEAD"), False)
    source = _df(spark, 8, "a")  # 5 updates + 3 inserts
    stats = merge_current(spark, store, source, ["id"])
    assert (stats["updated"], stats["inserted"]) == (5, 3)
    assert read_current(spark, store).count() == 8


def test_delete_cascade_drops_children_and_is_idempotent(spark, tmp_path):
    """delete_cascade (sms-db.pl:53 ON DELETE CASCADE parity): children
    of deleted parents go, children of survivors stay, absent ids are a
    no-op (DELETE is idempotent), parts commit BEFORE messages (the
    crash contract: no crash point can publish an orphan part), and a
    repeat delete commits new versions with identical content."""
    from sms_db_spark.sinks.versioned import delete_cascade

    m_store, p_store = str(tmp_path / "m"), str(tmp_path / "p")
    msgs = spark.range(10).select(F.col("id").alias("_id"))
    parts = (
        spark.range(30)
        .select((F.col("id") % 10).alias("message_id"), F.col("id").alias("pid"))
    )
    commit_version(spark, m_store, msgs)
    commit_version(spark, p_store, parts)
    # delete 2 present ids + 1 absent id
    doomed = spark.createDataFrame([(3,), (7,), (99,)], "_id bigint")
    vs = delete_cascade(spark, m_store, p_store, doomed)
    assert vs == {"parts_version": "v00000002", "messages_version": "v00000002"}
    m = read_current(spark, m_store)
    p = read_current(spark, p_store)
    assert sorted(r._id for r in m.collect()) == [0, 1, 2, 4, 5, 6, 8, 9]
    assert p.count() == 24  # 3 children each for ids 3 and 7 dropped
    assert p.filter(F.col("message_id").isin(3, 7)).count() == 0
    # FK law: no orphan parts after the cascade
    orphans = p.join(
        m.select(F.col("_id").alias("message_id")), "message_id", "left_anti"
    )
    assert orphans.count() == 0
    # idempotent: same delete again commits v3 with identical content
    delete_cascade(spark, m_store, p_store, doomed)
    assert current_version(spark, m_store) == "v00000003"
    assert read_current(spark, m_store).count() == 8
    assert read_current(spark, p_store).count() == 24
