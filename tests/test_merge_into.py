"""MERGE INTO: updates win from the source, inserts land, the delete
clause removes matched rows, unmatched target rows survive byte-exact,
and a schema mismatch refuses before touching the store."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sms_db_spark.sinks.merge import merge_into
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _seed(spark, tmp_path):
    store = str(tmp_path / "store")
    orders = load_table(spark, SF_DIR, "orders")
    orders.write.parquet(store)
    return store, orders


def test_merge_update_insert_delete(spark, tmp_path):
    store, orders = _seed(spark, tmp_path)
    n0 = orders.count()
    # source: 50 updated keys (price doubled), 10 brand-new keys,
    # and every matched 'F' row deleted via the condition
    upd = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    ins = orders.limit(10).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(max_key + 1000)
    )
    src = upd.unionByName(ins)
    n_upd, n_ins = upd.count(), ins.count()
    n_del_expected = upd.filter(F.col("o_orderstatus") == "F").count()

    stats = merge_into(
        spark,
        store,
        src,
        keys=["o_orderkey"],
        delete_condition=F.col("s_o_orderstatus") == "F",
    )
    assert stats["inserted"] == n_ins
    assert stats["deleted"] == n_del_expected
    assert stats["updated"] == n_upd - n_del_expected
    assert stats["unchanged"] == n0 - n_upd

    got = spark.read.parquet(store)
    assert got.count() == n0 + n_ins - n_del_expected
    # updates applied: every surviving matched key carries the doubled price
    doubled = got.join(upd.select("o_orderkey", F.col("o_totalprice").alias("want")), "o_orderkey")
    assert doubled.filter(F.col("o_totalprice") != F.col("want")).count() == 0
    # unmatched rows are bit-identical to the original
    untouched_ids = orders.filter(F.col("o_orderkey") % 100 != 0).select("o_orderkey")
    before = orders.join(untouched_ids, "o_orderkey")
    after = got.join(untouched_ids, "o_orderkey")
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0
    # no staging/backup residue
    import os

    assert not os.path.exists(store + ".merging")
    assert not os.path.exists(store + ".premerge")


def test_merge_refuses_schema_mismatch(spark, tmp_path):
    store, orders = _seed(spark, tmp_path)
    bad = orders.withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_into(spark, store, bad, keys=["o_orderkey"])
    # store untouched
    assert spark.read.parquet(store).count() == orders.count()


def test_cow_merge_equals_full_merge_and_skips_files(spark, tmp_path):
    """Copy-on-write merge must produce exactly merge_into's table while
    physically rewriting only the key-overlapping files."""
    import os

    from sms_db_spark.sinks.merge import merge_into_cow

    full_store = str(tmp_path / "full")
    cow_store = str(tmp_path / "cow")
    orders = load_table(spark, SF_DIR, "orders")
    # key-clustered layout: disjoint per-file o_orderkey ranges
    seed = orders.repartitionByRange(16, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    )
    seed.write.parquet(full_store)
    seed.write.parquet(cow_store)

    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    band_top = lo + (hi - lo) // 10  # delta touches ~the bottom decile
    upd = orders.filter(F.col("o_orderkey") <= band_top).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    ins = orders.limit(5).withColumn("o_orderkey", F.col("o_orderkey") + hi + 10)
    # pin the source rows: limit() is plan-nondeterministic, and the
    # equivalence claim requires both merges to consume identical rows
    src = upd.unionByName(ins).localCheckpoint(eager=True)
    cond = F.col("s_o_orderstatus") == "F"

    full_stats = merge_into(spark, full_store, src, ["o_orderkey"], cond)
    files_before = {
        f: os.path.getmtime(os.path.join(cow_store, f))
        for f in os.listdir(cow_store)
        if f.endswith(".parquet")
    }
    cow_stats = merge_into_cow(spark, cow_store, src, "o_orderkey", cond)

    for k in ("inserted", "updated", "deleted", "unchanged"):
        if k == "unchanged":
            continue  # cow counts only the touched slice's keeps
        assert cow_stats[k] == full_stats[k], (k, cow_stats, full_stats)
    assert cow_stats["files_skipped"] > 0
    assert cow_stats["files_rewritten"] < len(files_before)

    a = spark.read.parquet(full_store)
    b = spark.read.parquet(cow_store)
    assert a.count() == b.count()
    assert a.exceptAll(b).unionAll(b.exceptAll(a)).count() == 0
    # skipped files really were not rewritten (names and mtimes intact)
    survivors = {
        f: os.path.getmtime(os.path.join(cow_store, f))
        for f in os.listdir(cow_store)
        if f.endswith(".parquet") and f in files_before
    }
    assert len(survivors) >= cow_stats["files_skipped"]
    for f, m in survivors.items():
        assert m == files_before[f]


def test_cow_refuses_partitioned_store_and_null_keys(spark, tmp_path):
    from sms_db_spark.sinks.merge import merge_into_cow

    orders = load_table(spark, SF_DIR, "orders")
    part_store = str(tmp_path / "part")
    orders.withColumn("d", F.to_date("o_orderdate")).write.partitionBy("d").parquet(
        part_store
    )
    with pytest.raises(ValueError, match="partitioned"):
        merge_into_cow(spark, part_store, orders.withColumn("d", F.to_date("o_orderdate")), "o_orderkey")

    flat_store = str(tmp_path / "flat")
    orders.write.parquet(flat_store)
    src = orders.limit(3).withColumn("o_orderkey", F.lit(None).cast("long"))
    with pytest.raises(ValueError, match="NULL"):
        merge_into_cow(spark, flat_store, src, "o_orderkey")


def test_cow_refuses_key_type_mismatch(spark, tmp_path):
    """_resolve compares column NAMES only, so the COW path must refuse a
    type-mismatched source key itself — a double-typed key against a
    bigint store would coerce footer ranges to float64 and mis-prune."""
    from sms_db_spark.sinks.merge import merge_into_cow

    orders = load_table(spark, SF_DIR, "orders")
    flat_store = str(tmp_path / "flat")
    orders.write.parquet(flat_store)
    src = orders.limit(3).withColumn(
        "o_orderkey", F.col("o_orderkey").cast("double")
    )
    with pytest.raises(ValueError, match="type mismatch"):
        merge_into_cow(spark, flat_store, src, "o_orderkey")


def test_cow_delete_prunes_files_and_is_idempotent(spark, tmp_path):
    """delete_cow: rows whose key is in the delete list go, every file
    whose footer range misses the list survives byte-identical (same
    name, same size), absent ids are a no-op, and a second identical
    delete deletes nothing. The key-clustered write makes the prune
    deterministic: 8 range-sorted files, delete keys confined to the
    low range."""
    from pyspark.sql import functions as F

    from sms_db_spark.sinks.compaction import _data_files
    from sms_db_spark.sinks.merge import delete_cow

    store = str(tmp_path / "store")
    (
        spark.range(800)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
        .write.parquet(store)
    )
    before = {f.rsplit("/", 1)[-1]: b for f, b in _data_files(spark, store)}
    # low-range keys (clustered into the first file(s)) + absent ids
    ids = spark.createDataFrame(
        [(k,) for k in list(range(0, 60)) + [5000, 6000]], "k bigint"
    )
    stats = delete_cow(spark, store, ids, "k")
    assert stats["deleted"] == 60
    assert stats["files_rewritten"] >= 1
    assert stats["files_skipped"] >= 4, stats
    back = spark.read.parquet(store)
    assert back.count() == 740
    assert back.filter(F.col("k") < 60).count() == 0
    # untouched files survive under their original name and size
    after = {f.rsplit("/", 1)[-1]: b for f, b in _data_files(spark, store)}
    survived = set(before) & set(after)
    assert len(survived) >= stats["files_skipped"]
    assert all(before[f] == after[f] for f in survived)
    # idempotent: the same delete again removes nothing
    stats2 = delete_cow(spark, store, ids, "k")
    assert stats2["deleted"] == 0
    assert spark.read.parquet(store).count() == 740


def test_cow_delete_full_store_stays_readable(spark, tmp_path):
    """Full delete (every row of every file) must leave a READABLE
    empty store — the checked invariant from ADVICE r16 #3: either the
    empty-kept append preserved a schema-bearing file (this runtime's
    behavior, so the delete succeeds and a repeat delete is a no-op),
    or delete_cow refuses before making the directory unreadable. An
    unreadable store after a successful return is the one forbidden
    outcome."""
    from pyspark.sql import functions as F

    from sms_db_spark.sinks.merge import delete_cow

    store = str(tmp_path / "store")
    (
        spark.range(100)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        .repartitionByRange(4, "k")
        .write.parquet(store)
    )
    ids = spark.range(100).select(F.col("id").alias("k"))
    try:
        stats = delete_cow(spark, store, ids, "k")
    except RuntimeError as e:
        # the documented refusal path: store untouched and readable
        assert "final row set" in str(e)
        assert spark.read.parquet(store).count() == 100
        return
    assert stats["deleted"] == 100
    back = spark.read.parquet(store)  # schema survives the full delete
    assert back.count() == 0
    assert set(back.columns) == {"k", "v"}
    # repeat idempotent delete still works on the emptied store
    stats2 = delete_cow(spark, store, ids, "k")
    assert stats2["deleted"] == 0
    assert spark.read.parquet(store).count() == 0
