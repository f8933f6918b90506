"""Maintenance-operator guarantees (q125-q127, q131): delta dedup equals
the plain exact anti-join (Bloom prune is an optimization, never a
semantics change), CDC merge is last-write-wins with delete handling,
the quality audit reports real violations, and the skew profile's
ratios are internally consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.operators.maintenance import (
    DELTA_BATCH_SOURCES,
    _content_key,
    q125_delta_dedup,
    q126_scd_upsert,
    q127_data_quality_audit,
    q131_skew_profile,
)
from sms_db_spark.tables import load_table
from tests.test_plans import _explain_str

SF_DIR = "/root/testdata/sf0.001"


def test_delta_dedup_equals_plain_anti_join(spark):
    """The Bloom prune must be invisible in the output: is_dup flags are
    exactly those of the unpruned exact key join (no false negatives)."""
    out = {r.doc_id: r.is_dup for r in q125_delta_dedup(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", _content_key().alias("k")
    )
    batch = docs.filter(F.col("source").isin(*DELTA_BATCH_SOURCES))
    store = docs.filter(~F.col("source").isin(*DELTA_BATCH_SOURCES)).select("k")
    expected = {
        r.doc_id: r.dup
        for r in batch.join(
            store.distinct().withColumn("dup", F.lit(1)), "k", "left"
        )
        .select("doc_id", F.coalesce("dup", F.lit(0)).alias("dup"))
        .collect()
    }
    assert out == expected
    # the fixture must exercise BOTH lanes or the test proves nothing
    assert 0 < sum(out.values()) < len(out)


def test_delta_dedup_store_side_is_pruned_by_broadcast(spark):
    """The store scan feeds a broadcast join on the batch's bit set —
    the store side must never hash-shuffle its full rows."""
    p = _explain_str(q125_delta_dedup(spark, SF_DIR), "formatted")
    assert "BroadcastExchange" in p


def test_scd_upsert_last_write_wins(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = {r.user_id: r for r in q126_scd_upsert(spark, SF_DIR).collect()}
    last = {
        r.user_id: r
        for r in ev.orderBy("ts", "event_id").collect()  # last assignment wins
    }
    n_users = ev.select("user_id").distinct().count()
    deleted = {u for u, r in last.items() if r.event_type == "error"}
    assert set(out) == set(last) - deleted
    for u, r in out.items():
        assert r.current_value == last[u].value
        assert r.updated_at == last[u].ts
    # change counts cover every event, live or deleted rows aside
    counts = {r.user_id: r[1] for r in ev.groupBy("user_id").count().collect()}
    assert all(out[u].n_changes == counts[u] for u in out)
    assert len(deleted) > 0 or n_users == len(out)


def test_quality_audit_reports_real_violations(spark):
    rows = {r.check_name: r for r in q127_data_quality_audit(spark, SF_DIR).collect()}
    assert len(rows) == 5
    total = load_table(spark, SF_DIR, "orders").count()
    assert all(r.total == total for r in rows.values())
    # synthetic data is referentially intact and key-unique...
    assert rows["referential_o_custkey"].violations == 0
    assert rows["unique_o_orderkey"].passed == 1
    # ...but the price cap is deliberately set below max(o_totalprice)
    assert rows["range_o_totalprice"].violations > 0
    assert rows["range_o_totalprice"].passed == 0


def test_skew_profile_ratios_consistent(spark):
    rows = q131_skew_profile(spark, SF_DIR).collect()
    assert {r.key_col for r in rows} == {
        "events.user_id",
        "events.event_type",
        "lineitem.l_orderkey",
    }
    for r in rows:
        assert r.min_cnt <= r.max_cnt
        # skew_milli = max/avg (milli) is >= 1000 by definition of max
        assert r.skew_milli >= 1000
        assert r.skew_milli == r.max_cnt * r.n_keys * 1000 // r.n_rows
    ev = {r.key_col: r for r in rows}["events.user_id"]
    assert ev.n_rows == load_table(spark, SF_DIR, "events").count()


def test_plan_join_broadcasts_tiny_dimension(spark):
    """A dimension under the broadcast threshold must come back as a
    broadcast join — verified on the decision AND the physical plan."""
    from sms_db_spark.operators.maintenance import plan_join

    orders = load_table(spark, SF_DIR, "orders")
    dim = spark.createDataFrame(
        [(s, f"status {s}") for s in ("F", "O", "P")],
        ["o_orderstatus", "status_name"],
    )
    out, decision = plan_join(orders, dim, "o_orderstatus")
    assert decision == {"strategy": "broadcast", "build_side": "right"}
    p = _explain_str(out)
    assert "BroadcastHashJoin" in p, p
    assert out.count() == orders.count()  # dim covers every status


def test_plan_join_salts_skewed_fact_join(spark):
    """q35's fixture shape: one viral key dominating the fact side. The
    profile must trip the salt path, and the salted result must equal
    the plain join row-for-row (salt invariance)."""
    from sms_db_spark.operators.maintenance import key_profile, plan_join

    hot = spark.range(0, 20_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(0, 2_000).select(
        (F.col("id") + 100).alias("k"), (F.col("id") * 2).alias("payload")
    )
    fact = hot.unionByName(cold)
    dim = spark.range(0, 3_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    )
    pf, pd_ = key_profile(fact, "k"), key_profile(dim, "k")
    assert pf["skew_milli"] >= 8_000  # the hot key dominates
    out, decision = plan_join(
        fact, dim, "k", profiles=(pf, pd_), broadcast_rows=100
    )
    assert decision["strategy"] == "salted"
    assert decision["salted_side"] == "left"
    plain = fact.join(dim, "k")
    assert out.count() == plain.count()
    assert out.exceptAll(plain).count() == 0
    assert plain.exceptAll(out).count() == 0
    # uniform keys must NOT pay the salt replication
    out2, d2 = plan_join(cold, dim, "k", profiles=(key_profile(cold, "k"), pd_), broadcast_rows=100)
    assert d2["strategy"] == "shuffle"


def test_corpus_drift_bounds_and_control(spark):
    """TVD is bounded [0, 1000] milli; bucket counts partition the
    corpus (n_a + n_b = |documents| for every feature)."""
    from sms_db_spark.operators.maintenance import q136_corpus_drift

    rows = q136_corpus_drift(spark, SF_DIR).collect()
    assert {r.feature for r in rows} == {"len_bucket", "lang"}
    n_docs = load_table(spark, SF_DIR, "documents").count()
    for r in rows:
        assert 0 <= r.tvd_milli <= 1000
        assert r.n_a + r.n_b == n_docs
        assert r.top_bucket is not None and r.n_buckets >= 1


def test_embedding_health_flags_planted_defects(spark):
    """A zero vector, a wrong-dimension vector, and a NULL must each be
    counted in their label's row — an audit whose fixtures cannot fail
    tests nothing (q127's discipline)."""
    from pyspark.sql import types as T

    from sms_db_spark.operators.maintenance import EMB_DIM, q137_embedding_health

    emb = load_table(spark, SF_DIR, "embeddings")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    planted = spark.createDataFrame(
        [
            (10_001, [0.0] * EMB_DIM, 0),      # zero norm
            (10_002, [1.0] * (EMB_DIM - 3), 1),  # wrong dim
            (10_003, None, 2),                  # missing
            (10_004, [], 3),                    # empty: norm2=0, zero-flagged
            (10_005, [None] * EMB_DIM, 4),      # all-NULL elems: ditto
        ],
        schema,
    )
    import tempfile, shutil

    d = tempfile.mkdtemp(prefix="sms_db_spark_embhealth_")
    try:
        emb.unionByName(planted).write.parquet(d + "/embeddings.parquet")
        rows = {r.label: r for r in q137_embedding_health(spark, d).collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert rows[0].n_zero == 1 and rows[0].min_norm2 == 0
    assert rows[1].n_dim_bad == 1
    assert rows[2].n_null == 1
    assert rows[3].n_zero == 1 and rows[3].n_dim_bad == 1  # empty array
    assert rows[4].n_zero == 1  # NULL elements are skipped, not poisoned
    # clean labels stay clean
    assert all(
        r.n_zero == 0 and r.n_dim_bad == 0 and r.n_null == 0
        for lbl, r in rows.items()
        if lbl > 4
    )


def test_plan_join_refuses_reserved_salt_column(spark):
    import pytest

    from sms_db_spark.operators.maintenance import plan_join

    a = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("_salt"))
    b = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="_salt"):
        plan_join(a, b, "k")


def test_snapshot_diff_statuses_and_volumes(spark):
    """The four statuses reproduce the snapshot-construction rule
    exactly (diffing by digest recovers which buckets were dropped,
    added, and re-crawled), and the changed row's byte delta is exactly
    one recrawl suffix per changed doc."""
    from sms_db_spark.operators.maintenance import (
        SNAP_CHANGE_HI,
        SNAP_CHANGE_LO,
        SNAP_NEW_FROM,
        SNAP_OLD_UPTO,
        SNAP_RECRAWL_SUFFIX,
        _snap_bucket,
        q140_snapshot_diff,
    )

    rows = {r.status: r for r in q140_snapshot_diff(spark, SF_DIR).collect()}
    b = _snap_bucket(F.col("doc_id"))
    docs = load_table(spark, SF_DIR, "documents").select(b.alias("b"))
    expect = {
        "added": docs.filter(F.col("b") >= SNAP_OLD_UPTO).count(),
        "removed": docs.filter(F.col("b") < SNAP_NEW_FROM).count(),
        "changed": docs.filter(
            (F.col("b") >= SNAP_CHANGE_LO) & (F.col("b") < SNAP_CHANGE_HI)
        ).count(),
    }
    expect["unchanged"] = (
        docs.count() - expect["added"] - expect["removed"] - expect["changed"]
    )
    assert {s: r.n_docs for s, r in rows.items()} == expect
    # content change = exactly one suffix appended per changed doc
    ch = rows["changed"]
    assert ch.chars_new - ch.chars_old == ch.n_docs * len(SNAP_RECRAWL_SUFFIX)
    # one-sided statuses carry volume only on their existing side
    assert rows["added"].chars_old == 0 and rows["removed"].chars_new == 0
    un = rows["unchanged"]
    assert un.chars_old == un.chars_new


def test_snapshot_diff_null_text_presence(spark):
    """Presence must come from the join marker, digest compare must be
    NULL-safe: a NULL-text doc existing only in the old snapshot is
    'removed' (not 'added'), and one existing in both with NULL text on
    both sides is 'unchanged'. The DuckDB oracle can't catch this class
    (it shares the classification SQL), so it is pinned here."""
    import hashlib
    import shutil
    import tempfile

    from sms_db_spark.operators.maintenance import (
        SNAP_BUCKETS,
        SNAP_CHANGE_HI,
        SNAP_CHANGE_LO,
        SNAP_NEW_FROM,
        SNAP_OLD_UPTO,
        q140_snapshot_diff,
    )

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % SNAP_BUCKETS

    def find(pred):
        return next(i for i in range(100_000) if pred(bucket(i)))

    removed_id = find(lambda b: b < SNAP_NEW_FROM)
    both_id = find(
        lambda b: SNAP_NEW_FROM <= b < SNAP_OLD_UPTO
        and not (SNAP_CHANGE_LO <= b < SNAP_CHANGE_HI)
    )
    added_id = find(lambda b: b >= SNAP_OLD_UPTO)
    rows = [
        (removed_id, None, "en", "s0", 0),  # old-only, NULL text
        (both_id, None, "en", "s0", 0),  # both sides, NULL text
        (added_id, "fresh doc", "en", "s0", 9),  # new-only
    ]
    d = tempfile.mkdtemp(prefix="snapdiff-")
    try:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {r.status: r for r in q140_snapshot_diff(spark, d).collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got["removed"].n_docs == 1 and got["removed"].min_doc == removed_id
    assert got["unchanged"].n_docs == 1 and got["unchanged"].min_doc == both_id
    assert got["added"].n_docs == 1 and got["added"].min_doc == added_id
    assert "changed" not in got
