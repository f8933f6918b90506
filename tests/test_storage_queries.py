"""Unit tests for the driver-gated storage/maintenance audit queries
(plans/storage_queries.py) beyond what the DuckDB hash gate checks:
the protocol flags the oracle can only see as constants, and the
configurable scratch-root plumbing the gate never exercises."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sms_db_spark.plans.storage_queries import (
    SCRATCH_ROOT_CONF,
    _scratch_dir,
    q142_versioned_store_audit,
    q143_metricslog_readback,
)

SF_DIR = "/root/testdata/sf0.001"


def test_q142_lineage_flag_and_statuses(spark):
    """The in-result lineage flag must be computed, not assumed: every
    row carries lineage_ok=1 and the four diff statuses are present."""
    rows = q142_versioned_store_audit(spark, SF_DIR).collect()
    assert {r.status for r in rows} == {"added", "removed", "changed", "unchanged"}
    assert all(r.lineage_ok == 1 for r in rows)
    # the diff is over real read-backs: changed rows moved chars
    changed = next(r for r in rows if r.status == "changed")
    assert changed.chars_new > changed.chars_old


def test_q143_only_new_epoch_survives(spark):
    """After the simulated checkpoint reset, the log holds exactly epoch
    B's two batches — epoch A's three partitions (including the
    same-numbered batch 0) are gone, and batch contents match B's
    doc_id%2 slicing, not A's doc_id%4."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rows = {r.batch_id: r for r in q143_metricslog_readback(spark, SF_DIR).collect()}
    assert sorted(rows) == [0, 1]
    for k in (0, 1):
        want = docs.filter(F.col("doc_id") % 2 == k).count()
        assert rows[k].n_docs == want


def test_q150_prune_and_untouched_flags(spark):
    """The copy-on-write flags must be computed from the real file
    listing, not assumed: the delta touches only low-range files
    (prune_ok), skipped files survive under name+size (untouched_ok),
    all three action classes are populated, and deletions happened."""
    from sms_db_spark.plans.storage_queries import q150_cow_merge_audit

    rows = {r["class"]: r for r in q150_cow_merge_audit(spark, SF_DIR).collect()}
    assert sorted(rows) == ["inserted", "kept", "updated"]
    any_row = rows["kept"]
    assert any_row.prune_ok == 1 and any_row.untouched_ok == 1
    assert any_row.n_deleted > 0 and any_row.n_updated > 0 and any_row.n_inserted > 0
    assert rows["inserted"].n_docs == any_row.n_inserted
    assert rows["updated"].n_docs == any_row.n_updated


def test_q155_layout_flags_and_backfill(spark):
    """The partitioned-store flags must be computed from the real plan
    and file listing, not assumed: the slice plans with partition
    pruning, the executed scan touched only in-range directories, the
    backfill left other partitions byte-identical — and the backfilled
    day's sum reflects the doubled values while other days are raw."""
    from sms_db_spark.plans.storage_queries import (
        _BACKFILL_DAY,
        _PRUNE_HI,
        _PRUNE_LO,
        q155_partitioned_prune_audit,
    )

    rows = {r.day: r for r in q155_partitioned_prune_audit(spark, SF_DIR).collect()}
    assert min(rows) >= _PRUNE_LO and max(rows) <= _PRUNE_HI
    assert _BACKFILL_DAY in rows
    any_row = rows[_BACKFILL_DAY]
    assert any_row.prune_plan_ok == 1
    assert any_row.files_pruned_ok == 1
    assert any_row.backfill_untouched_ok == 1
    # the corrected day serves doubled values; a raw day serves raw.
    # Double BEFORE the decimal cast, as the write path did — rounding
    # does not commute with the doubling (round(2v,2) != 2*round(v,2))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    for day, factor in ((_BACKFILL_DAY, 2), (_PRUNE_LO, 1)):
        want = (
            ev.filter(F.to_date("ts") == day)
            .agg(F.sum((F.col("value") * factor).cast("decimal(18,2)")))
            .first()[0]
        )
        assert abs(rows[day].sum_value - float(want)) < 1e-6


def test_pruned_listing_count_guards_every_assumption(spark, tmp_path):
    """The py4j reach behind q155's files_pruned flag must degrade to
    None + a naming UserWarning on every broken structural assumption
    (VERDICT r10 item 7), and still measure the real listing on the
    happy path."""
    import warnings

    import pytest

    from sms_db_spark.plans.storage_queries import _pruned_listing_count

    df = spark.range(10).selectExpr("id", "id % 3 AS p")
    df.write.mode("overwrite").partitionBy("p").parquet(str(tmp_path / "t"))
    scan = spark.read.parquet(str(tmp_path / "t"))

    # happy path: a pruned single-scan plan reports its real listing
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _pruned_listing_count(scan.filter("p = 1")) == 1
        assert _pruned_listing_count(scan) == 3

    # two leaves (a union: no exchange, so AQE does not wrap it):
    # apply(0) would be arbitrary — refused, loudly
    unioned = scan.union(spark.read.parquet(str(tmp_path / "t")))
    with pytest.warns(UserWarning, match="expected 1 plan leaf"):
        assert _pruned_listing_count(unioned) is None

    # an AQE-wrapped plan (a join introduces exchanges): collectLeaves
    # returns the unexecuted AdaptiveSparkPlanExec itself — the class
    # check refuses it rather than calling methods it does not have
    joined = scan.alias("a").join(
        spark.read.parquet(str(tmp_path / "t")).alias("b"), "id"
    )
    with pytest.warns(UserWarning, match="not a FileSourceScan"):
        assert _pruned_listing_count(joined) is None

    # a non-file leaf (local relation): no selectedPartitions to force
    local = spark.createDataFrame([(1,)], "x int")
    with pytest.warns(UserWarning, match="not a FileSourceScan"):
        assert _pruned_listing_count(local) is None

    # the reach itself exploding (simulated by a frame with no _jdf
    # queryExecution — a plain object) must warn, not raise
    class Broken:
        class _jdf:  # noqa: N801 - shape stand-in
            @staticmethod
            def queryExecution():
                raise RuntimeError("renamed in a future Spark")

    with pytest.warns(UserWarning, match="py4j reach failed"):
        assert _pruned_listing_count(Broken()) is None


def test_q156_lanes_and_replay_flags(spark):
    """The document-lane streaming parity audit (driver-gated q156;
    events lanes split to q169 in r16): every lane produced rows
    through its real streaming runtime, every measured
    replay/restart-idempotence flag came back 1, drift logged exactly
    one report per (batch, feature), and the audit ran on a session
    CLONE (the caller's shuffle setting is untouched)."""
    from sms_db_spark.plans.storage_queries import (
        _PARITY_DROPS,
        q156_streaming_parity_audit,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    rows = {r.lane: r for r in q156_streaming_parity_audit(spark, SF_DIR).collect()}
    assert sorted(rows) == ["curation", "drift", "sketches"]
    assert all(r.replay_ok == 1 for r in rows.values())
    assert all(r.n_rows > 0 for r in rows.values())
    assert rows["drift"].n_rows == 2 * _PARITY_DROPS  # one row per (batch, feature)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_q169_events_lanes_and_replay_flags(spark):
    """The events-lane streaming parity audit (split from q156 in r16):
    windows and sessions each produced rows through their real
    streaming runtime with replay/restart-idempotence measured 1, on a
    session clone."""
    from sms_db_spark.plans.storage_queries import (
        q169_streaming_events_parity_audit,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    rows = {
        r.lane: r
        for r in q169_streaming_events_parity_audit(spark, SF_DIR).collect()
    }
    assert sorted(rows) == ["sessions", "windows"]
    assert all(r.replay_ok == 1 for r in rows.values())
    assert all(r.n_rows > 0 for r in rows.values())
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_q157_flags_are_measured(spark):
    """The bucketed anti-join dedup audit's laws must be computed from
    the real plan and the real store read-back, not assumed: one
    delta-side exchange with a bucketed store scan (store_no_exchange),
    no survivor hash present in the store (dup_dropped_ok), and the
    survivor count strictly below the delta count (the re-delivered
    duplicates actually dropped)."""
    from sms_db_spark.plans.storage_queries import (
        q157_bucketed_antijoin_dedup_audit,
    )

    (r,) = q157_bucketed_antijoin_dedup_audit(spark, SF_DIR).collect()
    assert r.store_no_exchange == 1
    assert r.dup_dropped_ok == 1
    assert 0 < r.n_survivors < r.n_delta


def test_q158_join_lane_laws(spark):
    """The attribution-join parity audit (joins lane alone since the
    r17 split): rows produced through the real streaming runtime and
    the measured law came back 1 — the join restart emitted nothing
    new."""
    from sms_db_spark.plans.storage_queries import q158_stream_join_ingest_audit

    (r,) = q158_stream_join_ingest_audit(spark, SF_DIR).collect()
    assert r.lane == "joins"
    assert r.replay_ok == 1
    assert r.n_rows > 0


def test_q178_ingest_lane_laws(spark):
    """The redundant-delivery ingest audit (split from q158 in r17):
    the full re-delivery drop added zero store rows (the reference's
    same-backup-twice case)."""
    from sms_db_spark.plans.storage_queries import q178_stream_ingest_audit

    (r,) = q178_stream_ingest_audit(spark, SF_DIR).collect()
    assert r.lane == "ingest"
    assert r.replay_ok == 1
    assert r.n_rows > 0


def test_scratch_dir_honors_configured_root(spark, tmp_path):
    """With spark.sms_db_spark.scratchRoot set, the scratch dir is a
    child of that root and is deleted on exit (ADVICE r5: driver-local
    /tmp is invisible to cluster executors)."""
    root = str(tmp_path / "shared_scratch")
    os.makedirs(root)
    spark.conf.set(SCRATCH_ROOT_CONF, root)
    try:
        with _scratch_dir(spark, "audit_") as path:
            assert path.startswith(root)
            spark.range(5).write.parquet(path)
            assert spark.read.parquet(path).count() == 5
        assert os.listdir(root) == []  # cleaned up through the FS API
    finally:
        spark.conf.unset(SCRATCH_ROOT_CONF)


def test_q159_log_protocol_and_poison_placement(spark):
    """The quality-monitor audit (driver-gated q159): 12 log cells (3
    batches x 4 constraints) through the REAL monitor runtime, the
    redelivery flag measured 1, the poisoned batch failing
    accepted_values in EXACTLY batch 1, and uniqueness green everywhere
    (the corpus has unique event_ids; the poison touches only
    event_type). Runs on a session clone."""
    from sms_db_spark.plans.storage_queries import (
        q159_stream_quality_monitor_audit,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    rows = q159_stream_quality_monitor_audit(spark, SF_DIR).collect()
    assert len(rows) == 12
    cells = {(r.batch_id, r.check_name): r for r in rows}
    assert {b for b, _ in cells} == {0, 1, 2}
    assert all(r.replay_ok == 1 for r in rows)
    poisoned = cells[(1, "accepted_values_event_type")]
    assert poisoned.passed == 0 and poisoned.violations > 0
    for b in (0, 2):
        assert cells[(b, "accepted_values_event_type")].passed == 1
    assert all(
        cells[(b, "unique_event_id")].passed == 1 for b in (0, 1, 2)
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_q160_chain_conserves_state_and_flags(spark):
    """The composed day-2 chain audit (driver-gated q160): all five
    stage flags measured 1, and the four conservation stages carry the
    IDENTICAL (n_rows, checksum) — the content the upsert produced is
    what the shard store hands the trainer, bit-for-bit."""
    from sms_db_spark.plans.storage_queries import q160_day2_chain_audit

    rows = {r.stage: r for r in q160_day2_chain_audit(spark, SF_DIR).collect()}
    assert sorted(rows) == ["compact", "gate", "shards", "upsert", "zorder"]
    assert all(r.ok == 1 for r in rows.values()), {
        s: r.ok for s, r in rows.items()
    }
    conserved = {
        (rows[s].n_rows, rows[s].checksum_mod)
        for s in ("upsert", "compact", "zorder", "shards")
    }
    assert len(conserved) == 1 and rows["upsert"].n_rows > 0
    assert rows["gate"].n_rows == 12
