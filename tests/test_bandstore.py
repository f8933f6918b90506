"""Band store + incremental near-dup pairing: the delta join against
the persisted band store must emit exactly q45's batch pairs over the
UNION corpus (same hot-bucket cap law) restricted to pairs with at
least one delta member — and never shuffle or re-band the history."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from sms_db_spark.operators.dedup import band_rows, lsh_candidate_pairs
from sms_db_spark.sinks.bandstore import (
    delta_neardup_pairs,
    read_band_meta,
    release_delta_pin,
    write_band_store,
)
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
SPLIT = 350  # history: doc_id < SPLIT; delta: doc_id >= SPLIT


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_delta_pairs_match_batch_union(spark, tmp_path):
    store = str(tmp_path / "bands")
    docs = _docs(spark)
    history = docs.filter(F.col("doc_id") < SPLIT)
    delta = docs.filter(F.col("doc_id") >= SPLIT)

    write_band_store(history, store)
    pairs = delta_neardup_pairs(spark, delta, store)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}

    # the documented pin lifecycle (ADVICE r9): the delta bands are
    # cached while the result is live; release_delta_pin frees the
    # blocks deterministically, is idempotent, and the pairs stay
    # correct (re-evaluated from lineage) afterwards
    pin = pairs._delta_pin
    lvl = pin.storageLevel
    assert lvl.useMemory or lvl.useDisk
    release_delta_pin(pairs)
    release_delta_pin(pairs)  # idempotent
    lvl = pin.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)
    assert {(r.doc_a, r.doc_b) for r in pairs.collect()} == got
    # pin-less frame with NO live pins: silently a no-op (nothing to miss)
    release_delta_pin()  # drain any other tests' leftovers first
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        release_delta_pin(pairs.limit(1))

    # the no-arg catch-all (a driver that transformed the result away
    # from the attribute-bearing frame): releases every live pin —
    # including any left by other tests, which is what makes the == []
    # assertion below order-independent by construction
    import pytest

    import sms_db_spark.sinks.bandstore as _bs

    pairs2 = delta_neardup_pairs(spark, delta, store)
    pin2 = pairs2._delta_pin
    derived = pairs2.filter(F.col("doc_a") >= 0)  # attribute lost here
    assert not hasattr(derived, "_delta_pin")
    # ADVICE r10: a derived frame while a pin is LIVE is a caller bug —
    # it must warn (naming the no-arg remedy) and release nothing
    with pytest.warns(UserWarning, match="no-arg"):
        release_delta_pin(derived)
    lvl = pin2.storageLevel
    assert lvl.useMemory or lvl.useDisk  # the miss released nothing
    release_delta_pin()
    lvl = pin2.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)
    assert _bs._LIVE_PINS == []
    release_delta_pin(pairs2)  # per-frame release after catch-all: no-op

    batch_union = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(band_rows(docs)).collect()
    }
    want = {
        (a, b) for a, b in batch_union if a >= SPLIT or b >= SPLIT
    }
    assert got == want
    assert got, "corpus has no delta-involving candidates — parity is vacuous"
    # both cross (history x delta) and in-delta pairs are exercised
    assert any(a < SPLIT for a, _ in got)
    assert any(a >= SPLIT for a, _ in got)


def test_union_cap_law(spark, tmp_path):
    """The hot-bucket cap measures the UNION bucket size: a bucket of
    boilerplate clones split across history and delta — each side
    small, together over the cap — must contribute no pairs, exactly
    as q45 would drop it on the union corpus."""
    store = str(tmp_path / "bands")
    text = "the same boilerplate sentence repeated across the corpus"
    rows = [(i, text) for i in range(12)]
    clones = spark.createDataFrame(rows, "doc_id bigint, text string")
    history = clones.filter(F.col("doc_id") < 6)
    delta = clones.filter(F.col("doc_id") >= 6)

    write_band_store(history, store)
    # cap below the union bucket size (12) but above each side's (6):
    # a per-side cap would keep the bucket and emit pairs — the union
    # law drops it
    got = delta_neardup_pairs(spark, delta, store, max_bucket=10).collect()
    assert got == []
    # sanity: with the cap above the union size the clones all pair
    n = delta_neardup_pairs(spark, delta, store, max_bucket=64).count()
    assert n == 6 * 6 + 6 * 5 // 2  # cross pairs + in-delta pairs


def test_append_folds_delta_and_guards_params(spark, tmp_path):
    store = str(tmp_path / "bands")
    docs = _docs(spark)
    history = docs.filter(F.col("doc_id") < SPLIT)
    delta = docs.filter(F.col("doc_id") >= SPLIT)

    write_band_store(history, store)
    write_band_store(delta, store, mode="append")
    appended = spark.read.parquet(store)
    oneshot = band_rows(docs)
    assert appended.count() == oneshot.count()
    assert (
        appended.select("doc_id", "band_id", "band_hash")
        .exceptAll(oneshot)
        .count()
        == 0
    )
    # parameter guard: appending under a different bucket count refuses
    try:
        write_band_store(delta, store, n_buckets=8, mode="append")
        raise AssertionError("append with mismatched n_buckets must refuse")
    except ValueError as e:
        assert "mismatch" in str(e)
    assert read_band_meta(spark, store)["n_buckets"] == 64


def test_empty_store_bootstrap_and_mode_guard(spark, tmp_path):
    """A legitimately-empty store (meta present, zero banded rows —
    the day-0 bootstrap) must serve the first delta's in-delta pairs
    instead of failing schema inference; modes other than
    overwrite/append refuse (an 'ignore' no-op data write would
    re-stamp mismatched metadata)."""
    store = str(tmp_path / "bands")
    docs = _docs(spark)
    empty = docs.filter(F.lit(False))
    write_band_store(empty, store)

    delta = docs.filter(F.col("doc_id") >= SPLIT)
    got = {
        (r.doc_a, r.doc_b)
        for r in delta_neardup_pairs(spark, delta, store).collect()
    }
    want = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(band_rows(delta)).collect()
    }
    assert got == want

    try:
        write_band_store(delta, store, mode="ignore")
        raise AssertionError("mode='ignore' must refuse")
    except ValueError as e:
        assert "overwrite|append" in str(e)


def test_history_side_is_not_shuffled(spark, tmp_path):
    """The scale contract: the store scan reaches the semi-join with no
    Exchange between them (map-side broadcast semi) — history bytes
    never shuffle; the only exchange below the bucket groupBy carries
    the matched rows + the delta's own bands."""
    store = str(tmp_path / "bands")
    docs = _docs(spark)
    write_band_store(docs.filter(F.col("doc_id") < SPLIT), store)
    df = delta_neardup_pairs(
        spark, docs.filter(F.col("doc_id") >= SPLIT), store
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    assert "BroadcastHashJoin" in text and "LeftSemi" in text, text
    # the store-side scan feeds the semi join directly: no Exchange
    # appears between the parquet scan of the store and the join
    scan_to_join = re.search(
        r"BroadcastHashJoin.*?Scan parquet", text, re.S
    )
    assert scan_to_join is not None, text
    assert "Exchange" not in scan_to_join.group(0), scan_to_join.group(0)
