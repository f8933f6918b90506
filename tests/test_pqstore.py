"""sinks/pqstore.py: the persisted IVF-PQ index artifact — commit/load
round-trip, the parameter-mismatch refusal, pinned-version consistency
under a concurrent re-commit, and the torn-artifact crash contract."""

import json

import pytest

from sms_db_spark.sinks import pqstore, versioned


def _toy_tables(spark, shift=0.0):
    cent = spark.createDataFrame(
        [(c, [float(c) + shift] * 4) for c in range(2)],
        "cid long, c_emb array<double>",
    )
    cb = spark.createDataFrame(
        [(m, c, [0.1 * m + c + shift] * 2) for m in range(2) for c in range(2)],
        "m int, cid int, c array<double>",
    )
    codes = spark.createDataFrame(
        [(v, [v % 2, (v + 1) % 2]) for v in range(6)],
        "vec_id long, codes array<int>",
    )
    assigned = spark.createDataFrame(
        [(v, v % 2) for v in range(6)], "vec_id long, cid long"
    )
    return {"centroids": cent, "codebooks": cb, "codes": codes, "assigned": assigned}


PARAMS = {"dim": 4, "pq_m": 2, "pq_codes": 2, "variant": "base"}


def test_commit_load_roundtrip(spark, tmp_path):
    store = str(tmp_path / "idx")
    tables = _toy_tables(spark)
    meta = pqstore.commit_pq_index(spark, store, tables, PARAMS)
    assert set(meta["tables"]) == set(pqstore.PQ_INDEX_TABLES)

    loaded = pqstore.load_pq_index(spark, store, expect_params=PARAMS)
    assert loaded["params"] == PARAMS
    for name in pqstore.PQ_INDEX_TABLES:
        want = sorted(map(tuple, tables[name].collect()))
        got = sorted(map(tuple, loaded[name].collect()))
        assert got == want, name


def test_param_mismatch_refused(spark, tmp_path):
    store = str(tmp_path / "idx")
    pqstore.commit_pq_index(spark, store, _toy_tables(spark), PARAMS)
    with pytest.raises(ValueError, match="parameter mismatch"):
        pqstore.load_pq_index(spark, store, expect_params={**PARAMS, "pq_m": 4})
    # no expectation -> load serves whatever the store was trained with
    assert pqstore.load_pq_index(spark, store)["params"] == PARAMS


def test_meta_pins_versions_across_recommit(spark, tmp_path):
    """A reader that resolved the meta BEFORE a re-train reads the OLD
    quadruple even after the new one fully commits — the pinned-version
    consistency the module contract promises (heads have moved on, the
    meta's named versions have not)."""
    store = str(tmp_path / "idx")
    pqstore.commit_pq_index(spark, store, _toy_tables(spark, shift=0.0), PARAMS)
    meta_v1 = pqstore.read_pq_meta(spark, store)
    pqstore.commit_pq_index(spark, store, _toy_tables(spark, shift=9.0), PARAMS)

    # the store's live artifact is the re-train...
    live = pqstore.load_pq_index(spark, store)
    assert live["centroids"].agg({"c_emb": "count"}).first()[0] == 2
    assert max(r.c_emb[0] for r in live["centroids"].collect()) >= 9.0
    # ...but v1's pinned versions still read the original tables
    old_cent = versioned.read_version(
        spark, f"{store}/centroids", meta_v1["tables"]["centroids"]
    )
    assert max(r.c_emb[0] for r in old_cent.collect()) < 9.0


def test_incomplete_table_set_refused(spark, tmp_path):
    tables = _toy_tables(spark)
    tables.pop("codes")
    with pytest.raises(ValueError, match="exactly"):
        pqstore.commit_pq_index(spark, str(tmp_path / "idx"), tables, PARAMS)


def test_torn_artifact_is_loud(spark, tmp_path):
    """A meta document naming a version that never committed (the
    crashed-mid-commit shape with a hand-rolled meta) fails loudly at
    load — never a silent partial index."""
    store = str(tmp_path / "idx")
    pqstore.commit_pq_index(spark, store, _toy_tables(spark), PARAMS)
    meta = pqstore.read_pq_meta(spark, store)
    meta["tables"]["codes"] = "v99999999"
    # through the store's own writer (a pathlib write would orphan the
    # Hadoop-local .crc sidecar and fail on checksum, not on the law)
    from sms_db_spark.fsutil import write_text_atomic

    write_text_atomic(spark, f"{store}/_PQ_META", json.dumps(meta))
    with pytest.raises(FileNotFoundError, match="no committed version"):
        pqstore.load_pq_index(spark, store)


def test_missing_meta_is_loud(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="_PQ_META"):
        pqstore.load_pq_index(spark, str(tmp_path / "nothing"))
