"""JSONL source/sink contract: lossless round-trip (nulls, unicode) and
loud failure on corrupt lines — a silently-nulled training corpus is the
failure mode the FAILFAST contract exists to prevent."""

from __future__ import annotations

import pytest

from sms_db_spark.sources.jsonl import (
    DOCUMENTS_JSONL_SCHEMA,
    read_jsonl,
    write_jsonl,
)


def test_roundtrip_preserves_nulls_and_unicode(spark, tmp_path):
    rows = [
        (1, "héllo wörld é中文", "fr", "web", 20),
        (2, None, None, "books", 0),
        (3, 'quote " and \\ backslash\nnewline', "en", None, 30),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_JSONL_SCHEMA)
    path = str(tmp_path / "corpus")
    write_jsonl(df, path, shards=2)
    back = read_jsonl(spark, path).orderBy("doc_id").collect()
    assert [tuple(r) for r in back] == sorted(rows)


def test_corrupt_line_fails_loudly(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "part-00000.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}\n'
        "this is not json\n"
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_jsonl(spark, str(d)).collect()
