"""Hash byte-parity with the reference recipe (sms-db.pl:318-339)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sms_db_spark.functions.hashing import python_reference_hash
from sms_db_spark.sources.canonical import with_message_hash
from sms_db_spark.sources.xml_source import normalize_xml
from tests.fixtures import JPEG_BYTES, xml_frames


def test_python_oracle_matches_manual_recipe():
    # join('', fields) ++ (data, ct) per part, utf-8 encoded — sms-db.pl:325
    meta = [1577836800000, "+15550001111", "Alice", "<SELF>", "<SELF>", 1, 0, 0]
    parts = [("hi there", "text/plain")]
    expected = hashlib.sha256(
        "1577836800000+15550001111Alice<SELF><SELF>100hi theretext/plain".encode()
    ).hexdigest()
    assert python_reference_hash(meta, parts) == expected


def test_undef_fields_hash_as_empty():
    # Perl join treats undef as '' (warned, sms-db.pl:321-325)
    meta = [1, None, "A", None, None, 1, 0, 0]
    assert python_reference_hash(meta, []) == hashlib.sha256(b"1A100").hexdigest()


def test_binary_part_latin1_expansion():
    # encode_utf8 expands bytes >0x7F (decode_base64 output is latin-1-ish)
    meta = [1, "a", "b", "c", "d", 1, 1, 0]
    got = python_reference_hash(meta, [(JPEG_BYTES, "image/jpeg")])
    manual = hashlib.sha256(
        b"1abcd110" + JPEG_BYTES.decode("latin-1").encode("utf-8") + b"image/jpeg"
    ).hexdigest()
    assert got == manual


def test_spark_hash_matches_python_oracle(spark):
    staged_m, staged_p = normalize_xml(*xml_frames(spark))
    hashed = {r["local_id"]: r for r in with_message_hash(staged_m, staged_p).collect()}
    parts_by_msg: dict[int, list] = {}
    for p in sorted(staged_p.collect(), key=lambda r: (r["local_id"], r["part_seq"])):
        parts_by_msg.setdefault(p["local_id"], []).append(
            (p["data"] if p["data"] is not None else p["text"], p["content_type"])
        )
    for lid, row in hashed.items():
        expected = python_reference_hash(
            [
                row["timestamp"], row["sender_address"], row["sender_name"],
                row["recipient_address"], row["recipient_name"], row["msg_box"],
                row["message_type"], row["source_format"],
            ],
            parts_by_msg.get(lid, []),
        )
        assert row["hash"] == expected, f"hash mismatch for local_id={lid}"


def test_multibyte_text_hashes_as_utf8(spark):
    # 'hello back ünïcödé' exercises the encode-before-hash path (sms-db.pl:324)
    staged_m, staged_p = normalize_xml(*xml_frames(spark))
    row = with_message_hash(staged_m, staged_p).filter(F.col("local_id") == 2).collect()[0]
    expected = python_reference_hash(
        [1577836900000, "<SELF>", "<SELF>", "+15550001111", "Alice", 2, 0, 0],
        [("hello back ünïcödé", "text/plain")],
    )
    assert row["hash"] == expected
