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


# --- property test: byte parity on arbitrary generated records ---------------

from hypothesis import given, settings, strategies as st

from sms_db_spark.schemas import MESSAGE_HASH_FIELDS

_text = st.text(max_size=24)  # arbitrary unicode (incl. astral, excl. surrogates)
_maybe_text = st.one_of(st.none(), _text)
_part = st.tuples(
    st.one_of(
        st.none(),
        _text,                                 # text-lane part
        st.binary(min_size=0, max_size=24),    # binary lane (latin1→utf8 expansion)
    ),
    st.one_of(st.none(), st.sampled_from(["text/plain", "image/jpeg", "video/mp4"])),
)
_record = st.tuples(
    st.integers(min_value=0, max_value=2**53),  # timestamp
    _maybe_text, _maybe_text, _maybe_text, _maybe_text,  # addresses/names
    st.integers(min_value=1, max_value=4),      # msg_box
    st.integers(min_value=0, max_value=1),      # message_type
    st.integers(min_value=0, max_value=2),      # source_format
    st.lists(_part, max_size=3),                # parts
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_record, min_size=1, max_size=6))
def test_spark_hash_parity_on_generated_records(spark, records):
    """with_message_hash must byte-match the Perl-recipe oracle for ANY
    record: unicode, None fields, binary payloads, partless messages."""
    import pandas as pd
    from pyspark.sql import types as T

    msg_rows, part_rows = [], []
    for lid, rec in enumerate(records):
        *meta, parts = rec
        msg_rows.append((lid, *meta))
        for seq, (data, ct) in enumerate(parts):
            is_bin = isinstance(data, bytes)
            part_rows.append(
                (lid, seq, data if is_bin else None, None if is_bin else data, ct, None)
            )

    msg_schema = T.StructType(
        [T.StructField("local_id", T.LongType(), False)]
        + [
            T.StructField(name, T.LongType() if name in ("timestamp",) else
                          T.IntegerType() if name in ("msg_box", "message_type", "source_format")
                          else T.StringType(), True)
            for name in MESSAGE_HASH_FIELDS
        ]
    )
    part_schema = T.StructType(
        [
            T.StructField("local_id", T.LongType(), False),
            T.StructField("part_seq", T.IntegerType(), False),
            T.StructField("data", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("content_type", T.StringType(), True),
            T.StructField("filename", T.StringType(), True),
        ]
    )
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    msgs = spark.createDataFrame(
        pd.DataFrame(msg_rows, columns=[f.name for f in msg_schema.fields], dtype=object),
        msg_schema,
    )
    parts = spark.createDataFrame(
        pd.DataFrame(part_rows, columns=[f.name for f in part_schema.fields], dtype=object),
        part_schema,
    )

    got = {r["local_id"]: r["hash"] for r in with_message_hash(msgs, parts).collect()}
    for lid, rec in enumerate(records):
        *meta, parts_list = rec
        assert got[lid] == python_reference_hash(list(meta), parts_list), (lid, rec)
