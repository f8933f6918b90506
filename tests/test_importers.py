"""Importer normalizer semantics vs the reference (golden expectations
hand-derived from sms-db.pl:63-229 over tests/fixtures.py inputs)."""

from __future__ import annotations

from sms_db_spark.schemas import SELF, UNAVAILABLE
from sms_db_spark.sources.bugle import normalize_bugle
from sms_db_spark.sources.signal import normalize_signal
from sms_db_spark.sources.xml_source import normalize_xml
from tests.fixtures import JPEG_BYTES, bugle_frames, signal_frames, xml_frames


def _by_local(df):
    return {r["local_id"]: r.asDict() for r in df.collect()}


class TestXml:
    def test_sms_swap(self, spark):
        m, _ = normalize_xml(*xml_frames(spark))
        rows = _by_local(m)
        received = rows[0]  # type=1
        assert received["sender_address"] == "+15550001111"
        assert received["sender_name"] == "Alice"
        assert received["recipient_address"] == SELF
        assert received["recipient_name"] == SELF
        assert received["msg_box"] == 1 and received["message_type"] == 0
        sent = rows[2]  # type=2
        assert sent["sender_address"] == SELF
        assert sent["recipient_address"] == "+15550001111"

    def test_mms_addr_append(self, spark):
        m, _ = normalize_xml(*xml_frames(spark))
        rows = _by_local(m)
        # received mms (local 1): initial undef → addr list only, 137 row excluded
        assert rows[1]["recipient_address"] == "+15559998888,+15559997777"
        assert rows[1]["recipient_name"] == SELF
        # sent mms (local 3): initial address, then 151/129 appended; 999 excluded
        assert rows[3]["recipient_address"] == "+15550004444,+15550004444,+15550009999"
        assert rows[3]["recipient_name"] == "Dave"

    def test_part_base64_decode(self, spark):
        _, p = normalize_xml(*xml_frames(spark))
        parts = [r.asDict() for r in p.orderBy("local_id", "part_seq").collect()]
        img = [x for x in parts if x["content_type"] == "image/jpeg"][0]
        assert bytes(img["data"]) == JPEG_BYTES  # base64-decoded binary lane
        assert img["text"] is None
        assert img["filename"] == "IMG_0001.jpg"
        text = [x for x in parts if x["local_id"] == 1 and x["part_seq"] == 0][0]
        assert text["text"] == "photo attached" and text["data"] is None


class TestBugle:
    def test_incoming_outgoing_and_unavailable(self, spark):
        m, _ = normalize_bugle(*bugle_frames(spark))
        rows = _by_local(m)
        incoming = rows[1]  # conv 100 sub_id=-2
        assert incoming["msg_box"] == 1
        assert incoming["recipient_address"] == SELF
        assert incoming["sender_name"] == "Eve"
        outgoing = rows[2]
        assert outgoing["msg_box"] == 2
        assert outgoing["sender_name"] == UNAVAILABLE  # null full_name
        assert outgoing["recipient_address"] == "+15552220000"
        assert outgoing["recipient_name"] == "NoName"

    def test_group_expansion(self, spark):
        m, _ = normalize_bugle(*bugle_frames(spark))
        rows = _by_local(m)
        group = rows[3]  # conv 102: count=3, null destination
        assert group["recipient_address"] == "+15551110000,+15552220000,+15553330000"
        assert group["recipient_name"] == "The Gang"

    def test_uri_part_placeholder(self, spark):
        _, p = normalize_bugle(*bugle_frames(spark))
        uri_part = [r for r in p.collect() if r["content_type"] == "image/png"][0]
        assert uri_part["text"] == "<content://mms/part/5>"  # sms-db.pl:114


class TestSignal:
    def test_ignored_counts(self, spark):
        _, _, ignored = normalize_signal(*signal_frames(spark))
        # sms: 2097156 + call(2) + unknown(999); mms: bad box 777
        assert ignored == 4

    def test_sms_decode_and_defaults(self, spark):
        m, _, _ = normalize_signal(*signal_frames(spark))
        rows = _by_local(m)
        received = rows[2]  # sms _id=1, type 20 → box 1
        assert received["msg_box"] == 1
        assert received["sender_address"] == "+15556660000"
        assert received["sender_name"] == "Grace"
        sent = rows[4]  # sms _id=2, 10485783 → box 2; null name → UNAVAILABLE
        assert sent["msg_box"] == 2
        assert sent["recipient_address"] == "+15557770000"
        assert sent["recipient_name"] == UNAVAILABLE

    def test_mms_thread_group_override(self, spark):
        m, _, _ = normalize_signal(*signal_frames(spark))
        rows = _by_local(m)
        sent_group = rows[5]  # mms _id=2 → thread 2 → recipient 30 → group g1
        assert sent_group["msg_box"] == 2
        assert sent_group["sender_address"] == SELF
        # members 10,12 in members-list order, names defaulted per :201-203
        assert sent_group["recipient_address"] == "+15556660000,+15558880000"
        assert sent_group["recipient_name"] == "Grace,Heidi"

    def test_attachment_join_and_missing_file(self, spark):
        _, p, _ = normalize_signal(*signal_frames(spark))
        parts = [r.asDict() for r in p.collect()]
        att = [x for x in parts if x["content_type"] == "image/jpeg"]
        assert len(att) == 1
        assert bytes(att[0]["data"]) == JPEG_BYTES
        assert att[0]["filename"] == "photo.jpg"
        # unique_id 4999 has no file → part dropped (reference warns+skips, :217)
        assert not [x for x in parts if x["content_type"] == "image/png"]
        # body text part exists for mms 1
        body = [x for x in parts if x["local_id"] == 3 and x["part_seq"] == 0]
        assert body and body[0]["text"] == "mms body"

    def test_attachment_part_order_follows_table_rows_not_unique_id(self, spark):
        """Reference appends attachment parts in part-TABLE row order
        (sms-db.pl:211-223), and part order feeds the dedup hash
        (sms-db.pl:325). Two attachments whose unique_ids INVERT the table
        order must still hash in table order."""
        from sms_db_spark.functions.hashing import python_reference_hash
        from sms_db_spark.sources.canonical import with_message_hash
        from sms_db_spark.sources.signal import (
            SIGNAL_ATTACHMENTS_SCHEMA,
            SIGNAL_GROUPS_SCHEMA,
            SIGNAL_MMS_SCHEMA,
            SIGNAL_PART_SCHEMA,
            SIGNAL_RECIPIENT_SCHEMA,
            SIGNAL_SMS_SCHEMA,
            SIGNAL_THREAD_SCHEMA,
        )

        sms = spark.createDataFrame([], SIGNAL_SMS_SCHEMA)
        mms = spark.createDataFrame(
            [(1, 1, 10, 1610001000000, 20, "two pics")], SIGNAL_MMS_SCHEMA
        )
        recipient = spark.createDataFrame(
            [(10, "+15556660000", "Grace", None)], SIGNAL_RECIPIENT_SCHEMA
        )
        groups = spark.createDataFrame([], SIGNAL_GROUPS_SCHEMA)
        thread = spark.createDataFrame([(1, 10)], SIGNAL_THREAD_SCHEMA)
        # table order (rowid 1, 2) inverts unique_id order (9002, 9001)
        part = spark.createDataFrame(
            [
                (1, "image/jpeg", "b.jpg", 9002, 1),
                (1, "image/png", "a.png", 9001, 2),
            ],
            SIGNAL_PART_SCHEMA,
        )
        attachments = spark.createDataFrame(
            [
                ("/backup/attachment/9001_1.png", b"AAAA"),
                ("/backup/attachment/9002_1.jpg", b"BBBB"),
            ],
            SIGNAL_ATTACHMENTS_SCHEMA,
        )
        m, p, ignored = normalize_signal(
            sms, mms, recipient, groups, thread, part, attachments, message_type="mms"
        )
        assert ignored == 0
        seq = {
            r["part_seq"]: r.asDict()
            for r in p.orderBy("part_seq").collect()
        }
        assert seq[0]["text"] == "two pics"
        assert bytes(seq[1]["data"]) == b"BBBB" and seq[1]["content_type"] == "image/jpeg"
        assert bytes(seq[2]["data"]) == b"AAAA" and seq[2]["content_type"] == "image/png"
        row = with_message_hash(m, p).collect()[0]
        expected = python_reference_hash(
            [
                row["timestamp"], row["sender_address"], row["sender_name"],
                row["recipient_address"], row["recipient_name"], row["msg_box"],
                row["message_type"], row["source_format"],
            ],
            [("two pics", "text/plain"), (b"BBBB", "image/jpeg"), (b"AAAA", "image/png")],
        )
        assert row["hash"] == expected


def test_sqlite_like_compat_rewrite():
    """LIKE→ILIKE token rewrite: operators outside quotes rewritten
    (any case, NOT LIKE included), literal and quoted-identifier
    content untouched, ILIKE left alone (idempotent)."""
    from sms_db_spark.functions.sqlcompat import sqlite_like_compat as c

    assert c("a LIKE 'x%'") == "a ILIKE 'x%'"
    assert c("a like 'x%'") == "a ILIKE 'x%'"
    assert c("a NOT LIKE 'x%'") == "a NOT ILIKE 'x%'"
    # data stays data: a literal containing ' LIKE ' and an escaped ''
    assert c("a = 'I LIKE it' AND b LIKE 'don''t LIKE %'") == (
        "a = 'I LIKE it' AND b ILIKE 'don''t LIKE %'"
    )
    # quoted identifiers untouched — all four sqlite3 quotings
    assert c('"LIKE" LIKE \'x\'') == '"LIKE" ILIKE \'x\''
    assert c("[LIKE] LIKE 'x'") == "[LIKE] ILIKE 'x'"
    assert c("`LIKE` LIKE 'x'") == "`LIKE` ILIKE 'x'"
    # idempotent: ILIKE has no \bLIKE\b inside
    assert c("a ILIKE 'x%'") == "a ILIKE 'x%'"
    # LIKELY / columns named like_x are not operators
    assert c("SELECT likely, my_like FROM t WHERE x LIKE 'a'") == (
        "SELECT likely, my_like FROM t WHERE x ILIKE 'a'"
    )
    # comments are opaque (ADVICE r16 #1): a LIKE inside one is data,
    # and an apostrophe inside one must not open a phantom literal
    # that desynchronizes the scanner for a LATER operator LIKE
    assert c("x LIKE 'a' -- comments may say LIKE\n AND y LIKE 'b'") == (
        "x ILIKE 'a' -- comments may say LIKE\n AND y ILIKE 'b'"
    )
    assert c("-- don't\nx LIKE 'a'") == "-- don't\nx ILIKE 'a'"
    assert c("/* don't LIKE this */ x LIKE 'a'") == (
        "/* don't LIKE this */ x ILIKE 'a'"
    )
    # unterminated trailing comments swallow the rest of the input
    assert c("x LIKE 'a' -- trailing don't") == "x ILIKE 'a' -- trailing don't"
    assert c("x LIKE 'a' /* open don't") == "x ILIKE 'a' /* open don't"
    # a quote character ends a line comment's opacity at the newline
    assert c("-- it's fine\nSELECT 'a LIKE b' WHERE x LIKE 'c'") == (
        "-- it's fine\nSELECT 'a LIKE b' WHERE x ILIKE 'c'"
    )
    # block comments do not nest (sqlite semantics): the first */ closes
    assert c("/* a /* b */ x LIKE 'c'") == "/* a /* b */ x ILIKE 'c'"
