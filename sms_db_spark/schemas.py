"""Canonical store schemas + constants.

Parity targets (reference cited per SURVEY.md §1):
  - messages table DDL: /root/reference/sms-db.pl:49
  - parts table DDL:    /root/reference/sms-db.pl:53
  - field order used in the dedup hash (@message_fields): sms-db.pl:39
  - sentinel values '<SELF>' / '<UNAVAILABLE>': sms-db.pl:70,80,103-104,142,153,191
  - msg_box / message_type / source_format code points: sms-db.pl:36-37, README.md:121-127

Deviations from the reference, by design (SURVEY.md §1.2):
  - `hash` is a StringType 64-char hex (the reference declares INT but
    stores hex text via SQLite type affinity, sms-db.pl:49,325).
  - parts.data polymorphism (text vs blob, sms-db.pl:88,114,222) is split
    into a typed `text` string lane + `data` binary lane; reconstituted on
    export and in the hash.
  - array views of comma-joined multi-recipient strings are additive.
"""

from __future__ import annotations

from pyspark.sql import types as T

# source_format codes — sms-db.pl:36
SOURCE_XML, SOURCE_BUGLE, SOURCE_SIGNAL = 0, 1, 2
# message_type codes — sms-db.pl:37
MSG_SMS, MSG_MMS = 0, 1
# msg_box codes — README.md:123
BOX_RECEIVED, BOX_SENT, BOX_DRAFT, BOX_OUTBOX = 1, 2, 3, 4

# sentinels — sms-db.pl:70,103 etc. Preserved exactly: they participate in
# the dedup hash (README.md:115 documents a real dedup miss caused by <SELF>).
SELF = "<SELF>"
UNAVAILABLE = "<UNAVAILABLE>"

# hash field order — sms-db.pl:39 (@message_fields). The dedup digest is
# sha256(utf8(join('', fields..., (part.data, part.content_type)...))) with an
# EMPTY join separator (sms-db.pl:325).
MESSAGE_HASH_FIELDS = (
    "timestamp",
    "sender_address",
    "sender_name",
    "recipient_address",
    "recipient_name",
    "msg_box",
    "message_type",
    "source_format",
)

# Signal raw type → canonical msg_box decode table — sms-db.pl:131.
# 2 = outgoing variants, 1 = received variants; everything else is ignored
# (counted, with special warnings for 2097156 "is on Signal!" and 2 "call").
SIGNAL_MESSAGE_TYPES = {
    23: 2,
    24: 2,
    87: 2,
    88: 2,
    10485783: 2,
    20: 1,
    10485780: 1,
}
SIGNAL_IGNORED_SPECIAL = {2097156: "is_on_signal", 2: "outgoing_call"}

# MMS addr 'type' codes whose rows contribute recipients — sms-db.pl:83
MMS_ADDR_RECIPIENT_TYPES = ("151", "129", "130")
MMS_ADDR_FROM = 137  # sms-db.pl:290
MMS_ADDR_TO = 151  # sms-db.pl:297

MESSAGES_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("timestamp", T.LongType(), True),  # epoch millis, README.md:117
        T.StructField("sender_address", T.StringType(), True),
        T.StructField("sender_name", T.StringType(), True),
        T.StructField("recipient_address", T.StringType(), True),
        T.StructField("recipient_name", T.StringType(), True),
        T.StructField("msg_box", T.IntegerType(), True),
        T.StructField("message_type", T.IntegerType(), True),
        T.StructField("source_format", T.IntegerType(), True),
        T.StructField("hash", T.StringType(), True),  # 64-char lowercase hex
    ]
)

PARTS_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("message_id", T.LongType(), False),
        T.StructField("data", T.BinaryType(), True),  # binary lane (attachments)
        T.StructField("text", T.StringType(), True),  # text lane (text/* parts)
        T.StructField("content_type", T.StringType(), True),
        T.StructField("filename", T.StringType(), True),
    ]
)

# pre-id normalizer output: importer emits messages w/ a per-batch local key
# and parts referencing that local key; finalize assigns dense ids (W2).
STAGED_MESSAGE_COLUMNS = [
    "local_id",
    "timestamp",
    "sender_address",
    "sender_name",
    "recipient_address",
    "recipient_name",
    "msg_box",
    "message_type",
    "source_format",
]
STAGED_PART_COLUMNS = ["local_id", "part_seq", "data", "text", "content_type", "filename"]
