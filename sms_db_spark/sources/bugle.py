"""Android Bugle SQLite importer normalizer (reference: sms-db.pl:94-118).

Input: staged DataFrames mirroring the Bugle tables (FIXTURES.md §2.2) —
read them from an actual .db via sources/sqlite_io.read_sqlite_tables.

The reference's shape: one 3-way SQL join (J1) + two N+1 prepared-statement
loops (J2 parts, J3 group participants). Spark shape: every lookup becomes
one set-oriented join; the lookup sides (participants, conversations) are
small dimensions → broadcast, so the fact table (messages) never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import SELF, SOURCE_BUGLE, UNAVAILABLE

BUGLE_MESSAGES_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("received_timestamp", T.LongType(), True),
        T.StructField("message_protocol", T.IntegerType(), True),
        T.StructField("sender_id", T.LongType(), True),
        T.StructField("conversation_id", T.LongType(), True),
    ]
)
BUGLE_PARTICIPANTS_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("normalized_destination", T.StringType(), True),
        T.StructField("full_name", T.StringType(), True),
    ]
)
BUGLE_CONVERSATIONS_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("participant_normalized_destination", T.StringType(), True),
        T.StructField("participant_count", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("sub_id", T.IntegerType(), True),
    ]
)
BUGLE_CONV_PARTICIPANTS_SCHEMA = T.StructType(
    [
        T.StructField("conversation_id", T.LongType(), False),
        T.StructField("participant_id", T.LongType(), False),
    ]
)
BUGLE_PARTS_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("message_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("uri", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
    ]
)


def normalize_bugle(
    messages: DataFrame,
    participants: DataFrame,
    conversations: DataFrame,
    conversation_participants: DataFrame,
    parts: DataFrame,
    message_type: str = "all",
) -> tuple[DataFrame, DataFrame]:
    """Bugle staging → staged canonical (messages, parts)."""
    # protocol filter (sms-db.pl:102)
    if message_type == "sms":
        messages = messages.filter(F.col("message_protocol") == 0)
    elif message_type == "mms":
        messages = messages.filter(F.col("message_protocol") == 1)

    # J1: messages ⋈ participants(sender) ⋈ conversations (sms-db.pl:98);
    # both dimension sides broadcast.
    sender = participants.select(
        F.col("_id").alias("sender_pid"),
        F.col("normalized_destination").alias("sender_dest"),
        F.col("full_name").alias("sender_full_name"),
    )
    conv = conversations.select(
        F.col("_id").alias("conv_id"),
        "participant_normalized_destination",
        "participant_count",
        F.col("name").alias("conv_name"),
        "sub_id",
    )
    joined = messages.join(
        F.broadcast(sender), messages.sender_id == sender.sender_pid, "inner"
    ).join(F.broadcast(conv), messages.conversation_id == conv.conv_id, "inner")

    # J3: group-conversation recipient expansion (sms-db.pl:105-111) — the
    # double N+1 becomes join + ordered group-concat; order pinned to
    # conversation_participants row order via participant_id (deterministic
    # deviation, SURVEY.md W-notes).
    group_members = (
        conversation_participants.join(
            participants.select(
                F.col("_id").alias("participant_id"),
                F.col("normalized_destination").alias("member_dest"),
            ),
            "participant_id",
        )
        .groupBy("conversation_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("participant_id", "member_dest"))),
                    lambda s: s.getField("member_dest"),
                ),
                ",",
            ).alias("group_dest")
        )
        .withColumnRenamed("conversation_id", "gconv_id")
    )
    joined = joined.join(
        F.broadcast(group_members), joined.conversation_id == group_members.gconv_id, "left"
    )

    incoming = F.col("sub_id") == -2  # sms-db.pl:104
    # the group append (sms-db.pl:105-111) runs AFTER the incoming/outgoing
    # assignment and appends to the existing value — an incoming group chat
    # therefore yields '<SELF>,p1,p2,…'.
    is_group = (F.col("participant_count") > 1) & F.col(
        "participant_normalized_destination"
    ).isNull()
    base_recipient = F.when(incoming, F.lit(SELF)).otherwise(
        F.col("participant_normalized_destination")
    )
    recipient_address = F.when(
        is_group,
        F.when(base_recipient.isNull(), F.col("group_dest")).otherwise(
            F.concat_ws(",", base_recipient, F.col("group_dest"))
        ),
    ).otherwise(base_recipient)
    staged = joined.select(
        F.col("_id").alias("local_id"),
        F.col("received_timestamp").alias("timestamp"),
        F.col("sender_dest").alias("sender_address"),
        F.coalesce(F.col("sender_full_name"), F.lit(UNAVAILABLE)).alias("sender_name"),
        recipient_address.alias("recipient_address"),
        F.when(incoming, F.lit(SELF)).otherwise(F.col("conv_name")).alias("recipient_name"),
        F.when(incoming, F.lit(1)).otherwise(F.lit(2)).alias("msg_box"),
        F.col("message_protocol").alias("message_type"),
        F.lit(SOURCE_BUGLE).alias("source_format"),
    )

    # J2: parts join — Bugle non-text parts carry no blob, only a content://
    # URI; the reference degrades them to "<uri>" placeholder text
    # (sms-db.pl:114).
    staged_parts = (
        parts.join(staged.select("local_id"), parts.message_id == F.col("local_id"), "inner")
        .select(
            "local_id",
            F.col("_id").alias("part_seq"),
            F.lit(None).cast("binary").alias("data"),
            # concat_ws, not concat: Perl "<$uri>" with undef uri is the
            # literal '<>' (sms-db.pl:114), but F.concat null-propagates —
            # a NULL-text NULL-uri part must still hash as '<>'.
            F.when(F.col("text").isNotNull(), F.col("text"))
            .otherwise(F.concat_ws("", F.lit("<"), F.col("uri"), F.lit(">")))
            .alias("text"),
            "content_type",
            F.lit(None).cast("string").alias("filename"),
        )
    )
    return staged, staged_parts
