"""Signal backup importer normalizer (reference: sms-db.pl:119-229).

Input: staged DataFrames mirroring the Signal tables (FIXTURES.md §2.3)
plus an attachments frame (path, content) as produced by
spark.read.format('binaryFile') over the backup's attachment dir (S4).

Reference inefficiencies deliberately NOT replicated (SURVEY.md §4):
  - per-message N+1 scalar lookups (thread, recipient, group) → broadcast
    join chain J7;
  - O(parts×messages) app-side nested loop (sms-db.pl:211-212) → equi-join
    J8;
  - O(files) linear regex scan per attachment (sms-db.pl:215) → one
    regexp_extract over paths + equi-join J9, with a deterministic
    row_number()==1 pick replacing directory-order first-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import (
    MSG_MMS,
    MSG_SMS,
    SELF,
    SIGNAL_MESSAGE_TYPES,
    SOURCE_SIGNAL,
    UNAVAILABLE,
)

SIGNAL_SMS_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("address", T.LongType(), True),
        T.StructField("date", T.LongType(), True),
        T.StructField("type", T.LongType(), True),
        T.StructField("body", T.StringType(), True),
    ]
)
SIGNAL_MMS_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("thread_id", T.LongType(), True),
        T.StructField("address", T.LongType(), True),
        T.StructField("date", T.LongType(), True),
        T.StructField("msg_box", T.LongType(), True),
        T.StructField("body", T.StringType(), True),
    ]
)
SIGNAL_RECIPIENT_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("phone", T.StringType(), True),
        T.StructField("system_display_name", T.StringType(), True),
        T.StructField("group_id", T.StringType(), True),
    ]
)
SIGNAL_GROUPS_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.StringType(), False),
        T.StructField("members", T.StringType(), True),
    ]
)
SIGNAL_THREAD_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType(), False),
        T.StructField("thread_recipient_id", T.LongType(), True),
    ]
)
SIGNAL_PART_SCHEMA = T.StructType(
    [
        T.StructField("mid", T.LongType(), False),
        T.StructField("ct", T.StringType(), True),
        T.StructField("file_name", T.StringType(), True),
        T.StructField("unique_id", T.LongType(), False),
        # SQLite rowid of the part row: the reference appends attachment
        # parts in part-*table* row order (sms-db.pl:211-223), and part
        # order feeds the dedup hash (sms-db.pl:325) — so ordering by
        # unique_id would hash out-of-order multi-attachment messages
        # differently than the reference.
        T.StructField("rowid", T.LongType(), False),
    ]
)
SIGNAL_ATTACHMENTS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def _decode_expr(col: str):
    """P5 dictionary decode (sms-db.pl:131) as a literal CASE chain —
    stays in codegen; unmapped → NULL (the reject/ignore branch)."""
    expr = F.lit(None).cast("int")
    for raw, box in reversed(list(SIGNAL_MESSAGE_TYPES.items())):
        expr = F.when(F.col(col) == raw, F.lit(box)).otherwise(expr)
    return expr


def _group_expansion(groups: DataFrame, recipient: DataFrame, default_unavailable: bool):
    """J6: groups.members (comma-joined recipient ids) → split → explode →
    join recipient → re-join phones/names with ','.

    Order pinned to members-list position via posexplode (the reference
    iterates the split list in order, sms-db.pl:184-188).
    default_unavailable: the thread-recipient expansion defaults undef
    phones/names to <UNAVAILABLE> (sms-db.pl:201-203); the sender-side one
    does NOT (sms-db.pl:184-188 — undefs join as empty strings).
    """
    exploded = groups.select(
        "group_id",
        F.posexplode(F.split(F.col("members"), ",")).alias("pos", "member_id"),
    )
    member = recipient.select(
        F.col("_id").alias("member_rid"),
        F.col("phone").alias("m_phone"),
        F.col("system_display_name").alias("m_name"),
    )
    joined = exploded.join(
        F.broadcast(member), exploded.member_id.cast("long") == member.member_rid, "left"
    )
    if default_unavailable:
        phone = F.coalesce(F.col("m_phone"), F.lit(UNAVAILABLE))
        name = F.coalesce(F.col("m_name"), F.lit(UNAVAILABLE))
    else:
        phone = F.coalesce(F.col("m_phone"), F.lit(""))
        name = F.coalesce(F.col("m_name"), F.lit(""))
    return joined.groupBy("group_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), phone.alias("v")))),
                lambda s: s.getField("v"),
            ),
            ",",
        ).alias("g_phones"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), name.alias("v")))),
                lambda s: s.getField("v"),
            ),
            ",",
        ).alias("g_names"),
    )


def signal_quarantine_rows(
    sms: DataFrame, mms: DataFrame, recipient: DataFrame
) -> DataFrame:
    """The ignored-record QUARANTINE frame (VERDICT r15 item 8): the
    reference DUMPS each ignored record to the console as it skips it
    (Data::Dump at sms-db.pl:146-147 for sms, :176 for mms) so the
    user can see what the import refused. A driver-side dump is the
    wrong shape at scale; the scale-correct twin is a persistable
    reject frame — the offending rows with a reason code — that an
    import can write next to the store and a user can read back,
    instead of scraping warnings from executor logs.

    Shares the staging predicate with normalize_signal verbatim: the
    same broadcast recipient join and the same _decode_expr, with the
    FILTER INVERTED (box IS NULL = the reject branch normalize_signal
    counts into ignored_count). One row per ignored message, carrying
    the raw record fields plus `reason`; by construction
    count(quarantine) == ignored_count, which q172 asserts through the
    hash gate."""
    rec = recipient.select(F.col("_id").alias("rid"))
    s = (
        sms.join(F.broadcast(rec), sms.address == rec.rid, "inner")
        .withColumn("box", _decode_expr("type"))
        .filter(F.col("box").isNull())
        .select(
            F.lit("sms").alias("source"),
            "_id",
            F.col("date").alias("timestamp"),
            F.col("address"),
            F.col("type").alias("raw_code"),
            "body",
            F.lit("unknown_type_code").alias("reason"),
        )
    )
    m = (
        mms.join(F.broadcast(rec), mms.address == rec.rid, "inner")
        .withColumn("box", _decode_expr("msg_box"))
        .filter(F.col("box").isNull())
        .select(
            F.lit("mms").alias("source"),
            "_id",
            F.col("date").alias("timestamp"),
            F.col("address"),
            F.col("msg_box").alias("raw_code"),
            "body",
            F.lit("unknown_msg_box_code").alias("reason"),
        )
    )
    return s.unionByName(m)


def normalize_signal(
    sms: DataFrame,
    mms: DataFrame,
    recipient: DataFrame,
    groups: DataFrame,
    thread: DataFrame,
    part: DataFrame,
    attachments: DataFrame,
    message_type: str = "all",
) -> tuple[DataFrame, DataFrame, int]:
    """Signal staging → (staged_messages, staged_parts, ignored_count).

    ignored_count ≙ the reference's ignored_messages counter (unknown
    type/msg_box codes, incl. 'is on Signal!' and call records,
    sms-db.pl:136-151, 174-180).
    """
    out_msgs, out_parts, reject_flags = [], [], []

    rec = recipient.select(
        F.col("_id").alias("rid"),
        "phone",
        "system_display_name",
        F.col("group_id").alias("rec_group_id"),
    )

    if message_type in ("sms", "all"):
        # J4 equi-join + P5 decode; sms-db.pl:132-157
        j = sms.join(F.broadcast(rec), sms.address == rec.rid, "inner").withColumn(
            "box", _decode_expr("type")
        )
        reject_flags.append(j.select(F.col("box").isNull().alias("rejected")))
        ok = j.filter(F.col("box").isNotNull())
        sent = F.col("box") == 2
        m = ok.select(
            (F.col("_id") * 2).alias("local_id"),
            F.col("date").alias("timestamp"),
            F.when(sent, F.lit(SELF))
            .otherwise(F.coalesce(F.col("phone"), F.lit(UNAVAILABLE)))
            .alias("sender_address"),
            F.when(sent, F.lit(SELF))
            .otherwise(F.coalesce(F.col("system_display_name"), F.lit(UNAVAILABLE)))
            .alias("sender_name"),
            F.when(sent, F.coalesce(F.col("phone"), F.lit(UNAVAILABLE)))
            .otherwise(F.lit(SELF))
            .alias("recipient_address"),
            F.when(sent, F.coalesce(F.col("system_display_name"), F.lit(UNAVAILABLE)))
            .otherwise(F.lit(SELF))
            .alias("recipient_name"),
            F.col("box").alias("msg_box"),
            F.lit(MSG_SMS).alias("message_type"),
            F.lit(SOURCE_SIGNAL).alias("source_format"),
        )
        p = ok.select(
            (F.col("_id") * 2).alias("local_id"),
            F.lit(0).alias("part_seq"),
            F.lit(None).cast("binary").alias("data"),
            F.col("body").alias("text"),
            F.lit("text/plain").alias("content_type"),
            F.lit(None).cast("string").alias("filename"),
        )
        out_msgs.append(m)
        out_parts.append(p)

    if message_type in ("mms", "all"):
        # J5 + P5; sms-db.pl:159-227
        j = mms.join(F.broadcast(rec), mms.address == rec.rid, "inner").withColumn(
            "box", _decode_expr("msg_box")
        )
        reject_flags.append(j.select(F.col("box").isNull().alias("rejected")))
        ok = j.filter(F.col("box").isNotNull())

        # sender-side group expansion (sms-db.pl:181-189): if the message's
        # recipient row has a group_id, phone/name become the member lists
        # (no <UNAVAILABLE> defaulting here).
        sender_groups = _group_expansion(groups, recipient, default_unavailable=False)
        ok = ok.join(
            F.broadcast(sender_groups.withColumnRenamed("group_id", "sg_id")),
            F.col("rec_group_id") == F.col("sg_id"),
            "left",
        ).withColumns(
            {
                "eff_phone": F.when(
                    F.col("rec_group_id").isNotNull(), F.col("g_phones")
                ).otherwise(F.col("phone")),
                "eff_name": F.when(
                    F.col("rec_group_id").isNotNull(), F.col("g_names")
                ).otherwise(F.col("system_display_name")),
            }
        ).drop("g_phones", "g_names", "sg_id")

        # thread-recipient group chain (J7, sms-db.pl:162-163,192-205):
        # mms.thread_id → thread.thread_recipient_id → recipient.group_id →
        # group member lists (with <UNAVAILABLE> defaulting), overriding the
        # recipient_* columns AFTER the swap.
        thread_rec = thread.select(
            F.col("_id").alias("t_id"), "thread_recipient_id"
        )
        rec2 = recipient.select(
            F.col("_id").alias("tr_rid"), F.col("group_id").alias("thread_group_id")
        )
        thread_groups = _group_expansion(groups, recipient, default_unavailable=True)
        ok = (
            ok.join(F.broadcast(thread_rec), ok.thread_id == thread_rec.t_id, "left")
            .join(F.broadcast(rec2), F.col("thread_recipient_id") == rec2.tr_rid, "left")
            .join(
                F.broadcast(
                    thread_groups.select(
                        F.col("group_id").alias("tg_id"),
                        F.col("g_phones").alias("tg_phones"),
                        F.col("g_names").alias("tg_names"),
                    )
                ),
                F.col("thread_group_id") == F.col("tg_id"),
                "left",
            )
        )

        sent = F.col("box") == 2
        swap_recipient_addr = F.when(
            sent, F.coalesce(F.col("eff_phone"), F.lit(UNAVAILABLE))
        ).otherwise(F.lit(SELF))
        swap_recipient_name = F.when(
            sent, F.coalesce(F.col("eff_name"), F.lit(UNAVAILABLE))
        ).otherwise(F.lit(SELF))
        m = ok.select(
            (F.col("_id") * 2 + 1).alias("local_id"),
            F.col("date").alias("timestamp"),
            F.when(sent, F.lit(SELF))
            .otherwise(F.coalesce(F.col("eff_phone"), F.lit(UNAVAILABLE)))
            .alias("sender_address"),
            F.when(sent, F.lit(SELF))
            .otherwise(F.coalesce(F.col("eff_name"), F.lit(UNAVAILABLE)))
            .alias("sender_name"),
            F.coalesce(F.col("tg_phones"), swap_recipient_addr).alias("recipient_address"),
            F.coalesce(F.col("tg_names"), swap_recipient_name).alias("recipient_name"),
            F.col("box").alias("msg_box"),
            F.lit(MSG_MMS).alias("message_type"),
            F.lit(SOURCE_SIGNAL).alias("source_format"),
        )
        out_msgs.append(m)

        # body text part (part_seq 0, sms-db.pl:210) then attachments
        # (sms-db.pl:211-223) in part-table order.
        body_parts = ok.filter(F.col("body").isNotNull()).select(
            (F.col("_id") * 2 + 1).alias("local_id"),
            F.lit(0).alias("part_seq"),
            F.lit(None).cast("binary").alias("data"),
            F.col("body").alias("text"),
            F.lit("text/plain").alias("content_type"),
            F.lit(None).cast("string").alias("filename"),
        )
        # J9: resolve backup filename by unique_id prefix; deterministic
        # first-match via min(path). Missing file → part skipped (warn path).
        att_keyed = attachments.withColumn(
            "att_uid",
            F.regexp_extract(
                F.element_at(F.split(F.col("path"), "/"), -1), r"^([0-9]+)(_|\.bin)", 1
            ).cast("long"),
        ).filter(F.col("att_uid").isNotNull())
        first_match = att_keyed.groupBy("att_uid").agg(
            F.min_by(F.col("content"), F.col("path")).alias("content")
        )
        # part_seq follows the part-*table* row order (rowid), matching the
        # reference's append order (sms-db.pl:211-223) — NOT unique_id
        # order, which can invert it and diverge the dedup hash. Sequence
        # is assigned after the attachment join, like the reference's
        # @parts push (missing-file parts never enter the order). The
        # window shuffles on local_id with a handful of rows per message.
        seq_w = Window.partitionBy("local_id").orderBy("rowid")
        att_parts = (
            part.join(
                ok.select((F.col("_id")).alias("msg_mid"), (F.col("_id") * 2 + 1).alias("local_id")),
                part.mid == F.col("msg_mid"),
                "inner",
            )
            .join(F.broadcast(first_match), part.unique_id == first_match.att_uid, "inner")
            .select(
                "local_id",
                F.row_number().over(seq_w).alias("part_seq"),
                F.col("content").alias("data"),
                F.lit(None).cast("string").alias("text"),
                F.col("ct").alias("content_type"),
                F.col("file_name").alias("filename"),
            )
        )
        out_parts.append(body_parts.unionByName(att_parts))

    msgs = out_msgs[0] if len(out_msgs) == 1 else out_msgs[0].unionByName(out_msgs[1])
    parts = out_parts[0] if len(out_parts) == 1 else out_parts[0].unionByName(out_parts[1])
    # ignored_messages counter (sms-db.pl:136-151, 174-180) as ONE
    # conditional-agg Spark job over both sources' reject indicators (A2
    # shape) — not one eager .count() job per source re-running each
    # staging join separately.
    flags = reject_flags[0]
    for extra in reject_flags[1:]:
        flags = flags.unionAll(extra)
    ignored = flags.agg(
        F.sum(F.col("rejected").cast("long")).alias("n")
    ).collect()[0]["n"] or 0
    return msgs, parts, int(ignored)
