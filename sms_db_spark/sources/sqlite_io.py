"""Read Bugle / Signal SQLite backup files into the staging DataFrames the
normalizers consume (S2/S3, sms-db.pl:95-100 and 119-124).

Read strategy: a phone backup is single-device data (MB-GB) — a driver-side
stdlib-sqlite3 read into `createDataFrame` with the EXPLICIT staging schema
is correct and dependency-free. The at-scale path for server-sized SQLite/
JDBC sources is `spark.read.jdbc` with partitionColumn/lowerBound/upperBound
(range-parallel scans); the staging schemas and everything downstream are
identical, so swapping the reader is a one-call change.

Missing columns are tolerated per-layout (older/newer app schemas): any
staging column absent from the on-disk table surfaces as NULL, matching
Perl DBI's undef for absent hash keys.
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .bugle import (
    BUGLE_CONV_PARTICIPANTS_SCHEMA,
    BUGLE_CONVERSATIONS_SCHEMA,
    BUGLE_MESSAGES_SCHEMA,
    BUGLE_PARTICIPANTS_SCHEMA,
    BUGLE_PARTS_SCHEMA,
)
from .signal import (
    SIGNAL_ATTACHMENTS_SCHEMA,
    SIGNAL_GROUPS_SCHEMA,
    SIGNAL_MMS_SCHEMA,
    SIGNAL_PART_SCHEMA,
    SIGNAL_RECIPIENT_SCHEMA,
    SIGNAL_SMS_SCHEMA,
    SIGNAL_THREAD_SCHEMA,
)


def read_sqlite_table(
    spark: SparkSession, db_path: str, table: str, schema: T.StructType
) -> DataFrame:
    """One staging frame from one SQLite table, schema-first (never
    inference). Absent columns → NULL; absent table → empty frame."""
    con = sqlite3.connect(db_path)
    try:
        try:
            present = {r[1] for r in con.execute(f"PRAGMA table_info({table})")}
        except sqlite3.DatabaseError:
            present = set()
        if not present:
            return spark.createDataFrame([], schema)
        # `rowid` never appears in PRAGMA table_info but is usually
        # selectable — the part importer needs it to pin the reference's
        # part-table row order. WITHOUT ROWID tables raise on it, so probe
        # once and degrade to NULL like any other absent column.
        rowid_ok = False
        if any(f.name == "rowid" and f.name not in present for f in schema.fields):
            try:
                con.execute(f"SELECT rowid FROM {table} LIMIT 1")
                rowid_ok = True
            except sqlite3.OperationalError:
                rowid_ok = False
        cols = ", ".join(
            f.name
            if f.name in present or (f.name == "rowid" and rowid_ok)
            else f"NULL AS {f.name}"
            for f in schema.fields
        )
        rows = con.execute(f"SELECT {cols} FROM {table}").fetchall()
    finally:
        con.close()
    return spark.createDataFrame(rows, schema)


def read_bugle_staging(
    spark: SparkSession, db_path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """The five Bugle staging frames (sms-db.pl:95-100)."""
    return (
        read_sqlite_table(spark, db_path, "messages", BUGLE_MESSAGES_SCHEMA),
        read_sqlite_table(spark, db_path, "participants", BUGLE_PARTICIPANTS_SCHEMA),
        read_sqlite_table(spark, db_path, "conversations", BUGLE_CONVERSATIONS_SCHEMA),
        read_sqlite_table(
            spark, db_path, "conversation_participants", BUGLE_CONV_PARTICIPANTS_SCHEMA
        ),
        read_sqlite_table(spark, db_path, "parts", BUGLE_PARTS_SCHEMA),
    )


# Signal backup dual-layout probe (sms-db.pl:121-123): filename-based
# detection of the two decrypted-backup tools' on-disk layouts.
SIGNAL_LAYOUTS = (
    {"db_name": "signal_backup.db", "attach_dir": "attachment", "attach_style": "underscore"},
    {"db_name": "database.sqlite", "attach_dir": "attachments", "attach_style": "bin"},
)


def detect_signal_layout(backup_dir: str) -> dict:
    """Probe which decrypted-Signal-backup layout backup_dir holds.

    Raises ValueError on neither — the reference's
    'Unrecognized Signal backup format.' die (sms-db.pl:123).
    """
    for layout in SIGNAL_LAYOUTS:
        if os.path.isfile(os.path.join(backup_dir, layout["db_name"])):
            return layout
    raise ValueError(f"Unrecognized Signal backup format: {backup_dir}")


def read_signal_staging(
    spark: SparkSession, backup_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """The six Signal staging frames + the attachments frame (S3+S4).

    Attachments come from Spark's distributed binaryFile source when the
    directory exists (path, content columns — J9 joins on the id regex in
    the filename); an absent dir degrades to an empty frame with a
    warning-equivalent (the reference warns and skips, sms-db.pl:164-166).
    """
    layout = detect_signal_layout(backup_dir)
    db_path = os.path.join(backup_dir, layout["db_name"])
    attach_dir = os.path.join(backup_dir, layout["attach_dir"])
    if os.path.isdir(attach_dir):
        attachments = (
            spark.read.format("binaryFile")
            .load(attach_dir)
            .selectExpr("path", "content")
        )
    else:
        attachments = spark.createDataFrame([], SIGNAL_ATTACHMENTS_SCHEMA)
    return (
        read_sqlite_table(spark, db_path, "sms", SIGNAL_SMS_SCHEMA),
        read_sqlite_table(spark, db_path, "mms", SIGNAL_MMS_SCHEMA),
        read_sqlite_table(spark, db_path, "recipient", SIGNAL_RECIPIENT_SCHEMA),
        read_sqlite_table(spark, db_path, "groups", SIGNAL_GROUPS_SCHEMA),
        read_sqlite_table(spark, db_path, "thread", SIGNAL_THREAD_SCHEMA),
        read_sqlite_table(spark, db_path, "part", SIGNAL_PART_SCHEMA),
        attachments,
    )
