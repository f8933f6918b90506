"""Table-loader contract tests.

The driver's correctness gate calls queries() entries with its OWN vanilla
SparkSession, so load_table must work without any builder-time confs. The
events table is the hard case: its ts column is TIMESTAMP(NANOS) in parquet,
which different Spark runtimes surface differently (LongType under the
legacy nanosAsLong conf, TIMESTAMP_NTZ natively on 4.1+). load_table must
normalize both to a UTC TimestampType instant.
"""

from __future__ import annotations

import datetime

from pyspark.sql.types import TimestampType

from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_events_ts_is_utc_instant_under_vanilla_clone(spark):
    # newSession() drops runtime confs back to the context defaults —
    # closest local approximation of the driver's own vanilla session.
    vanilla = spark.newSession()
    df = load_table(vanilla, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    row = df.orderBy("event_id").limit(1).collect()[0]
    # Oracle parity anchor: DuckDB reads the same file's first row
    # (event_id=0) as 2024-01-01 00:09:58.778549.
    assert row.event_id == 0
    assert row.ts.replace(tzinfo=None) == datetime.datetime(
        2024, 1, 1, 0, 9, 58, 778549
    )


def test_events_microsecond_precision_preserved(spark):
    # The generator emits micro precision; whatever path the runtime takes
    # (nanos-as-long div 1000 or native NTZ truncation) must be lossless.
    df = load_table(spark.newSession(), SF_DIR, "events")
    rows = df.orderBy("event_id").limit(100).collect()
    assert any(r.ts.microsecond % 1000 != 0 for r in rows)
