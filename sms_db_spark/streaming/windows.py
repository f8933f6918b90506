"""Event-time windowed streaming aggregation with watermark-based late-data
handling.

The reference is strictly batch (SURVEY.md §2.7), so this is extension
surface: the streaming twin of q30_window_agg's batch tumbling window,
built the Structured Streaming way — `withWatermark` on the event-time
column bounds both the aggregation state and the lateness horizon; rows
arriving later than (max event time seen - watermark) are dropped, and in
append mode a window only emits once the watermark passes its end (i.e.
the result is final, never retracted).

Scale notes: state lives in the state store keyed by (window, event_type)
— bounded by watermark expiry, uniform across executors; the shuffle is
the usual groupBy exchange on those keys. At 100 TB/day this is the
standard production shape: watermark = max tolerated lateness, window
sized so per-key state stays in the low millions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# THE one streaming wire schema: the driver's events table minus the nanos
# quirk (tables.load_table normalizes ts to TimestampType micros); streams
# stage files in this shape. Defined ONCE here and imported by every other
# streaming module (upsert/quality/shards/joins) — a drop dir written for
# one consumer is readable by all of them. Consumers that don't use `props`
# simply ignore the column.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def windowed_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Tumbling event-time window counts per event_type.

    Works on both a streaming frame (readStream; append-mode finality,
    late drops) and a batch frame (identical results when no data is
    late) — the same declarative plan, which is the point.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "10 minutes",
    watermark: str = "20 minutes",
):
    """File-source stream -> watermarked windowed agg -> append-mode parquet
    sink. Append mode means every emitted row is FINAL: a window flushes
    only when the watermark passes window_end, and later-than-watermark
    rows never resurrect it (the at-most-once-emit contract downstream
    consumers want)."""
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(drop_dir)
    agg = windowed_counts(stream, window_duration, watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
