"""Watermarked stream-stream interval join.

The reference is strictly batch (SURVEY.md §2.7), so this is extension
surface: the streaming form of q93's range-join semantics — match each
"view" event with the same user's "purchase" events that happen within
ATTRIBUTION_WINDOW after it (the standard attribution join).

Structured Streaming executes this as a symmetric hash join where BOTH
sides buffer state; the two `withWatermark` calls plus the time-bound
join condition are what make that state droppable: a buffered view can
be evicted once the purchase-side watermark passes view.ts +
ATTRIBUTION_WINDOW (no future purchase can match it), and vice versa.
Without the time bound the state grows forever — Spark rejects the
append-mode query outright, which is the right default.

Scale notes: state per side ≈ rows within the watermark horizon, keyed
by user_id — uniform, RocksDB-backed in production. The shuffle is the
usual exchange on the equi key (user_id); the interval predicate rides
as a residual inside the joined state lookup, exactly like the batch
bucketed form (q93) — neither shape ever compares a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import EVENT_SCHEMA

ATTRIBUTION_WINDOW = "30 minutes"
WATERMARK = "20 minutes"


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    attribution_window: str = ATTRIBUTION_WINDOW,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Views ⋈ purchases of the same user with purchase.ts in
    [view.ts, view.ts + attribution_window].

    Works identically on batch frames (plain range join) and streaming
    frames (symmetric hash join with watermark-bounded state) — one
    declarative plan, which is the point.
    """
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    ).withWatermark("purchase_ts", watermark)
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {attribution_window}")),
    ).select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
        "amount",
    )


def stream_attribution_join(
    spark,
    views_dir: str,
    purchases_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    attribution_window: str = ATTRIBUTION_WINDOW,
    watermark: str = WATERMARK,
):
    """File-source streams on both sides -> watermarked interval join ->
    append-mode parquet sink. Each matched pair is emitted exactly once;
    a row arriving behind the other side's watermark finds its potential
    matches already evicted and emits nothing (late-data contract
    mirrors `windows.py`)."""
    views = spark.readStream.schema(EVENT_SCHEMA).parquet(views_dir)
    purchases = spark.readStream.schema(EVENT_SCHEMA).parquet(purchases_dir)
    joined = attribution_join(views, purchases, attribution_window, watermark)
    return (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
