"""Generic MERGE INTO for a parquet store: the lakehouse upsert API
(Delta/Iceberg `MERGE INTO` subset) as one full-outer join + an atomic
rewrite.

Semantics per target key:
  - matched  + delete_condition true  → row removed
  - matched  otherwise                → source columns win (update)
  - source-only                       → inserted
  - target-only                       → kept unchanged

Where q126 / streaming/upsert.py fold a CHANGELOG (ordered events,
last-write-wins) into state, this merges a SNAPSHOT delta: the source
is already one row per key — the "recompute a slice upstream, merge it
in" workflow. One shuffle on the key (the full-outer join); the rewrite
is write-new-then-swap like sinks/compaction.py, so readers never see a
half-merged store and a failed merge leaves the target untouched.

At 100 TB: run per partition (merge the affected partitions only —
combine with sinks/partitioned.backfill_day for date-keyed stores), and
when the source is small relative to the target prefer copy-on-write of
only the FILES containing matched keys (the file-pruning join: source
keys → footer min/max ranges → touched file set); the full-outer here
is the semantics reference that path must reproduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import atomic_swap, recover_interrupted_swap


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    delete_condition: Column | None = None,
) -> dict:
    """Merge source into the parquet store at target_path. Returns
    {'inserted': n, 'updated': n, 'deleted': n, 'unchanged': n}.

    delete_condition is evaluated on the MATCHED join row, where target
    columns appear as `t_<name>` and source columns as `s_<name>`
    (e.g. `F.col("s_status") == "tombstone"`)."""
    recover_interrupted_swap(spark, target_path)
    target = spark.read.parquet(target_path)
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs source {sorted(source.columns)}"
        )
    data_cols = [c for c in target.columns if c not in keys]
    t = target.select(
        *[F.col(c).alias(f"t_{c}") for c in target.columns],
        F.lit(1).alias("in_t"),
    )
    s = source.select(
        *[F.col(c).alias(f"s_{c}") for c in source.columns],
        F.lit(1).alias("in_s"),
    )
    cond = [t[f"t_{k}"].eqNullSafe(s[f"s_{k}"]) for k in keys]
    joined = t.join(s, cond, "full_outer")
    matched = F.col("in_t").isNotNull() & F.col("in_s").isNotNull()
    deleted = (
        matched & delete_condition if delete_condition is not None else F.lit(False)
    )
    action = (
        F.when(deleted, "delete")
        .when(matched, "update")
        .when(F.col("in_s").isNotNull(), "insert")
        .otherwise("keep")
    )
    out_cols = [
        F.coalesce(F.col(f"s_{k}"), F.col(f"t_{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col("_action").isin("update", "insert"), F.col(f"s_{c}"))
        .otherwise(F.col(f"t_{c}"))
        .alias(c)
        for c in data_cols
    ]
    # keep deletes in the resolved frame: the ONE checkpoint feeds both
    # the four-way stats and the write (deletes dropped there) — the
    # full-outer join, the dominant cost, executes exactly once
    result = joined.withColumn("_action", action).select(
        *out_cols, "_action"
    ).localCheckpoint(eager=True)
    counts = {
        r["_action"]: r["n"]
        for r in result.groupBy("_action").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    staged = target_path.rstrip("/") + ".merging"
    backup = target_path.rstrip("/") + ".premerge"
    result.filter(F.col("_action") != "delete").drop("_action").write.mode(
        "overwrite"
    ).parquet(staged)
    atomic_swap(spark, target_path, staged, backup)
    return {
        "inserted": counts.get("insert", 0),
        "updated": counts.get("update", 0),
        "deleted": counts.get("delete", 0),
        "unchanged": counts.get("keep", 0),
    }
