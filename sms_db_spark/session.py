"""SparkSession factory tuned for both local testing and cluster scale.

The reference (sms-db.pl:47) is a single-threaded Perl process with one
SQLite connection; our execution substrate is Spark, so the knobs that
matter are AQE, shuffle sizing, Arrow transfer, and a pinned timezone
(epoch-millis semantics per README.md:117 must not drift with local tz).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def env_flag(name: str) -> bool:
    """Boolean env switch: unset, empty, '0', 'false', 'no', and
    'off' (any case) are OFF; anything else is ON. A wrapper exporting
    FLAG=0 (or FLAG=off) must not silently ENABLE the flag (review
    r13 — the raw-truthiness check read '0' as on; ADVICE r13 added
    the no/off spellings)."""
    return os.environ.get(name, "").strip().lower() not in (
        "", "0", "false", "no", "off",
    )


def get_spark(
    app_name: str = "sms-db-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    Defaults favor correctness + 100TB-readiness:
      - AQE on: runtime partition coalescing, skew-join splitting, and
        dynamic broadcast conversion replace hand-tuned plans.
      - UTC session tz: timestamps are stored/compared as epoch instants.
      - Arrow on: pandas UDF / toPandas paths are vectorized.
      - shuffle partitions: small fixed count locally (local[32]); on a
        real cluster leave unset and let AQE coalesce from a high initial.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # driver testdata stores TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long and convert in tables.load_table (lossless:
        # the generator's values are micro-precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # inferred size(e)>0 pre-explode filters duplicate expensive
        # generator expressions below the parallelizing exchange (see
        # plans._tuned for the measurement); skip-empty-rows only, no
        # correctness content.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
