"""Streaming corpus curation: the batch curation operators' expressions
(quality gate, deterministic hash split, repetition stats) applied to a
document STREAM — the shape of a continuously-ingesting training-data
pipeline (new crawl drops land, get gated, and fall into their final
train/valid/test shard with no reprocessing of history).

Everything here is stateless per-row expression work, which is exactly
why the batch operators were built as pure projections/filters: the SAME
column expressions bind to a readStream source unchanged, and
batch-vs-stream results are identical row-for-row (pinned by
tests/test_streaming_curation.py). No watermark needed — no state, no
aggregation; at scale this runs as a map-only continuous job partitioned
by the source's file/partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.curation import TRAIN_UPTO, VALID_UPTO, _hash_bucket

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# q41's gate thresholds (textstats) — shared contract
MIN_LEN_CHARS = 20
MIN_TOKENS = 5
MAX_STOP_RATIO = 0.5
_TOKEN_RE = "[A-Za-z]+|[0-9]+"
_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is")


def curate_columns(df: DataFrame) -> DataFrame:
    """Attach gate + split columns; works identically on batch and
    streaming frames (pure projections)."""
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0))
    stop_pattern = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    stop_cnt = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(stop_pattern), 0)
    )
    bucket = _hash_bucket(F.col("doc_id"))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn(
            "stop_ratio",
            stop_cnt.cast("double")
            / F.greatest(n_tokens, F.lit(1)).cast("double"),
        )
        .withColumn(
            "passes_quality",
            (F.length("text") >= MIN_LEN_CHARS)
            & (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("stop_ratio") < MAX_STOP_RATIO),
        )
        .withColumn("bucket", bucket)
        .withColumn(
            "split",
            F.when(bucket < TRAIN_UPTO, "train")
            .when(bucket < VALID_UPTO, "valid")
            .otherwise("test"),
        )
    )


def stream_curate(spark: SparkSession, drop_dir: str) -> DataFrame:
    """readStream over a document drop directory → curated stream of
    gate-passing docs with their split assignment. Pair with a
    partitionBy('split') parquet sink so each doc lands directly in its
    final shard."""
    raw = spark.readStream.schema(DOCS_SCHEMA).parquet(drop_dir)
    return curate_columns(raw).filter(F.col("passes_quality")).drop("passes_quality")
