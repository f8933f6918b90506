"""Streaming near-duplicate detection: the batch candidate→verify
family's missing streaming twin. New documents land continuously; each
drop's docs must pair against BOTH the docs in the same drop and the
already-ingested history — without reprocessing that history.

Shape (streaming/curation.py's stateless-expression discipline + q45's
band machinery, operators/dedup.py band_rows):

  readStream → banded MinHash (stateless map, the IDENTICAL expression
  the batch path binds) → watermarked stream-stream SELF-join on the
  band bucket (band_id, band_hash) → candidate pairs, append-mode.

The self-join is where streaming semantics earn their keep: Spark keeps
each side's band rows in join state only until the watermark passes the
pairing horizon, so state is bounded by (ingest rate × horizon), not by
corpus size. The horizon is the declared contract — two docs ingested
further apart than PAIR_HORIZON never pair (at 100 TB/day you dedup new
data against a trailing window in-stream, and against deep history with
the batch join over the band store). Within the horizon the emitted
pair set equals q45's batch output below the hot-bucket cap, pinned by
tests/test_streaming_neardup.py on a micro-batched corpus.

Hot buckets: a stream-stream join cannot see final bucket sizes, so the
cap that q45 applies at plan time becomes a STATE-size concern here —
the watermark bounds how long a degenerate bucket can accumulate, and
the downstream verify stage (exact Jaccard, q73's shape) is what keeps
a hot bucket from amplifying into wrong merges.

Event time: documents carry no timestamp in the test tables, so ingest
time is modeled deterministically as BASE_EPOCH + doc_id seconds (the
generator's ids are ingestion-ordered); a real deployment uses the
drop's event time column directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import band_rows
from .curation import DOCS_SCHEMA

BASE_EPOCH = 1_600_000_000  # deterministic synthetic ingest clock
# max ingest-time distance at which two docs pair; the SECONDS form is
# the source of truth so the gate oracle (q152) can interpolate the
# identical bound as integer doc_id arithmetic
PAIR_HORIZON_SECONDS = 3600
PAIR_HORIZON = f"{PAIR_HORIZON_SECONDS} seconds"
WATERMARK_DELAY = "10 minutes"  # allowed out-of-order slack per side


def _banded_stream(spark: SparkSession, drop_dir: str, side: str) -> DataFrame:
    raw = spark.readStream.schema(DOCS_SCHEMA).parquet(drop_dir)
    bands = band_rows(raw).select(
        F.col("doc_id").alias(f"doc_{side}"),
        "band_id",
        "band_hash",
        # event time is a pure function of doc_id, so recomputing it after
        # the band explode keeps band_rows stateless and shared with batch
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("doc_id")).alias(f"t_{side}"),
    )
    return bands.withWatermark(f"t_{side}", WATERMARK_DELAY)


def stream_neardup_pairs(spark: SparkSession, drop_dir: str) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) over a document drop
    stream: watermarked band-bucket self-join, append-mode. Pairs can
    surface once per shared band; global distinct-ness is the reader's
    one-line dedup (exactly as q45 applies .distinct() in batch) — in
    append streaming the dedup belongs to the consumer or a downstream
    dropDuplicates with its own retention horizon."""
    a = _banded_stream(spark, drop_dir, "a")
    b = _banded_stream(spark, drop_dir, "b")
    # StreamingJoinHelper logs a WARN per batch ("Error trying to
    # extract state constraint") because the doc_a < doc_b conjunct is
    # not a time predicate — benign: the extraction is per-conjunct,
    # the two time-range conjuncts still yield the state watermark,
    # and eviction is REAL (verified under q152's protocol at sf0.1:
    # state 80000 rows peak, 12784 removed the batch after the
    # watermark first passed the horizon). Moving the ordering to a
    # post-join filter does not silence it either — Catalyst pushes
    # the filter straight back into the join condition.
    return (
        a.join(
            b,
            [
                a.band_id == b.band_id,
                a.band_hash == b.band_hash,
                F.col("doc_a") < F.col("doc_b"),
                F.col("t_b").between(
                    F.col("t_a") - F.expr(f"INTERVAL {PAIR_HORIZON}"),
                    F.col("t_a") + F.expr(f"INTERVAL {PAIR_HORIZON}"),
                ),
            ],
        )
        .select("doc_a", "doc_b")
    )
