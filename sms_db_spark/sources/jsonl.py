"""JSONL corpus source/sink — the de-facto interchange format for LLM
training corpora (one JSON document per line, gzip-shardable).

Spark's native json reader/writer is already distributed and splittable
(one task per shard; .gz shards are one split each, so shard size is the
parallelism knob at write time). What this module adds is the CONTRACT:
an explicit schema (never inference — a 100 TB inference pass reads the
corpus twice and infers unstable unions), deterministic column order,
and a lossless round-trip that q108 proves against the oracle.

Behavioral parity: the reference's interchange surface is the Synctech
XML backup (sms-db.pl:237-311, one document per <sms> element); JSONL is
that same one-record-per-element discipline in the format the training
stack actually consumes.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans import QuerySpec
from ..tables import load_table

# explicit on-the-wire schema for the documents corpus — field order is
# the column contract, types never inferred
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(df: DataFrame, path: str, shards: int | None = None) -> None:
    """Write a corpus frame as JSONL shards (part-*.json). `shards`
    controls write parallelism AND downstream read parallelism: at scale
    pick corpus_bytes / ~256 MB; None keeps the input partitioning."""
    out = df.select([f.name for f in DOCUMENTS_JSONL_SCHEMA.fields])
    if shards is not None:
        out = out.repartition(shards)
    out.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-first JSONL read: corrupt lines land in no column and fail
    loudly via the default PERMISSIVE->FAILFAST choice here (a training
    corpus with silently-nulled rows is worse than a failed job)."""
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "FAILFAST")
        .json(path)
    )


def q108_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless JSONL round-trip: documents → JSONL shards → read back.

    The output IS the re-read corpus, so the oracle (plain SELECT over
    the original parquet) hash-matching proves byte-level value fidelity
    through the serialize/deserialize cycle — including unicode text and
    null handling. Distributed both ways: the write is one map-side pass
    per shard, the read is one task per shard; nothing ever collects.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Unique per-run directory: a fixed shared path races when two runs
    # (bench + gate, or two drivers on one host) overlap — one's write
    # clobbers the other's read. mkdtemp gives an unshared dir; the eager
    # localCheckpoint below materializes the read-back BEFORE we delete
    # it, so the returned frame is self-contained and nothing leaks.
    path = tempfile.mkdtemp(prefix="sms_db_spark_jsonl_")
    try:
        write_jsonl(docs, path, shards=8)
        back = read_jsonl(spark, path).orderBy("doc_id").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return back


Q108_SQL = """
SELECT doc_id, text, lang, source, n_chars
FROM documents
ORDER BY doc_id
"""

QUERIES = {
    "q108_jsonl_roundtrip": QuerySpec(
        q108_jsonl_roundtrip,
        Q108_SQL,
        "JSONL corpus sink+source, oracle-proved lossless round-trip",
    ),
}
