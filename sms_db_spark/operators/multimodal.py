"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The decode step is STUBBED (image/audio libraries are not in this
container): `decode_image` raises NotImplementedError unless a decoder is
injected, and tests inject `fake_decode_image` — a deterministic fake that
parses our synthetic 8-byte header. The Spark-side plumbing — schema,
Arrow batch shape, mapInPandas signature, partition behavior — is real.

The queries() entry computes features that are ALSO SQL-expressible
(byte length, sha256, first-byte fields), so even the Python-UDF path is
oracle-checked end-to-end against DuckDB.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of corpus size; binary payloads never pass through the
driver; `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch RAM
for large blobs. Partitioning of binary corpora should be by file/row
group, never by blob content.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans import QuerySpec
from ..tables import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> dict:
    """Real image decode — STUB: no imaging library in this container.

    Inject a decoder via `extract_features(..., decoder=...)`; production
    would pass a Pillow/libvips-backed callable here.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; inject a decoder (tests use fake_decode_image)"
    )


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic fake decoder: 'width'/'height' from the first bytes."""
    return {
        "width": int(payload[0]) if len(payload) > 0 else 0,
        "height": int(payload[1]) if len(payload) > 1 else 0,
    }


def to_media_frame(docs: DataFrame) -> DataFrame:
    """Fabricate a binary media column from document text (the container
    has no real image fixtures; payload bytes are the UTF-8 text)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_features(media: DataFrame, decoder=fake_decode_image) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decoder(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_sha256": payloads.map(lambda p: hashlib.sha256(p).hexdigest()),
                    "width": pd.Series([d["width"] for d in dims], dtype="int32"),
                    "height": pd.Series([d["height"] for d in dims], dtype="int32"),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def q55_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(to_media_frame(docs))


# oracle twin: the fake features are pure byte functions, SQL-expressible.
# width/height = first/second byte of the UTF-8 payload = ascii codes for
# the (all-ASCII) synthetic corpus.
Q55_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha256,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS width,
       CAST(ascii(substr(text, 2, 1)) AS INTEGER) AS height
FROM documents
"""


QUERIES = {
    "q55_multimodal_features": QuerySpec(
        q55_multimodal_features, Q55_SQL, "binary-column mapInPandas plumbing"
    ),
}
