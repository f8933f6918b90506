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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resizer: truncate/zero-pad to width*height bytes
    (stands in for a real resample; preserves the bytes-in/bytes-out
    contract and output-size invariant a real kernel has)."""
    n = width * height
    return payload[:n] + b"\x00" * max(0, n - len(payload))


def resize_images(
    media: DataFrame, width: int, height: int, resizer=fake_resize
) -> DataFrame:
    """Arrow-batched image resize over binary payloads (1:1 rows).

    Production injects a Pillow/libvips-backed `resizer`; the stub keeps
    the Spark plumbing (schema, batch shape, constant task memory) real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(lambda p: resizer(p, width, height)),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SIZE = 16  # bytes per fake "frame"
FRAME_STRIDE = 4  # sample every 4th frame

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_text", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE) -> DataFrame:
    """Video frame sampling: payload treated as a sequence of fixed-size
    frames; every `stride`-th frame is emitted as its own row (1:N output
    — the mapInPandas batch shape real frame extraction needs; a real
    decoder swaps the byte-slice for an ffmpeg/pyav keyframe read).

    Frame content is surfaced as text (the synthetic corpus is ASCII) so
    the oracle can compare values across engines.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(
                        payload[i * frame_size : (i + 1) * frame_size].decode("utf-8")
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_text": pd.Series(frames, dtype="object"),
                }
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def q55_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(to_media_frame(docs))


def q56_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the fabricated media column (1:N mapInPandas)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(to_media_frame(docs))


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


Q56_SQL = f"""
SELECT doc_id, i AS frame_idx, substr(text, CAST(i * {FRAME_SIZE} + 1 AS INTEGER), {FRAME_SIZE}) AS frame_text
FROM (
  SELECT doc_id, text,
         unnest(range(0, (octet_length(encode(text)) + {FRAME_SIZE - 1}) // {FRAME_SIZE}, {FRAME_STRIDE})) AS i
  FROM documents
)
"""


QUERIES = {
    "q55_multimodal_features": QuerySpec(
        q55_multimodal_features, Q55_SQL, "binary-column mapInPandas plumbing"
    ),
    "q56_multimodal_frames": QuerySpec(
        q56_multimodal_frames, Q56_SQL, "frame sampling (1:N mapInPandas)"
    ),
}
