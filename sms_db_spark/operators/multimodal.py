"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The decode step is REAL for header-level decoding: `decode_image` is a
pure-python BMP/PNG/GIF/JPEG dimension parser and `decode_audio` a WAV
fmt-chunk parser (no external libraries needed), exercised end-to-end
and oracle-checked by q75 over genuine container bytes. PIXEL decoding
(resampling, color conversion) genuinely needs an imaging library not in
this container — production injects a Pillow/libvips-backed callable via
`extract_features(..., decoder=...)` / `resize_images(..., resizer=...)`;
`fake_decode_image`/`fake_resize` stand in for those in q55's fixtures.
The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partition behavior — is identical either way.

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
    """Real image header decode — pure python, no external libraries.

    Parses the four container formats whose dimensions live in a fixed
    or scannable header: BMP (BITMAPINFOHEADER, little-endian at offset
    18/22), PNG (IHDR, big-endian at offset 16/20), GIF (logical screen
    descriptor, little-endian u16 at 6/8), and JPEG (scan markers for the
    first SOFn segment). This is the honest subset of what Pillow's
    `Image.open(...).size` does; pixel decoding (which genuinely needs an
    imaging library) is what a production `decoder=` injection replaces.
    """
    if payload[:2] == b"BM" and len(payload) >= 26:
        return {
            "width": int.from_bytes(payload[18:22], "little", signed=True),
            "height": int.from_bytes(payload[22:26], "little", signed=True),
        }
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        return {
            "width": int.from_bytes(payload[16:20], "big"),
            "height": int.from_bytes(payload[20:24], "big"),
        }
    if payload[:4] in (b"GIF8",) and len(payload) >= 10:
        return {
            "width": int.from_bytes(payload[6:8], "little"),
            "height": int.from_bytes(payload[8:10], "little"),
        }
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to SOFn
        i = 2
        while i + 1 < len(payload):
            if payload[i] != 0xFF:
                break
            # repeated 0xFF bytes before a marker are legal fill/padding
            while i + 1 < len(payload) and payload[i + 1] == 0xFF:
                i += 1
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI with no SOF seen
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # TEM / RST0-7 / SOI: standalone, no length field
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(payload):
                    return {
                        "width": int.from_bytes(payload[i + 7 : i + 9], "big"),
                        "height": int.from_bytes(payload[i + 5 : i + 7], "big"),
                    }
                break
            if i + 4 > len(payload):
                break
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        raise ValueError("truncated JPEG: no SOF segment found")
    raise ValueError("unrecognized image container (BMP/PNG/GIF/JPEG supported)")


def decode_audio(payload: bytes) -> dict:
    """WAV (RIFF) header decode — pure python: channels/sample-rate/bit
    depth from the canonical fmt chunk (little-endian, offsets 22/24/34)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE" or len(payload) < 36:
        raise ValueError("unrecognized audio container (canonical WAV supported)")
    return {
        "channels": int.from_bytes(payload[22:24], "little"),
        "sample_rate": int.from_bytes(payload[24:28], "little"),
        "bits_per_sample": int.from_bytes(payload[34:36], "little"),
    }


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic fake decoder: 'width'/'height' from the first bytes."""
    return {
        "width": int(payload[0]) if len(payload) > 0 else 0,
        "height": int(payload[1]) if len(payload) > 1 else 0,
    }


def to_media_frame(docs: DataFrame, media_type: str = "image/fake") -> DataFrame:
    """Fabricate a binary media column from document text (the container
    has no real image fixtures; payload bytes are the UTF-8 text). One
    payload-fabrication convention for every modality — the video lane
    reuses this with its own media_type rather than re-stating it."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
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


REAL_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def q75_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: distributed construction of genuine
    BMP/PNG header bytes (hex-built from doc_id, even→BMP little-endian,
    odd→PNG big-endian), then `decode_image` — the actual pure-python
    header parser, no fake, no injection — recovers the dimensions inside
    an Arrow-batched mapInPandas. The oracle derives the same dimensions
    arithmetically, so a parser that mis-reads endianness, offset, or
    container dispatch hash-mismatches immediately.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    w = F.pmod(F.col("doc_id"), F.lit(200)) + 1
    h = F.pmod(F.col("doc_id") * 7, F.lit(150)) + 1
    bmp_hex = F.format_string("424D%s%02X000000%02X000000", F.lit("00" * 16), w, h)
    png_hex = F.format_string(
        "89504E470D0A1A0A0000000D49484452000000%02X000000%02X", w, h
    )
    media = docs.select(
        "doc_id",
        F.unhex(F.when(F.col("doc_id") % 2 == 0, bmp_hex).otherwise(png_hex)).alias(
            "payload"
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image(p) for p in pdf["payload"]]
            fmts = ["bmp" if p[:2] == b"BM" else "png" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": pd.Series(fmts, dtype="object"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([d["width"] for d in dims], dtype="int32"),
                    "height": pd.Series([d["height"] for d in dims], dtype="int32"),
                }
            )

    return media.mapInPandas(run, schema=REAL_DECODE_SCHEMA)


Q75_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 26 ELSE 24 END AS BIGINT) AS n_bytes,
       CAST(doc_id % 200 + 1 AS INTEGER) AS width,
       CAST((doc_id * 7) % 150 + 1 AS INTEGER) AS height
FROM documents
"""


# ---- image perceptual-hash near-dup (VERDICT r12 item 6) ------------
#
# The one training-data dedup lane the registry covered only for text:
# near-duplicate IMAGES. dHash — the standard difference hash: resample
# to a (W+1)xH grayscale grid, emit one bit per horizontal gradient
# (right pixel brighter than left), Hamming distance on the resulting
# W*H bits. Production swaps `resizer=` for a Pillow/libvips resample
# exactly like resize_images; the stub keeps every Spark-side shape —
# one Arrow pass for decode→resize→hash, JVM-side banded pair
# generation — real and oracle-checked (the fake resample is
# byte-truncation arithmetic DuckDB can mirror).
#
# Pair generation rides q45's band-bucket discipline WHOLESALE
# (dedup.bucket_cap_filter / bucket_pair_expr — the cap law and slice
# arithmetic live only there): the 64 bits split into 4 bands of 16;
# by pigeonhole, any pair within Hamming distance PHASH_BANDS - 1 = 3
# agrees EXACTLY on at least one band (3 flipped bits can touch at
# most 3 of the 4 bands), so banding loses nothing below the bucket
# cap — unlike MinHash LSH this isn't probabilistic recall, it's
# exact. Hamming verification runs map-side inside the bucket
# expansion (bit_count over band XORs), so no candidate ever reaches
# a second shuffle.

DHASH_W, DHASH_H = 9, 8  # 9x8 grid -> 8 gradient bits x 8 rows = 64
DHASH_BANDS = 4  # 16 bits per band
# exact-recall bound: <= 3 flipped bits cannot touch all 4 bands
PHASH_HAMMING_MAX = 3
# q45's hot-bucket cap rationale verbatim: a degenerate band value
# (flat/boilerplate images) pairs quadratically; such buckets are
# dropped. A genuinely-near pair usually still meets in another band,
# but a pair whose ONLY agreeing band is the dropped hot one is lost
# entirely (ADVICE r13 #3) — Spark and the oracle apply the identical
# cap law, so parity holds; the sacrifice is the cap's price, same as
# q45's MinHash path.
PHASH_MAX_BUCKET = 64

PHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType(), False)]
    + [T.StructField(f"b{i}", T.IntegerType(), False) for i in range(DHASH_BANDS)]
)


def _pack_bands(bits: list[bool]) -> tuple[int, ...]:
    """64 bits → DHASH_BANDS 16-bit band values, big-endian within a
    band (bit k of band b is global bit t = 16b + k at weight
    2^(15-k)). THE one packing law both fingerprint kernels and both
    DuckDB oracles implement — shared so the image/audio lanes can
    never drift on bit order (review r13)."""
    bands = []
    for b in range(DHASH_BANDS):
        v = 0
        for k in range(16):
            if bits[16 * b + k]:
                v |= 1 << (15 - k)
        bands.append(v)
    return tuple(bands)


def dhash_bands_bytes(px: bytes) -> tuple[int, ...]:
    """dHash over a (DHASH_W x DHASH_H)-byte grayscale grid: global bit
    t = row*8 + col fires when the right pixel is brighter than the
    left; packed by _pack_bands. Pure function of the pixel bytes —
    unit-testable without Spark, and the DuckDB oracle recomputes the
    identical arithmetic from the text bytes."""
    return _pack_bands(
        [
            px[(t // 8) * DHASH_W + (t % 8) + 1] > px[(t // 8) * DHASH_W + (t % 8)]
            for t in range(DHASH_BANDS * 16)
        ]
    )


def _fingerprint_frame(media: DataFrame, kernel, batch_kernel=None) -> DataFrame:
    """ONE Arrow-batched pass turning payload bytes into banded
    fingerprints (doc_id, b0..b3) via a payload→bands callable — the
    shared mapInPandas body of the image and audio lanes (a second
    Arrow stage per lane would pay a round trip for nothing; the
    production Pillow/PCM pipelines are likewise one Python pass per
    blob). Constant task memory; payloads never leave the executors.

    batch_kernel (r17, guide §4.2): an optional whole-batch vectorized
    twin — payload list → (n, DHASH_BANDS) int ndarray — used when the
    lane's per-payload math vectorizes (the default dHash/energy
    kernels do: byte compares and big-endian packing over a fixed-size
    grid are three numpy expressions). The per-row `kernel` remains
    the semantic reference and the injection point for production
    decoders; tests pin batch == per-row on the same payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_kernel is not None:
                m = batch_kernel(list(pdf["payload"]))
                # positional assembly (ADVICE r17): doc_id as a bare
                # ndarray, so a non-default-indexed batch can never
                # misalign against the fresh default-indexed band
                # columns via pandas index alignment
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].to_numpy(),
                        **{
                            f"b{i}": pd.Series(m[:, i], dtype="int32")
                            for i in range(DHASH_BANDS)
                        },
                    }
                )
                continue
            bands = [kernel(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{
                        f"b{i}": pd.Series(
                            [bs[i] for bs in bands], dtype="int32"
                        )
                        for i in range(DHASH_BANDS)
                    },
                }
            )

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def _pack_bands_matrix(cmp):
    """Vectorized _pack_bands: (n, 64) boolean bit matrix (bit t in
    column t) → (n, DHASH_BANDS) int32 band values — the identical
    big-endian-within-band packing law (bit k of band b is global bit
    16b + k at weight 2^(15-k))."""
    import numpy as np

    weights = (1 << (15 - np.arange(16))).astype(np.int32)
    return np.stack(
        [
            (cmp[:, 16 * b : 16 * (b + 1)].astype(np.int32) * weights).sum(axis=1)
            for b in range(DHASH_BANDS)
        ],
        axis=1,
    )


def _dhash_bands_batch(payloads: list) -> "object":
    """Whole-batch dHash over fake_resize'd payloads: truncate/zero-pad
    every payload to the DHASH_W x DHASH_H grid (one bytes-join +
    frombuffer — no per-byte Python), then bit t = 16b + k fires when
    the right pixel beats the left within the t//8-th row (the same
    (t//8)*DHASH_W + t%8 indexing as dhash_bands_bytes, expressed as
    one shifted comparison over the (n, H, W) grid). Bit-identical to
    [dhash_bands_bytes(fake_resize(p, DHASH_W, DHASH_H)) for p in
    payloads] — pinned by tests/test_multimodal.py."""
    import numpy as np

    n_px = DHASH_W * DHASH_H
    buf = b"".join(
        p[:n_px] + b"\x00" * (n_px - len(p)) if len(p) < n_px else p[:n_px]
        for p in payloads
    )
    a = np.frombuffer(buf, dtype=np.uint8).reshape(len(payloads), DHASH_H, DHASH_W)
    cmp = (a[:, :, 1 : DHASH_W] > a[:, :, 0 : DHASH_W - 1]).reshape(
        len(payloads), DHASH_BANDS * 16
    )
    return _pack_bands_matrix(cmp)


def image_phash(media: DataFrame, resizer=fake_resize) -> DataFrame:
    """decode→resize→dHash in one Arrow pass (see _fingerprint_frame).
    Under the default resizer the whole batch runs vectorized
    (_dhash_bands_batch); an injected production resizer keeps the
    per-payload path, whose row loop is then dominated by the real
    resample anyway."""
    return _fingerprint_frame(
        media,
        lambda p: dhash_bands_bytes(resizer(p, DHASH_W, DHASH_H)),
        batch_kernel=_dhash_bands_batch if resizer is fake_resize else None,
    )


def hamming_banded_pairs(
    hashed: DataFrame,
    hamming_max: int = PHASH_HAMMING_MAX,
    max_bucket: int = PHASH_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, Hamming <= hamming_max) from any
    banded 64-bit fingerprint (doc_id, b0..b3) — shared by the image
    dHash (q161) and audio energy-fingerprint (q162) lanes: explode
    the 4 bands, group into (band_id, band_val) buckets, pair
    expansion + Hamming verification map-side over the sorted
    in-bucket array (bounded by max_bucket^2). distinct() collapses
    pairs that met in several bands.

    PRE-capped, not just post-capped (r13 scale hardening): these
    fingerprint spaces have NATURAL degenerate attractors — the
    all-zero dHash of blank images, the silence fingerprint of short
    audio (measured: ~30% of the sf0.01 corpus in ONE silence bucket)
    — and a collect_set that materializes such a bucket BEFORE the
    cap filter would hold the whole bucket's structs in one reducer
    task (at 10^11 docs, terabytes in one task). So bucket membership
    is counted FIRST (map-side partial counts — tiny whatever the
    skew), only 2..max_bucket buckets keep their rows, and collect_set
    never sees an over-cap bucket. Both aggregations and the join
    shuffle on the same (band_id, band_val) keys, so AQE/exchange
    reuse keeps the extra pass cheap; the dedup.bucket_cap_filter
    post-filter stays as the belt-and-braces assertion of the same
    law. Output is IDENTICAL to the post-cap-only shape (the oracle's
    bucket-count law is unchanged); only the memory profile moves.
    q45's MinHash path adopted this exact shape in r14
    (dedup.lsh_candidate_pairs) — the whole dedup family now pre-caps.

    The fingerprint frame is PINNED (eager localCheckpoint) before the
    two consumers: the counts pass and the bucket pass would otherwise
    each re-execute the lineage — DOUBLING the Arrow fingerprint pass,
    the lane's dominant cost (observed in the plan: two MapInPandas
    branches). The pinned frame is tiny per row (doc_id + 4 ints ≈
    40 B — ~4 TB at 10^11 docs, spread across executor storage with
    disk spill), while the pass it saves decodes every payload."""
    from .dedup import bucket_cap_filter, bucket_pair_expr

    hashed = hashed.localCheckpoint(eager=True)
    band_cols = [f"b{i}" for i in range(DHASH_BANDS)]
    bands = hashed.select(
        "doc_id",
        *band_cols,
        F.posexplode(F.array(*band_cols)).alias("band_id", "band_val"),
    )
    eligible = (
        bands.groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter((F.col("_bn") >= 2) & (F.col("_bn") <= max_bucket))
        .select("band_id", "band_val")
    )
    buckets = (
        bands.join(eligible, ["band_id", "band_val"])
        .groupBy("band_id", "band_val")
        .agg(
            F.array_sort(F.collect_set(F.struct("doc_id", *band_cols))).alias(
                "docs"
            )
        )
    )
    keep = (
        " + ".join(f"bit_count(x.{b} ^ y.{b})" for b in band_cols)
        + f" <= {hamming_max}"
    )
    return (
        bucket_cap_filter(buckets, max_bucket)
        .select(F.explode(bucket_pair_expr(".doc_id", keep_expr=keep)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def q161_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup end-to-end: fabricated binary media column →
    one Arrow pass (resize stub + dHash) → banded Hamming pairs."""
    from ..tables import load_table_parallel

    docs = load_table_parallel(spark, sf_dir, "documents")
    pairs = hamming_banded_pairs(image_phash(to_media_frame(docs)))
    return pairs.orderBy("doc_a", "doc_b")


def _q161_band_exprs() -> str:
    """The oracle's band columns: identical arithmetic to
    dhash_bands_bytes over the same 72 resized bytes (fake_resize =
    truncate/zero-pad; the corpus is all-ASCII so UTF-8 byte i ==
    ascii(char i), the q55 oracle's standing assumption)."""
    cols = []
    for b in range(DHASH_BANDS):
        cols.append(
            f"CAST(list_sum(list_transform(range({16 * b}, {16 * b + 16}), t -> "
            f"CASE WHEN p[((t//8)*{DHASH_W} + (t%8)) + 2] > "
            f"p[((t//8)*{DHASH_W} + (t%8)) + 1] "
            f"THEN (1 << (15 - (t % 16))) ELSE 0 END)) AS BIGINT) AS b{b}"
        )
    return ", ".join(cols)


_PAIRS_TAIL_DEFAULT = "SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b"


def _banded_pairs_sql(h_ctes: str, tail: str = _PAIRS_TAIL_DEFAULT) -> str:
    """Shared oracle tail for the banded-Hamming lanes (q161/q162/q164):
    the 4-way band explode, the bucket-cap join, and the map-side
    Hamming filter as ONE SQL block, parameterized only by the CTEs
    that produce `h (doc_id, b0..b3)` and an optional final SELECT over
    `pairs` (q164's doc-level frame vote) — so the oracles can never
    drift on the cap law or the Hamming threshold, mirroring how all
    three Spark lanes share hamming_banded_pairs (review r13)."""
    return f"""{h_ctes},
bands AS (
  SELECT doc_id, 0 AS band_id, b0 AS band_val, b0, b1, b2, b3 FROM h
  UNION ALL SELECT doc_id, 1, b1, b0, b1, b2, b3 FROM h
  UNION ALL SELECT doc_id, 2, b2, b0, b1, b2, b3 FROM h
  UNION ALL SELECT doc_id, 3, b3, b0, b1, b2, b3 FROM h
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
  JOIN (SELECT band_id, band_val, count(*) AS n
        FROM bands GROUP BY band_id, band_val) k
    ON k.band_id = a.band_id AND k.band_val = a.band_val
   AND k.n <= {PHASH_MAX_BUCKET}
  WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
      <= {PHASH_HAMMING_MAX}
)
{tail}
"""


Q161_SQL = _banded_pairs_sql(
    f"""WITH px AS (
  SELECT doc_id,
         list_transform(range(1, {DHASH_W * DHASH_H + 1}), i ->
           CASE WHEN i <= length(text)
                THEN ascii(substr(text, CAST(i AS INTEGER), 1)) ELSE 0 END) AS p
  FROM documents
),
h AS (SELECT doc_id, {_q161_band_exprs()} FROM px)"""
)


# ---- audio fingerprint near-dup (r13, sibling of q161) --------------
#
# The audio arm of multimodal dedup: a simplified
# acoustic-fingerprint (the chromaprint/landmark family reduced to its
# core move — frame the signal, one bit per consecutive-frame energy
# gradient, Hamming distance on the bit string). The WAV containers
# are REAL and built DISTRIBUTED (constant canonical header — fixing
# the data size makes every RIFF length field a literal — plus text
# bytes as 8-bit PCM samples), and decode_audio — the actual RIFF
# parser, no fake — gates every payload inside the Arrow pass: a
# malformed container raises, it cannot silently fingerprint garbage.
# Pair generation reuses hamming_banded_pairs verbatim; the oracle
# recomputes frame energies and band packing from the same text-byte
# arithmetic. Production swaps the byte-sum "energy" for a real
# spectral frame over decoded PCM — the batch shape, the banding, and
# the pair kernel are unchanged by that substitution.

AUDIO_FRAME_SIZE = 4
AUDIO_FRAMES = 65  # 64 energy-gradient bits
AUDIO_DATA_BYTES = AUDIO_FRAME_SIZE * AUDIO_FRAMES  # 260
AUDIO_SAMPLE_RATE = 8000


def _wav_header(data_len: int) -> bytes:
    """Canonical 44-byte PCM WAV header (mono, 8-bit, 8 kHz) — the
    exact layout decode_audio parses (RIFF/WAVE magic, fmt chunk at
    the fixed offsets, data chunk header)."""
    return (
        b"RIFF" + (36 + data_len).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + AUDIO_SAMPLE_RATE.to_bytes(4, "little")
        + AUDIO_SAMPLE_RATE.to_bytes(4, "little")  # byte rate (mono, 8-bit)
        + (1).to_bytes(2, "little")  # block align
        + (8).to_bytes(2, "little")  # bits per sample
        + b"data" + data_len.to_bytes(4, "little")
    )


def to_audio_frame(docs: DataFrame) -> DataFrame:
    """REAL WAV containers built distributed, JVM-side: constant header
    (all length fields are literals because the data size is fixed)
    concatenated with the first AUDIO_DATA_BYTES text bytes as 8-bit
    PCM samples, zero-padded — "silence" past the end of short
    documents."""
    header = F.unhex(F.lit(_wav_header(AUDIO_DATA_BYTES).hex().upper()))
    samples = F.expr(f"rpad(encode(text, 'UTF-8'), {AUDIO_DATA_BYTES}, x'00')")
    return docs.select(
        "doc_id",
        F.concat(header, samples).alias("payload"),
        F.lit("audio/wav").alias("media_type"),
    )


def energy_bands_bytes(samples: bytes) -> tuple[int, ...]:
    """Energy-gradient fingerprint over AUDIO_FRAMES frames of
    AUDIO_FRAME_SIZE 8-bit samples: frame energy = byte sum, global
    bit t fires when energy[t+1] > energy[t]; packed by _pack_bands
    (the same law as dHash). Pure function; the DuckDB oracle
    recomputes it from the text bytes."""
    e = [
        sum(samples[f * AUDIO_FRAME_SIZE : (f + 1) * AUDIO_FRAME_SIZE])
        for f in range(AUDIO_FRAMES)
    ]
    return _pack_bands([e[t + 1] > e[t] for t in range(DHASH_BANDS * 16)])


_WAV_EXPECT = {
    "channels": 1,
    "sample_rate": AUDIO_SAMPLE_RATE,
    "bits_per_sample": 8,
}


def _audio_kernel(p: bytes) -> tuple[int, ...]:
    """Payload→bands kernel for the audio lane: decode_audio — the real
    RIFF header parser — gates every payload, and the data chunk is
    length-validated before fingerprinting: a TRUNCATED container
    (intact header, missing samples) would otherwise fingerprint as
    silence and emit false near-dup pairs with genuinely short
    documents (review r13 — the header checks alone did not honor the
    'raises instead of fingerprinting garbage' contract)."""
    meta = decode_audio(p)
    if meta != _WAV_EXPECT:
        raise ValueError(f"unexpected WAV layout: {meta}")
    data_len = int.from_bytes(p[40:44], "little")
    if (
        p[36:40] != b"data"
        or data_len != AUDIO_DATA_BYTES
        or len(p) < 44 + data_len
    ):
        raise ValueError(
            f"truncated or non-canonical WAV data chunk: "
            f"declared {data_len} bytes, payload carries {len(p) - 44}"
        )
    return energy_bands_bytes(p[44 : 44 + AUDIO_DATA_BYTES])


def _audio_bands_batch(payloads: list) -> "object":
    """Whole-batch energy fingerprint with the SAME fail-loud gate as
    _audio_kernel: the canonical WAV layout makes every valid payload
    byte-identical in its first 44 bytes and exactly 44 +
    AUDIO_DATA_BYTES long, so validation is one all-equal check — any
    deviation re-runs the per-row kernel, which raises the identical
    diagnostic on the first bad payload (vectorization never trades
    away the 'raises instead of fingerprinting garbage' contract).
    Frame energies and gradient bits are the same integer arithmetic
    as energy_bands_bytes, batched."""
    import numpy as np

    header = _wav_header(AUDIO_DATA_BYTES)
    total = 44 + AUDIO_DATA_BYTES
    if any(len(p) != total or p[:44] != header for p in payloads):
        # identical error surface to the row path — and if every
        # payload is row-valid anyway (e.g. trailing bytes after the
        # declared data chunk, which the row kernel tolerates), its
        # results are the answer
        return np.asarray([_audio_kernel(p) for p in payloads], dtype=np.int32)
    buf = b"".join(p[44:total] for p in payloads)
    a = np.frombuffer(buf, dtype=np.uint8).reshape(
        len(payloads), AUDIO_FRAMES, AUDIO_FRAME_SIZE
    )
    e = a.astype(np.int32).sum(axis=2)
    cmp = e[:, 1:AUDIO_FRAMES] > e[:, 0 : AUDIO_FRAMES - 1]
    return _pack_bands_matrix(cmp[:, : DHASH_BANDS * 16])


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """decode→fingerprint in one Arrow pass (see _fingerprint_frame);
    the batch kernel validates the canonical layout wholesale and
    fails loud through the per-row kernel on any malformed payload."""
    return _fingerprint_frame(media, _audio_kernel, batch_kernel=_audio_bands_batch)


def q162_audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup end-to-end: distributed real-WAV construction →
    one Arrow pass (real header parse + energy fingerprint) → the
    shared Hamming-banded pair kernel. At sf0.01 the hot-bucket cap
    genuinely engages (a ~150-doc "silence" band bucket from short
    documents is dropped — the degenerate-bucket case the cap law
    exists for, mirrored by the oracle's bucket-count filter)."""
    from ..tables import load_table_parallel

    docs = load_table_parallel(spark, sf_dir, "documents")
    pairs = hamming_banded_pairs(audio_fingerprint(to_audio_frame(docs)))
    return pairs.orderBy("doc_a", "doc_b")


def _q162_band_exprs() -> str:
    """Oracle band columns over the frame-energy list `e` (1-based):
    identical arithmetic to energy_bands_bytes."""
    cols = []
    for b in range(DHASH_BANDS):
        cols.append(
            f"CAST(list_sum(list_transform(range({16 * b}, {16 * b + 16}), t -> "
            f"CASE WHEN e[t + 2] > e[t + 1] "
            f"THEN (1 << (15 - (t % 16))) ELSE 0 END)) AS BIGINT) AS b{b}"
        )
    return ", ".join(cols)


Q162_SQL = _banded_pairs_sql(
    f"""WITH px AS (
  SELECT doc_id,
         list_transform(range(1, {AUDIO_DATA_BYTES + 1}), i ->
           CASE WHEN i <= length(text)
                THEN ascii(substr(text, CAST(i AS INTEGER), 1)) ELSE 0 END) AS p
  FROM documents
),
en AS (
  SELECT doc_id,
         list_transform(range(0, {AUDIO_FRAMES}), f ->
           p[{AUDIO_FRAME_SIZE}*f+1] + p[{AUDIO_FRAME_SIZE}*f+2]
           + p[{AUDIO_FRAME_SIZE}*f+3] + p[{AUDIO_FRAME_SIZE}*f+4]) AS e
  FROM px
),
h AS (SELECT doc_id, {_q162_band_exprs()} FROM en)"""
)


# ---- video frame-sequence near-dup (r14, closes the modality) ------
#
# The video arm of multimodal dedup, built ENTIRELY from existing
# kernels (VERDICT r13 item 7): sample_frames (q56's 1:N Arrow pass)
# slices the fabricated video payload into frames; each frame gets the
# q161 dHash via the SAME image_phash kernel (fake_resize
# truncate/zero-pads a frame to the 9x8 grid — production swaps in a
# real keyframe decode + resample, nothing downstream changes); frame
# ids pack doc_id and frame_idx into one bigint so
# hamming_banded_pairs runs VERBATIM (pre-cap discipline for free);
# and a doc-level vote keeps pairs with >= VIDEO_MATCH_MIN_FRAMES
# near-dup frame pairs — the standard sampled-frame voting shape for
# video near-dup at corpus scale (per-frame fingerprints, bucketed
# frame join, bounded vote aggregation; never a per-video all-frames
# comparison).

# fid = doc_id << 22 | frame_idx: shift-packing stays exact bigint
# arithmetic at any scale (10^11 docs -> 37 bits + 22 < 63; a
# float-division decode would lose precision past 2^53). 2^22 frames
# bounds payloads at ~302 MB given VIDEO_FRAME_SIZE=72 at stride 1 —
# beyond that a real pipeline samples keyframes, not every slice; the
# bound is ENFORCED in the fid expression (assert_true), never
# silently exceeded.
VIDEO_FID_SHIFT = 22
VIDEO_MATCH_MIN_FRAMES = 2
# Video frames are sampled at the FULL dHash grid size (9x8 = 72
# bytes), not q56's 16-byte demo frames: a 16-byte frame zero-pads
# pixel indices 18..71, making bands 1-3 identically zero for EVERY
# frame — three universal attractor buckets (cap-dropped at any real
# scale) and a band 0 that only pairs on EXACT equality, so the
# advertised Hamming<=3 tolerance never engages (review r14). At 72
# bytes every band is informative and the q161 pigeonhole guarantee
# (any Hamming<=3 pair agrees exactly on >=1 of 4 bands) actually
# holds. Stride 1: a video's frames are its content — sampling every
# frame of the fabricated payload keeps sub-200-char docs above the
# >=2-frame vote floor.
VIDEO_FRAME_SIZE = DHASH_W * DHASH_H
VIDEO_FRAME_STRIDE = 1


def to_video_frame(docs: DataFrame) -> DataFrame:
    """Fabricate a binary video column from document text — the shared
    to_media_frame convention with the video media_type."""
    return to_media_frame(docs, media_type="video/fake")


def video_frame_neardup(
    frames: DataFrame, min_frames: int = VIDEO_MATCH_MIN_FRAMES
) -> DataFrame:
    """Doc-level near-dup pairs from sampled frames: per-frame dHash →
    banded Hamming frame pairs (the shared pre-capped kernel) →
    same-doc pairs dropped → vote. Input is FRAMES_SCHEMA (doc_id,
    frame_idx, frame_text)."""
    # The documented packing bound, ENFORCED: a frame_idx at or past
    # 2^22 would bleed into the next doc's fid space and silently
    # attribute frame pairs to the wrong document — fail the job
    # loudly instead (a production keyframe decoder that emits more
    # frames must re-shift, not corrupt). assert_true is embedded in
    # the fid expression (coalesce of its NULL result) so column
    # pruning cannot drop the check, and it is the LEFT-most operand:
    # interpreted Add.eval short-circuits to NULL without evaluating
    # the right child when the left is NULL (review r14, the cell
    # writer's identical guard), so a right-appended guard can be
    # skipped for NULL inputs. Costs one fused comparison per row.
    fid_guard = F.assert_true(
        F.col("frame_idx") < F.lit(1 << VIDEO_FID_SHIFT),
        F.concat(
            F.lit(f"frame_idx overflows the {VIDEO_FID_SHIFT}-bit fid packing: "),
            F.col("frame_idx").cast("string"),
        ),
    )
    fid = (
        F.coalesce(fid_guard.cast("long"), F.lit(0))
        + F.shiftleft(F.col("doc_id"), VIDEO_FID_SHIFT)
        + F.col("frame_idx")
    )
    fid_media = frames.select(
        fid.alias("doc_id"),
        F.encode(F.col("frame_text"), "UTF-8").alias("payload"),
    )
    frame_pairs = hamming_banded_pairs(image_phash(fid_media))
    va = F.expr(f"doc_a DIV {1 << VIDEO_FID_SHIFT}")
    vb = F.expr(f"doc_b DIV {1 << VIDEO_FID_SHIFT}")
    return (
        frame_pairs.select(va.alias("va"), vb.alias("vb"))
        # frame-pair order (doc_a < doc_b on fids) implies va <= vb,
        # so dropping the same-doc diagonal leaves va < vb: already
        # the canonical pair orientation, no least/greatest needed
        .filter(F.col("va") != F.col("vb"))
        .groupBy("va", "vb")
        .agg(F.count(F.lit(1)).alias("n_frame_matches"))
        .filter(F.col("n_frame_matches") >= min_frames)
        .select(
            F.col("va").alias("doc_a"),
            F.col("vb").alias("doc_b"),
            "n_frame_matches",
        )
    )


def q164_video_frame_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup end-to-end: fabricated video payload → frame
    sampling at the full dHash grid size (VIDEO_FRAME_SIZE — see that
    constant for why q56's demo frame size cannot carry this lane) →
    per-frame dHash → banded-Hamming frame pairs →
    >= VIDEO_MATCH_MIN_FRAMES doc vote."""
    from ..tables import load_table_parallel

    docs = load_table_parallel(spark, sf_dir, "documents")
    frames = sample_frames(
        to_video_frame(docs), VIDEO_FRAME_SIZE, VIDEO_FRAME_STRIDE
    )
    return video_frame_neardup(frames).orderBy("doc_a", "doc_b")


def _q164_sql() -> str:
    """DuckDB recompute: the frame slicing (frame i covers text bytes
    [72i+1, 72i+72], i stepping by VIDEO_FRAME_STRIDE), the q161 band
    arithmetic over the zero-padded frame (beyond-length chars read 0,
    exactly fake_resize's pad — only a doc's LAST frame pads now),
    the shared banded-pairs tail with the fid packing, then the vote."""
    fid = f"(doc_id * {1 << VIDEO_FID_SHIFT} + i)"
    vote_tail = f"""
SELECT CAST(doc_a // {1 << VIDEO_FID_SHIFT} AS BIGINT) AS va,
       CAST(doc_b // {1 << VIDEO_FID_SHIFT} AS BIGINT) AS vb,
       COUNT(*) AS n_frame_matches
FROM pairs
WHERE doc_a // {1 << VIDEO_FID_SHIFT} <> doc_b // {1 << VIDEO_FID_SHIFT}
GROUP BY va, vb
HAVING COUNT(*) >= {VIDEO_MATCH_MIN_FRAMES}
"""
    # outer aliasing: the driver compares by column NAME
    vote_tail = (
        "SELECT va AS doc_a, vb AS doc_b, n_frame_matches FROM ("
        + vote_tail
        + ") ORDER BY doc_a, doc_b"
    )
    h_ctes = f"""WITH fr AS (
  SELECT {fid} AS fid,
         substr(text, CAST(i*{VIDEO_FRAME_SIZE}+1 AS INTEGER), {VIDEO_FRAME_SIZE}) AS ft
  FROM (SELECT doc_id, text,
               unnest(range(0,
                 CAST((length(text)+{VIDEO_FRAME_SIZE - 1})//{VIDEO_FRAME_SIZE} AS BIGINT),
                 {VIDEO_FRAME_STRIDE})) AS i
        FROM documents)
),
px AS (
  SELECT fid AS doc_id,
         list_transform(range(1, {DHASH_W * DHASH_H + 1}), j ->
           CASE WHEN j <= length(ft)
                THEN ascii(substr(ft, CAST(j AS INTEGER), 1)) ELSE 0 END) AS p
  FROM fr
),
h AS (SELECT doc_id, {_q161_band_exprs()} FROM px)"""
    return _banded_pairs_sql(h_ctes, vote_tail)


Q164_SQL = _q164_sql()


QUERIES = {
    "q55_multimodal_features": QuerySpec(
        q55_multimodal_features, Q55_SQL, "binary-column mapInPandas plumbing"
    ),
    "q56_multimodal_frames": QuerySpec(
        q56_multimodal_frames, Q56_SQL, "frame sampling (1:N mapInPandas)"
    ),
    "q75_multimodal_real_decode": QuerySpec(
        q75_multimodal_real_decode, Q75_SQL, "real BMP/PNG header decode via mapInPandas"
    ),
    "q161_image_phash_neardup": QuerySpec(
        q161_image_phash_neardup,
        Q161_SQL,
        "image perceptual-hash near-dup (dHash + Hamming-banded pairs)",
    ),
    "q162_audio_fingerprint_neardup": QuerySpec(
        q162_audio_fingerprint_neardup,
        Q162_SQL,
        "audio energy-fingerprint near-dup (real WAV parse + banded Hamming)",
    ),
    "q164_video_frame_neardup": QuerySpec(
        q164_video_frame_neardup,
        Q164_SQL,
        "video frame-sequence near-dup (frame dHash + banded Hamming + vote)",
    ),
}
