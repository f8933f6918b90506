"""Streaming near-dup (watermarked band-bucket self-join) emits the SAME
candidate pair set as the batch q45 path over the same corpus delivered
as micro-batched drops — the batch/stream parity that makes in-stream
dedup trustworthy (q115's parity discipline applied to the LSH family).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.operators.dedup import (
    LSH_MAX_BUCKET,
    minhash_bands,
    q45_minhash_lsh_pairs,
)
from sms_db_spark.streaming.neardup import stream_neardup_pairs
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stream_neardup_matches_q45_on_microbatched_corpus(spark, tmp_path):
    drop, out, ckpt = tmp_path / "drop", tmp_path / "out", tmp_path / "ckpt"
    docs = load_table(spark, SF_DIR, "documents")

    # parity precondition: no bucket over the cap, so q45's hot-bucket
    # guard is a no-op on this corpus and exact parity is well-defined
    max_bucket = (
        minhash_bands(spark, SF_DIR)
        .groupBy("band_id", "band_hash")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_bucket <= LSH_MAX_BUCKET, max_bucket

    # three drops: history must pair with later arrivals across drops
    for lo, hi in ((0, 150), (150, 350), (350, 100_000)):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).write.mode(
            "append"
        ).parquet(str(drop))

    q = (
        stream_neardup_pairs(spark, str(drop))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {
        (r.doc_a, r.doc_b) for r in spark.read.parquet(str(out)).collect()
    }
    batch = {(r.doc_a, r.doc_b) for r in q45_minhash_lsh_pairs(spark, SF_DIR).collect()}
    # all test doc_ids sit within PAIR_HORIZON of each other (500 ids ≈
    # 500 s < 1 h), so the horizon bound excludes nothing here
    assert streamed == batch
    assert streamed, "corpus has no near-dup candidates — parity is vacuous"
