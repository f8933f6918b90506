"""Streaming curation: the batch curation expressions bound to a
document stream produce IDENTICAL rows (the batch/stream parity that
makes continuous ingest safe), docs land partitioned by their final
split, and a second drop never reshuffles history.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sms_db_spark.streaming.curation import curate_columns, stream_curate
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _run(spark, drop, out, ckpt):
    q = (
        stream_curate(spark, str(drop))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .partitionBy("split")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_matches_batch_and_partitions_by_split(spark, tmp_path):
    drop, out, ckpt = tmp_path / "drop", tmp_path / "out", tmp_path / "ckpt"
    docs = load_table(spark, SF_DIR, "documents")
    first = docs.filter(F.col("doc_id") < 30)
    first.write.mode("append").parquet(str(drop))
    _run(spark, drop, out, ckpt)

    batch = {
        r.doc_id: r
        for r in curate_columns(first).filter("passes_quality").collect()
    }
    streamed = {r.doc_id: r for r in spark.read.parquet(str(out)).collect()}
    assert set(streamed) == set(batch)  # same gate decisions
    for doc_id, r in streamed.items():
        b = batch[doc_id]
        assert (r.split, r.bucket, r.n_tokens) == (b.split, b.bucket, b.n_tokens)
    # physical layout: one directory per split actually present
    split_dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert split_dirs == {f"split={r.split}" for r in streamed.values()}

    # a second drop appends only the new docs; earlier rows are untouched
    docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 60)).write.mode(
        "append"
    ).parquet(str(drop))
    _run(spark, drop, out, ckpt)
    after = spark.read.parquet(str(out))
    assert after.filter(F.col("doc_id") < 30).count() == len(streamed)
    assert after.count() > len(streamed)
