"""Incremental HLL maintenance: registers merged across streamed shard
drops must equal the one-shot registers over the full corpus (the q106
merge-equals-whole property, now across microbatches), and re-delivering
a batch must not change the state (idempotent merge ⇒ exactly-once
register state under at-least-once foreachBatch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.streaming.sketches import (
    batch_registers,
    merge_registers,
    stream_hll,
)
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _regs_dict(df):
    return {r.bucket: r.max_rho for r in df.collect()}


def test_streamed_registers_equal_one_shot(spark, tmp_path):
    drop = tmp_path / "drop"
    regs_dir = tmp_path / "regs"
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    # two shard drops, processed by two separate availableNow runs
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(str(drop))
    q = stream_hll(spark, str(drop), str(regs_dir), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(str(drop))
    q = stream_hll(spark, str(drop), str(regs_dir), str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    streamed = _regs_dict(spark.read.parquet(str(regs_dir / "current")))
    one_shot = _regs_dict(batch_registers(docs))
    assert streamed == one_shot


def test_merge_is_idempotent(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    regs = batch_registers(docs)
    remerged = merge_registers(regs, regs)
    assert _regs_dict(remerged) == _regs_dict(regs)
