"""Bucketed co-located join: both sides bucketed by the join key ->
the join plans with ZERO shuffle exchanges (the write paid the shuffle
once; every subsequent join is free). Proves README scale rule 2's
storage-side claim mechanically."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from sms_db_spark.sinks.bucketed import write_bucketed
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 4, path=str(tmp_path / "o"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 4, path=str(tmp_path / "l"),
    )
    try:
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = ob.hint("merge").join(lb, "o_orderkey").select(
            "o_orderkey", "o_orderdate", "l_linenumber", "l_quantity"
        )
        p = _plan(joined)
        assert "Exchange hashpartitioning" not in p, p
        assert "SortMergeJoin" in p, p

        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == plain

        # bucket-key aggregation is exchange-free too
        agg = lb.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
        assert "Exchange hashpartitioning" not in _plan(agg), _plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
