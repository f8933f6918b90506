"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (Q7/J11, querying.md:39) at sf0.001.
queries()      — every implemented SURVEY.md §2 operator + extensions.
oracle_sql()   — DuckDB twins for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sms_db_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sms_db_spark.plans.compat_queries import q07_flagship_join_like

    return q07_flagship_join_like(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle is not None
    }
