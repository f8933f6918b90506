"""Named query surface: every SURVEY.md §2 operator as a (spark_fn, oracle_sql) pair."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One named query: a Spark callable plus (optionally) a DuckDB oracle.

    fn takes (spark, sf_dir) and returns a DataFrame. oracle is ANSI SQL over
    the pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings), or None for non-SQL-expressible
    operators (driver then records a weaker rows-only check).
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def registry() -> dict[str, QuerySpec]:
    from . import compat_queries, importer_queries
    from ..operators import dedup, similarity, textstats, multimodal, pipeline

    specs: dict[str, QuerySpec] = {}
    for mod in (
        compat_queries,
        importer_queries,
        dedup,
        similarity,
        textstats,
        multimodal,
        pipeline,
    ):
        overlap = specs.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        specs.update(mod.QUERIES)
    return specs
