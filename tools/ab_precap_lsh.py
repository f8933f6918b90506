"""One-shot A/B: dedup.lsh_candidate_pairs pre-cap (r14) vs the old
post-cap-only shape — outputs must be bit-identical; only the memory
profile moves. Mirrors r13's hamming_banded_pairs A/B
(EVIDENCE_r13.md): a planted degenerate attractor bucket (~30% of the
corpus in ONE (band_id, band_hash)) plus a spread of bucket sizes
straddling the cap boundary (1..2*cap), so the 2..cap law is exercised
on both edges.

Run: python tools/ab_precap_lsh.py [n_docs] [both|new|old] [heap]
(mode new/old runs one shape only — with a small heap this
demonstrates the memory law: the old shape OOMs on the attractor
bucket, the new shape completes.)
"""

import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from sms_db_spark.operators.dedup import (  # noqa: E402
    LSH_MAX_BUCKET,
    bucket_cap_filter,
    bucket_pair_expr,
    lsh_candidate_pairs,
)


def old_post_cap_pairs(bands: DataFrame, max_bucket: int) -> DataFrame:
    """The pre-r14 shape, verbatim: collect_set BEFORE the cap filter."""
    buckets = bands.groupBy("band_id", "band_hash").agg(
        F.array_sort(F.collect_set("doc_id")).alias("docs")
    )
    return (
        bucket_cap_filter(buckets, max_bucket)
        .select(F.explode(bucket_pair_expr()).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def checksum(pairs: DataFrame):
    row = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_a", "doc_b").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    heap = sys.argv[3] if len(sys.argv) > 3 else "8g"
    cap = LSH_MAX_BUCKET
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", heap)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # 4 bands per doc. Band 0: 30% of docs share ONE hash (the planted
    # attractor; dropped by the cap on both shapes), the rest unique.
    # Band 1: buckets of size doc_id % (2*cap) + 1 — straddles the cap.
    # Band 2: pair buckets (size 2, all pairable). Band 3: unique.
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    bands = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("bigint").alias("band_id"),
                    F.when(F.col("doc_id") % 10 < 3, F.lit("ATTRACTOR"))
                    .otherwise(F.concat(F.lit("u0-"), F.col("doc_id")))
                    .alias("band_hash"),
                ),
                F.struct(
                    F.lit(1).cast("bigint").alias("band_id"),
                    F.concat(
                        F.lit("s-"),
                        (F.col("doc_id") % (2 * cap)).cast("string"),
                        F.lit("-"),
                        F.floor(
                            F.col("doc_id") / ((F.col("doc_id") % (2 * cap)) + 1)
                        ).cast("string"),
                    ).alias("band_hash"),
                ),
                F.struct(
                    F.lit(2).cast("bigint").alias("band_id"),
                    F.concat(F.lit("p-"), F.floor(F.col("doc_id") / 2)).alias(
                        "band_hash"
                    ),
                ),
                F.struct(
                    F.lit(3).cast("bigint").alias("band_id"),
                    F.concat(F.lit("u3-"), F.col("doc_id")).alias("band_hash"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.band_id", "b.band_hash")
    bands = bands.localCheckpoint(eager=True)  # same input frame, timed fairly

    results = {}
    for shape, fn in (
        ("new", lsh_candidate_pairs),
        ("old", old_post_cap_pairs),
    ):
        if mode not in ("both", shape):
            continue
        t0 = time.time()
        n, h = checksum(fn(bands, cap))
        results[shape] = (n, h, time.time() - t0)
        print(f"{shape}: n={n} h={h} {results[shape][2]:.1f}s heap={heap}")
    if mode == "both":
        same = results["new"][:2] == results["old"][:2]
        print(f"n_docs={n_docs} cap={cap} identical={same}")
        assert same, "pre-cap changed the output!"


if __name__ == "__main__":
    main()
