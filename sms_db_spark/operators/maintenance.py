"""Table-maintenance / pipeline-operations operators: incremental delta
dedup, CDC changelog merge (SCD upsert), data-quality constraint audit,
and join-key skew profiling.

These are the day-2 operations of a 100 TB corpus store. The reference's
model is re-runnable idempotent imports into one growing store
(README.md:39-43, sms-db.pl:49,325-331 — the UNIQUE-hash "already seen"
probe); at scale that becomes (a) delta-vs-store dedup where the store
is too big to rescan per batch (q125), (b) changelog-to-snapshot merge
where updates/deletes arrive as events rather than full rewrites (q126),
(c) constraint audits that gate a batch before it is merged (q127), and
(d) key-distribution profiling that decides the join strategy — salt
(q35), broadcast, or plain shuffle — BEFORE the expensive join runs
(q131).

Scale notes (the 100 TB story, per operator):
  - q125: the batch (small: today's arrivals) builds the Bloom filter;
    only those k·|batch| distinct bit positions are broadcast. The huge
    store side is pruned to bloom-hit keys with broadcast semi-joins —
    it never shuffles — and the exact-verify equi-join then runs on
    ~|batch|·(1+FP) keys per side. No false negatives (a true duplicate
    hits all k positions by construction), so the output is provably
    the exact anti-join's.
  - q126: one shuffle on the merge key; last-write-wins rank and the
    change count share the same window partitioning, so Spark reuses a
    single exchange. This is the merge-on-read compaction kernel of a
    lakehouse upsert (Delta/Iceberg MERGE INTO): at 100 TB it runs
    per storage partition, and the changelog side is usually small
    enough to broadcast per partition.
  - q127: all row-level constraints fold into ONE aggregate scan with
    map-side combine (constant state per partition); the referential
    check broadcasts only the dimension's key column. Output is one row
    per constraint — the shape of a Deequ/Great-Expectations report.
  - q131: groupBy(key) with map-side combine reduces the corpus to the
    key-distribution table (|keys| rows); the summary and top-key rank
    then run over that aggregated state, not the corpus. The single
    global window is over ≤|keys| post-aggregate rows by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import QuerySpec
from ..tables import load_table, load_table_parallel
from .curation import SPLIT_BUCKETS as SNAP_BUCKETS
from .curation import _hash_bucket as _snap_bucket
from .curation import _sql_bucket as _snap_bucket_sql
from .dedup import _NORM_TOKENS, _tokens_col
from .sketches import _h60, _h60_sql

# ------------------------------------------------------------------ q125

DELTA_BATCH_SOURCES = ("src0", "src1")  # "today's arrivals"
DELTA_BLOOM_M = 1 << 13  # bits
DELTA_BLOOM_K = 2  # hash functions
HEAD_K = 8  # head-fingerprint token count

# Content key: sha256 of the first HEAD_K normalized tokens. A full-text
# exact key (q20's sha2(text)) finds zero cross-batch duplicates on the
# synthetic corpus (every text differs in its tail); the head fingerprint
# is the standard prefix-dup signal and exercises the duplicate lane. The
# operator is key-agnostic — swap in sha2(text, 256) for byte-exact runs.


def _content_key():
    return F.sha2(F.concat_ws(" ", F.slice(_tokens_col(), 1, HEAD_K)), 256)


def q125_delta_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: is each NEW batch document already in
    the existing store? Bloom filter built FROM the small batch side,
    broadcast into the store scan to prune it to bloom-hit keys, then an
    exact equi-join verifies (no false negatives ⇒ output equals the
    plain exact anti-join, which the oracle computes directly).

    This inverts q105's direction to match the daily-delta shape: at
    100 TB the store is the huge side, so the filter must come from the
    batch — the store never shuffles, it only probes k broadcast bit
    sets and the surviving ~|batch| keys join. Combines q105's Bloom
    mechanics with q21's anti-join dedup semantics (sms-db.pl:325-331
    re-runnable import probe, lifted to store-scale).
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source", _content_key().alias("content_key"))
    batch = d.filter(F.col("source").isin(*DELTA_BATCH_SOURCES)).select(
        "doc_id", "content_key"
    )
    store_raw = d.filter(~F.col("source").isin(*DELTA_BATCH_SOURCES)).select(
        "content_key"
    )
    ks = F.sequence(F.lit(0), F.lit(DELTA_BLOOM_K - 1))
    pos = lambda kcol, keycol: (  # noqa: E731
        _h60(F.concat(kcol.cast("string"), F.lit("@"), keycol)) % DELTA_BLOOM_M
    )
    bits = (
        batch.select(F.explode(ks).alias("k"), "content_key")
        .select(pos(F.col("k"), F.col("content_key")).alias("bit"))
        .distinct()
    )
    # Probe all k bit positions map-side on the RAW store scan: one
    # projection + one BroadcastHashJoin per hash function, so no
    # shuffle (and no aggregate Catalyst can't reorder a join below)
    # sits upstream of the prune. Only the bloom-hit survivors —
    # ~|batch|·(1+FP) keys — reach the distinct() that follows.
    pruned = store_raw
    for k in range(DELTA_BLOOM_K):
        bits_k = bits.select(F.col("bit").alias(f"bit{k}"))
        pruned = pruned.withColumn(
            f"bit{k}", pos(F.lit(k), F.col("content_key"))
        ).join(F.broadcast(bits_k), f"bit{k}")
    pruned_store = (
        pruned.select("content_key")
        .distinct()
        .select("content_key", F.lit(1).alias("hit"))
    )
    return (
        batch.join(pruned_store, "content_key", "left")
        .select(
            "doc_id",
            "content_key",
            F.coalesce("hit", F.lit(0)).alias("is_dup"),
        )
        .orderBy("doc_id")
    )


_Q125_KEYED = f"""
  SELECT doc_id, source,
         sha256(array_to_string((tokens)[1:{HEAD_K}], ' ')) AS content_key
  FROM (SELECT doc_id, source, {_NORM_TOKENS} AS tokens FROM documents)
"""

Q125_SQL = f"""
WITH d AS ({_Q125_KEYED}),
b AS (SELECT doc_id, content_key FROM d
      WHERE source IN ('{DELTA_BATCH_SOURCES[0]}', '{DELTA_BATCH_SOURCES[1]}')),
s AS (SELECT DISTINCT content_key FROM d
      WHERE source NOT IN ('{DELTA_BATCH_SOURCES[0]}', '{DELTA_BATCH_SOURCES[1]}'))
SELECT b.doc_id AS doc_id, b.content_key AS content_key,
       CASE WHEN s.content_key IS NULL THEN 0 ELSE 1 END AS is_dup
FROM b LEFT JOIN s ON b.content_key = s.content_key
ORDER BY doc_id
"""

# ------------------------------------------------------------------ q126


def q126_scd_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog merge, last-write-wins: the events log is read as a
    per-user change stream ('error' ⇒ delete, anything else ⇒ upsert of
    `value`) and folded to the CURRENT snapshot — one row per live user
    with its latest value, update time, and total change count.

    The lakehouse MERGE INTO / merge-on-read compaction kernel: rank and
    change-count share one window partitioning, so the whole merge is a
    single shuffle on the key. Deterministic under ts ties via the
    event_id tie-break. The reference's idempotent re-import
    (README.md:39-43) is the degenerate insert-only case of this.
    """
    ev = load_table(spark, sf_dir, "events")
    ch = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    wall = Window.partitionBy("user_id")
    return (
        ch.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wall))
        .filter((F.col("rn") == 1) & (F.col("op") == "upsert"))
        .select(
            "user_id",
            F.col("value").alias("current_value"),
            F.col("ts").alias("updated_at"),
            "n_changes",
        )
        .orderBy("user_id")
    )


Q126_SQL = """
WITH ch AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
  FROM events
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM ch
)
SELECT user_id, value AS current_value, ts AS updated_at, n_changes
FROM ranked WHERE rn = 1 AND op = 'upsert'
ORDER BY user_id
"""

# ------------------------------------------------------------------ q127

PRICE_CAP = 450000.0  # deliberate: the data exceeds it, so one check FAILS


def q127_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-shaped data-quality constraint suite over a batch before it
    merges: completeness, key uniqueness, accepted values, numeric range
    — folded into ONE aggregate scan — plus referential integrity via a
    broadcast anti-join on the dimension's key column. One row per
    constraint: (check_name, violations, total, passed).

    PRICE_CAP is set below the data's max so the report contains a
    failing constraint — an audit whose fixtures can never fail tests
    nothing. The reference's import-stats report (sms-db.pl:333-339) is
    the ancestor: counts that tell the operator whether the batch looks
    right before trusting it.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = orders.agg(
        F.count(F.lit(1)).alias("total"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("v_completeness"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("v_unique"),
        F.sum(
            F.when(
                F.col("o_orderstatus").isNull()
                | ~F.col("o_orderstatus").isin("F", "O", "P"),
                1,
            ).otherwise(0)
        ).alias("v_accepted"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull()
                | (F.col("o_totalprice") <= 0)
                | (F.col("o_totalprice") > PRICE_CAP),
                1,
            ).otherwise(0)
        ).alias("v_range"),
    )
    ri = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v_ri"))
    )
    return (
        base.crossJoin(ri)
        .selectExpr(
            "stack(5,"
            " 'accepted_values_o_orderstatus', v_accepted,"
            " 'completeness_o_custkey', v_completeness,"
            " 'range_o_totalprice', v_range,"
            " 'referential_o_custkey', v_ri,"
            " 'unique_o_orderkey', v_unique"
            ") AS (check_name, violations)",
            "total",
        )
        .select(
            "check_name",
            "violations",
            "total",
            (F.col("violations") == 0).cast("int").alias("passed"),
        )
        .orderBy("check_name")
    )


Q127_SQL = f"""
WITH base AS (
  SELECT count(*) AS total,
         count(*) - count(o_custkey) AS v_completeness,
         count(*) - count(DISTINCT o_orderkey) AS v_unique,
         count(*) FILTER (WHERE o_orderstatus IS NULL
                             OR o_orderstatus NOT IN ('F', 'O', 'P')) AS v_accepted,
         count(*) FILTER (WHERE o_totalprice IS NULL
                             OR o_totalprice <= 0
                             OR o_totalprice > {PRICE_CAP}) AS v_range
  FROM orders
), ri AS (
  SELECT count(*) AS v_ri FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT check_name, violations, total,
       CASE WHEN violations = 0 THEN 1 ELSE 0 END AS passed
FROM (
  SELECT 'accepted_values_o_orderstatus' AS check_name, v_accepted AS violations, total FROM base, ri
  UNION ALL SELECT 'completeness_o_custkey', v_completeness, total FROM base, ri
  UNION ALL SELECT 'range_o_totalprice', v_range, total FROM base, ri
  UNION ALL SELECT 'referential_o_custkey', v_ri, total FROM base, ri
  UNION ALL SELECT 'unique_o_orderkey', v_unique, total FROM base, ri
)
ORDER BY check_name
"""

# ------------------------------------------------------------------ q131


def _profile(df: DataFrame, key_col: str, key) -> DataFrame:
    counts = df.groupBy(key.cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ranked = counts.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("key")))
    )
    return ranked.agg(
        F.lit(key_col).alias("key_col"),
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.min("cnt").alias("min_cnt"),
        F.max(F.when(F.col("rn") == 1, F.col("key"))).alias("top_key"),
    ).select(
        "key_col",
        "n_rows",
        "n_keys",
        "max_cnt",
        "min_cnt",
        "top_key",
        F.expr("max_cnt * n_keys * 1000 div n_rows").alias("skew_milli"),
    )


def q131_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit across three candidate keys (events.user_id,
    events.event_type, lineitem.l_orderkey): rows, distinct keys,
    max/min per-key counts, heaviest key, and skew ratio (max/avg,
    milli-scaled integer — exact cross-engine).

    The decision input for join strategy at 100 TB: skew_milli near
    1000 ⇒ plain shuffle join; large ⇒ salt the hot keys (q35) or
    let AQE split them; tiny n_keys ⇒ the key side is broadcastable.
    Each profile is a map-side-combined groupBy reducing the corpus to
    |keys| rows; ranking runs over that aggregated state only.
    """
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        _profile(ev, "events.user_id", F.col("user_id"))
        .unionByName(_profile(ev, "events.event_type", F.col("event_type")))
        .unionByName(_profile(li, "lineitem.l_orderkey", F.col("l_orderkey")))
        .orderBy("key_col")
    )


def _profile_sql(table: str, key_col: str, key_expr: str) -> str:
    return f"""
  SELECT '{table}.{key_col}' AS key_col, n_rows, n_keys, max_cnt, min_cnt, top_key,
         CAST(max_cnt * n_keys * 1000 // n_rows AS BIGINT) AS skew_milli
  FROM (
    SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys, MAX(cnt) AS max_cnt,
           MIN(cnt) AS min_cnt,
           MAX(CASE WHEN rn = 1 THEN key END) AS top_key
    FROM (
      SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key) AS rn
      FROM (SELECT CAST({key_expr} AS VARCHAR) AS key, COUNT(*) AS cnt
            FROM {table} GROUP BY 1)
    )
  )
"""


Q131_SQL = (
    _profile_sql("events", "user_id", "user_id")
    + " UNION ALL "
    + _profile_sql("events", "event_type", "event_type")
    + " UNION ALL "
    + _profile_sql("lineitem", "l_orderkey", "l_orderkey")
    + " ORDER BY key_col"
)


# ------------------------------------------------------------------ q136

DRIFT_LEN_BUCKET = 64  # n_chars bucket width
DRIFT_LEN_CAP = 8  # buckets above cap fold into the tail


def _drift_profile(docs: DataFrame, bucket, feature_name: str) -> DataFrame:
    """One feature's drift summary between window A (DELTA_BATCH_SOURCES,
    'today') and window B (the standing corpus): per-bucket counts fold
    map-side to |buckets| rows, milli-scaled proportions and the total
    variation distance are integer-exact (cross-engine stable), and the
    single window runs over the aggregated bucket table only."""
    in_a = F.col("source").isin(*DELTA_BATCH_SOURCES).cast("bigint")
    counts = (
        docs.select(bucket.cast("string").alias("bucket"), in_a.alias("in_a"))
        .groupBy("bucket")
        .agg(
            F.sum("in_a").alias("cnt_a"),
            F.sum(F.lit(1) - F.col("in_a")).alias("cnt_b"),
        )
    )
    return _drift_from_counts(counts, feature_name)


def _drift_from_counts(counts: DataFrame, feature_name: str) -> DataFrame:
    """The drift math over an already-aggregated (bucket, cnt_a, cnt_b)
    table — shared verbatim by q136 and the streaming drift monitor
    (streaming/drift.py), so batch and continuous reports are the SAME
    integer arithmetic by construction, not by parallel maintenance."""
    totals = counts.agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    d = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("p_a", F.expr("cnt_a * 1000 div tot_a"))
        .withColumn("p_b", F.expr("cnt_b * 1000 div tot_b"))
        .withColumn("diff", F.abs(F.col("p_a") - F.col("p_b")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("diff").desc(), F.col("bucket"))
            ),
        )
    )
    return d.agg(
        F.lit(feature_name).alias("feature"),
        F.max("tot_a").alias("n_a"),
        F.max("tot_b").alias("n_b"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.expr("sum(diff) div 2").alias("tvd_milli"),
        F.max(F.when(F.col("rn") == 1, F.col("bucket"))).alias("top_bucket"),
    )


def q136_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-window distribution drift report: for each monitored
    feature (document length buckets, language composition, source
    composition-within-window is the control), the total variation
    distance (milli-scaled integer) between today's arrivals
    (DELTA_BATCH_SOURCES — q125's batch) and the standing corpus, plus
    the most-drifted bucket. TVD ∈ [0, 1000]; a pipeline alerts above a
    threshold BEFORE the batch merges — the distribution-level sibling
    of q127's row-level constraint gate (both descend from the
    reference's trust-the-batch import stats, sms-db.pl:333-339).

    100 TB shape: each feature is one map-side-combined groupBy to a
    |buckets|-row table; proportions, TVD, and the top-bucket rank all
    run over that aggregated state. Integer milli-proportions make the
    report bit-identical across engines and run-to-run.
    """
    docs = load_table(spark, sf_dir, "documents")
    reports = None
    for name, bucket_fn in DRIFT_FEATURES:
        r = _drift_profile(docs, bucket_fn(), name)
        reports = r if reports is None else reports.unionByName(r)
    return reports.orderBy("feature")


def drift_len_bucket():
    """The monitored length-bucket expression (integer div, never
    float-then-truncate) — shared with the streaming monitor so both
    report over the same buckets."""
    return F.least(F.expr(f"n_chars div {DRIFT_LEN_BUCKET}"), F.lit(DRIFT_LEN_CAP))


# THE monitored-feature list: q136 and the streaming monitor
# (streaming/drift.py) both iterate this one tuple, so adding a feature
# extends batch and continuous reporting together — there is no second
# copy to forget. (Q136_SQL is the DuckDB oracle twin; the hash gate
# catches it drifting.)
DRIFT_FEATURES = (
    ("lang", lambda: F.col("lang")),
    ("len_bucket", drift_len_bucket),
)


def _drift_sql(bucket_expr: str, feature_name: str) -> str:
    return f"""
  SELECT '{feature_name}' AS feature,
         CAST(MAX(tot_a) AS BIGINT) AS n_a, CAST(MAX(tot_b) AS BIGINT) AS n_b,
         COUNT(*) AS n_buckets, CAST(SUM(diff) // 2 AS BIGINT) AS tvd_milli,
         MAX(CASE WHEN rn = 1 THEN bucket END) AS top_bucket
  FROM (
    SELECT bucket, tot_a, tot_b, ABS(p_a - p_b) AS diff,
           row_number() OVER (ORDER BY ABS(p_a - p_b) DESC, bucket) AS rn
    FROM (
      SELECT bucket, cnt_a * 1000 // SUM(cnt_a) OVER () AS p_a,
             cnt_b * 1000 // SUM(cnt_b) OVER () AS p_b,
             SUM(cnt_a) OVER () AS tot_a, SUM(cnt_b) OVER () AS tot_b
      FROM (
        SELECT CAST({bucket_expr} AS VARCHAR) AS bucket,
               COUNT(*) FILTER (WHERE source IN ('{DELTA_BATCH_SOURCES[0]}',
                                                 '{DELTA_BATCH_SOURCES[1]}')) AS cnt_a,
               COUNT(*) FILTER (WHERE source NOT IN ('{DELTA_BATCH_SOURCES[0]}',
                                                     '{DELTA_BATCH_SOURCES[1]}')) AS cnt_b
        FROM documents GROUP BY 1
      )
    )
  )
"""


Q136_SQL = (
    _drift_sql(f"LEAST(n_chars // {DRIFT_LEN_BUCKET}, {DRIFT_LEN_CAP})", "len_bucket")
    + " UNION ALL "
    + _drift_sql("lang", "lang")
    + " ORDER BY feature"
)


# ------------------------------------------------------------------ q137

EMB_DIM = 64
NORM_SCALE = 1000  # 1e-3 component resolution; norm2 stays well inside int64


def q137_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-store health audit, per label: vector count, missing
    arrays, wrong-dimension vectors, zero-norm vectors, and min/max/mean
    of the integer-floored squared norm. The q127-style gate for the
    EMBEDDING pipeline: a batch of zero vectors (a failed encoder), a
    dimension mismatch (a model swap), or a norm collapse all surface
    as one report row BEFORE the vectors reach the ANN/dedup operators
    that silently mis-rank on them.

    norm2 is sum of floor(x*1e3)^2 as int64 — exact under any
    aggregation/summation order, so the report is bit-identical
    cross-engine and run-to-run (q86's integer-floored discipline).
    Degenerate shapes are pinned, not engine-accidental: a NULL array
    has NULL norm2 (excluded from min/max/avg), an EMPTY array or one
    of only-NULL elements has norm2 = 0 (counted in n_zero — a vector
    with no usable components IS a zero vector for ranking purposes),
    and NULL elements are skipped in the sum on both engines.
    One map-side pass + one groupBy on the 10-ish label key.
    """
    emb = load_table_parallel(spark, sf_dir, "embeddings")
    sq = (
        f"CAST(floor(CAST(x AS DOUBLE) * {NORM_SCALE}.0D) AS BIGINT)"
        f" * CAST(floor(CAST(x AS DOUBLE) * {NORM_SCALE}.0D) AS BIGINT)"
    )
    d = emb.select(
        F.col("label").cast("int").alias("label"),
        F.col("embedding").isNull().cast("bigint").alias("is_null"),
        F.size("embedding").alias("dim"),
        F.expr(
            "CASE WHEN embedding IS NULL THEN NULL ELSE "
            "aggregate(filter(embedding, x -> x IS NOT NULL), "
            f"CAST(0 AS BIGINT), (a, x) -> a + {sq}) END"
        ).alias("norm2"),
    )
    return (
        d.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("is_null").alias("n_null"),
            F.sum(
                ((F.col("is_null") == 0) & (F.col("dim") != EMB_DIM)).cast("bigint")
            ).alias("n_dim_bad"),
            F.sum(
                ((F.col("is_null") == 0) & (F.col("norm2") == 0)).cast("bigint")
            ).alias("n_zero"),
            F.min("norm2").alias("min_norm2"),
            F.max("norm2").alias("max_norm2"),
            F.expr("sum(norm2) div count(1)").alias("avg_norm2"),
        )
        .orderBy("label")
    )


Q137_SQL = f"""
WITH d AS (
  SELECT CAST(label AS INT) AS label,
         CASE WHEN embedding IS NULL THEN 1 ELSE 0 END AS is_null,
         len(embedding) AS dim,
         CASE WHEN embedding IS NULL THEN NULL ELSE
           COALESCE(list_sum(list_transform(
             list_filter(embedding, x -> x IS NOT NULL),
             x -> CAST(FLOOR(CAST(x AS DOUBLE) * {NORM_SCALE}) AS BIGINT)
                * CAST(FLOOR(CAST(x AS DOUBLE) * {NORM_SCALE}) AS BIGINT))), 0)
         END AS norm2
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(is_null) AS BIGINT) AS n_null,
       CAST(SUM(CASE WHEN is_null = 0 AND dim != {EMB_DIM} THEN 1 ELSE 0 END) AS BIGINT) AS n_dim_bad,
       CAST(SUM(CASE WHEN is_null = 0 AND norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(MIN(norm2) AS BIGINT) AS min_norm2,
       CAST(MAX(norm2) AS BIGINT) AS max_norm2,
       CAST(SUM(norm2) // COUNT(*) AS BIGINT) AS avg_norm2
FROM d GROUP BY label ORDER BY label
"""


# ------------------------------------------------------------------ q140

# Bucket recipe is curation's md5-prefix convention (_snap_bucket /
# _snap_bucket_sql are imported aliases of curation's helpers at the top
# of this module): ONE copy of the cross-engine hash trick to keep in
# sync. The window edges are DERIVED from the bucket count so a change
# to SPLIT_BUCKETS rescales the snapshots instead of silently emptying
# one of them.
SNAP_OLD_UPTO = SNAP_BUCKETS * 9 // 10  # old snapshot: buckets [0, 90%)
SNAP_NEW_FROM = SNAP_BUCKETS // 10  # new snapshot: buckets [10%, 100%)
SNAP_CHANGE_LO = SNAP_BUCKETS * 45 // 100  # re-crawled in [45%, 50%)
SNAP_CHANGE_HI = SNAP_BUCKETS // 2
SNAP_RECRAWL_SUFFIX = " recrawl-v2"


def q140_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style corpus snapshot diff: two crawl snapshots compared by
    content digest, every doc classified added / removed / changed /
    unchanged, aggregated per status (doc count, old/new byte volume,
    id range). `added + changed` is exactly the incremental workload a
    downstream pipeline re-runs (re-embed, re-index, re-shard);
    `removed` drives index tombstones. This is the reference's
    "already seen" re-import probe (sms-db.pl:49,325-331) generalized
    to bidirectional set drift PLUS in-place content change — the diff
    an importer needs when a source can rewrite history, not just
    append to it.

    The snapshots are derived deterministically from the one corpus so
    the query is self-contained and oracle-checkable: old = id-buckets
    [0,900), new = [100,1000) with buckets [450,500) "re-crawled"
    (suffix appended ⇒ digest and length change). The OPERATOR ignores
    that provenance: it sees two opaque (doc_id, presence, digest,
    length) relations and diffs them — swap in any two real store
    versions. Presence is keyed on an explicit marker, never on digest
    nullability, and digests compare NULL-safe, so NULL-text docs diff
    correctly (both lengths recomputed from text, not trusted metadata).

    100 TB shape: digests fold map-side at each scan (a doc's text
    never crosses the wire — only its 32-byte digest); the diff is ONE
    full-outer shuffle on the uniform doc_id key (co-located for free
    when both versions live in a doc_id-bucketed store, q93's layout);
    output is 4 rows. Compare q126, which APPLIES a changelog it is
    given — q140 DERIVES the changelog when no one kept one.
    """
    docs = load_table(spark, sf_dir, "documents")
    return snapshot_diff(*_snapshot_inputs(docs))


def _snapshot_inputs(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The deterministic old/new snapshot derivation q140's docstring
    describes, as two raw (doc_id, text) relations: old = id-buckets
    [0,90%), new = [10%,100%) with buckets [45%,50%) 're-crawled'
    (suffix appended). Shared with q142, which commits these frames to
    a real versioned store and diffs the READ-BACKS — so both queries
    derive from the one recipe and the one oracle."""
    b = _snap_bucket(F.col("doc_id"))
    old = docs.filter(b < SNAP_OLD_UPTO).select("doc_id", "text")
    recrawled = F.when(
        (b >= SNAP_CHANGE_LO) & (b < SNAP_CHANGE_HI),
        F.concat(F.col("text"), F.lit(SNAP_RECRAWL_SUFFIX)),
    ).otherwise(F.col("text"))
    new = docs.filter(b >= SNAP_NEW_FROM).select("doc_id", recrawled.alias("text"))
    return old, new


def snapshot_diff(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """Diff two (doc_id, text) snapshot relations by content digest —
    the operator half of q140, reusable over ANY two store versions
    (q142 runs it over versioned-store read-backs). Presence is keyed
    on an explicit marker, never digest nullability, and digests
    compare NULL-safe, so NULL-text docs diff correctly."""
    old = old_docs.select(
        "doc_id",
        F.lit(1).alias("in_old"),  # presence marker: a NULL text must
        F.md5("text").alias("digest_old"),  # not read as "row absent"
        F.coalesce(F.length("text"), F.lit(0)).alias("co"),
    )
    new = new_docs.select(
        "doc_id",
        F.lit(1).alias("in_new"),
        F.md5("text").alias("digest_new"),
        F.coalesce(F.length("text"), F.lit(0)).alias("cn"),
    )
    status = (
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "removed")
        # NULL-safe: two NULL-text versions are the same (absent) content
        .when(F.col("digest_old").eqNullSafe(F.col("digest_new")), "unchanged")
        .otherwise("changed")
    )
    return (
        old.join(new, "doc_id", "full_outer")  # USING-join: doc_id coalesced
        .select(
            status.alias("status"),
            "doc_id",
            F.coalesce("co", F.lit(0)).alias("co"),
            F.coalesce("cn", F.lit(0)).alias("cn"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("co").alias("chars_old"),
            F.sum("cn").alias("chars_new"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("status")
    )


def _snapshot_diff_sql(extra: str = "") -> str:
    """q140's oracle; `extra` appends constant flag columns (q142's
    lineage_ok) without re-spelling the derivation."""
    return f"""
WITH base AS (
  SELECT doc_id, text, {_snap_bucket_sql('doc_id')} AS bkt FROM documents
),
old AS (
  SELECT doc_id, 1 AS in_old, md5(text) AS digest_old,
         COALESCE(LENGTH(text), 0) AS co
  FROM base WHERE bkt < {SNAP_OLD_UPTO}
),
new AS (
  SELECT doc_id, 1 AS in_new,
         md5(CASE WHEN bkt >= {SNAP_CHANGE_LO} AND bkt < {SNAP_CHANGE_HI}
                  THEN text || '{SNAP_RECRAWL_SUFFIX}' ELSE text END) AS digest_new,
         COALESCE(LENGTH(CASE WHEN bkt >= {SNAP_CHANGE_LO} AND bkt < {SNAP_CHANGE_HI}
                              THEN text || '{SNAP_RECRAWL_SUFFIX}' ELSE text END),
                  0) AS cn
  FROM base WHERE bkt >= {SNAP_NEW_FROM}
)
SELECT status, COUNT(*) AS n_docs,
       CAST(SUM(co) AS BIGINT) AS chars_old,
       CAST(SUM(cn) AS BIGINT) AS chars_new,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc{extra}
FROM (
  SELECT CASE WHEN o.in_old IS NULL THEN 'added'
              WHEN n.in_new IS NULL THEN 'removed'
              WHEN o.digest_old IS NOT DISTINCT FROM n.digest_new THEN 'unchanged'
              ELSE 'changed' END AS status,
         COALESCE(o.doc_id, n.doc_id) AS doc_id,
         COALESCE(o.co, 0) AS co, COALESCE(n.cn, 0) AS cn
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
GROUP BY status ORDER BY status
"""


Q140_SQL = _snapshot_diff_sql()


# ------------------------------------------------- auto-strategy join helper

JOIN_BROADCAST_ROWS = 1_000_000  # narrow dim ⇒ tens of MB: safe to ship
JOIN_SKEW_MILLI = 8_000  # hottest key ≥ 8x the mean per-key count
JOIN_N_SALT = 8


def key_profile(df: DataFrame, key: str) -> dict:
    """One-pass key-distribution profile of a single frame — q131's
    per-key groupBy + summary collapsed to a dict. The collect is ONE
    summary row (bounded metadata, not row data). At 100 TB run this
    once per table/key and persist; plan_join accepts the stored dict."""
    r = _profile(df, key, F.col(key)).collect()[0]
    return _profile_row_to_dict(r)


def _profile_row_to_dict(r) -> dict:
    return {
        "n_rows": int(r.n_rows or 0),
        "n_keys": int(r.n_keys or 0),
        "max_cnt": int(r.max_cnt or 0),
        "skew_milli": int(r.skew_milli or 0),
    }


def _key_profiles_pair(a: DataFrame, b: DataFrame, key: str) -> tuple[dict, dict]:
    """Both sides' key profiles in ONE Spark job: the two independent
    _profile aggregates union under a side tag and collect together, so
    the per-side summary stages run concurrently inside one DAG instead
    of as two sequential collect round-trips (guide §2.6's overlap —
    the live-profile path paid two full scheduler round-trips for two
    one-row results; measured at sf0.1: q144 2.67→1.89 s, q147
    1.76→1.44 s). Identical
    dicts to two key_profile calls — same aggregates, same arithmetic."""
    rows = (
        _profile(a, "a", F.col(key))
        .unionByName(_profile(b, "b", F.col(key)))
        .collect()
    )
    by_side = {r.key_col: r for r in rows}
    return _profile_row_to_dict(by_side["a"]), _profile_row_to_dict(by_side["b"])


def plan_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    profiles: tuple[dict, dict] | None = None,
    broadcast_rows: int = JOIN_BROADCAST_ROWS,
    skew_milli: int = JOIN_SKEW_MILLI,
    n_salt: int = JOIN_N_SALT,
) -> tuple[DataFrame, dict]:
    """Profile-driven inner equi-join: q131's skew profile turned into
    the decision it documents. Returns (joined, decision):

      - one side under `broadcast_rows` ⇒ BROADCAST it (no shuffle);
      - else if the larger side's hottest key exceeds `skew_milli`
        (max_cnt/mean, milli-scaled) ⇒ SALTED shuffle join: the skewed
        side gets a per-row salt splitting each hot key across n_salt
        reducers, the other side is replicated n_salt ways (q35's
        machinery, output provably identical to the plain join);
      - else ⇒ plain shuffle join (skew_milli near 1000 means uniform
        keys — salting would only pay the replication for nothing).

    `profiles` takes precomputed key_profile dicts (the 100 TB path:
    profile once, decide many times); omitted, both sides are profiled
    now. The salt uses monotonically_increasing_id — salt VALUES are
    partition-dependent, but the join result is salt-invariant by
    construction (every right row exists under every salt)."""
    if "_salt" in a.columns or "_salt" in b.columns:
        # the salted strategy would clobber-then-drop the user's column,
        # and only on that strategy — refuse up front rather than make
        # the output schema depend on which path the profile picks
        # (check_shard_input's reserved-column discipline)
        raise ValueError("plan_join: '_salt' is a reserved bookkeeping column")
    pa, pb = profiles if profiles is not None else _key_profiles_pair(a, b, key)
    if min(pa["n_rows"], pb["n_rows"]) <= broadcast_rows:
        if pb["n_rows"] <= pa["n_rows"]:
            out = a.join(F.broadcast(b), key)
            decision = {"strategy": "broadcast", "build_side": "right"}
        else:
            out = F.broadcast(a).join(b, key)
            decision = {"strategy": "broadcast", "build_side": "left"}
        return out, decision
    big_is_a = pa["n_rows"] >= pb["n_rows"]
    big_skew = (pa if big_is_a else pb)["skew_milli"]
    if big_skew >= skew_milli:
        skewed, other = (a, b) if big_is_a else (b, a)
        salted = skewed.withColumn(
            "_salt",
            F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int"),
        )
        replicated = other.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        out = (
            salted.join(replicated, [key, "_salt"]).drop("_salt")
            if big_is_a
            else replicated.join(salted, [key, "_salt"]).drop("_salt")
        )
        return out, {
            "strategy": "salted",
            "salted_side": "left" if big_is_a else "right",
            "n_salt": n_salt,
            "skew_milli": big_skew,
        }
    return a.join(b, key), {"strategy": "shuffle", "skew_milli": big_skew}


def q144_planned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """plan_join as a production consumer (VERDICT r5 item 3): the
    lineitem⋈orders fact-dim join routed through the profile-driven
    strategy picker instead of a hand-written join. The profiles see
    orders under JOIN_BROADCAST_ROWS at every test SF, so the picked
    plan is a BroadcastHashJoin with no shuffle on either side —
    pinned by a plan test (tests/test_plans.py) — and the chosen
    strategy is surfaced as a result column so the driver's hash gate
    fails if the decision ever drifts. The aggregate itself is the
    reference's per-correspondent rollup shape (querying.md:20-24) on
    the fact side.

    100 TB shape: key_profile is one map-side-combined pass per side
    (collected as ONE summary row each); at real scale those profiles
    are computed once and persisted, and plan_join accepts the stored
    dicts — the query demonstrates the live-profile path.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderstatus"
    )
    joined, decision = plan_join(li, orders, "okey")
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("qty").cast("double").alias("sum_qty"),
        )
        .withColumn("strategy", F.lit(decision["strategy"]))
        .orderBy("o_orderstatus")
    )


# The oracle derives the expected strategy from the SAME row-count
# threshold plan_join applies (ADVICE r6): hardcoding 'broadcast' made
# the pin valid only below the SF where orders crosses
# JOIN_BROADCAST_ROWS (~sf0.7). Past it the live path picks 'shuffle' —
# never 'salted' for this pair at ANY scale: l_orderkey has at most 7
# lineitems per order and ~4 mean, so the fact side's skew_milli is
# bounded near max_cnt/mean = 1750 < JOIN_SKEW_MILLI, and the orders
# side's unique keys profile at exactly 1000.
Q144_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CASE WHEN LEAST((SELECT COUNT(*) FROM lineitem),
                       (SELECT COUNT(*) FROM orders)) <= {JOIN_BROADCAST_ROWS}
            THEN 'broadcast' ELSE 'shuffle' END AS strategy
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q147_salted_planned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """plan_join's SALTED branch as a driver-gated production consumer
    (VERDICT r6 item 3 — q144 gates only the broadcast decision): a
    deliberately skewed fact key (q35's viral-key shape: ~90% of
    lineitem rows collapse onto key 0, the rest keep their orderkey)
    joined to a per-key dimension through the profile-driven picker.
    `broadcast_rows=0` models the regime where neither side fits a
    broadcast (at gate SFs both sides would otherwise be tiny), so the
    decision rests on the skew profile alone — and that profile is
    scale-INVARIANT by construction: the hot key holds ~90% of rows,
    so skew_milli ≈ 900 * n_keys >= JOIN_SKEW_MILLI whenever the
    corpus has >= 9 distinct keys (sf0.001 already has ~150). The
    oracle can therefore pin 'salted'/'left'/8 as constants; the live
    decision is surfaced in-result so any drift fails the hash gate.
    Salt invariance (salted result == plain join) is exactly what the
    plain-SQL oracle checks row-for-row.

    100 TB shape: this is the hot-key join that kills the plain
    shuffle (one reducer owns the viral key); the salt splits it
    across n_salt reducers while the dimension side replicates only
    n_salt-fold — bounded, unlike AQE skew handling which cannot split
    a single in-flight aggregation key.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )
    dim = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.when(F.col("o_orderkey") % 10 != 0, F.lit(0))
            .otherwise(F.col("o_orderkey"))
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined, decision = plan_join(li, dim, "k", broadcast_rows=0)
    return (
        joined.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("qty").cast("double").alias("sum_qty"),
            # n_orders is constant per key (the dim is keyed); max picks
            # that constant deterministically
            F.max("n_orders").alias("n_orders"),
        )
        .withColumn("strategy", F.lit(decision["strategy"]))
        .withColumn("salted_side", F.lit(decision.get("salted_side", "none")))
        .withColumn("n_salt", F.lit(decision.get("n_salt", 0)).cast("int"))
        .orderBy("k")
    )


# 'salted'/'left'/8 are pinnable constants here — unlike q144's
# threshold-derived strategy — because the skew is constructed to be
# scale-invariant (see q147's docstring): broadcast is disabled by
# parameter and skew_milli >= 900 * n_keys clears JOIN_SKEW_MILLI at
# every SF with >= 9 distinct keys.
Q147_SQL = f"""
WITH lk AS (
  SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0 ELSE l_orderkey END AS k,
         l_quantity
  FROM lineitem
), ok AS (
  SELECT CASE WHEN o_orderkey % 10 <> 0 THEN 0 ELSE o_orderkey END AS k,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT lk.k AS k, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(MAX(n_orders) AS BIGINT) AS n_orders,
       'salted' AS strategy, 'left' AS salted_side,
       CAST({JOIN_N_SALT} AS INT) AS n_salt
FROM lk JOIN ok ON lk.k = ok.k
GROUP BY lk.k ORDER BY k
"""


QUERIES = {
    "q125_delta_dedup": QuerySpec(
        q125_delta_dedup,
        Q125_SQL,
        "delta-vs-store dedup: batch-built Bloom prune + exact verify",
    ),
    "q126_scd_upsert": QuerySpec(
        q126_scd_upsert,
        Q126_SQL,
        "CDC changelog merge to current snapshot (last-write-wins + deletes)",
    ),
    "q127_data_quality_audit": QuerySpec(
        q127_data_quality_audit,
        Q127_SQL,
        "Deequ-style constraint audit: one-pass metrics + broadcast RI check",
    ),
    "q131_skew_profile": QuerySpec(
        q131_skew_profile,
        Q131_SQL,
        "join-key skew profile: the pre-join salt/broadcast decision input",
    ),
    "q136_corpus_drift": QuerySpec(
        q136_corpus_drift,
        Q136_SQL,
        "ingest-window drift report: integer TVD per monitored feature",
    ),
    "q137_embedding_health": QuerySpec(
        q137_embedding_health,
        Q137_SQL,
        "embedding-store health audit: nulls, dims, zero/collapsed norms",
    ),
    "q140_snapshot_diff": QuerySpec(
        q140_snapshot_diff,
        Q140_SQL,
        "snapshot diff: digest-compared added/removed/changed/unchanged",
    ),
    "q144_planned_join": QuerySpec(
        q144_planned_join,
        Q144_SQL,
        "profile-driven join: plan_join picks broadcast, surfaced in-result",
    ),
    "q147_salted_planned_join": QuerySpec(
        q147_salted_planned_join,
        Q147_SQL,
        "profile-driven join, skew regime: the salted branch under the gate",
    ),
}
