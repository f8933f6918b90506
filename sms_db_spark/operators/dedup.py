"""Deduplication operator family.

The reference's core dedup is exact SHA-256 content hashing with
first-insert-wins (sms-db.pl:318-339, README.md:113-115) — covered by
q20_dedup_exact / q21_dedup_anti_join in plans/compat_queries.py and by
sources/canonical.py for the sms domain. This module adds the fuzzy family
for 100TB training-data pipelines:

  - MinHash signatures + banded LSH candidate pairs (shingle → minhash →
    band → bucket self-join)
  - SimHash signatures (computed map-side with zero shuffle)
  - n-gram Jaccard similarity over shingle sets

Scale design notes:
  - shingling + hashing are map-side (explode is linear, no shuffle);
  - the only shuffles are groupBy(doc_id[, j]) on uniformly-distributed
    keys (no skew) and ONE bucket-grouping shuffle for candidate pairs,
    with a hot-bucket cap bounding within-bucket pair fan-out;
  - SimHash avoids even those: a single `aggregate` higher-order function
    folds tokens into the 32 bit-counters per row, entirely inside codegen.

Portable hashing: h_j(s) = int64(first 15 hex chars of md5(j || ':' || s)).
md5 exists in both Spark and DuckDB, so every step has an oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import QuerySpec
from ..tables import load_table, load_table_parallel

NUM_HASHES = 16
BAND_SIZE = 2  # 8 bands of 2 → candidate recall at jaccard ≈ 0.5+

# normalized token array: lower, trim, collapse runs of spaces
_NORM_TOKENS = "string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')"  # duckdb
def _tokens_col() -> Column:
    return F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " "), " ")


def shingles_col(tokens: Column, k: int = 3) -> Column:
    """Distinct word k-shingles; docs shorter than k tokens yield none."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (k - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + off) for off in range(k)]
    )
    return F.when(
        F.size(tokens) >= k, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


_SHINGLES_SQL = f"""
  SELECT doc_id, list_distinct(
           list_transform(range(1, greatest(len(tokens) - 1, 1)),
                          i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])
         ) AS shingles
  FROM (SELECT doc_id, {_NORM_TOKENS} AS tokens FROM documents)
  WHERE len(tokens) >= 3
"""


# hash family: ONE md5 per shingle → 30-bit base, then NUM_HASHES cheap
# universal hashes h_j = ((2j+1)·base + 7919j) mod P. Avoids md5×NUM_HASHES
# (16× fewer digests — the dominant cost at scale); (2j+1) is odd ⇒ nonzero
# mod P ⇒ each h_j is a bijection over Z_P. All arithmetic < 2^40, exact in
# int64 for both engines.
MINHASH_P = 1073741789  # largest prime < 2^30


def _base30(s: Column) -> Column:
    """Portable 30-bit base hash: md5 prefix — identical in Spark and DuckDB."""
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint") % MINHASH_P
    )


def band_rows(docs: DataFrame) -> DataFrame:
    """Per-document banded MinHash: (doc_id, band_id, band_hash), from any
    frame with (doc_id, text) — batch scans and readStream sources bind
    the identical stateless expression (streaming/neardup.py reuses it).

    The whole signature is folded MAP-SIDE per row (aggregate + zip_with):
    no explode, no shuffle — at 100TB the only data movement left is the
    band-bucket join downstream. A naive explode×NUM_HASHES + groupBy
    formulation shuffles |corpus|·NUM_HASHES rows and was 5× slower at
    sf0.1 on local[32].
    """
    # Everything below is ONE expression with intermediates bound via the
    # single-element-array + lambda-variable trick: Catalyst's
    # CollapseProject would otherwise inline an aliased `mins` column into
    # every band expression, re-running the fold 8× (measured 2.7× slower
    # end-to-end at sf0.1).
    tokens_sql = "split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')"
    shingles_sql = f"""
      element_at(transform(array({tokens_sql}), toks ->
        array_distinct(transform(sequence(1, size(toks) - 2),
          i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1),
                              element_at(toks, i+2))))), 1)
    """
    # bind the base-hash array once (lambda-variable trick), then one
    # aggregate-min pass per hash j: no NUM_HASHES-wide accumulator array
    # allocated per shingle (measured ~10% faster than the zip_with-fold
    # formulation at sf0.1, identical output)
    mins_sql = f"""
      element_at(transform(array(
        transform({shingles_sql},
                  s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT) % {MINHASH_P})),
        bases -> transform(sequence(0, {NUM_HASHES - 1}),
          j -> aggregate(bases, CAST({MINHASH_P} AS BIGINT),
                         (m, base) -> least(m, ((2*j + 1) * base + 7919*j) % {MINHASH_P})))), 1)
    """
    bands_sql = f"""
      element_at(transform(array({mins_sql}), mins ->
        transform(sequence(0, {NUM_HASHES // BAND_SIZE - 1}),
          b -> md5(concat_ws(':',
                 transform(sequence(1, {BAND_SIZE}),
                   k -> CAST(element_at(mins, {BAND_SIZE}*b + k) AS STRING)))))), 1)
    """
    return (
        docs.filter(F.expr(f"size({tokens_sql}) >= 3"))
        .select("doc_id", F.posexplode(F.expr(bands_sql)).alias("band_id", "band_hash"))
        .select("doc_id", F.col("band_id").cast("bigint"), "band_hash")
    )


def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """band_rows over the documents table (see band_rows for the shape)."""
    return band_rows(load_table_parallel(spark, sf_dir, "documents"))


_BANDS_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
ex AS (
  SELECT doc_id, ('0x' || substr(md5(unnest(shingles)), 1, 8))::BIGINT % {MINHASH_P} AS base
  FROM sh
),
hashed AS (
  SELECT doc_id, j, ((2*j + 1) * base + 7919*j) % {MINHASH_P} AS h
  FROM ex CROSS JOIN range(0, {NUM_HASHES}) r(j)
),
mh AS (SELECT doc_id, j, min(h) AS mh FROM hashed GROUP BY doc_id, j),
banded AS (SELECT doc_id, j // {BAND_SIZE} AS band_id, j, mh FROM mh)
SELECT doc_id, band_id,
       md5(string_agg(CAST(mh AS VARCHAR), ':' ORDER BY j)) AS band_hash
FROM banded GROUP BY doc_id, band_id
"""


def q44_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No global orderBy: rangepartitioning SAMPLES its child, re-evaluating
    # the whole signature expression a second time (measured 2.3x at sf0.1);
    # signature row order is not semantic and the gate compares unordered.
    return minhash_bands(spark, sf_dir)


Q44_SQL = _BANDS_SQL


# Hot-bucket cap: a degenerate band bucket (empty/boilerplate docs all
# sharing one signature band) generates pairs quadratically — the classic
# LSH scale-killer. Buckets above this size are dropped from candidate
# generation (the standard guard: such buckets are near-identical
# boilerplate that exact dedup already collapses, and genuinely-similar
# docs still pair through their other 7 bands).
LSH_MAX_BUCKET = 64


def bucket_cap_filter(buckets: DataFrame, max_bucket: int) -> DataFrame:
    """THE hot-bucket cap law over a grouped (.., docs: array) relation
    — one implementation shared by the one-shot path here and the
    incremental band-store path (sinks/bandstore.py), so the cap
    semantics (pairable lower bound, inclusive upper cap) can never
    drift between them."""
    return buckets.filter((F.size("docs") >= 2) & (F.size("docs") <= max_bucket))


def bucket_pair_expr(doc_field: str = "", keep_expr: str | None = None):
    """THE in-bucket pair-expansion expression over a doc_id-sorted
    `docs` array: every (i, j>i) pair, map-side, bounded by the cap.
    doc_field selects into struct elements ('' for plain arrays,
    '.doc_id' for struct arrays); keep_expr optionally filters pairs
    (the band-store path keeps only delta-involving ones). The slice
    arithmetic lives ONLY here."""
    inner = (
        f"struct(x{doc_field} AS doc_a, y{doc_field} AS doc_b"
        + (f", {keep_expr} AS keep" if keep_expr else "")
        + ")"
    )
    body = f"transform(slice(docs, i + 2, size(docs) - i - 1), y -> {inner})"
    if keep_expr:
        body = f"filter({body}, p -> p.keep)"
    return F.expr(f"flatten(transform(docs, (x, i) -> {body}))")


def lsh_candidate_pairs(bands: DataFrame, max_bucket: int = LSH_MAX_BUCKET) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) from banded signatures, hot-bucket
    capped.

    PRE-capped (r14, the r13 hamming_banded_pairs template —
    multimodal.py): bucket membership is counted FIRST (a map-side
    partial-combinable aggregate — tiny whatever the skew), only
    2..max_bucket buckets keep their rows through an equi-join on the
    same (band_id, band_hash) keys, and collect_set never materializes
    an over-cap bucket. The earlier shape collected every bucket's doc
    list BEFORE the cap filter, so one degenerate band value —
    boilerplate-heavy web text whose MinHash signatures coincide —
    would hold the whole bucket's array in a single reducer task (at
    10^11 docs, terabytes in one task). Output is IDENTICAL to the
    post-cap-only shape (the cap law is unchanged — the oracle's
    bucket-count join proves it); only the memory profile moves.
    PRECONDITION (every caller holds it, same as the fingerprint
    lanes): `bands` has exactly one row per (doc_id, band_id) — all
    callers posexplode a per-doc band array — so count(1) equals
    size(collect_set(doc_id)) and the row count IS the cap law.
    bucket_cap_filter stays as the belt-and-braces assertion of the
    same law on the grouped row.

    The bands frame is PINNED (eager localCheckpoint) before the two
    consumers: the counts pass and the bucket pass would otherwise
    each re-execute the banding lineage — for the MinHash callers that
    is the full signature computation, the lane's dominant cost (the
    exact re-execution r13 observed as duplicate MapInPandas branches
    in the fingerprint lanes). A band row is doc_id + band_id + a
    32-char hash ≈ 50 B × NUM_BANDS per doc — at 10^11 docs ~40 TB
    spread across executor storage with disk spill, versus re-running
    MinHash over the corpus text twice.

    Pair expansion stays map-side over the sorted in-bucket array
    (bounded by max_bucket², so no within-bucket quadratic blow-up can
    reach a second shuffle); all three aggregations/joins shuffle on
    the same keys, so AQE/exchange reuse keeps the extra pass cheap.
    """
    bands = bands.localCheckpoint(eager=True)
    eligible = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter((F.col("_bn") >= 2) & (F.col("_bn") <= max_bucket))
        .select("band_id", "band_hash")
    )
    buckets = (
        bands.join(eligible, ["band_id", "band_hash"])
        .groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("docs"))
    )
    return (
        bucket_cap_filter(buckets, max_bucket)
        .select(F.explode(bucket_pair_expr()).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def _pairs_sql(max_bucket: int = LSH_MAX_BUCKET) -> str:
    """DuckDB twin of lsh_candidate_pairs over the `bands` CTE (identical
    cap semantics: buckets above max_bucket contribute no pairs)."""
    return f"""
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  JOIN (SELECT band_id, band_hash, count(*) AS n FROM bands GROUP BY band_id, band_hash) k
    ON k.band_id = a.band_id AND k.band_hash = a.band_hash AND k.n <= {max_bucket}
"""


def q45_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs agreeing on any band bucket, with the
    hot-bucket cap (see lsh_candidate_pairs)."""
    return lsh_candidate_pairs(minhash_bands(spark, sf_dir)).orderBy("doc_a", "doc_b")


Q45_SQL = f"""
WITH bands AS ({_BANDS_SQL}),
pairs AS ({_pairs_sql()})
SELECT doc_a, doc_b FROM pairs
ORDER BY doc_a, doc_b
"""

SIMHASH_BITS = 32


def q46_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document, folded map-side with `aggregate` —
    zero shuffle, whole-stage codegen; the 100TB-correct shape (the
    round-robin input spread is not a hash shuffle — see
    load_table_parallel)."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    # hash each token ONCE (outer transform), then fold bit-contributions;
    # putting md5 inside the per-bit lambda would recompute it ×32.
    bitsums = F.expr(
        f"""
        aggregate(
          transform(split(regexp_replace(lower(trim(text)), ' +', ' '), ' '),
                    t -> CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)),
          array_repeat(CAST(0 AS BIGINT), {SIMHASH_BITS}),
          (acc, th) -> zip_with(
            acc, sequence(0, {SIMHASH_BITS - 1}),
            (x, b) -> x + CASE WHEN (shiftright(th, b) & 1) = 1
                               THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END))
        """
    )
    simhash = F.expr(
        f"""
        aggregate(
          zip_with(bitsums, sequence(0, {SIMHASH_BITS - 1}),
            (s, b) -> CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b)
                           ELSE CAST(0 AS BIGINT) END),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)
        """
    )
    # no global orderBy — see q44: the sort's sampling pass would run the
    # fold twice, and signature order is not semantic
    return docs.select("doc_id", bitsums.alias("bitsums")).select(
        "doc_id", simhash.alias("simhash")
    )


Q46_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_NORM_TOKENS}) AS t FROM documents
),
h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS th FROM tok),
bits AS (
  SELECT doc_id, b,
         CAST(SUM(CASE WHEN (th >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s
  FROM h CROSS JOIN range(0, {SIMHASH_BITS}) r(b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT)
           AS simhash
FROM bits GROUP BY doc_id
"""


def q47_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard of each doc (doc_id 1..50) against anchor doc 0.

    inter/union computed on distinct shingle sets; jaccard is an int/int
    double division (bit-deterministic). In a full pipeline this runs on
    LSH candidate pairs (q45), never all-pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    with_sh = docs.select("doc_id", shingles_col(_tokens_col()).alias("sh"))
    anchor = with_sh.filter(F.col("doc_id") == 0).select(F.col("sh").alias("anchor_sh"))
    others = with_sh.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= 50))
    inter = F.size(F.array_intersect(F.col("sh"), F.col("anchor_sh")))
    union = F.size("sh") + F.size("anchor_sh") - inter
    return (
        others.crossJoin(F.broadcast(anchor))
        .select(
            "doc_id",
            inter.alias("inter_cnt"),
            union.alias("union_cnt"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .orderBy("doc_id")
    )


Q47_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
anchor AS (SELECT shingles AS anchor_sh FROM sh WHERE doc_id = 0),
pairs AS (
  SELECT s.doc_id,
         len(list_filter(s.shingles, x -> list_contains(a.anchor_sh, x))) AS inter_cnt,
         len(s.shingles) + len(a.anchor_sh)
           - len(list_filter(s.shingles, x -> list_contains(a.anchor_sh, x))) AS union_cnt
  FROM sh s CROSS JOIN anchor a
  WHERE s.doc_id BETWEEN 1 AND 50
)
SELECT doc_id, inter_cnt, union_cnt,
       CAST(inter_cnt AS DOUBLE) / CAST(union_cnt AS DOUBLE) AS jaccard
FROM pairs ORDER BY doc_id
"""


def q70_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: connected components over the LSH
    collision graph, labels = min doc_id reachable. The closure q52's
    greedy pairwise policy deliberately skips — a doc chained A~B~C lands
    in one cluster here even if A and C never collide directly.

    Iterative min-label propagation (one hop per round, converges in
    graph-diameter rounds — near-dup clusters are shallow); per round:
    one join of the bidirectional edge list against current labels + one
    min-agg, lineage cut with localCheckpoint so round N's plan doesn't
    replay rounds 1..N-1. Convergence test is sum(cluster_id): labels
    only ever decrease, so an unchanged sum IS the fixpoint. At 10^11
    docs you'd switch to the alternating large-star/small-star rounds
    (O(log n) instead of diameter) — same per-round join/agg plan shape.

    Non-colliding docs keep themselves as singleton clusters.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = lsh_candidate_pairs(minhash_bands(spark, sf_dir)).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    bi = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id")).localCheckpoint(
        eager=True
    )
    prev_sum = labels.agg(F.sum("cluster_id")).first()[0]
    for _ in range(20):  # diameter cap; near-dup graphs converge in a few hops
        neigh = bi.join(labels, bi.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), "cluster_id"
        )
        labels = (
            labels.unionByName(neigh)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("cluster_id")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.orderBy("doc_id")


Q70_SQL = f"""
WITH RECURSIVE bands AS ({_BANDS_SQL}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM ({_pairs_sql()})
),
bi AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
reach(doc_id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT bi.dst, reach.lab FROM reach JOIN bi ON reach.doc_id = bi.src
)
SELECT doc_id, min(lab) AS cluster_id FROM reach GROUP BY doc_id ORDER BY doc_id
"""


def _oriented(e: DataFrame, big: str, small: str) -> DataFrame:
    return e.select(F.col(big).alias("src"), F.col(small).alias("dst"))


def _large_star(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbors to the minimum of its neighborhood. ONE window shuffle on
    src (full-partition min, no ordering) + a distinct.

    dedup=False (r18, guide §2.4 — remove shuffles outright): when the
    output feeds _small_star directly (_star_round), the trailing
    distinct buys nothing — the small star's min-window is duplicate-
    insensitive and its own trailing distinct restores set semantics —
    yet costs a full Exchange + two-stage aggregate per round. The
    multiset handed on is bounded by the same <= 2|E| rows the filter
    leaves, so the traded shuffle volume is at most the duplicate
    rewires, while a whole exchange round-trip leaves the plan."""
    from pyspark.sql import Window

    sym = edges.union(_oriented(edges, "dst", "src"))
    m = F.least(F.col("src"), F.min("dst").over(Window.partitionBy("src")))
    out = (
        sym.withColumn("m", m)
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round over (big, small)-oriented edges: every node
    rewires its smaller-or-equal neighbors (and itself) to their min."""
    from pyspark.sql import Window

    m = F.min("dst").over(Window.partitionBy("src"))
    with_m = edges.withColumn("m", m)
    rewired = with_m.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
        with_m.select("src", F.col("m").alias("dst"))
    )
    return rewired.filter(F.col("src") != F.col("dst")).distinct()


def q83_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round formulation q70's docstring names as the swap-in
    at 10^11 docs, where diameter-bound label propagation (q70) would
    need as many rounds as the longest collision chain.

    Per round: large-star + small-star, each ONE window shuffle (a
    full-partition min on the grouping key — no join against a label
    table at all, unlike q70) + a distinct; lineage cut per round with
    localCheckpoint. Convergence: the oriented edge set only ever
    rewires DOWNWARD (dst is a neighborhood min, and node ids are
    non-negative), so an unchanged (count, sum(src), sum(dst)) checksum
    is a fixpoint. At the fixpoint every non-root points directly at its
    component minimum; singleton docs keep themselves.

    Oracle: identical labels to q70's recursive-CTE closure — the two
    algorithms must agree exactly, which is the strongest cross-check of
    both.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = lsh_candidate_pairs(minhash_bands(spark, sf_dir))
    # orient (big, small): lsh_candidate_pairs emits doc_a < doc_b
    edges = _oriented(pairs, "doc_b", "doc_a").localCheckpoint(eager=True)

    def checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)), F.sum("src"), F.sum("dst")
        ).first()
        return tuple(row)

    prev = checksum(edges)
    for _ in range(15):  # ~log2(components span); tiny for real graphs
        edges = _small_star(_large_star(edges, dedup=False)).localCheckpoint(
            eager=True
        )
        cur = checksum(edges)
        if cur == prev:
            break
        prev = cur

    labels = edges.groupBy("src").agg(F.min("dst").alias("lab"))
    return (
        docs.join(labels, docs.doc_id == labels.src, "left")
        .select("doc_id", F.coalesce("lab", "doc_id").alias("cluster_id"))
        .orderBy("doc_id")
    )


def q97_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection: one surviving document per
    near-dup cluster — the step that turns cluster labels (q83) into a
    deduplicated corpus. Representative = longest doc (n_chars), doc_id
    ascending as the deterministic tie-break; singleton docs represent
    themselves, so the output is exactly one row per cluster.

    Plan: q83's O(log n)-round components feed a doc_id equi-join onto
    the (doc_id, n_chars) projection, then ONE sort-based window per
    cluster key picks the representative and counts the cluster — no
    collect of cluster members, no second corpus pass. Cluster keys are
    near-unique (most clusters are singletons), so the window shuffle is
    uniform.

    Oracle: the recursive-CTE closure (Q70's) + the same window — the
    Spark side must reproduce the CTE's clusters exactly for the hash to
    match, which cross-checks the star algorithm end-to-end a second
    way.
    """
    from pyspark.sql import Window

    clusters = q83_dedup_clusters_star(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        clusters.join(docs, "doc_id")
        .withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").alias("rep_n_chars"),
        )
    )


def _q97_sql() -> str:
    closure = Q70_SQL.replace("ORDER BY doc_id", "")
    return f"""
WITH clusters AS ({closure})
SELECT cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       doc_id AS rep_doc_id,
       n_chars AS rep_n_chars
FROM (
  SELECT c.cluster_id, d.doc_id, d.n_chars,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
  FROM clusters c JOIN documents d USING (doc_id)
)
WHERE rn = 1
"""


JACCARD_THRESHOLD = 0.5


def q73_lsh_jaccard_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full candidate→verify near-dup pipeline: LSH candidate pairs
    (q45) re-scored with exact shingle-set Jaccard and kept only above
    threshold — the production shape where the expensive exact measure
    runs on |candidates| pairs, never |corpus|² (q47's anchored variant
    is the oracle-sized demonstration of the scorer).

    Verify-stage shape (the part that must survive 100×):
      - the pair list is materialized ONCE (localCheckpoint — it is the
        collision-survivor set, small but NOT globally bounded, so it is
        never broadcast: the pair↔shingle joins are plain equi-joins on
        doc_id and AQE picks the strategy from runtime sizes);
      - shingles are computed ONLY for docs that appear in some pair:
        candidate ids semi-join the corpus BEFORE the shingle expression
        runs, so the expensive per-doc array is built once per colliding
        doc — not twice per corpus doc as a naive two-sided self-join
        would (measured: the corpus-wide shingle pass alone was 10.2s
        at sf0.1, run twice in the old shape);
      - the checkpointed candidate-shingle table feeds BOTH join sides,
        so the final plan scans no parquet at all;
      - the threshold test is an integer predicate referencing each of
        inter_cnt / size_sum exactly ONCE (inter·(1+T) ≥ T·size_sum ⇔
        inter/union ≥ T; exact for T with a short binary expansion), so
        when Catalyst pushes it into the join condition the substituted
        expression evaluates array_intersect once per candidate pair —
        filtering on the jaccard division itself would inline inter_cnt
        twice and double the set-intersection work for every rejected
        pair. Survivors (few, by construction) recompute it once more in
        the output projection. Docs whose shingle set is empty are
        dropped up front: they can never reach the threshold (the
        division form yields NULL/0 for them), and removing them keeps
        the integer form's size_sum strictly positive.
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(spark, sf_dir)).localCheckpoint(eager=True)
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_sh = (
        docs.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", shingles_col(_tokens_col()).alias("sh"))
        .localCheckpoint(eager=True)
        # Empty-shingle drop AFTER the checkpoint: placed before it, the
        # predicate (whose expression embeds the whole shingle transform)
        # is pushed down onto the parquet scan — upstream of both the
        # semi-join AND the round-robin spread — re-shingling the full
        # corpus on the raw single-file partitioning (measured 9.3s vs
        # 0.5s at sf0.1). The checkpoint is a pushdown barrier; here the
        # filter touches only the ~|candidates| cached rows.
        .filter(F.size(F.col("sh")) > 0)
    )
    sa = cand_sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = cand_sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).alias("inter_cnt"),
            (F.size("sh_a") + F.size("sh_b")).alias("size_sum"),
        )
        .filter(
            F.col("inter_cnt").cast("double") * (1.0 + JACCARD_THRESHOLD)
            >= F.col("size_sum").cast("double") * JACCARD_THRESHOLD
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter_cnt").cast("double")
                / (F.col("size_sum") - F.col("inter_cnt")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


Q73_SQL = f"""
WITH bands AS ({_BANDS_SQL}),
pairs AS ({_pairs_sql()}),
sh AS ({_SHINGLES_SQL}),
scored AS (
  SELECT p.doc_a, p.doc_b,
         CAST(len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) AS DOUBLE)
           / CAST(len(sa.shingles) + len(sb.shingles)
                  - len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x)))
                  AS DOUBLE) AS jaccard
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b
)
SELECT doc_a, doc_b, jaccard FROM scored
WHERE jaccard >= {JACCARD_THRESHOLD} ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------------ q112

CONTAINMENT_THRESHOLD = 0.8


def q112_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment scoring over the SAME LSH candidate pairs
    as q73: containment(A→B) = |A∩B| / |A|. Catches what Jaccard
    structurally cannot — a short document quoted wholesale inside a
    long one has high containment but low Jaccard (the union is
    dominated by the long doc), and partial-overlap/quote removal is a
    distinct curation decision from near-dup removal.

    Emits each surviving pair with both directional containments and
    the direction flag (which side is the contained one). Verify-stage
    shape is q73's verbatim: candidates only, shingles computed once
    per colliding doc, no pair-list broadcast, integer-safe threshold
    on max(inter/|A|, inter/|B|) ⇔ inter ≥ T·min(|A|,|B|).
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(spark, sf_dir)).localCheckpoint(eager=True)
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_sh = (
        docs.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", shingles_col(_tokens_col()).alias("sh"))
        .localCheckpoint(eager=True)
        .filter(F.size(F.col("sh")) > 0)
    )
    sa = cand_sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = cand_sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter_cnt"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        .filter(
            F.col("inter_cnt").cast("double")
            >= F.least("n_a", "n_b").cast("double") * CONTAINMENT_THRESHOLD
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter_cnt") / F.col("n_a")).alias("containment_a_in_b"),
            (F.col("inter_cnt") / F.col("n_b")).alias("containment_b_in_a"),
            F.when(F.col("n_a") <= F.col("n_b"), "a_in_b")
            .otherwise("b_in_a")
            .alias("direction"),
        )
        .orderBy("doc_a", "doc_b")
    )


Q112_SQL = f"""
WITH bands AS ({_BANDS_SQL}),
pairs AS ({_pairs_sql()}),
sh AS ({_SHINGLES_SQL}),
scored AS (
  SELECT p.doc_a, p.doc_b,
         len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) AS inter_cnt,
         len(sa.shingles) AS n_a, len(sb.shingles) AS n_b
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b
)
SELECT doc_a, doc_b,
       CAST(inter_cnt AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment_a_in_b,
       CAST(inter_cnt AS DOUBLE) / CAST(n_b AS DOUBLE) AS containment_b_in_a,
       CASE WHEN n_a <= n_b THEN 'a_in_b' ELSE 'b_in_a' END AS direction
FROM scored
WHERE CAST(inter_cnt AS DOUBLE) >= CAST(least(n_a, n_b) AS DOUBLE) * {CONTAINMENT_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------------ q107

LEV_BLOCK_CAP = 64  # hot-block cap, same discipline as LSH_MAX_BUCKET
LEV_PREFIX_CHARS = 120  # edit-distance window: bounds the O(len^2) DP
LEV_MAX_DIST = 20


def q107_blocked_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage near-dup pairs: block on the first word 3-shingle,
    then verify candidates with exact edit distance over a bounded prefix
    window. Generalizes the reference's exact-hash linkage
    (sms-db.pl:325-331: identical bytes ⇒ same message) to
    almost-identical records — the classic blocking+verify shape of
    entity resolution.

    Scale shape: the blocker is ONE shuffle on the (uniformly hashed)
    leading shingle; in-block pair expansion is capped at
    LEV_BLOCK_CAP², and the O(len²) Levenshtein DP only ever sees
    LEV_PREFIX_CHARS-char prefixes of docs that already share their
    opening shingle — never the corpus cross product.

    Engine-parity constraint: Spark's levenshtein counts Unicode code
    points while DuckDB's walks UTF-8 bytes, so on non-ASCII text the
    same pair gets two different distances. The head window is therefore
    ASCII-projected (non-ASCII chars stripped IDENTICALLY in both
    engines) before the distance — making the metric engine-portable by
    construction, not by luck of an ASCII corpus. Block keys stay
    un-stripped: exact string equality agrees across engines regardless.
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    toks = _tokens_col()
    norm = F.regexp_replace(F.concat_ws(" ", toks), r"[^\x20-\x7e]", "")
    blocked = (
        docs.filter(F.size(toks) >= 3)
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at(toks, 1),
                F.element_at(toks, 2),
                F.element_at(toks, 3),
            ).alias("block"),
            F.substring(norm, 1, LEV_PREFIX_CHARS).alias("head"),
        )
    )
    w = Window.partitionBy("block").orderBy("doc_id")
    capped = blocked.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= LEV_BLOCK_CAP
    )
    a = capped.select(
        F.col("block"),
        F.col("doc_id").alias("doc_a"),
        F.col("head").alias("head_a"),
    )
    b = capped.select(
        F.col("block"),
        F.col("doc_id").alias("doc_b"),
        F.col("head").alias("head_b"),
    )
    pairs = (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("edit_dist", F.levenshtein("head_a", "head_b"))
        .filter(F.col("edit_dist") <= LEV_MAX_DIST)
    )
    return pairs.select("doc_a", "doc_b", "edit_dist").orderBy("doc_a", "doc_b")


Q107_SQL = f"""
WITH blocked AS (
  SELECT doc_id,
         tokens[1] || ' ' || tokens[2] || ' ' || tokens[3] AS block,
         substr(regexp_replace(array_to_string(tokens, ' '), '[^\\x20-\\x7e]', '', 'g'),
                1, {LEV_PREFIX_CHARS}) AS head
  FROM (SELECT doc_id, {_NORM_TOKENS} AS tokens FROM documents)
  WHERE len(tokens) >= 3
), capped AS (
  SELECT * FROM (
    SELECT doc_id, block, head,
           ROW_NUMBER() OVER (PARTITION BY block ORDER BY doc_id) AS rn
    FROM blocked)
  WHERE rn <= {LEV_BLOCK_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.head, b.head) AS edit_dist
FROM capped a JOIN capped b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= {LEV_MAX_DIST}
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------------ q118


def q118_minhash_estimate_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash as an ESTIMATOR, audited: for every LSH candidate pair,
    the signature-agreement estimate of Jaccard (matching coordinates /
    NUM_HASHES) next to the exact shingle-set Jaccard and the absolute
    error — the similarity-domain counterpart of q103's HLL
    estimate-vs-exact row. This is the number that justifies the whole
    minhash family: the estimate is what candidate generation (q45/q73)
    implicitly trusts, and here its error is a first-class, oracle-
    checked output.

    Scale shape: q73's verify discipline verbatim (candidates only,
    per-doc arrays computed once behind a checkpoint, plain equi-joins);
    the signature fold is the same map-side aggregate as q44, evaluated
    only for colliding docs.
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(spark, sf_dir)).localCheckpoint(eager=True)
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = shingles_col(_tokens_col())
    bases = F.transform(sh, lambda s: _base30(s))
    mins = F.transform(
        F.sequence(F.lit(0), F.lit(NUM_HASHES - 1)),
        lambda j: F.aggregate(
            bases,
            F.lit(MINHASH_P).cast("bigint"),
            lambda m, b: F.least(m, ((2 * j + 1) * b + 7919 * j) % MINHASH_P),
        ),
    )
    cand = (
        docs.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", sh.alias("sh"), mins.alias("mins"))
        .localCheckpoint(eager=True)
        .filter(F.size(F.col("sh")) > 0)
    )
    a = cand.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("mins").alias("m_a")
    )
    b = cand.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("mins").alias("m_b")
    )
    matches = F.size(
        F.filter(F.zip_with("m_a", "m_b", lambda x, y: x == y), lambda v: v)
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / F.lit(float(NUM_HASHES))).alias("est_jaccard"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .withColumn("abs_err", F.abs(F.col("est_jaccard") - F.col("jaccard")))
        .orderBy("doc_a", "doc_b")
    )


Q118_SQL = f"""
WITH bands AS ({_BANDS_SQL}),
pairs AS ({_pairs_sql()}),
sh AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id, shingles,
         list_transform(range(0, {NUM_HASHES}), j ->
           list_min(list_transform(shingles, s ->
             ((2*j + 1) * (('0x' || substr(md5(s), 1, 8))::BIGINT % {MINHASH_P})
              + 7919*j) % {MINHASH_P}))) AS mins
  FROM sh WHERE len(shingles) > 0
),
scored AS (
  SELECT p.doc_a, p.doc_b,
         CAST(len(list_filter(range(1, {NUM_HASHES + 1}),
                              i -> sa.mins[i] = sb.mins[i])) AS DOUBLE)
           / {float(NUM_HASHES)} AS est_jaccard,
         CAST(len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) AS DOUBLE)
           / CAST(len(sa.shingles) + len(sb.shingles)
                  - len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x)))
                  AS DOUBLE) AS jaccard
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.doc_a
  JOIN sigs sb ON sb.doc_id = p.doc_b
)
SELECT doc_a, doc_b, est_jaccard, jaccard, abs(est_jaccard - jaccard) AS abs_err
FROM scored ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------------ q117


def q117_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end: q107's blocked-Levenshtein linkage
    pairs → transitive closure via the q83 star-contraction loop → one
    canonical record per entity (longest text, doc_id tie-break) with
    the entity's member count. The full record-linkage pipeline the
    reference's exact-hash dedup (sms-db.pl:325-331) is the degenerate
    case of: block, verify, cluster, canonicalize.

    Scale: each stage reuses an already-audited shape — capped block
    pairs (q107), O(log n) star rounds each one window shuffle (q83),
    and one per-cluster window for the pick (q97).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = q107_blocked_levenshtein(spark, sf_dir).select("doc_a", "doc_b")
    edges = _oriented(pairs, "doc_b", "doc_a").localCheckpoint(eager=True)

    def checksum(e: DataFrame) -> tuple:
        row = e.agg(F.count(F.lit(1)), F.sum("src"), F.sum("dst")).first()
        return tuple(row)

    prev = checksum(edges)
    for _ in range(15):
        edges = _small_star(_large_star(edges, dedup=False)).localCheckpoint(
            eager=True
        )
        cur = checksum(edges)
        if cur == prev:
            break
        prev = cur

    labels = edges.groupBy("src").agg(F.min("dst").alias("lab"))
    clustered = docs.join(labels, docs.doc_id == labels.src, "left").select(
        "doc_id", "n_chars", F.coalesce("lab", "doc_id").alias("entity_id")
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        clustered.withColumn("rn", F.row_number().over(w))
        .withColumn("entity_size", F.count(F.lit(1)).over(Window.partitionBy("entity_id")))
        .filter(F.col("rn") == 1)
        .select("entity_id", "entity_size", F.col("doc_id").alias("rep_doc_id"))
        .orderBy("entity_id")
    )


def _q117_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS ({Q107_SQL.replace("ORDER BY doc_a, doc_b", "")}),
bi AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(doc_id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT bi.dst, reach.lab FROM reach JOIN bi ON reach.doc_id = bi.src
),
clusters AS (
  SELECT doc_id, min(lab) AS entity_id FROM reach GROUP BY doc_id
)
SELECT entity_id, CAST(entity_size AS BIGINT) AS entity_size, rep_doc_id
FROM (
  SELECT c.entity_id, d.doc_id AS rep_doc_id,
         count(*) OVER (PARTITION BY c.entity_id) AS entity_size,
         row_number() OVER (PARTITION BY c.entity_id
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
  FROM clusters c JOIN documents d USING (doc_id)
)
WHERE rn = 1
ORDER BY entity_id
"""


QUERIES = {
    "q44_minhash_signatures": QuerySpec(
        q44_minhash_signatures, Q44_SQL, "MinHash banded signatures"
    ),
    "q45_minhash_lsh_pairs": QuerySpec(
        q45_minhash_lsh_pairs, Q45_SQL, "LSH candidate pairs"
    ),
    "q46_simhash": QuerySpec(q46_simhash, Q46_SQL, "SimHash (map-side fold)"),
    "q47_ngram_jaccard": QuerySpec(q47_ngram_jaccard, Q47_SQL, "n-gram Jaccard vs anchor"),
    "q70_dedup_clusters": QuerySpec(
        q70_dedup_clusters, Q70_SQL, "transitive near-dup connected components"
    ),
    "q83_dedup_clusters_star": QuerySpec(
        q83_dedup_clusters_star,
        Q70_SQL,
        "connected components via large-star/small-star (O(log n) rounds)",
    ),
    "q73_lsh_jaccard_verified": QuerySpec(
        q73_lsh_jaccard_verified, Q73_SQL, "LSH candidates verified by exact Jaccard"
    ),
    "q97_cluster_representatives": QuerySpec(
        q97_cluster_representatives,
        _q97_sql(),
        "canonical representative per near-dup cluster (longest, id tie-break)",
    ),
    "q107_blocked_levenshtein": QuerySpec(
        q107_blocked_levenshtein,
        Q107_SQL,
        "blocked edit-distance record linkage (shingle block + capped verify)",
    ),
    "q112_containment_pairs": QuerySpec(
        q112_containment_pairs,
        Q112_SQL,
        "asymmetric containment (quote/subset detection) over LSH candidates",
    ),
    "q117_entity_resolution": QuerySpec(
        q117_entity_resolution,
        _q117_sql(),
        "entity resolution: lev pairs → star closure → canonical record",
    ),
    "q118_minhash_estimate_vs_exact": QuerySpec(
        q118_minhash_estimate_vs_exact,
        Q118_SQL,
        "minhash Jaccard estimate audited against exact, per candidate pair",
    ),
}
