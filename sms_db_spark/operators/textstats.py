"""Text analysis operators over the `documents` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure built-in expressions (JVM-side, whole-stage codegen) — no Python
UDFs. Each has a DuckDB oracle. Regex patterns are kept to the common
Java-regex ∩ RE2 subset so both engines agree.

Scale: all operators are per-row map operations — no shuffle, trivially
linear at 100TB. No trailing orderBy: a global sort's rangepartitioning
sampling pass re-evaluates the whole map expression a second time
(measured ~2x on the MinHash fold), and row order is not semantic here —
the correctness gate compares unordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import QuerySpec
from ..tables import load_table_parallel

# tokens: alpha runs or digit runs (a BPE-ish pre-tokenization regex subset)
TOKEN_RE = "[A-Za-z]+|[0-9]+"
PUNCT_RE = "[,.!?;:]"
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table_parallel(spark, sf_dir, "documents")


def _token_count(col):
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0))


def q40_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + regex (BPE-ish) tokens."""
    docs = _docs(spark, sf_dir)
    ws_tokens = F.split(F.trim(F.col("text")), " +")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.size(ws_tokens).alias("ws_token_cnt"),
        _token_count(F.col("text")).alias("regex_token_cnt"),
    )


Q40_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars_measured,
       len(regexp_split_to_array(trim(text), ' +')) AS ws_token_cnt,
       len(regexp_extract_all(text, '{TOKEN_RE}')) AS regex_token_cnt
FROM documents
"""


def q41_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword-ratio heuristics.

    Ratios are int/int double divisions — bit-deterministic across engines.
    """
    docs = _docs(spark, sf_dir)
    n_tokens = _token_count(F.col("text"))
    punct_cnt = F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_RE), 0))
    stop_pattern = r"\b(" + "|".join(STOPWORDS) + r")\b"
    stop_cnt = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(stop_pattern), 0))
    out = docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        n_tokens.alias("n_tokens"),
        punct_cnt.alias("punct_cnt"),
        stop_cnt.alias("stop_cnt"),
    ).withColumn(
        "stop_ratio",
        F.col("stop_cnt").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
    )
    return out.withColumn(
        "passes_quality",
        (F.col("len_chars") >= 20) & (F.col("n_tokens") >= 5) & (F.col("stop_ratio") < 0.5),
    )


Q41_SQL = f"""
WITH s AS (
  SELECT doc_id,
         length(text) AS len_chars,
         len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
         len(regexp_extract_all(text, '{PUNCT_RE}')) AS punct_cnt,
         len(regexp_extract_all(lower(text), '\\b({"|".join(STOPWORDS)})\\b')) AS stop_cnt
  FROM documents
)
SELECT doc_id, len_chars, n_tokens, punct_cnt, stop_cnt,
       CAST(stop_cnt AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stop_ratio,
       (len_chars >= 20 AND n_tokens >= 5
        AND CAST(stop_cnt AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) < 0.5)
           AS passes_quality
FROM s
"""

# language-ID marker lexicons (tiny n-gram/stopword heuristic)
_EN = ("the", "and", "of", "to", "is")
_DE = ("der", "die", "das", "und", "ist")
_ES = ("el", "la", "los", "de", "es")


def _marker_count(col, words):
    return F.size(
        F.regexp_extract_all(F.lower(col), F.lit(r"\b(" + "|".join(words) + r")\b"), 0)
    )


def q42_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-word scores + deterministic argmax.

    Tie-break order en > de > es is encoded identically in both engines.
    """
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        "lang",
        _marker_count(F.col("text"), _EN).alias("score_en"),
        _marker_count(F.col("text"), _DE).alias("score_de"),
        _marker_count(F.col("text"), _ES).alias("score_es"),
    )
    pred = (
        F.when(
            (F.col("score_en") >= F.col("score_de")) & (F.col("score_en") >= F.col("score_es")),
            F.lit("en"),
        )
        .when(F.col("score_de") >= F.col("score_es"), F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return scored.withColumn("predicted_lang", pred)


Q42_SQL = f"""
WITH s AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '\\b({"|".join(_EN)})\\b')) AS score_en,
         len(regexp_extract_all(lower(text), '\\b({"|".join(_DE)})\\b')) AS score_de,
         len(regexp_extract_all(lower(text), '\\b({"|".join(_ES)})\\b')) AS score_es
  FROM documents
)
SELECT doc_id, lang, score_en, score_de, score_es,
       CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
            WHEN score_de >= score_es THEN 'de'
            ELSE 'es' END AS predicted_lang
FROM s
"""


def q43_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized-content hash + bag-of-words hash
    (order-insensitive), the two standard near-dup pre-filters."""
    docs = _docs(spark, sf_dir)
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    sorted_words = F.array_join(F.array_sort(F.split(normalized, " ")), " ")
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("content_fp"),
        F.md5(sorted_words).alias("bow_fp"),
    )


Q43_SQL = """
WITH n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), ' +', ' ', 'g') AS norm
  FROM documents
)
SELECT doc_id,
       md5(norm) AS content_fp,
       md5(array_to_string(list_sort(string_split(norm, ' ')), ' ')) AS bow_fp
FROM n
"""


def q95_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf frequency-of-frequencies: how many distinct terms occur
    exactly k times. The standard corpus-health fingerprint (a healthy
    natural-language corpus is near-Zipfian; boilerplate/spam floods
    break the low-k tail) and the input to Good-Turing smoothing.

    Two cascaded aggregates, each with map-side partials: terms (one
    shuffle on the term key, Zipf skew dies in the partial agg) then the
    tiny spectrum groupBy — output is O(max term frequency) rows.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    return vocab.groupBy("freq").agg(F.count(F.lit(1)).alias("n_terms"))


Q95_SQL = f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents
),
vocab AS (SELECT term, count(*) AS freq FROM tok GROUP BY term)
SELECT freq, count(*) AS n_terms FROM vocab GROUP BY freq
"""


# ----------------------------------------------------------------- q101

PCTS = (0.25, 0.5, 0.9, 0.95, 0.99)


def q101_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length distribution summary: doc count, exact
    mean, and exact interpolated percentiles of n_chars — the summary a
    curation run reports per domain to pick length cutoffs.

    Spark's `percentile` and DuckDB's `quantile_cont` interpolate with
    the same linear rule and agree bit-for-bit (verified on this data,
    including fractional interpolations), so the oracle hashes exactly.

    Scale note: exact percentile buffers each group's values — fine for
    per-domain groups up to ~10^8 docs; beyond that swap in
    `approx_percentile` (t-digest sketch, mergeable map-side, bounded
    memory) and accept the documented rank error. The mean is one double
    division of two exact int64 sums either way.
    """
    docs = _docs(spark, sf_dir)
    pcols = [
        F.expr(f"percentile(n_chars, {p})").alias(f"p{int(p * 100)}") for p in PCTS
    ]
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_sum"),
            *pcols,
        )
        .select(
            "source",
            "n_docs",
            (F.col("chars_sum").cast("double") / F.col("n_docs").cast("double")).alias(
                "mean_chars"
            ),
            *[F.col(f"p{int(p * 100)}") for p in PCTS],
        )
        .orderBy("source")
    )


Q101_SQL = f"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars,
       {", ".join(f"quantile_cont(n_chars, {p}) AS p{int(p * 100)}" for p in PCTS)}
FROM documents GROUP BY source ORDER BY source
"""


# Gopher/MassiveText-style repetition rules (Rae et al. 2021, table
# A1). The paper's COUNT-ratio rules (type-token ratio, top-token
# share, dup-bigram fraction) are q82_repetition_stats (curation.py)
# as per-row array expressions; these are the complementary
# CHARACTER-MASS rules, built in the explode + groupBy shape q82's
# docstring defers long documents to. Documented deviation from the
# paper's character accounting: the paper de-overlaps duplicated
# n-gram character positions; this law counts OCCURRENCE MASS (count
# × gram string length, inner spaces included), which both engines
# compute identically with no positional bookkeeping. Because
# overlaps double-count, the mass fraction can exceed the paper's
# de-overlapped fraction (even exceed 1.0), so these gate values are
# THIS LAW'S OWN calibration over the occurrence-mass statistic —
# numerically borrowed from the paper's 0.20/0.15 but deliberately
# NOT presented as the published constants (they gate a stricter
# statistic; ADVICE r14). Recalibrate here, not in the paper's name.
REP_TOP2_MASS_MAX = 0.20
REP_DUP5_MASS_MAX = 0.15


def _gram_structs(n: int) -> str:
    """SQL expr: array<struct<n,gram>> of the row's word n-grams (empty
    when the doc has fewer than n words — sequence() would otherwise
    DESCEND on a negative stop and fabricate grams)."""
    return f"""CASE WHEN size(_ws) >= {n} THEN
        transform(sequence(0, size(_ws) - {n}),
                  i -> struct({n} AS n, concat_ws(' ', slice(_ws, i + 1, {n})) AS gram))
      ELSE array() END"""


def gopher_repetition(docs: DataFrame) -> DataFrame:
    """Repetition quality rules over word n-grams: per doc, the char
    mass of the most frequent 2-gram and the char mass of duplicated
    (count >= 2) 5-grams, each as a fraction of the doc's characters,
    with the Gopher-threshold pass flag. Input needs (doc_id, text).

    Scale shape: ONE explode of both gram arrays (tagged by n) → one
    partial-aggregable (doc_id, n, gram) count → one per-doc
    conditional agg → broadcast-free left join back to the doc row (a
    doc shorter than the gram can emit zero grams and must still
    appear, mass 0). Gram keys are (doc_id, n, gram): cardinality is
    bounded by corpus word count, skew is bounded by the longest
    single document — nothing corpus-global lands on one key, so the
    shape holds at 10^11 docs. Per-doc work is linear in doc length
    (never the O(words²) within-row-HOF alternative, which dies on
    long documents)."""
    grams = (
        docs.select(
            "doc_id", F.split(F.trim(F.col("text")), " +").alias("_ws")
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(f"concat({_gram_structs(2)}, {_gram_structs(5)})")
            ).alias("g"),
        )
        .select("doc_id", "g.n", "g.gram")
    )
    # The paper's rule is the char mass of the MOST FREQUENT 2-gram —
    # not the gram maximizing mass (a longer-but-rarer gram must not
    # win; review r14). The argmax is one packed-integer max — key =
    # cnt * 2^32 + mass, decoded by modulus — so both engines pick the
    # identical winner with no struct-max semantics in play. Tiebreak:
    # equal-count grams resolve to the larger mass (the conservative
    # reading for a >= threshold gate). Bounds for the pack: mass <
    # 2^32 (docs under ~2 GiB of text) and cnt < 2^31; a corpus of
    # larger single documents needs a wider pack, not a new law — and
    # the bound is ENFORCED, not just documented (ADVICE r14): the
    # coalesced assert_true below fails the job loudly on a breach
    # instead of silently corrupting the argmax winner/decode. Same
    # coalesce-LEFTMOST pattern as q164's fid guard and the cell
    # writer's NULL guard: interpreted Add.eval short-circuits to NULL
    # without evaluating the right child when the left is NULL, so a
    # right-appended guard would be skipped exactly when it matters.
    _PACK = 1 << 32
    _pack_guard = F.expr(
        f"coalesce(CAST(assert_true(cnt < {1 << 31} "
        f"AND cnt * length(gram) < {_PACK}, "
        "'gopher_repetition: 2-gram pack bound breached (cnt or char "
        "mass too large for the 2^32 pack — widen _PACK)') AS BIGINT), "
        "CAST(0 AS BIGINT))"
    )
    per_doc = (
        grams.groupBy("doc_id", "n", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            (
                F.max(
                    F.when(
                        F.col("n") == 2,
                        _pack_guard
                        + F.col("cnt") * F.lit(_PACK)
                        + F.col("cnt") * F.length("gram"),
                    )
                )
                % F.lit(_PACK)
            ).alias("top2_mass"),
            F.sum(
                F.when(
                    (F.col("n") == 5) & (F.col("cnt") >= 2),
                    F.col("cnt") * F.length("gram"),
                )
            ).alias("dup5_mass"),
        )
    )
    # divisor through greatest(len_chars, 1) — the zero-safe guard
    # (ADVICE r14, the q128 _safe_nrm class): an empty document has
    # zero grams so both masses are 0 and the fractions are exactly
    # 0.0; without the guard ANSI double division by zero throws on
    # the Spark side while DuckDB yields NaN — one empty doc would
    # crash the job. Mirrored in Q165_SQL so both engines agree.
    div = F.greatest(F.col("len_chars"), F.lit(1)).cast("double")
    out = (
        docs.select("doc_id", F.length("text").alias("len_chars"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "len_chars",
            (F.coalesce(F.col("top2_mass"), F.lit(0)).cast("double") / div).alias(
                "top2gram_char_frac"
            ),
            (F.coalesce(F.col("dup5_mass"), F.lit(0)).cast("double") / div).alias(
                "dup5gram_char_frac"
            ),
        )
    )
    return out.withColumn(
        "passes_repetition",
        (F.col("top2gram_char_frac") < REP_TOP2_MASS_MAX)
        & (F.col("dup5gram_char_frac") < REP_DUP5_MASS_MAX),
    )


def q165_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gopher_repetition over the documents table (the gate row)."""
    return gopher_repetition(_docs(spark, sf_dir)).orderBy("doc_id")


Q165_SQL = f"""
WITH w AS (
  SELECT doc_id, length(text) AS len_chars,
         regexp_split_to_array(trim(text), ' +') AS ws
  FROM documents
),
g AS (
  SELECT doc_id, 2 AS n,
         array_to_string(ws[i + 1 : i + 2], ' ') AS gram
  FROM w, unnest(range(0, greatest(len(ws) - 1, 0))) t(i)
  UNION ALL
  SELECT doc_id, 5 AS n,
         array_to_string(ws[i + 1 : i + 5], ' ') AS gram
  FROM w, unnest(range(0, greatest(len(ws) - 4, 0))) t(i)
),
c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY doc_id, n, gram),
pd AS (
  SELECT doc_id,
         max(CASE WHEN n = 2
                  THEN cnt * {1 << 32} + cnt * length(gram) END) % {1 << 32}
             AS top2_mass,
         sum(CASE WHEN n = 5 AND cnt >= 2 THEN cnt * length(gram) END) AS dup5_mass
  FROM c GROUP BY doc_id
)
SELECT w.doc_id, w.len_chars,
       CAST(coalesce(pd.top2_mass, 0) AS DOUBLE)
           / CAST(greatest(w.len_chars, 1) AS DOUBLE) AS top2gram_char_frac,
       CAST(coalesce(pd.dup5_mass, 0) AS DOUBLE)
           / CAST(greatest(w.len_chars, 1) AS DOUBLE) AS dup5gram_char_frac,
       (CAST(coalesce(pd.top2_mass, 0) AS DOUBLE)
            / CAST(greatest(w.len_chars, 1) AS DOUBLE) < {REP_TOP2_MASS_MAX}
        AND CAST(coalesce(pd.dup5_mass, 0) AS DOUBLE)
            / CAST(greatest(w.len_chars, 1) AS DOUBLE) < {REP_DUP5_MASS_MAX})
           AS passes_repetition
FROM w LEFT JOIN pd ON w.doc_id = pd.doc_id
ORDER BY w.doc_id
"""


QUERIES = {
    "q40_text_tokens": QuerySpec(q40_text_tokens, Q40_SQL, "token counting"),
    "q41_text_quality": QuerySpec(q41_text_quality, Q41_SQL, "quality scoring"),
    "q165_gopher_repetition": QuerySpec(
        q165_gopher_repetition,
        Q165_SQL,
        "Gopher-style n-gram repetition rules (top-2-gram / dup-5-gram char mass)",
    ),
    "q42_text_langid": QuerySpec(q42_text_langid, Q42_SQL, "language-ID heuristic"),
    "q43_text_fingerprint": QuerySpec(q43_text_fingerprint, Q43_SQL, "doc fingerprinting"),
    "q95_freq_spectrum": QuerySpec(
        q95_freq_spectrum, Q95_SQL, "Zipf frequency-of-frequencies corpus fingerprint"
    ),
    "q101_length_percentiles": QuerySpec(
        q101_length_percentiles, Q101_SQL, "per-source exact length percentiles"
    ),
}
