"""Behavioral edge-semantics tests for the n-gram / index operators
(q88-q90) — the oracle gate proves engine parity; these pin the
CONTRACTS: span accounting, within-doc-repeat exclusion, posting-list
cap and order, classifier determinism and score bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sms_db_spark.operators import ngrams

SF_DIR = "/root/testdata/sf0.001"


def _doc_frame(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _run_q88_on(spark, texts, monkeypatch):
    monkeypatch.setattr(
        ngrams, "_docs", lambda _spark, _sf: _doc_frame(spark, texts)
    )
    return {r.doc_id: r for r in ngrams.q88_dup_ngram_coverage(spark, "unused").collect()}


def test_q88_shared_span_counted_both_sides(spark, monkeypatch):
    span = "a b c d e f g h"  # exactly NGRAM_N tokens
    rows = _run_q88_on(
        spark, [f"x {span} y", f"p q {span}", "totally different words here"], monkeypatch
    )
    # doc0: 10 tokens -> 3 spans; only the exact shared one is duplicated
    assert rows[0].n_spans == 3 and rows[0].dup_spans == 1
    assert rows[1].n_spans == 3 and rows[1].dup_spans == 1
    assert rows[2].dup_spans == 0
    assert abs(rows[0].dup_fraction - 1 / 3) < 1e-12


def test_q88_within_doc_repeat_is_not_cross_doc(spark, monkeypatch):
    span = "a b c d e f g h"
    rows = _run_q88_on(spark, [f"{span} z {span}", "unrelated text"], monkeypatch)
    # the span occurs twice but only inside doc0: min==max doc_id -> not duplicated
    assert rows[0].dup_spans == 0


def test_q88_short_doc_reports_zero_spans(spark, monkeypatch):
    rows = _run_q88_on(spark, ["one two three", "four five six"], monkeypatch)
    assert rows[0].n_spans == 0 and rows[0].dup_spans == 0
    assert rows[0].dup_fraction == 0.0


def test_q89_posting_list_capped_sorted_and_df_uncapped(spark):
    rows = ngrams.q89_inverted_index(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        postings = [int(x) for x in r.postings.split(",")]
        assert postings == sorted(postings)
        assert len(postings) == min(r.doc_freq, ngrams.POSTING_K)
        assert r.total_tf >= r.doc_freq  # tf >= 1 per posting


def test_q90_score_bounded_and_deterministic(spark):
    a = ngrams.q90_hashed_classifier(spark, SF_DIR).collect()
    b = ngrams.q90_hashed_classifier(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert -1.0 <= r.score <= 1.0
        assert r.label_keep == (r.score > 0)
        # unigrams + bigrams: n features = 2*tokens - 1 for >=1-token docs
        assert r.n_features % 2 == 1


def test_q94_topk_ranked_and_deterministic(spark):
    rows = ngrams.q94_bpe_pair_counts(spark, SF_DIR).collect()
    assert len(rows) == ngrams.BPE_TOP_K
    assert [r.rank for r in rows] == list(range(1, ngrams.BPE_TOP_K + 1))
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    for prev, cur in zip(rows, rows[1:]):
        if prev.pair_count == cur.pair_count:
            assert prev.pair < cur.pair  # deterministic tie-break


def test_bpe_train_learns_expected_merges(spark, monkeypatch):
    texts = ["low low low lower lowest", "low lower newest newest"]
    monkeypatch.setattr(
        ngrams, "_docs", lambda _s, _d: _doc_frame(spark, texts)
    )
    merges = ngrams.bpe_train(spark, "unused", rounds=3)
    # 'lo' wins round 1 (every word starts l-o: freq 7); then 'lo w'
    # (still 7); tie-break picks deterministically after that
    assert merges[0] == "l o"
    assert merges[1] == "lo w"
    assert len(merges) == 3


def test_bpe_merge_apply_is_greedy_leftmost(spark, monkeypatch):
    # 'aaaaaa' must merge pairwise to aa aa aa, not skip alternating pairs
    monkeypatch.setattr(
        ngrams, "_docs", lambda _s, _d: _doc_frame(spark, ["aaaaaa bb"])
    )
    merges = ngrams.bpe_train(spark, "unused", rounds=2)
    # round 2 seeing "aa aa" twice proves round 1 produced aa aa aa:
    # a skip-alternating apply would leave "aa a a aa" (pair count 1)
    # and "b b" would win instead
    assert merges == ["a a", "aa aa"]


def test_dup_spans_cross_checks_q88_and_bounds(spark):
    """q132's position-level dup count must equal q88's span count per
    document (same flagging rule, different aggregation), and the
    longest run can never exceed the doc's dup total."""
    from sms_db_spark.operators.ngrams import q88_dup_ngram_coverage, q132_dup_spans

    sf = "/root/testdata/sf0.001"
    spans = {r.doc_id: r for r in q132_dup_spans(spark, sf).collect()}
    cov = {r.doc_id: r for r in q88_dup_ngram_coverage(spark, sf).collect()}
    assert set(spans) == set(cov)
    for d, r in spans.items():
        assert r.dup_spans == cov[d].dup_spans, d
        assert 0 <= r.max_dup_run <= r.dup_spans <= r.n_spans
        if r.max_dup_run > 0:
            assert r.max_span_tokens == r.max_dup_run + 7
    # the corpus actually contains multi-gram duplicated runs
    assert any(r.max_dup_run > 1 for r in spans.values())


def test_bpe_encode_boundary_law_equals_trainer_lookahead(spark):
    """The capacity-2 boundary law (_bpe_merge_steps, RE2-portable)
    must reproduce the trainer's lookahead law `(^| )a b(?= |$)` on
    adversarial adjacent-fusion chains — the case where a consuming
    single-space law visibly diverges ('a a a a a a' pairs as
    aa/aa/aa under the trainer, but aa/a/aa/a under naive consuming
    replace)."""
    from pyspark.sql import functions as F

    cases = [
        "a a a a a a",        # even chain
        "a a a a a",          # odd chain
        "x a b a b y",        # interleaved
        "a b",                # whole string
        "a b a b a b a b",    # long even chain (merge 'a b')
        "b a a b",            # adjacent different context
    ]

    def trainer_apply(s: str, a: str, b: str) -> str:
        df = spark.createDataFrame([(s,)], "s string")
        return df.select(
            F.regexp_replace(
                "s", f"(^| ){a} {b}(?= |$)", f"$1{a}{b}"
            ).alias("r")
        ).first()["r"]

    def encode_apply(s: str, a: str, b: str) -> str:
        # single-spaced symbols -> capacity-2 encoding -> law -> collapse
        df = spark.createDataFrame([(s.replace(" ", "  "),)], "s string")
        out = df.select(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        "s", f"(^| ){a}  {b}( |$)", f"$1{a}{b}$2"
                    ),
                    "  +",
                    " ",
                )
            ).alias("r")
        ).first()["r"]
        return out

    for s in cases:
        for a, b in [("a", "a"), ("a", "b")]:
            assert encode_apply(s, a, b) == trainer_apply(s, a, b), (s, a, b)


def test_q179_store_roundtrip_and_q173_parity(spark):
    """The store-served tokenize lane: the candidate vocabulary
    round-trips train -> commit -> pinned read exactly, the served
    vocabulary is the promoted production artifact, and the per-doc
    output is hash-identical to q173 (the VERDICT r16 item 5 done
    bar — merges reached the encoder via a store read-back, not the
    source constant)."""
    rows = ngrams.q179_bpe_store_tokenize(spark, SF_DIR).collect()
    assert rows and all(r.train_roundtrip_ok for r in rows)
    assert all(r.vocab_n_merges == len(ngrams.BPE_MERGES) for r in rows)
    q173 = ngrams.q173_bpe_tokenize(spark, SF_DIR).collect()
    assert [(r.doc_id, r.n_tokens, r.tok_checksum) for r in rows] == [
        tuple(r) for r in q173
    ]


def test_q176_coverage_measured(spark, monkeypatch):
    """coverage_milli measures the fraction of input chars that reach
    the encoder (VERDICT r16 item 6): '[a-z]-only' text covers fully;
    digits/punctuation dilute it by exactly their char share."""
    docs = spark.createDataFrame(
        [(0, "en", "abcd"), (1, "en", "ab 12!@"), (2, "xx", "1234")],
        "doc_id long, lang string, text string",
    )
    monkeypatch.setattr(ngrams, "_docs", lambda _s, _d: docs.select("doc_id", "lang", "text"))
    rows = {r.lang: r for r in ngrams.q176_tokenizer_fertility(spark, "unused").collect()}
    # en: word chars 4 + 2 = 6, text chars 4 + 7 = 11
    assert rows["en"].n_word_chars == 6 and rows["en"].n_text_chars == 11
    assert rows["en"].coverage_milli == (1000 * 6) // 11
    # xx: nothing reaches the encoder — measured as 0, not a crash
    assert rows["xx"].n_tokens == 0 and rows["xx"].coverage_milli == 0
    assert all(r.roundtrip_ok for r in rows.values())
