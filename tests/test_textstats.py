"""Pin the Gopher-repetition law (textstats.gopher_repetition) against
hand-computed masses — the driver gate exercises it on random word soup
where the dup-5-gram branch is identically zero, so the duplicated-gram
arithmetic and the short-doc edges are pinned HERE."""

import pytest

from sms_db_spark.operators.textstats import (
    REP_DUP5_MASS_MAX,
    REP_TOP2_MASS_MAX,
    gopher_repetition,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in gopher_repetition(df).collect()}


def test_duplicated_5gram_mass_hand_computed(spark):
    # words a..e twice: the 5-gram "a b c d e" occurs at i=0 and i=5
    # (count 2, len 9 -> mass 18); every 2-gram except "e a" occurs
    # twice (top mass 2*3=6); text length 19.
    out = _run(spark, [(1, "a b c d e a b c d e")])
    r = out[1]
    assert r["len_chars"] == 19
    assert r["top2gram_char_frac"] == pytest.approx(6 / 19)
    assert r["dup5gram_char_frac"] == pytest.approx(18 / 19)
    assert r["passes_repetition"] is False  # dup5 0.947 >= 0.15


def test_single_occurrence_top2_and_no_5grams(spark):
    # 3 words: two distinct 2-grams, each count 1 -> top mass is one
    # occurrence (3 chars) over 5 chars = 0.6; no 5-grams at all.
    out = _run(spark, [(1, "x y z")])
    r = out[1]
    assert r["top2gram_char_frac"] == pytest.approx(3 / 5)
    assert r["dup5gram_char_frac"] == 0.0
    assert r["passes_repetition"] is False  # top2 0.6 >= 0.20


def test_clean_doc_passes(spark):
    # 20 distinct 3-char words: max 2-gram mass is 7 chars over 79,
    # well under both thresholds.
    words = [f"w{i:02d}" for i in range(20)]
    text = " ".join(words)
    out = _run(spark, [(1, text)])
    r = out[1]
    assert r["len_chars"] == 79
    assert r["top2gram_char_frac"] == pytest.approx(7 / 79)
    assert r["dup5gram_char_frac"] == 0.0
    assert r["passes_repetition"] is True


def test_short_docs_survive_the_left_join(spark):
    # fewer words than the gram: zero grams, zero mass, still a row
    # (and the sequence() guard must not DESCEND and fabricate grams
    # from a negative stop)
    out = _run(spark, [(1, "solo"), (2, "two words")])
    assert out[1]["top2gram_char_frac"] == 0.0
    assert out[1]["dup5gram_char_frac"] == 0.0
    assert out[1]["passes_repetition"] is True
    # 2 words: exactly one 2-gram ("two words", 9 chars over 9) -> 1.0
    assert out[2]["top2gram_char_frac"] == pytest.approx(1.0)
    assert out[2]["passes_repetition"] is False


def test_empty_and_whitespace_docs_do_not_divide_by_zero(spark):
    # ADVICE r14 (medium): length('') = 0 — under ANSI mode an
    # unguarded double division threw DIVIDE_BY_ZERO, so ONE empty
    # document crashed the whole job. The greatest(len, 1) guard must
    # yield exactly 0.0 fractions and a passing flag instead.
    out = _run(spark, [(1, ""), (2, "   "), (3, "ok doc here")])
    for d in (1, 2):
        r = out[d]
        assert r["top2gram_char_frac"] == 0.0
        assert r["dup5gram_char_frac"] == 0.0
        assert r["passes_repetition"] is True
    assert out[3]["len_chars"] == 11


def test_thresholds_are_strict_less_than(spark):
    # a doc engineered to sit exactly AT the top2 threshold must fail
    # (Gopher's rule is "remove if >= threshold"): 2-gram mass 3 over
    # exactly 15 chars = 0.20.
    #   text "ab cd ef gh ij" is 14 chars; use "abc de fg hi j" ->
    #   grams: "abc de"(6) ... top mass 6; need 6/len == 0.2 -> len 30.
    words = ["abc", "de", "fg", "hi", "jk", "lm", "no", "pq", "rs", "tu"]
    text = " ".join(words)  # 9 two-grams, max len "abc de" = 6
    assert len(text) == 30
    out = _run(spark, [(1, text)])
    assert out[1]["top2gram_char_frac"] == pytest.approx(0.2)
    assert out[1]["passes_repetition"] is False
    assert REP_TOP2_MASS_MAX == 0.20 and REP_DUP5_MASS_MAX == 0.15


def test_top2_is_most_frequent_not_max_mass(spark):
    # the review-r14 law distinction: "aa bb" occurs 3x (mass 15);
    # "longword01 longword02" occurs 2x (mass 42 > 15). The paper's
    # rule scores the MOST FREQUENT gram's mass — a longer-but-rarer
    # gram must not win.
    text = "aa bb aa bb aa bb longword01 longword02 longword01 longword02"
    out = _run(spark, [(1, text)])
    r = out[1]
    assert r["top2gram_char_frac"] == pytest.approx(15 / len(text))


def test_top2_count_ties_resolve_to_larger_mass(spark):
    # equal counts: the larger mass wins (conservative for the gate)
    text = "aa bb cc longword01 longword02"
    # every 2-gram occurs once; the largest is "longword01 longword02"
    out = _run(spark, [(1, text)])
    assert out[1]["top2gram_char_frac"] == pytest.approx(21 / len(text))


def test_repetition_matches_pure_python_reference_on_random_docs(spark):
    """Seeded randomized cross-check: 40 random word-soup docs
    (including empty-ish and heavy-repeat shapes) against an
    independent pure-Python recompute of the char-mass law — the
    third engine alongside the Spark/DuckDB gate pair."""
    import random
    from collections import Counter

    rng = random.Random(1414)
    vocab = ["a", "bb", "ccc", "dddd", "w%d" % 5, "xy", "zq"]
    docs = []
    for i in range(40):
        n = rng.choice([1, 2, 4, 5, 7, 12, 30])
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.4 and n >= 6:  # plant a repeated block
            block = words[:3]
            words = block + words[3 : n - 3] + block
        docs.append((i, " ".join(words)))

    def ref(text):
        ws = text.split(" ")
        out = {}
        for gram_n in (2, 5):
            grams = [
                " ".join(ws[i : i + gram_n])
                for i in range(len(ws) - gram_n + 1)
            ]
            out[gram_n] = Counter(grams)
        c2, c5 = out[2], out[5]
        top2 = 0
        if c2:
            best_cnt = max(c2.values())
            top2 = max(
                cnt * len(g) for g, cnt in c2.items() if cnt == best_cnt
            )
        dup5 = sum(cnt * len(g) for g, cnt in c5.items() if cnt >= 2)
        return top2 / len(text), dup5 / len(text)

    got = _run(spark, docs)
    for i, text in docs:
        want_top2, want_dup5 = ref(text)
        r = got[i]
        assert r["top2gram_char_frac"] == pytest.approx(want_top2), (i, text)
        assert r["dup5gram_char_frac"] == pytest.approx(want_dup5), (i, text)
