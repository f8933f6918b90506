"""Cross-engine parity of the md5-arithmetic core every oracle relies on:
`_h60` (60-bit md5-prefix int) and the derived bucket/rho expressions
must produce byte-identical values in Spark and DuckDB for ANY string —
unicode, empty-adjacent, whitespace, long. A silent divergence here
would not fail one query; it would quietly skew every sketch, split,
sample, and LSH bucket, so it gets its own adversarial fixture."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from sms_db_spark.operators.sketches import HLL_M, HLL_P, _HLL_WBITS, _h60

ADVERSARIAL = [
    "",
    " ",
    "  double  spaces  ",
    "a",
    "ascii token",
    "héllo wörld",
    "中文分词测试",
    "emoji 🎉🎊 payload",
    "tab\tand\nnewline",
    'quote " backslash \\',
    "a" * 10_000,
    "null\x00byte",  # md5 of embedded NUL must agree too
    "ﬁ ligature ﬂ",
    "combining é accent",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 math",
]
# plus a deterministic pseudo-random batch (seeded — reproducible)
import random  # noqa: E402

_rng = random.Random(42)
ADVERSARIAL += [
    "".join(chr(_rng.randint(32, 0x2FFF)) for _ in range(_rng.randint(1, 80)))
    for _ in range(200)
]


def test_h60_bucket_rho_parity_spark_vs_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], "s string")
    h = _h60(F.col("s"))
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, _HLL_WBITS + 1).otherwise(
        _HLL_WBITS + 1 - F.length(F.bin(w))
    )
    got = {
        r.s: (r.h, r.bucket, r.rho)
        for r in df.select(
            "s", h.alias("h"), (h % HLL_M).alias("bucket"), rho.alias("rho")
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in ADVERSARIAL])
    expected = {
        s: (h, b, r)
        for s, h, b, r in con.execute(
            f"""
            SELECT s, h, h % {HLL_M},
                   CASE WHEN (h >> {HLL_P}) = 0 THEN {_HLL_WBITS + 1}
                        ELSE {_HLL_WBITS + 1} - length(bin(h >> {HLL_P})) END
            FROM (SELECT s, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM t)
            """
        ).fetchall()
    }
    assert got == expected


def test_q107_levenshtein_parity_on_unicode(spark, tmp_path):
    """The ADVICE-r3 divergence, pinned: Spark levenshtein counts code
    points, DuckDB's walks UTF-8 bytes — q107 dodges both by
    ASCII-projecting the head window identically in both engines. Feed
    doc pairs sharing a blocking shingle but differing in UNICODE tails
    and assert the two engines emit the identical pair set with the
    identical distances (pre-fix, any multi-byte tail diverged)."""
    import pandas as pd

    from sms_db_spark.operators.dedup import Q107_SQL, q107_blocked_levenshtein

    rng = random.Random(7)
    rows = []
    for k in range(40):
        # shared 3-token block prefix; tails mix ascii and multi-byte
        tail_a = "".join(chr(rng.randint(32, 0x2FFF)) for _ in range(rng.randint(0, 30)))
        tail_b = "".join(chr(rng.randint(32, 0x2FFF)) for _ in range(rng.randint(0, 30)))
        rows.append((2 * k, f"block{k} shared prefix {tail_a}"))
        rows.append((2 * k + 1, f"block{k} shared prefix {tail_b}"))
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "xx",
            "source": "unit",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    pdf.to_parquet(f"{tmp_path}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in q107_blocked_levenshtein(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    want = {tuple(r) for r in con.execute(Q107_SQL).fetchall()}
    assert got == want
    assert got, "no candidate pairs formed — fixture is vacuous"
