"""Semantic dedup (q98), DSIR importance (q99), centroid outliers (q100):
semantic pins beyond the DuckDB-oracle gate."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from sms_db_spark.operators import curation, similarity
from sms_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _cos(a, b):
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = sum(float(x) * float(x) for x in a) ** 0.5
    nb = sum(float(y) * float(y) for y in b) ** 0.5
    return dot / (na * nb)


def test_semantic_dedup_prune_is_justified_and_total(spark):
    emb = {r.vec_id: r.embedding for r in load_table(spark, SF_DIR, "embeddings").collect()}
    out = similarity.q98_semantic_dedup(spark, SF_DIR).collect()
    # verdict covers every vector exactly once
    assert sorted(r.vec_id for r in out) == sorted(emb)
    by_cluster = defaultdict(list)
    for r in out:
        by_cluster[r.cid].append(r)
    for rows in by_cluster.values():
        # the smallest id in a cluster can never be pruned
        keeper = min(rows, key=lambda r: r.vec_id)
        assert keeper.kept
        for r in rows:
            if not r.kept:
                # every pruned member has a smaller-id near-dup in-cluster
                assert any(
                    o.vec_id < r.vec_id
                    and _cos(emb[o.vec_id], emb[r.vec_id])
                    >= similarity.SEMDEDUP_THRESHOLD
                    for o in rows
                )


def test_centroid_outliers_decile_shape(spark):
    out = similarity.q100_centroid_outliers(spark, SF_DIR).collect()
    assert all((r.decile == 1) == r.is_outlier for r in out)
    by_cluster = defaultdict(list)
    for r in out:
        by_cluster[r.cid].append(r)
    for rows in by_cluster.values():
        n = len(rows)
        deciles = Counter(r.decile for r in rows)
        if n >= similarity.OUTLIER_DECILES:
            # ntile spreads n rows over 10 bins, sizes differ by at most 1
            assert max(deciles.values()) - min(deciles.values()) <= 1
        # the least-similar member of the cluster is always in decile 1
        worst = min(rows, key=lambda r: (r.centroid_sim, r.vec_id))
        assert worst.decile == 1


def test_dsir_importance_matches_exact_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text").collect()
    bucket = lambda tok: (  # noqa: E731
        int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % curation.DSIR_BUCKETS
    )
    target_cnt: Counter = Counter()
    raw_cnt: Counter = Counter()
    for r in docs:
        for tok in r.text.strip().split(" "):
            b = bucket(tok)
            raw_cnt[b] += 1
            if r.source == curation.DSIR_TARGET_SOURCE:
                target_cnt[b] += 1
    tt, rt = sum(target_cnt.values()), sum(raw_cnt.values())
    expected = {}
    for r in docs:
        toks = r.text.strip().split(" ")
        score = sum(
            target_cnt[bucket(t)] * rt - raw_cnt[bucket(t)] * tt for t in toks
        )
        expected[r.doc_id] = (len(toks), score)
    out = curation.q99_dsir_importance(spark, SF_DIR).collect()
    assert len(out) == len(expected)
    for r in out:
        n_toks, score = expected[r.doc_id]
        assert (r.n_toks, r.excess_mass) == (n_toks, score)
        assert r.importance == score / (float(tt) * float(rt))


def test_semantic_dedup_reports_truncated_clusters(spark, tmp_path):
    """No-silent-caps: members ranked past SEMDEDUP_MAX_CLUSTER are never
    compared, and q98 must SAY so via cluster_truncated — an oversized
    cluster fixture (one centroid hoarding cap+100 members) must report
    exactly size-cap, and bounded clusters must report 0."""
    import numpy as np
    import pandas as pd

    cap = similarity.SEMDEDUP_MAX_CLUSTER
    k = similarity.N_CENTROIDS
    dim = similarity.DIM
    rng = np.random.RandomState(7)
    # centroids: vec_id < k, well-separated one-hot-ish directions
    cents = np.zeros((k, dim))
    for i in range(k):
        cents[i, i % dim] = 1.0
    # cap+100 members glued to centroid 0, a handful on centroid 1
    big = cents[0] + rng.normal(0, 0.01, size=(cap + 100, dim))
    small = cents[1] + rng.normal(0, 0.01, size=(5, dim))
    vecs = np.vstack([cents, big, small])
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [v.astype("float64").tolist() for v in vecs]}
    )
    pdf.to_parquet(f"{tmp_path}/embeddings.parquet")

    out = similarity.q98_semantic_dedup(spark, str(tmp_path)).collect()
    by_cid = defaultdict(list)
    for r in out:
        by_cid[r.cid].append(r)
    big_cid = max(by_cid, key=lambda c: len(by_cid[c]))
    n_big = len(by_cid[big_cid])
    assert n_big > cap  # the fixture really oversizes one cluster
    assert all(r.cluster_truncated == n_big - cap for r in by_cid[big_cid])
    for cid, rows in by_cid.items():
        if cid != big_cid:
            assert all(r.cluster_truncated == 0 for r in rows), cid
