"""Similarity-search correctness: brute-force top-k is the exact
baseline (oracle-matched in test_entry_contract); LSH top-k is
measured against it for recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webfilter import simsearch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_self_is_nearest(emb, queries):
    top = simsearch.brute_force_topk(emb, queries, k=1)
    rows = top.collect()
    assert all(r["query_id"] == r["vec_id"] for r in rows)
    assert all(abs(r["cosine"] - 1.0) < 1e-9 for r in rows)


def test_topk_count_and_order(emb, queries):
    top = simsearch.brute_force_topk(emb, queries, k=5).toPandas()
    assert len(top) == 10 * 5
    for _, grp in top.groupby("query_id"):
        cos = grp.sort_values("rank")["cosine"].tolist()
        assert cos == sorted(cos, reverse=True)


def test_lsh_scores_are_exact(spark, emb, queries):
    """LSH candidates are reranked with exact cosine — every returned
    (query, vec) pair's cosine must equal the brute-force value."""
    brute = simsearch.brute_force_topk(emb, queries, k=500)
    approx = simsearch.lsh_topk(emb, queries, k=5, dim=64)
    j = approx.alias("a").join(
        brute.alias("b"), ["query_id", "vec_id"], "inner"
    )
    assert j.count() == approx.count()
    bad = j.filter(F.abs(F.col("a.cosine") - F.col("b.cosine")) > 1e-12).count()
    assert bad == 0


def test_lsh_recall_on_clustered_vectors(spark):
    """On clustered data (the regime LSH exists for: near-dup docs,
    embedding families) top-k recall must be high. Uniform random
    vectors (the sf tables) have no angular structure, so recall is
    measured here on deterministic clusters instead."""
    import numpy as np

    rng_base = simsearch._hyperplanes(64, 20, seed=123)  # 20 cluster centers
    rows = []
    vid = 0
    for c in range(20):
        center = rng_base[c] / np.linalg.norm(rng_base[c])
        for m in range(10):
            noise = simsearch._hyperplanes(64, 1, seed=1000 + vid)[0] * 0.04
            v = center + noise
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    queries = df.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 5
    brute = simsearch.brute_force_topk(df, queries, k=k)
    approx = simsearch.lsh_topk(df, queries, k=k, n_planes=8, n_tables=4, dim=64)
    hit = approx.join(brute.select("query_id", "vec_id"), ["query_id", "vec_id"]).count()
    recall = hit / brute.count()
    assert recall >= 0.8, f"LSH@{k} recall {recall:.2f} on clustered data"


def test_hyperplanes_deterministic():
    a = simsearch._hyperplanes(64, 8)
    b = simsearch._hyperplanes(64, 8)
    assert (a == b).all()
    assert abs(a.mean()) < 0.1 and 0.7 < a.std() < 1.3


def test_ivf_recall_on_clustered_vectors(spark):
    """IVF cell-probe search: on clustered data, probing the n_probe
    nearest cells must recover most of brute-force top-k, and every
    returned score must be the exact cosine."""
    import numpy as np

    rng_base = simsearch._hyperplanes(64, 20, seed=321)
    rows, vid = [], 0
    for c in range(20):
        center = rng_base[c] / np.linalg.norm(rng_base[c])
        for _ in range(10):
            noise = simsearch._hyperplanes(64, 1, seed=5000 + vid)[0] * 0.04
            rows.append((vid, [float(x) for x in center + noise]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 5
    brute = simsearch.brute_force_topk(df, queries, k=k)
    approx = simsearch.ivf_topk(df, queries, k=k, n_centroids=24, n_probe=4)
    hit = approx.join(brute.select("query_id", "vec_id"), ["query_id", "vec_id"]).count()
    recall = hit / brute.count()
    assert recall >= 0.8, f"IVF@{k} recall {recall:.2f}"
    j = approx.alias("a").join(
        simsearch.brute_force_topk(df, queries, k=500).alias("b"),
        ["query_id", "vec_id"],
    )
    bad = j.filter(F.abs(F.col("a.cosine") - F.col("b.cosine")) > 1e-9).count()
    assert bad == 0


def test_ivf_deterministic_codebook(spark, emb):
    a = simsearch.train_ivf_centroids(emb, n_centroids=16)
    b = simsearch.train_ivf_centroids(emb, n_centroids=16)
    import numpy as np

    assert np.array_equal(a, b)


def test_ivf_sample_is_partition_order_invariant(spark, emb):
    """VERDICT r2 #3: the codebook must train on a hash-sample, not a
    limit() prefix — repartitioning (which scrambles which rows a
    prefix would see) must yield the identical codebook."""
    import numpy as np

    a = simsearch.train_ivf_centroids(emb.coalesce(1), n_centroids=16, sample_cap=300)
    b = simsearch.train_ivf_centroids(
        emb.repartition(13, "vec_id"), n_centroids=16, sample_cap=300
    )
    c = simsearch.train_ivf_centroids(
        emb.orderBy(F.col("vec_id").desc()), n_centroids=16, sample_cap=300
    )
    assert np.array_equal(a, b) and np.array_equal(a, c)


# ------------------------------------------------------------------ PQ


def test_pq_centroids_encode_to_themselves(emb):
    """A codebook vector's nearest sub-centroid in every subspace is
    itself (distance 0), so vec_id < 8 must encode to codes
    [cid, cid, cid, cid]."""
    cb = simsearch.pq_codebook(emb, n_codes=8)
    codes = simsearch.pq_encode(emb, cb, n_sub=4, dim=64)
    rows = {r["vec_id"]: r["codes"] for r in codes.filter(F.col("vec_id") < 8).collect()}
    assert set(rows) == set(range(8))
    for cid, cs in rows.items():
        assert cs == [cid] * 4, (cid, cs)


def test_pq_adc_self_distance_zero_for_centroids(emb):
    """For a query that IS a centroid, the ADC distance to that
    centroid's own codes is exactly 0 — and since self-matches are
    excluded, any other vector sharing all four codes ranks first
    with distance 0; every reported distance is >= 0."""
    cb = simsearch.pq_codebook(emb, n_codes=8)
    codes = simsearch.pq_encode(emb, cb, n_sub=4, dim=64)
    luts = simsearch.pq_query_luts(
        emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        cb,
    )
    top = simsearch.pq_adc_topk(codes, luts, n_sub=4, k=3).collect()
    assert len(top) > 0
    assert all(r["adc_dist"] >= 0 for r in top)
    assert all(r["query_id"] != r["vec_id"] for r in top)
    # ranks are 1..k contiguous per query
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_pq_encode_is_map_only(emb):
    """The 100 TB contract: encoding never shuffles the corpus — the
    one-row codebook enters via BroadcastExchange; the plan contains
    no corpus-side (non-broadcast) Exchange."""
    cb = simsearch.pq_codebook(emb, n_codes=8)
    codes = simsearch.pq_encode(emb, cb, n_sub=4, dim=64)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    import re

    non_broadcast_exchanges = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange\b", ln) and "Broadcast" not in ln
    ]
    # the codebook's own single-row aggregation may exchange its 8
    # rows; the corpus scan side must not. 8-row exchanges sit under
    # the BroadcastExchange subtree — assert none elsewhere by
    # checking every plain Exchange is a SinglePartition gather (the
    # codebook agg), never a corpus hashpartitioning
    assert all("SinglePartition" in ln for ln in non_broadcast_exchanges), plan


def test_ivfpq_candidates_share_query_cell(emb):
    """IVFADC single-probe contract: every reported neighbor lives in
    the query's coarse cell, and its ADC distance equals the
    unrestricted PQ-ADC distance for the same (query, vec) pair."""
    cb = simsearch.pq_codebook(emb, n_codes=8)
    enc = simsearch.pq_encode(emb, cb, n_sub=4, dim=64, with_cell=True)
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    luts_c = simsearch.pq_query_luts(qs, cb, with_cell=True)
    top = simsearch.pq_adc_topk(enc, luts_c, n_sub=4, k=3, cell_restrict=True)
    cells = {r["vec_id"]: r["cell"] for r in enc.select("vec_id", "cell").collect()}
    rows = top.collect()
    assert len(rows) > 0
    for r in rows:
        assert cells[r["vec_id"]] == cells[r["query_id"]], r
    # exhaustive ADC distances for cross-check
    luts = simsearch.pq_query_luts(qs, cb)
    full = {
        (r["query_id"], r["vec_id"]): r["adc_dist"]
        for r in simsearch.pq_adc_topk(
            enc.select("vec_id", "codes"), luts, n_sub=4, k=10**6
        ).collect()
    }
    for r in rows:
        assert full[(r["query_id"], r["vec_id"])] == r["adc_dist"], r


def test_ivf_topk_respects_custom_id_col(spark):
    """ivf_topk must forward id_col to centroid training
    (code-review r4c4 finding #1: the default 'vec_id' was
    hard-coded and a renamed id column crashed)."""
    from webfilter.simsearch import ivf_topk

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumnRenamed("vec_id", "doc_id")
    )
    q = emb.limit(2).withColumnRenamed("doc_id", "query_id")
    out = ivf_topk(emb, q, id_col="doc_id", k=3, n_centroids=4, n_probe=4)
    assert out.count() > 0
