"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the query
  set (small side), JVM-side dot products via zip_with/aggregate,
  window top-k. No Python in the hot path.
* LSH (random hyperplane) bucketed top-k — the scale path: restrict
  the candidate set to query-bucket matches, then exact rerank.
  Hyperplanes are deterministic (splitmix64-seeded), computed once
  and folded into the plan as literals.

At 10^12-doc scale the brute-force path is one broadcast-join scan
(embarrassingly parallel, no shuffle except the final top-k); the
LSH path trades recall for a bucket-pruned scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Adds vec_n = L2-normalized vector (double[]) so cosine becomes
    a plain dot product downstream."""
    n = norm_col(F.col(vec_col))
    return df.withColumn(
        "vec_n",
        F.transform(F.col(vec_col), lambda x: x.cast("double") / n),
    )


def cosine_sim_col(a_normed: Column, b_normed: Column) -> Column:
    return dot_col(a_normed, b_normed)


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries: (query_id, embedding). The query side is broadcast —
    at scale it is always the small side (a probe set, not the
    corpus). Result: (query_id, vec_id, cosine, rank).
    """
    corpus = with_norm(emb, vec_col).select(F.col(id_col), F.col("vec_n").alias("c_vec"))
    probes = with_norm(queries, vec_col).select(
        F.col(query_id_col), F.col("vec_n").alias("q_vec")
    )
    scored = corpus.join(F.broadcast(probes)).withColumn(
        "cosine", cosine_sim_col(F.col("c_vec"), F.col("q_vec"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# ----------------------------------------------------------------- LSH


def _hyperplanes(dim: int, n_planes: int, seed: int = 0x91A5) -> np.ndarray:
    """Deterministic pseudo-gaussian hyperplanes via splitmix64 ->
    Box-Muller; no np.random state involved."""
    n = dim * n_planes
    x = np.arange(n, dtype=np.uint64) + np.uint64(seed)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    u = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u1, u2 = u[: n // 2], u[n // 2 :]
    g = np.sqrt(-2 * np.log(np.maximum(u1, 1e-12))) * np.cos(2 * np.pi * u2)
    g = np.concatenate([g, -g])[:n]
    return g.reshape(n_planes, dim)


def hyperplane_bucket_col(vec: Column, dim: int, n_planes: int) -> Column:
    """Sign-pattern bucket id (0..2^n_planes-1), hyperplanes folded in
    as array literals — pure Column math, codegen-friendly."""
    bucket = F.lit(0)
    planes = _hyperplanes(dim, n_planes)
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[p]])
        d = dot_col(vec, plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def with_hyperplane_bucket(
    df: DataFrame, vec_col: str = "vec_n", n_planes: int = 8, dim: int | None = None
) -> DataFrame:
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    return df.withColumn("bucket", hyperplane_bucket_col(F.col(vec_col), dim, n_planes))


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's bucket
    are scored. Recall depends on n_planes; use multiprobe (flip one
    bit) for higher recall — implemented as bucket OR neighbors."""
    dim = len(emb.select(vec_col).first()[0])
    corpus = with_hyperplane_bucket(with_norm(emb, vec_col), "vec_n", n_planes, dim)
    corpus = corpus.select(id_col, F.col("vec_n").alias("c_vec"), "bucket")
    probes = with_hyperplane_bucket(with_norm(queries, vec_col), "vec_n", n_planes, dim)
    # multiprobe: original bucket + all 1-bit flips
    probe_buckets = probes.select(
        query_id_col,
        F.col("vec_n").alias("q_vec"),
        F.explode(
            F.array_union(
                F.array(F.col("bucket")),
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_planes - 1)),
                    lambda p: F.col("bucket").bitwiseXOR(F.shiftleft(F.lit(1), p)),
                ),
            )
        ).alias("bucket"),
    )
    scored = corpus.join(F.broadcast(probe_buckets), "bucket").withColumn(
        "cosine", cosine_sim_col(F.col("c_vec"), F.col("q_vec"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
