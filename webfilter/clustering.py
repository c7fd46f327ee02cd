"""Distributed Lloyd's k-means over an embedding column.

The clustering primitive the corpus-scale curation stages lean on:
SemDeDup's cluster-then-dedup (Abbas et al. 2023) and IVF/IVFPQ index
training both start from k-means centroids. `simsearch.train_ivf_centroids`
trains driver-side numpy over a bounded hash-sample — right for index
BUILD, where a capped sample is the algorithm. This module is the
other half: Lloyd iterations where the ASSIGNMENT and the CENTROID
UPDATE are Spark jobs over the full corpus, so the 10^12-row table is
never collected and never sampled.

Scale shape (the plan that survives 100 TB):
  * assignment is MAP-SIDE — the k centroids are driver-held floats
    embedded as array literals (k*dim values, bounded by construction),
    so per-row argmin runs inside whole-stage codegen with zero join
    and zero shuffle;
  * the update is ONE groupBy(cluster) with map-side partial
    aggregation of `dim` per-component sums + a count — the exchange
    carries at most k rows per map partition, and the driver collects
    exactly k rows per iteration (the same bounded-collect exception
    as graph.pagerank's dangling mass: k is a model dimension, not a
    data dimension).
This mirrors the classic Spark MLlib KMeans layout (broadcast centers,
aggregate partials), re-expressed with DataFrame HOFs. Reference has
no clustering stage; precedent is the reference's ai_query scoring
fan-out (biomed_genai 04_* notebooks) replaced throughout this repo by
local math.

Two arithmetic paths:
  * `kmeans_fit` — production float path (fast, JVM codegen).
  * `kmeans_exact` — the cross-engine oracle twin: embeddings are
    quantized to int64 (`round(x*scale)`), a centroid is carried as
    the exact pair (component-sum vector `s`, member count `n`) and
    NEVER materialized as a float mean, and the argmin key is the
    rational  dist^2 = (n^2*|v|^2 - 2n*(v.s) + |s|^2) / n^2  whose
    numerator/denominator are exact integers. Both engines evaluate
    the final double division on identical integers, and IEEE-754
    division is correctly rounded and monotonic, so the rounded keys
    order exactly like the true rationals (ties broken by cent_id the
    same way on both sides). Exactness bound: the numerator must stay
    under 2^53, i.e. 4 * n_cluster^2 * dim * (scale*max|x|)^2 < 2^53 —
    with scale=100, dim=64, |x|<=1 that holds to n_cluster ~ 5.9e6;
    beyond that, drop `scale` (the operator is then k-means over the
    coarser quantized space — still exact, just lower resolution).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .simsearch import quantized_vec

__all__ = [
    "assign_col",
    "exact_assign_col",
    "exact_min_key_col",
    "kmeans_fit",
    "kmeans_exact",
    "kmeans_exact_assignments",
    "kmeans_exact_centroids",
]


def _sq_dist_lit(vec: Column, center: list[float]) -> Column:
    """Float squared L2 distance from an array column to a literal
    center — pure HOF, stays in codegen."""
    # one list-literal py4j call, not dim calls (see _exact_keys note)
    lit = F.lit([float(x) for x in center]).cast("array<double>")
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def assign_col(vec: Column, centers: list[list[float]]) -> Column:
    """0-based argmin cluster id for `vec` against literal `centers`.
    Ties resolve to the LOWEST center index (array_position finds the
    first occurrence of the min) — deterministic on both engines."""
    dists = F.array(*[_sq_dist_lit(vec, c) for c in centers])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("bigint")


def kmeans_fit(
    df: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, Callable[[Column], Column]]:
    """Distributed float Lloyd's. Returns (centers ndarray [k, dim],
    assign) where `assign(col)` is a map-side Column assigning any
    vector column to the trained centers.

    Init is the k rows with the smallest xxhash64(id) — partition- and
    file-order-invariant (the same device as train_ivf_centroids;
    a limit(k) prefix would be one shard's bias at 10^12 rows), and
    orderBy+limit compiles to TakeOrdered, not a full sort.

    Empty clusters keep their previous center (standard Lloyd's
    fallback; deterministic)."""
    if dim is None:
        raise ValueError("dim is required (no construction-time probe)")
    # a single NULL embedding would otherwise become a NULL cluster
    # row and crash the driver-side int() on the update collect
    # (code-review r4c7 finding #4); persist the projected frame so
    # the init + per-iteration scans do not recompute the upstream
    # lineage iters+1 times (finding #9 — the exact-twin already
    # does this)
    from .dedup import _persist

    df = _persist(df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull()))
    init = (
        df.select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    centers = np.array([list(r[0]) for r in init], dtype=np.float64)
    k = len(centers)
    sums = [F.sum(F.col(vec_col)[i]).alias(f"s{i}") for i in range(dim)]
    for _ in range(iters):
        asg = df.select(
            assign_col(F.col(vec_col), centers.tolist()).alias("cluster"),
            vec_col,
        )
        rows = asg.groupBy("cluster").agg(F.count("*").alias("n"), *sums).collect()
        for r in rows:  # <= k rows: bounded driver collect
            c = int(r["cluster"])
            centers[c] = np.array([r[f"s{i}"] for i in range(dim)]) / r["n"]
    return centers, lambda col: assign_col(col, centers.tolist())


# --- exact-integer oracle twin --------------------------------------


def _exact_keys(
    qv: Column, cents: list[tuple[int, list[int], int]]
) -> tuple[Column, Column]:
    """Distance keys + cent_id lookup arrays for an int64-quantized
    vector column against exact centroids [(cent_id, s, n), ...].

    Key per centroid: (n^2*|v|^2 - 2n*(v.s) + |s|^2) / n^2 — integer
    numerator/denominator evaluated exactly, divided once in double
    (correctly rounded + monotonic => cross-engine-identical order;
    see module docstring for the 2^53 bound). `cents` must be sorted
    by cent_id so the first-min tie-break of array_position matches
    an ORDER BY (key, cent_id)."""
    if [c[0] for c in cents] != sorted(c[0] for c in cents):
        raise ValueError("cents must be sorted by cent_id")
    vv = F.aggregate(
        F.transform(qv, lambda x: x * x), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    keys = []
    for _cid, s, n in cents:
        ss = sum(int(x) * int(x) for x in s)
        # ONE list-literal py4j call per centroid (F.lit accepts
        # sequences) — the previous per-element F.array(*[F.lit(x)
        # ...]) form cost k*dim driver round-trips, ~2 s of pure
        # expression CONSTRUCTION per call at k=8, dim=64 (measured;
        # it dominated the kmeans/semdedup bench wall at small sf)
        slit = F.lit([int(x) for x in s]).cast("array<bigint>")
        dot = F.aggregate(
            F.zip_with(qv, slit, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        num = F.lit(n * n).cast("bigint") * vv - F.lit(2 * n).cast("bigint") * dot + F.lit(ss).cast("bigint")
        keys.append((num.cast("double") / F.lit(float(n * n))))
    dists = F.array(*keys)
    ids = F.lit([int(cid) for cid, _, _ in cents]).cast("array<bigint>")
    return dists, ids


def exact_assign_col(
    qv: Column, cents: list[tuple[int, list[int], int]]
) -> Column:
    """Winning cent_id for a quantized vector (see _exact_keys)."""
    dists, ids = _exact_keys(qv, cents)
    return F.element_at(
        ids, F.array_position(dists, F.array_min(dists)).cast("int")
    )


def exact_min_key_col(
    qv: Column, cents: list[tuple[int, list[int], int]]
) -> Column:
    """The winning centroid's rational distance key as a double —
    exact-integer numerator/denominator, one monotonic IEEE division,
    so cross-engine comparisons of this key (e.g. SemDeDup's
    'farther-from-centroid loses') order identically."""
    dists, _ = _exact_keys(qv, cents)
    return F.array_min(dists)


def kmeans_exact_centroids(
    df: DataFrame,
    iters: int = 2,
    scale: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_ids: int = 8,
) -> tuple[DataFrame, list[tuple[int, list[int], int]]]:
    """Exact-arithmetic Lloyd's: `iters` assign+update rounds from the
    deterministic init (rows with id < init_ids, mirrorable in ANSI
    SQL). Returns (quantized frame with columns _id/qv, trained
    centroids [(cent_id, sum, count), ...]).

    Per iteration: one map-side assignment + one groupBy(cluster)
    partial-agg shuffle whose result (<= k rows) is collected to the
    driver to build the next round's literal centroids — the bounded-
    iterative pattern shared with graph.pagerank."""
    qdf = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), quantized_vec(F.col(vec_col), scale).alias("qv")
    )
    # every training round (and the caller's final assignment) scans
    # this frame — persist once so quantization runs one pass, not
    # iters+2 (the standard iterative-algorithm persist point; goes
    # through dedup's release registry so bench/pipeline sessions can
    # drop the storage between calls, tiny: ~dim*8 B per row)
    from .dedup import _persist

    qdf = _persist(qdf)
    init = (
        qdf.filter(F.col("_id") < init_ids)
        .orderBy("_id")
        .collect()
    )
    cents = [(int(r["_id"]), [int(x) for x in r["qv"]], 1) for r in init]
    if not cents:
        raise ValueError(
            f"no rows with {id_col} < init_ids={init_ids} — exact k-means "
            "init requires small sequential integer ids covering "
            "0..init_ids-1 (code-review r4c7 finding #7)"
        )
    dim = len(cents[0][1])
    sums = [F.sum(F.col("qv")[i]).alias(f"s{i}") for i in range(dim)]
    for _ in range(iters):
        asg = qdf.select(
            exact_assign_col(F.col("qv"), cents).alias("cluster"), "qv"
        )
        rows = {
            int(r["cluster"]): r
            for r in asg.groupBy("cluster").agg(F.count("*").alias("n"), *sums).collect()
        }
        cents = [
            (cid, [int(rows[cid][f"s{i}"]) for i in range(dim)], int(rows[cid]["n"]))
            if cid in rows
            else (cid, s, n)  # empty cluster keeps its previous centroid
            for cid, s, n in cents
        ]
    return qdf, cents


def kmeans_exact_assignments(
    df: DataFrame,
    iters: int = 2,
    scale: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_ids: int = 8,
) -> DataFrame:
    """Final (id, cluster) assignment against the trained exact
    centroids (see kmeans_exact_centroids)."""
    qdf, cents = kmeans_exact_centroids(
        df, iters, scale, vec_col, id_col, init_ids
    )
    return qdf.select(
        F.col("_id").alias(id_col),
        exact_assign_col(F.col("qv"), cents).alias("cluster"),
    )


def kmeans_exact(
    df: DataFrame,
    iters: int = 2,
    scale: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_ids: int = 8,
) -> DataFrame:
    """`kmeans_exact_assignments` + per-cluster size (one window)."""
    asg = kmeans_exact_assignments(df, iters, scale, vec_col, id_col, init_ids)
    w = Window.partitionBy("cluster")
    return asg.select(
        id_col, "cluster", F.count("*").over(w).alias("cluster_size")
    )
