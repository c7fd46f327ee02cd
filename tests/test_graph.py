"""PageRank: exactness vs numpy power iteration (same transition
model: column-stochastic with uniform dangling redistribution and
teleport), mass conservation, and plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webfilter.graph import pagerank


def _numpy_pagerank(edges, n, d=0.85, iters=12):
    """Dense reference: rank' = (1-d)/n + d (P rank + dang/n)."""
    P = np.zeros((n, n))
    deg = np.zeros(n)
    for s, t in edges:
        deg[s] += 1
    for s, t in edges:
        P[t, s] += 1.0 / deg[s]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[deg == 0].sum()
        r = (1 - d) / n + d * (P @ r + dang / n)
    return r


@pytest.fixture(scope="module")
def small_graph(spark):
    # 5 nodes; node 4 dangling; parallel edge 0->1 weighs double
    edges = [(0, 1), (0, 1), (0, 2), (1, 2), (2, 0), (3, 4), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    return edges, df


def test_pagerank_matches_numpy(spark, small_graph):
    edges, df = small_graph
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=12).collect()}
    want = _numpy_pagerank(edges, 5)
    assert set(got) == set(range(5))
    for i in range(5):
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


def test_pagerank_mass_conserved(spark, small_graph):
    _, df = small_graph
    total = pagerank(df, iters=7).agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_pagerank_dangling_outranks_nothing_silently(spark, small_graph):
    """The dangling node (4) receives from 3 and 2 and donates back
    uniformly — its rank must exceed teleport-only mass."""
    _, df = small_graph
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=12).collect()}
    assert got[4] > (1 - 0.85) / 5


def test_pagerank_no_action_during_loop_and_no_cartesian(spark, small_graph):
    """The per-iteration dangling scalar travels as a broadcast 1-row
    aggregate: the plan may contain BroadcastNestedLoopJoin (1-row
    cross) but never a CartesianProduct of node-scale frames."""
    _, df = small_graph
    plan = pagerank(df, iters=2, checkpoint_every=10)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
