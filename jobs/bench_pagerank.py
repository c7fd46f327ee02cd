"""PageRank scale evidence (VERDICT r3 #4): the registry's
pagerank_hosts runs on a 30-node toy graph where 12 rounds cost pure
scheduler overhead, so the claim "at scale the per-iteration cost is
the edges⋈ranks shuffle" had no measurement. This job provides it:

* synthesizes a DETERMINISTIC power-law directed graph with Spark
  Column math (no driver loops, no RNG objects): src ~ uniform,
  dst = floor(n * u^3) — cubic skew gives a heavy-tailed in-degree
  (top node collects ~1,000x the median's in-links), the web-host
  shape that makes the ranks shuffle skew-relevant;
* runs graph.pagerank at TWO edge scales (E and 4E, same iters,
  same cores) in one session and reports seconds/iteration at both.

If per-iteration cost were scheduler-bound (the toy regime), s/iter
would be flat across scales; shuffle-bound cost grows ~linearly with
|E|. The observed ratio is the evidence — recorded in
BENCH/pagerank.json and surfaced in BENCH/BASELINE.md.

Usage:
    spark-submit jobs/bench_pagerank.py [--edges 1000000] [--nodes 100000]
        [--iters 8] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def synth_edges(spark, n_edges: int, n_nodes: int, seed: int = 7):
    """Deterministic power-law edge list, pure Column math.

    u in [0,1) from a hashed edge id; dst = floor(n * u^3) makes
    P(dst = k) ∝ density of u^3 near k/n — in-degree falls off as a
    power of rank, concentrating mass on low node ids. src is
    uniform (out-degree ~ Poisson), like real hosts: pages link OUT a
    bounded amount but popular hosts collect unbounded in-links."""
    from pyspark.sql import functions as F

    e = spark.range(n_edges)
    u = (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1_000_000_007)) / 1_000_000_007.0)
    src = F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(n_nodes))
    dst = F.floor(F.lit(float(n_nodes)) * F.pow(u, F.lit(3.0))).cast("long")
    return (
        e.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def run_once(spark, n_edges: int, n_nodes: int, iters: int) -> dict:
    from pyspark.sql import functions as F

    from webfilter.graph import pagerank

    edges = synth_edges(spark, n_edges, n_nodes)
    edges = edges.repartition(spark.sparkContext.defaultParallelism).persist()
    n_real_edges = edges.count()  # materialize OUTSIDE the timed window

    t0 = time.time()
    ranks = pagerank(edges, iters=iters, n_nodes=n_nodes)
    top = (
        ranks.orderBy(F.desc("rank")).limit(5).collect()
    )
    wall = time.time() - t0
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    edges.unpersist()
    return {
        "edges": n_real_edges,
        "nodes": n_nodes,
        "iters": iters,
        "wall_s": round(wall, 2),
        "s_per_iter": round(wall / iters, 3),
        "rank_sum": round(float(total), 6),  # must be ~1.0
        "top_node": int(top[0]["node"]),  # power-law: a low id
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from webfilter.session import get_spark

    spark = get_spark("bench-pagerank", cores=args.cores)

    # warmup at a small scale: JIT + python worker spin-up out of the
    # measured numbers
    run_once(spark, 50_000, 5_000, 2)

    # scale edges AND nodes together (a 4x-bigger web, not a denser
    # one): both the edges⋈ranks shuffle and the node-keyed rank
    # update grow, so data-bound cost shows as s/iter rising toward
    # 4x while scheduler-bound cost stays flat at 1x.
    small = run_once(spark, args.edges, args.nodes, args.iters)
    big = run_once(spark, args.edges * 4, args.nodes * 4, args.iters)

    ratio = big["s_per_iter"] / max(small["s_per_iter"], 1e-9)
    out = {
        "metric": "pagerank_s_per_iter",
        "cores": args.cores,
        "small": small,
        "big": big,
        "per_iter_ratio_4x_graph": round(ratio, 2),
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "pagerank.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
