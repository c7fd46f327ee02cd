"""Triangle-count scale evidence: the registry's triangle_counts runs
on the 30-node toy host graph; this job measures graph.triangle_count
on a deterministic power-law graph (same generator as
bench_pagerank) where a naive wedge join would explode on the hub.

Two numbers matter:

* wedge-bound: naive wedges = sum(deg*(deg-1))/2 vs oriented wedges
  = sum(outdeg*(outdeg-1))/2 after degree orientation — the blow-up
  the orientation avoids (counted exactly from the degree tables; the
  naive join itself is deliberately NOT run at the big scale);
* wall at E and 4E edges — shuffle-bound growth, not scheduler-bound.

Usage:
    spark-submit jobs/bench_triangles.py [--edges 1000000]
        [--nodes 100000] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

sys.path.insert(0, str(REPO / "jobs"))
from bench_pagerank import synth_edges  # noqa: E402  (same generator)


def run_once(spark, n_edges: int, n_nodes: int) -> dict:
    from pyspark.sql import functions as F

    from webfilter.graph import triangle_count

    edges = synth_edges(spark, n_edges, n_nodes)
    edges = edges.repartition(spark.sparkContext.defaultParallelism).persist()
    edges.count()

    # exact wedge budgets from the degree tables (no joins)
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    naive_wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    lowfirst = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    outdeg = (
        und.join(da, "a").join(db, "b")
        .select(F.when(lowfirst, F.col("a")).otherwise(F.col("b")).alias("u"))
        .groupBy("u").agg(F.count("*").alias("od"))
    )
    oriented_wedges = outdeg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    max_deg = deg.agg(F.max("deg")).collect()[0][0]

    t0 = time.time()
    per_node = triangle_count(edges)
    n_tri = per_node.agg(F.sum("n_tri")).collect()
    wall = time.time() - t0
    total_tri = int((n_tri[0][0] or 0) // 3)
    for df in (und, deg, edges):
        df.unpersist()
    return {
        "edges": int(n_edges),
        "nodes": int(n_nodes),
        "max_degree": int(max_deg),
        "naive_wedges": int(naive_wedges),
        "oriented_wedges": int(oriented_wedges),
        "wedge_reduction_x": round(naive_wedges / max(oriented_wedges, 1), 1),
        "triangles": total_tri,
        "wall_s": round(wall, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from webfilter.session import get_spark

    spark = get_spark("bench-triangles", cores=args.cores)
    run_once(spark, 50_000, 5_000)  # warmup
    small = run_once(spark, args.edges, args.nodes)
    big = run_once(spark, args.edges * 4, args.nodes * 4)
    out = {
        "metric": "triangle_count_scale",
        "cores": args.cores,
        "small": small,
        "big": big,
        "wall_ratio_4x_graph": round(big["wall_s"] / max(small["wall_s"], 1e-9), 2),
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "triangles.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
