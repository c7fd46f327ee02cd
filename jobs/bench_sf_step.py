"""Scale-factor step evidence (VERDICT r4 #4): time the heavy-tail
registry queries at two scale factors and report the wall-clock
growth ratio per query next to the data growth ratio.

The sf0.1 heavy tail is graded every round by bench.py; the claim
that its amplification ratios and map-side combines HOLD at 10x the
data rests on this job: a data-bound operator should grow ~linearly
in rows scanned (ratio <= ~data ratio x constant), a scheduler- or
driver-bound one would not.

Usage:
    python jobs/synth_sf.py --sf 1 --out /dev/shm/sf1   # once
    python jobs/bench_sf_step.py --lo /root/testdata/sf0.1 \
        --hi /dev/shm/sf1 --ratio 10 --out BENCH/sf1_heavy_tail.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# the queries VERDICT r4 #4 names, plus the dedup/ANN families whose
# 100 TB posture claims ride on banded-join amplification
HEAVY_TAIL = [
    "semdedup_kmeans",
    "kmeans_assign",
    "pagerank_hosts",
    "dedup_minhash_pairs",
    "dedup_minhash_md5",
    "dedup_simhash_pairs",
    "gopher_repetition",
    "bpe_merges",
    "decontaminate_ngrams",
    "dedup_embedding_pairs",
    "simsearch_cosine_topk",
    "simsearch_ivfpq_adc",
    "frequent_terms",
    "inverted_index",
    "bm25_rank",
    "hll_distinct_terms",
    "events_sessionized",
    "triangle_counts",
]


def time_pair(spark, qs, name: str, lo_dir: str, hi_dir: str) -> tuple:
    """Interleaved lo/hi/lo/hi within one window, best-of-2 each:
    the two levels share whatever co-tenant load the window carries,
    so the RATIO is trustworthy even when absolute walls are not
    (first cut ran all-lo-then-all-hi and a contended lo block
    produced physically impossible sub-1 ratios at 10x the data)."""
    from webfilter.caching import release_cached

    walls = {lo_dir: [], hi_dir: []}
    for d in (lo_dir, hi_dir, lo_dir, hi_dir):
        t0 = time.time()
        qs[name](spark, d).count()
        walls[d].append(time.time() - t0)
        release_cached()
    return round(min(walls[lo_dir]), 3), round(min(walls[hi_dir]), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default="/root/testdata/sf0.1")
    ap.add_argument("--hi", required=True)
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--out", default=str(REPO / "BENCH" / "sf1_heavy_tail.json"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--only", default=None,
        help="comma-separated subset to (re)measure; merges into an "
        "existing --out record instead of replacing it",
    )
    args = ap.parse_args()

    from webfilter.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench-sf-step", cores=args.cores,
                      shuffle_partitions=args.cores)
    qs = entry_mod.queries()
    names = [n for n in HEAVY_TAIL if n in qs]

    # warmup one cheap query per dir (JIT + file listing)
    for d in (args.lo, args.hi):
        qs["quality_rules"](spark, d).count()

    # the k∝n SemDeDup scale path (clustering.semdedup_pairs_scaled,
    # round 5): the registry's fixed-k oracle twin is O(n^2/k) by
    # construction and measured 36x at 10x data — this entry proves
    # the bounded-cluster variant restores ~linear growth
    def q_semdedup_scaled(spark, sf_dir):
        from webfilter.clustering import semdedup_pairs_scaled

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return semdedup_pairs_scaled(
            emb, dim=64, tau=0.9, target_cluster=256, iters=2
        )

    qs = dict(qs, semdedup_scaledk=q_semdedup_scaled)
    names = names + ["semdedup_scaledk"]
    if args.only:
        wanted = set(args.only.split(","))
        names = [n for n in names if n in wanted]

    rows = []
    for n in names:
        lo_w, hi_w = time_pair(spark, qs, n, args.lo, args.hi)
        ratio = round(hi_w / lo_w, 2) if lo_w > 0 else None
        rows.append({"query": n, "lo_s": lo_w, "hi_s": hi_w,
                     "wall_ratio": ratio})
        print(f"{n:28s} lo={lo_w:7.2f}s hi={hi_w:7.2f}s "
              f"ratio={ratio}", flush=True)
    out_p = Path(args.out)
    if args.only and out_p.exists():
        rec = json.loads(out_p.read_text())
        merged = {r["query"]: r for r in rec["queries"]}
        for r in rows:
            merged[r["query"]] = r
        rec["queries"] = list(merged.values())
        rec["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    else:
        rec = {
            "lo_dir": args.lo, "hi_dir": args.hi,
            "data_ratio": args.ratio, "cores": args.cores,
            "queries": rows,
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "protocol": ("interleaved lo/hi/lo/hi per query, best-of-2 "
                         "each — ratios are same-window paired"),
            "note": ("hi dir docs/embeddings/events are 10x sf0.1 via "
                     "jobs/synth_sf.py (sf0.1-marginal-matched, seeded); "
                     "TPC-H tables are copied at sf0.1 (unused by these "
                     "queries except as dims)"),
        }
    out_p.write_text(json.dumps(rec, indent=1))
    ratios = sorted(r["wall_ratio"] for r in rows if r["wall_ratio"])
    print(json.dumps({"wrote": args.out,
                      "median_wall_ratio": (
                          ratios[len(ratios) // 2] if ratios else None)}))


if __name__ == "__main__":
    main()
