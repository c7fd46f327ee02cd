"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

* the flagship quality-filter pipeline over a synthetic pages corpus
  (extract + score + rules + scrub + decisions write) — docs/sec is
  the number that matters at 100 TB;
* representative operator queries over the sf tables (filter
  decision, dedup families, ANN top-k, salted aggs).

Scaling-efficiency evidence (N vs 4N parallelism) is produced by
bench_scaling.py -> BENCH/BASELINE.md, not here (the driver calls
this file once per round).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# big enough that the headline is steady-state throughput, not JVM/
# python-worker warmup + scheduling fixed cost (VERDICT r1 #5); a
# warmup pipeline run below removes the remaining cold-start
PAGES_N = int(os.environ.get("WEBFILTER_BENCH_PAGES", "240000"))
SF_LABEL = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]


def main() -> None:
    from webfilter.session import get_spark

    spark = get_spark("webfilter-bench", cores=CPUS, shuffle_partitions=CPUS)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    timings: dict[str, float] = {}

    # --- pages-pipeline throughput (the headline) -------------------
    from webfilter import pipeline, synth

    work = "/dev/shm/webfilter_bench" if os.path.isdir("/dev/shm") else "/tmp/webfilter_bench"
    shutil.rmtree(work, ignore_errors=True)
    synth.write_dataset(spark, PAGES_N, f"{work}/data")
    spark.read.parquet(f"{work}/data/pages.parquet").count()  # warm FS cache

    # warmup: full pipeline once into a scratch dir (JIT + python
    # worker + Arrow path), so the timed runs are steady-state
    pipeline.run_filter(
        spark, f"{work}/data/pages.parquet", f"{work}/warmup",
        n_buckets=64, run_id="warmup",
    )
    shutil.rmtree(f"{work}/warmup", ignore_errors=True)

    # best of 3 timed runs: the sandbox host is shared and an external
    # load spike during a single timed window otherwise defines the
    # round's headline (observed 4x swings with zero local processes)
    page_runs = []
    for i in range(3):
        shutil.rmtree(f"{work}/out{i}", ignore_errors=True)
        t0 = time.time()
        res = pipeline.run_filter(
            spark, f"{work}/data/pages.parquet", f"{work}/out{i}",
            n_buckets=64, run_id=f"bench{i}",
        )
        page_runs.append(round(time.time() - t0, 3))
    dt = min(page_runs)
    timings["pages_filter_pipeline"] = dt
    docs_per_s = res["docs"] / dt

    # --- operator queries over the sf tables ------------------------
    bench_queries = [
        "quality_filter_full",
        "quality_rules",
        "scrub_pii",
        "token_counts",
        "dedup_exact_keep",
        "dedup_minhash_pairs",
        "dedup_simhash_pairs",
        "dedup_embedding_pairs",
        "simsearch_cosine_topk",
        "simsearch_lsh_topk",
        "join_full_outer_reconcile",
        "join_asof_latest",
        "events_sessionized",
        "salted_source_counts",
        "window_rank",
        "join_outer_agg",
        "events_hourly",
        "posexplode_lines",
    ]
    for name in bench_queries:
        best = float("inf")
        for _ in range(2):  # best-of-2 (shared-host spike insurance)
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        _ = n

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "webfilter_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_LABEL,
                "pages_docs": res["docs"],
                "pages_docs_per_s": round(docs_per_s, 1),
                "pages_runs_s": page_runs,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
