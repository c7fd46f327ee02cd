"""Runtime shuffle-volume audit over the whole query registry.

Plan-shape tests (tests/test_plans.py) prove what the optimizer
CHOSE; this job measures what the chosen plan actually MOVED —
SQLMetric values harvested from the executed physical plan of every
registry query. The headline figure per query is shuffle
amplification = shuffle records written / rows read from parquet:
the fraction of the corpus that crosses the wire. Operators whose
docstrings claim "the corpus side never shuffles" (broadcast dims,
banded candidate joins, map-only projections) must show
amplification << 1 here, at runtime, not just a Broadcast node in
explain output.

Usage:
    python jobs/audit_shuffle.py [--sf-dir DIR] [--out FILE]

Writes one JSON object per query plus a summary to
BENCH/shuffle_audit.json and prints a compact table. ~ one bench
suite's wall time at sf0.1 (metrics ride the normal execution; the
only extra cost is executeCollect instead of count).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _walk_metrics(node, acc: dict, seen_reuse: list) -> None:
    """Recurse the executed plan, descending through AQE / query-stage
    / reused-exchange wrappers, summing the metric families we audit.
    A ReusedExchangeExec shares its child's accumulators, so its
    subtree is counted once and the reuse only bumps a counter."""
    cls = node.getClass().getSimpleName()
    mets = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        mets[kv._1()] = kv._2().value()

    if cls == "AdaptiveSparkPlanExec":
        _walk_metrics(node.executedPlan(), acc, seen_reuse)
        return
    if cls.endswith("QueryStageExec"):
        _walk_metrics(node.plan(), acc, seen_reuse)
        return
    if cls == "ReusedExchangeExec":
        seen_reuse.append(cls)
        acc["n_reused_exchanges"] += 1
        return
    if cls == "ShuffleExchangeExec":
        acc["n_shuffles"] += 1
        acc["shuffle_records"] += mets.get("shuffleRecordsWritten", 0)
        acc["shuffle_bytes"] += mets.get("shuffleBytesWritten", 0)
    elif cls == "BroadcastExchangeExec":
        acc["n_broadcasts"] += 1
        acc["broadcast_bytes"] += mets.get("dataSize", 0)
    elif cls in ("FileSourceScanExec", "BatchScanExec"):
        acc["scan_rows"] += mets.get("numOutputRows", 0)
    elif cls == "InMemoryTableScanExec":
        acc["cached_scan_rows"] += mets.get("numOutputRows", 0)

    ch = node.children()
    for i in range(ch.size()):
        _walk_metrics(ch.apply(i), acc, seen_reuse)


def audit_query(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan()
    t0 = time.time()
    rows = plan.executeCollect()
    wall = time.time() - t0
    acc = {
        "n_shuffles": 0,
        "shuffle_records": 0,
        "shuffle_bytes": 0,
        "n_broadcasts": 0,
        "broadcast_bytes": 0,
        "scan_rows": 0,
        "cached_scan_rows": 0,
        "n_reused_exchanges": 0,
    }
    _walk_metrics(plan, acc, [])
    acc["result_rows"] = len(rows)
    acc["wall_s"] = round(wall, 3)
    scan = acc["scan_rows"] + acc["cached_scan_rows"]
    acc["shuffle_amplification"] = (
        round(acc["shuffle_records"] / scan, 4) if scan else None
    )
    return acc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default="BENCH/shuffle_audit.json")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from webfilter.session import get_spark
    from webfilter.dedup import release_cached

    spark = get_spark("webfilter-shuffle-audit", cores=args.cores,
                      shuffle_partitions=args.cores)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        try:
            results[name] = audit_query(fn(spark, args.sf_dir))
        except Exception as e:  # audit must be total, not fail-fast
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        release_cached()

    ok = {k: v for k, v in results.items() if "error" not in v}
    summary = {
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "n_errors": len(results) - len(ok),
        "total_scan_rows": sum(v["scan_rows"] for v in ok.values()),
        "total_shuffle_records": sum(v["shuffle_records"] for v in ok.values()),
        "total_shuffle_bytes": sum(v["shuffle_bytes"] for v in ok.values()),
        "zero_shuffle_queries": sorted(
            k for k, v in ok.items() if v["n_shuffles"] == 0
        ),
        "worst_amplification": sorted(
            (
                (v["shuffle_amplification"], k)
                for k, v in ok.items()
                if v["shuffle_amplification"] is not None
            ),
            reverse=True,
        )[:10],
    }
    out = {"summary": summary, "queries": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    print(f"{'query':34} {'amp':>8} {'shuf_rec':>10} {'shuf_MB':>8} "
          f"{'scan_rows':>10} {'result':>8}")
    for k in sorted(ok, key=lambda k: -(ok[k]["shuffle_amplification"] or 0)):
        v = ok[k]
        amp = v["shuffle_amplification"]
        print(f"{k:34} {amp if amp is not None else '-':>8} "
              f"{v['shuffle_records']:>10} "
              f"{v['shuffle_bytes'] / 1e6:>8.2f} {v['scan_rows']:>10} "
              f"{v['result_rows']:>8}")
    for k, v in results.items():
        if "error" in v:
            print(f"ERROR {k}: {v['error']}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
