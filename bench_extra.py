"""Per-query isolation bench for optimization work (guide §1.4).

NOT the graded harness — bench.py is frozen for measurement. This
file times individual registry queries with the same `.count()`
methodology bench.py uses (so numbers are comparable), optionally
also through a noop sink (computes every column), and dumps
`.explain("formatted")` for each query to plans/r06/.

Usage:
    python bench_extra.py [--tag before] [--repeats 2] [--noop]
                          [--no-plans] q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 here — the
driver's round-6 measurement scale), SPARK_GRAFT_CPUS.
Writes BENCH/r06_probe_<tag>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
              "NUMEXPR_NUM_THREADS"):
        os.environ[v] = "1"
    try:
        avail = sorted(os.sched_getaffinity(0))
        if len(avail) > CPUS:
            os.sched_setaffinity(0, set(avail[:CPUS]))
    except (AttributeError, OSError):
        pass

    from webfilter.session import get_spark

    spark = get_spark("webfilter-bench-extra", cores=CPUS,
                      shuffle_partitions=CPUS)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    from webfilter.dedup import release_cached

    plans_dir = Path(__file__).resolve().parent / "plans" / "r06"
    plans_dir.mkdir(parents=True, exist_ok=True)

    out: dict[str, dict] = {}
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        rec: dict = {}
        if not args.no_plans:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
            release_cached()
        walls = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} count#{i}")
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            walls.append(round(time.time() - t0, 3))
            release_cached()
        rec["count_walls"] = walls
        rec["count_best"] = min(walls)
        rec["rows"] = n
        if args.noop:
            nwalls = []
            for i in range(args.repeats):
                spark.sparkContext.setJobDescription(f"{name} noop#{i}")
                t0 = time.time()
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite").save()
                nwalls.append(round(time.time() - t0, 3))
                release_cached()
            rec["noop_walls"] = nwalls
            rec["noop_best"] = min(nwalls)
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)

    res = {"sf_dir": SF_DIR, "cpus": CPUS, "tag": args.tag, "queries": out}
    p = Path(__file__).resolve().parent / "BENCH" / f"r06_probe_{args.tag}.json"
    p.write_text(json.dumps(res, indent=1))
    print(json.dumps({"total_count_best": round(sum(
        r["count_best"] for r in out.values()), 2), "written": str(p)}))


if __name__ == "__main__":
    main()
