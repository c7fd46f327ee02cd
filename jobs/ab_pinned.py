"""Simultaneous pinned A/B between two source trees.

The only trustworthy cross-tree comparison on this shared host
(BENCH/BASELINE.md measurement-validity note): run tree A pinned to
cores 0-(w-1) and tree B pinned to cores w-(2w-1) AT THE SAME TIME on
the same pre-generated corpus, for k paired rounds — co-tenant load
hits both sides of a pair equally, so the within-pair delta isolates
the code difference.

Usage:
    python jobs/ab_pinned.py --old-ref HEAD [--docs 60000] \
        [--rounds 3] [--width 8] [--label fused-scrub]

Tree A = `git archive <old-ref>` of webfilter/ + jobs/run_filter.py;
tree B = the working tree. Writes BENCH/ab_<label>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _zip_worktree(dst: Path) -> Path:
    zp = dst / "pkg.zip"
    with zipfile.ZipFile(zp, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((REPO / "webfilter").rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    shutil.copy(REPO / "jobs" / "run_filter.py", dst / "run_filter.py")
    return zp


def _zip_ref(ref: str, dst: Path) -> Path:
    """Package webfilter/ + jobs/run_filter.py exactly as committed at
    `ref` (git archive keeps us honest: no working-tree leakage)."""
    tar = dst / "old.tar"
    with open(tar, "wb") as fh:
        subprocess.run(
            ["git", "-C", str(REPO), "archive", ref, "webfilter",
             "jobs/run_filter.py"],
            stdout=fh, check=True,
        )
    exdir = dst / "tree"
    exdir.mkdir()
    subprocess.run(["tar", "-xf", str(tar), "-C", str(exdir)], check=True)
    zp = dst / "pkg.zip"
    with zipfile.ZipFile(zp, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((exdir / "webfilter").rglob("*.py")):
            z.write(f, f.relative_to(exdir))
    shutil.copy(exdir / "jobs" / "run_filter.py", dst / "run_filter.py")
    return zp


def _launch(side: Path, pages: str, out: str, cores: str, width: int,
            run_id: str) -> subprocess.Popen:
    cmd = [
        "taskset", "-c", cores,
        "spark-submit", "--driver-memory", "24g",
        "--py-files", str(side / "pkg.zip"),
        str(side / "run_filter.py"),
        "--pages", pages, "--out", out,
        "--buckets", "16", "--cores", str(width),
        "--run-id", run_id, "--warmup",
    ]
    env = dict(
        os.environ,
        OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1", NUMEXPR_NUM_THREADS="1",
    )
    env.pop("PYTHONPATH", None)  # each side runs ONLY from its zip
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, env=env,
    )


def _collect(p: subprocess.Popen) -> dict:
    out, _ = p.communicate(timeout=1800)
    if p.returncode != 0:
        raise RuntimeError(f"side failed rc={p.returncode}")
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-ref", default="HEAD")
    ap.add_argument("--docs", type=int, default=60000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--width", type=int, default=8)
    ap.add_argument("--label", default="ab")
    args = ap.parse_args()

    work = Path("/dev/shm/webfilter_ab")
    shutil.rmtree(work, ignore_errors=True)
    (work / "old").mkdir(parents=True)
    (work / "new").mkdir(parents=True)
    _zip_ref(args.old_ref, work / "old")
    _zip_worktree(work / "new")

    # one corpus, generated once, shared by both sides
    sys.path.insert(0, str(REPO))
    from webfilter.session import get_spark
    from webfilter.synth import write_dataset

    spark = get_spark("ab-synth", cores=8)
    write_dataset(spark, args.docs, str(work / "data"))
    spark.stop()
    pages = str(work / "data" / "pages.parquet")

    w = args.width
    cores_a, cores_b = f"0-{w - 1}", f"{w}-{2 * w - 1}"
    pairs = []
    for r in range(args.rounds):
        pa = _launch(work / "old", pages, str(work / f"oa{r}"), cores_a,
                     w, f"a{r}")
        pb = _launch(work / "new", pages, str(work / f"ob{r}"), cores_b,
                     w, f"b{r}")
        ra, rb = _collect(pa), _collect(pb)
        pair = {
            "round": r,
            "old_wall_s": ra["wall_s"], "new_wall_s": rb["wall_s"],
            "old_docs_per_s": ra["docs_per_s"],
            "new_docs_per_s": rb["docs_per_s"],
            "speedup_new_over_old": round(ra["wall_s"] / rb["wall_s"], 3),
        }
        pairs.append(pair)
        print(json.dumps(pair))
        # alternate core ranges so a side never owns the "good" cores
        cores_a, cores_b = cores_b, cores_a
        for d in (f"oa{r}", f"ob{r}"):
            shutil.rmtree(work / d, ignore_errors=True)
        time.sleep(2)

    geo = 1.0
    for p in pairs:
        geo *= p["speedup_new_over_old"]
    geo **= 1.0 / len(pairs)
    rec = {
        "label": args.label,
        "old_ref": args.old_ref,
        "docs": args.docs,
        "width_cores": w,
        "protocol": "simultaneous pinned pairs, alternated core ranges",
        "pairs": pairs,
        "geomean_speedup_new_over_old": round(geo, 3),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    out = REPO / "BENCH" / f"ab_{args.label}.json"
    out.write_text(json.dumps(rec, indent=1))
    print(json.dumps({"geomean_speedup_new_over_old": rec
                      ["geomean_speedup_new_over_old"],
                      "record": str(out)}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
