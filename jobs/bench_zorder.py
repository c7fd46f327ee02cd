"""Z-order data-skipping evidence: how many parquet row groups does a
2-D box predicate touch under a z-ordered layout vs a linear
(single-column-sorted) layout of the SAME table?

Min/max pruning is what makes a 100 TB scan cheap: Spark (and any
Iceberg/Delta reader) skips a row group when the predicate cannot
match its column stats. A layout sorted on x alone gives x tight
ranges but leaves y spanning the full domain in EVERY row group — a
(x, y) box predicate then prunes only on x. The z-ordered layout
(webfilter/zorder.py) keeps both dims compact per row group, so the
same box prunes in both dimensions multiplicatively.

The job measures, from the written files' parquet footers (pyarrow —
engine-independent ground truth, not Spark's own accounting):

* row groups / files whose (x, y) min-max intersect the box, per
  layout — the fraction a stats-pruning reader must read;
* Spark wall time for the filtered count on each layout (pushdown
  on), best of k.

Usage:
    spark-submit jobs/bench_zorder.py [--rows 2000000] [--files 32]
        [--cores 8] [--box-frac 0.0625]
"""

from __future__ import annotations

import argparse
import glob
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DOMAIN = 4096  # x, y uniform in [0, DOMAIN)


def synth_xy(spark, n_rows: int):
    """Deterministic uniform 2-D integer points (hash-derived, no RNG
    state): x and y are independent 12-bit values per id."""
    from pyspark.sql import functions as F

    ids = spark.range(n_rows)
    return ids.select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(DOMAIN)).cast("bigint").alias("x"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(DOMAIN)).cast("bigint").alias("y"),
        F.xxhash64(F.col("id"), F.lit(3)).alias("payload"),
    )


# Small parquet row groups so stats-pruning resolution comes from the
# LAYOUT, not the file count: with the default 128 MB block size this
# whole benchmark table is one row group per file and both layouts
# bottom out at the same floor. Real 100 TB tables have thousands of
# row groups per partition; this reproduces that regime at bench size.
ROW_GROUP_BYTES = 256 * 1024


def write_linear(df, path: str, n_files: int) -> None:
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(n_files, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .option("parquet.block.size", str(ROW_GROUP_BYTES))
        .parquet(path)
    )


def footer_pruning(path: str, box: tuple[int, int, int, int]) -> dict:
    """Ground-truth stats pruning: row groups / files whose x AND y
    min-max ranges intersect the box."""
    import pyarrow.parquet as pq

    x_lo, x_hi, y_lo, y_hi = box
    files = sorted(glob.glob(f"{path}/*.parquet"))
    rg_total = rg_hit = 0
    file_hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        f_any = False
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sx = rg.column(names["x"]).statistics
            sy = rg.column(names["y"]).statistics
            rg_total += 1
            if sx.min <= x_hi and sx.max >= x_lo and sy.min <= y_hi and sy.max >= y_lo:
                rg_hit += 1
                f_any = True
        if f_any:
            file_hit += 1
    return {
        "files": len(files),
        "files_hit": file_hit,
        "row_groups": rg_total,
        "row_groups_hit": rg_hit,
        "rg_hit_frac": round(rg_hit / max(rg_total, 1), 4),
    }


def timed_box_count(spark, path: str, box: tuple[int, int, int, int], k: int = 3):
    from pyspark.sql import functions as F

    x_lo, x_hi, y_lo, y_hi = box
    best = float("inf")
    n = -1
    for _ in range(k):
        t0 = time.time()
        n = (
            spark.read.parquet(path)
            .filter(
                (F.col("x").between(x_lo, x_hi)) & (F.col("y").between(y_lo, y_hi))
            )
            .count()
        )
        best = min(best, time.time() - t0)
    return n, round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--box-frac", type=float, default=0.0625)
    ap.add_argument("--out", default="/dev/shm/wf_zorder_bench")
    args = ap.parse_args()

    from webfilter.session import get_spark
    from webfilter.zorder import zorder_write

    spark = get_spark("bench-zorder", cores=args.cores)
    base = Path(args.out)
    shutil.rmtree(base, ignore_errors=True)
    lin, zor = str(base / "linear"), str(base / "zorder")

    df = synth_xy(spark, args.rows)
    write_linear(df, lin, args.files)
    zorder_write(
        df, zor, ["x", "y"], bits=12, n_files=args.files,
        options={"parquet.block.size": str(ROW_GROUP_BYTES)},
    )

    side = max(1, int(DOMAIN * args.box_frac))
    # 2-D box: the linear layout prunes on x only; z-order prunes on
    # both dims multiplicatively.
    box = (DOMAIN // 4, DOMAIN // 4 + side - 1, DOMAIN // 2, DOMAIN // 2 + side - 1)
    # y-only slice: the adversarial case for any x-sorted layout —
    # every x-sorted row group spans the full y domain, pruning zero.
    y_slice = (0, DOMAIN - 1, DOMAIN // 2, DOMAIN // 2 + side - 1)

    probes = {}
    for name, b in (("box_2d", box), ("y_slice", y_slice)):
        prune_lin = footer_pruning(lin, b)
        prune_zor = footer_pruning(zor, b)
        n_lin, t_lin = timed_box_count(spark, lin, b)
        n_zor, t_zor = timed_box_count(spark, zor, b)
        assert n_lin == n_zor, (name, n_lin, n_zor)
        probes[name] = {
            "predicate": list(b),
            "selectivity": round(n_lin / args.rows, 5),
            "matched_rows": n_lin,
            "linear": {**prune_lin, "scan_s_best": t_lin},
            "zorder": {**prune_zor, "scan_s_best": t_zor},
            "rg_pruning_gain": round(
                prune_lin["rg_hit_frac"] / max(prune_zor["rg_hit_frac"], 1e-9), 1
            ),
        }

    out = {
        "metric": "zorder_box_pruning",
        "rows": args.rows,
        "files": args.files,
        "row_group_bytes": ROW_GROUP_BYTES,
        **probes,
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "zorder.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
