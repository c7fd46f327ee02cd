"""spark-submit entry point for snapshot-table maintenance.

The table-maintenance surface of the from-scratch snapshot format
(webfilter/snaptable.py) as a drivable job — the operational loop a
10^12-doc Iceberg-style table needs besides writes:

    spark-submit --py-files webfilter.zip jobs/maintain_table.py \
        --root /path/warehouse --name decisions \
        [--ingest pages.parquet --part-col lang] \
        [--takedown urls.parquet --key-cols url] \
        [--rewrite [--max-rows-per-file N]] \
        [--compact-manifests] \
        [--vacuum --keep-last K [--grace SECONDS]] \
        [--history]

Actions run in the order listed above (ingest -> takedown ->
rewrite -> compact -> vacuum -> history) and the job prints ONE JSON
summary line.  Typical operational cadences:

* daily: ``--takedown todays_removals.parquet --key-cols url`` —
  merge-on-read equality deletes, no data rewrite (the GDPR path);
* weekly: ``--rewrite --compact-manifests`` — bin-pack small files
  from streaming epoch commits and materialize accumulated deletes;
* monthly: ``--vacuum --keep-last 30`` — expire snapshots, reclaim
  dead data/delete/manifest files (orphan grace protects in-flight
  concurrent commits).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

# Safe floor for --grace: must exceed the worst-case gap between a
# concurrent writer's LAST staged file and its publish rename
# (seconds in practice; 60 s is a generous bound — ADVICE r4)
MIN_GRACE_SECONDS = 60.0


def run(spark, args) -> dict:
    from webfilter.snaptable import SnapshotTable

    t = SnapshotTable(spark, args.root, args.name)
    out: dict = {"table": t.dir}
    if args.ingest:
        df = spark.read.parquet(args.ingest)
        out["ingest"] = {
            "snapshot": t.append(df, part_col=args.part_col),
            "rows": df.count(),
        }
    if args.takedown:
        keys = spark.read.parquet(args.takedown)
        key_cols = args.key_cols.split(",")
        out["takedown"] = {
            "snapshot": t.delete_rows(keys, key_cols),
            "keys": keys.select(*key_cols).distinct().count(),
            "delete_files_pending": t.delete_file_count(),
        }
    if args.rewrite:
        out["rewrite"] = t.rewrite_data_files(
            max_rows_per_file=args.max_rows_per_file,
        )
    if args.compact_manifests:
        out["compact_manifests"] = {"snapshot": t.compact_manifests()}
    if args.vacuum:
        out["vacuum"] = t.vacuum(
            keep_last=args.keep_last,
            orphan_grace_seconds=args.grace,
        )
    if args.history:
        out["history"] = [
            {k: s[k] for k in ("seq", "operation", "added_files", "added_rows")}
            for s in t.snapshots()
        ]
    cur = t.current_snapshot()
    out["current_snapshot"] = cur
    if cur is not None:
        out["live_files"] = t.file_count()
        out["live_delete_files"] = t.delete_file_count()
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="snapshot-table maintenance")
    ap.add_argument("--root", required=True, help="warehouse root dir")
    ap.add_argument("--name", required=True, help="table name under root")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--ingest", help="parquet path to append into the table")
    ap.add_argument("--part-col", default=None, help="partition column for --ingest")
    ap.add_argument(
        "--takedown",
        help="parquet of key tuples to row-level-delete (merge-on-read)",
    )
    ap.add_argument(
        "--key-cols", default="url",
        help="comma-separated delete key columns (default: url)",
    )
    ap.add_argument(
        "--rewrite", action="store_true",
        help="bin-pack data files + materialize pending deletes",
    )
    ap.add_argument("--max-rows-per-file", type=int, default=512_000)
    ap.add_argument("--compact-manifests", action="store_true")
    ap.add_argument("--vacuum", action="store_true")
    ap.add_argument("--keep-last", type=int, default=1)
    ap.add_argument(
        "--grace", type=float, default=86400.0,
        help="orphan grace seconds for --vacuum (files referenced by "
        "no snapshot are only reclaimed when older than this AND "
        "their staging dir has been quiet that long; floor "
        f"{MIN_GRACE_SECONDS:.0f}s — must exceed the worst-case gap "
        "between a writer's last staged file and its publish)",
    )
    ap.add_argument("--history", action="store_true")
    args = ap.parse_args(argv)
    if args.vacuum and args.grace < MIN_GRACE_SECONDS:
        # ADVICE r4: an operator-supplied tiny --grace could reclaim a
        # concurrent writer's staged files whose write outlives the
        # window; snaptable.vacuum now also requires the whole staging
        # dir to be quiet, but the job refuses unsafe values outright
        ap.error(
            f"--grace {args.grace:g} is below the safe floor "
            f"({MIN_GRACE_SECONDS:.0f}s); sub-floor graces are for "
            "tests on quiesced tables only (call "
            "SnapshotTable.vacuum directly)"
        )
    if not any(
        (args.ingest, args.takedown, args.rewrite,
         args.compact_manifests, args.vacuum, args.history)
    ):
        ap.error("no action given")

    from webfilter.session import get_spark

    spark = get_spark("maintain-table", cores=args.cores)
    print(json.dumps(run(spark, args)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
