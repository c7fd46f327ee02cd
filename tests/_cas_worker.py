"""Subprocess worker for the cross-process snapshot-commit race test
(tests/test_snaptable_multiproc.py). Each worker is a REAL separate
driver process with its own SparkSession committing to the same table
— the topology the in-process fuzz (tests/test_snaptable.py) cannot
reproduce (VERDICT r4 next-round #5).

argv: root name worker_id n_appends n_merges
Phase 1: n_appends one-row appends (auto-retry on CAS loss inside
_commit). Phase 2: n_merges merge_upserts on SHARED keys (content-
replacing commits: CommitConflict surfaces to us and we re-derive +
retry, the documented caller contract). Prints one JSON line with the
committed snapshot seqs per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    root, name, wid, n_app, n_mrg = sys.argv[1:6]
    n_app, n_mrg = int(n_app), int(n_mrg)

    from webfilter.session import get_spark
    from webfilter.snaptable import CommitConflict, SnapshotTable

    spark = get_spark(f"cas-worker-{wid}", cores=2, shuffle_partitions=2)
    t = SnapshotTable(spark, root, name)

    # barrier: both workers must be fully up (JVM warm) before either
    # commits, or the slower starter sees no contention at all
    Path(root, f"ready-{wid}").touch()
    while not os.path.exists(os.path.join(root, "go")):
        time.sleep(0.05)

    app_seqs = []
    for k in range(n_app):
        df = spark.createDataFrame(
            [(f"w{wid}-a{k}", wid, k, 0)],
            "url string, worker string, k int, bucket int",
        )
        app_seqs.append(t.append(df, part_col="bucket"))

    mrg_seqs = []
    for k in range(n_mrg):
        # B's order value strictly dominates A's for every shared key,
        # so the merged survivor is B's row REGARDLESS of commit
        # interleaving — a commit-order-free invariant the parent
        # test can assert (equal order values would leave the
        # survivor to window tiebreak, which is not the contract
        # under test)
        df = spark.createDataFrame(
            [(f"shared-{k}", wid, k + (100 if wid == "B" else 0), 0)],
            "url string, worker string, k int, bucket int",
        )
        while True:
            try:
                mrg_seqs.append(
                    t.merge_upsert(
                        df, key_cols=["url"], order_cols=["k"],
                        part_col="bucket",
                    )
                )
                break
            except CommitConflict:
                continue  # re-derive against the advanced table

    print(json.dumps({"worker": wid, "appends": app_seqs, "merges": mrg_seqs}))
    spark.stop()


if __name__ == "__main__":
    main()
