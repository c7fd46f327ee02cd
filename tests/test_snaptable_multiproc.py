"""Cross-PROCESS optimistic-concurrency proof for the snapshot table
(VERDICT r4 next-round #5): the in-process fuzz shares one JVM and one
filesystem view; this test runs TWO real driver processes (separate
SparkSessions, separate JVMs) committing to one table concurrently and
asserts no lost updates and a linearizable snapshot history.

The commit protocol under test is `_publish`'s hard-link CAS
(snaptable.py): os.link fails with FileExistsError for the losing
writer of a sequence number, appends auto-retry against the new
parent, content-replacing merges surface CommitConflict to the caller
for re-derivation — exactly what the reference dodges with
max_concurrent_runs=1 (06_Create_Sync_Job.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

N_APPENDS = 5
N_MERGES = 3


def test_two_driver_processes_race_without_lost_updates(spark, tmp_path):
    root = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_cas_worker.py"),
             root, "t", wid, str(N_APPENDS), str(N_MERGES)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=dict(os.environ, PYTHONPATH=str(REPO)),
        )
        for wid in ("A", "B")
    ]
    # release the barrier only once both JVMs are up
    deadline = time.time() + 240
    while not all(
        os.path.exists(os.path.join(root, f"ready-{w}")) for w in "AB"
    ):
        assert time.time() < deadline, "workers failed to start"
        for p in procs:
            assert p.poll() is None, "worker died before the barrier"
        time.sleep(0.2)
    Path(root, "go").touch()

    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-2000:]
        rec = json.loads(out.strip().splitlines()[-1])
        results[rec["worker"]] = rec

    from webfilter.snaptable import SnapshotTable

    t = SnapshotTable(spark, root, "t")

    # 1. linearizable history: seqs are exactly 0..max, each
    #    snapshot's parent is its predecessor, no gaps, no forks
    snaps = t.snapshots()
    seqs = [s["seq"] for s in snaps]
    assert seqs == list(range(len(seqs)))
    for s in snaps:
        assert s["parent"] == (s["seq"] - 1 if s["seq"] else None)

    # 2. every commit both workers report landed on a distinct seq
    claimed = (
        results["A"]["appends"] + results["A"]["merges"]
        + results["B"]["appends"] + results["B"]["merges"]
    )
    assert len(claimed) == len(set(claimed)) == 2 * (N_APPENDS + N_MERGES)
    assert sorted(claimed) == seqs

    # 3. no lost APPEND: all 2*N_APPENDS distinct rows present
    rows = {r["url"]: r for r in t.read().collect()}
    for w in "AB":
        for k in range(N_APPENDS):
            assert f"w{w}-a{k}" in rows, f"lost append w{w}-a{k}"

    # 4. no lost MERGE state: each shared key holds exactly one row,
    #    and it is B's (B's order value strictly dominates A's — see
    #    _cas_worker.py — so the survivor is interleaving-independent:
    #    B-first means A's later merge is a stale no-op, A-first means
    #    B's merge updates it; ANY other outcome is a lost update)
    for k in range(N_MERGES):
        row = rows[f"shared-{k}"]
        assert row["worker"] == "B" and row["k"] == 100 + k, (
            f"shared-{k}: expected B's dominant row, got {row}"
        )
    assert sum(1 for u in rows if u.startswith("shared-")) == N_MERGES
