"""Partition-level checkpoint manifest: the resume/idempotency engine.

The reference resumes row-level: a PENDING/DOWNLOADED status column
plus a left-anti join of metadata against the target table
(03_Curate_Articles.py:64-65, pmc.py:150-151). That anti-join is
O(rows) and does not survive 10^12 rows (SURVEY.md §4), so we promote
the frontier to *bucket* granularity: the manifest holds <= n_buckets
rows per stage, the anti-join becomes a driver-side set difference,
and the pages table is only ever filtered by a pushed-down
``bucket_id IN (...)`` predicate (partition pruning on the Iceberg
bucket spec).

Crash safety: status rows are append-only (latest updated_at wins);
a bucket is DONE only after its output partition is fully rewritten,
and rewrites are idempotent (dynamic partition overwrite), so a
kill at any point re-runs at most the in-flight buckets.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .tables import ParquetCatalog

MANIFEST_SCHEMA = (
    "run_id string, stage string, bucket_id int, status string, "
    "attempt int, updated_at timestamp"
)

PENDING, RUNNING, DONE, ERROR = "PENDING", "RUNNING", "DONE", "ERROR"


class Manifest:
    def __init__(self, catalog: ParquetCatalog, name: str = "manifest"):
        self.catalog = catalog
        self.name = name
        self._state_cache: dict[int, tuple[str, int]] | None = None

    def _read_state(self) -> dict[int, tuple[str, int]]:
        """bucket_id -> (status, attempt), latest row per bucket.
        Bounded: <= n_buckets * attempts rows total — driver-side
        collect is safe by design (never row-level). Cached within
        this Manifest instance; every mark() updates the cache."""
        if self._state_cache is not None:
            return self._state_cache
        if not self.catalog.exists(self.name):
            return {}
        df = self.catalog.read(self.name)
        w_latest = (
            df.groupBy("bucket_id")
            .agg(F.max(F.struct("updated_at", "attempt", "status")).alias("s"))
            .select("bucket_id", "s.status", "s.attempt")
        )
        self._state_cache = {
            r["bucket_id"]: (r["status"], r["attempt"])
            for r in w_latest.collect()
        }
        return self._state_cache

    def pending_buckets(self, n_buckets: int) -> list[int]:
        state = self._read_state()
        return [b for b in range(n_buckets) if state.get(b, (PENDING, 0))[0] != DONE]

    def mark(self, run_id: str, stage: str, bucket_ids: list[int], status: str) -> None:
        if not bucket_ids:
            return
        state = self._read_state()
        spark = self.catalog.spark
        now = time.time()
        rows = [
            (run_id, stage, int(b), status, state.get(b, ("", 0))[1] + (status == RUNNING), None)
            for b in bucket_ids
        ]
        df = spark.createDataFrame(rows, MANIFEST_SCHEMA).withColumn(
            "updated_at", F.timestamp_seconds(F.lit(now))
        )
        self.catalog.append(df, self.name)
        cache = dict(state)
        for run, stage_, b, st, att, _ts in rows:
            cache[b] = (st, att)
        self._state_cache = cache
