"""Subprocess body for test_task_retry.py — runs in a FRESH JVM with
master local[4,2] (the ,2 enables task retries; the shared test
session's plain local[N] aborts the job on first task failure, which
is why this cannot run in-process).

Injects a real task-attempt failure AFTER the attempt has already
produced output batches, then asserts the committed table is exactly
right: retried tasks must replace, never duplicate or lose, the
failed attempt's partial output. Exits 0 and prints RETRY_OK on
success; any assertion failure propagates as a nonzero exit.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    marker, out = sys.argv[1], sys.argv[2]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4,2]")
        .appName("webfilter-retry-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small Arrow batches so partition 0's attempt streams SEVERAL
        # batches into the parquet writer before the injected failure
        # — a broken committer would leak that partial file
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 8).alias("bucket"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).repartition(4, "bucket")

    schema = df.schema

    def flaky(it):
        from pyspark import TaskContext

        tc = TaskContext.get()
        n = 0
        for pdf in it:
            if tc.attemptNumber() == 0 and tc.partitionId() == 0 and n >= 1:
                with open(marker, "a") as fh:
                    fh.write(f"attempt 0 failed after {n} batches\n")
                raise RuntimeError("injected executor failure (attempt 0)")
            n += 1
            yield pdf

    from webfilter.tables import ParquetCatalog

    cat = ParquetCatalog(spark, out)
    cat.overwrite_partitions(df.mapInPandas(flaky, schema), "pages_out", "bucket")

    back = spark.read.parquet(cat.path("pages_out"))
    got = sorted(r["doc_id"] for r in back.collect())
    assert got == list(range(200)), (
        f"committed rows wrong after retry: {len(got)} rows, "
        f"dupes={len(got) - len(set(got))}"
    )
    assert back.select("payload").distinct().count() == 200
    assert os.path.exists(marker), "injected failure never fired"
    print("RETRY_OK")


if __name__ == "__main__":
    main()
