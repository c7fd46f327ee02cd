"""End-to-end training-export composition (jobs/export_training.py):
survivors -> decontaminate -> split -> packed shards, validated with
DuckDB (independent engine) like the driver's oracle gate."""

from __future__ import annotations

import json

import duckdb
import pytest


@pytest.fixture(scope="module")
def export_out(spark, synth_dir, tmp_path_factory):
    from webfilter import pipeline

    root = tmp_path_factory.mktemp("export")
    run_root = str(root / "run")
    pipeline.run_filter(
        spark, f"{synth_dir}/pages.parquet", run_root, n_buckets=8, run_id="e"
    )
    pipeline.run_near_dedup(spark, run_root, n_buckets=8, run_id="e")

    import jobs.export_training as job

    out = str(root / "shards")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = job.main(
            [
                "--in", run_root, "--export", out, "--synth", "0",
                "--capacity", "512", "--buckets", "8",
            ]
        )
    assert rc == 0
    line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    return json.loads(line), out, run_root


def test_export_shards_on_disk(export_out):
    stats, out, _ = export_out
    assert stats["docs_in"] > 0
    assert stats["docs_out"] == stats["docs_in"]  # no --benchmark -> no drops
    assert set(stats["splits"]) == {"train", "val", "test"}
    assert stats["splits"]["train"]["docs"] > stats["splits"]["val"]["docs"]


def test_export_split_and_tokens_match_duckdb(export_out):
    _, out, _ = export_out
    con = duckdb.connect()
    shards = f"{out}/shards.parquet/*/*/*.parquet"
    ok, n = con.execute(
        f"""
        SELECT sum((split = expected)::int), count(*) FROM (
          SELECT split,
            CASE WHEN CAST(('0x' || substring(md5(url),1,8)) AS BIGINT) % 100 < 80
                   THEN 'train'
                 WHEN CAST(('0x' || substring(md5(url),1,8)) AS BIGINT) % 100 < 90
                   THEN 'val'
                 ELSE 'test' END AS expected
          FROM read_parquet('{shards}'))"""
    ).fetchone()
    assert ok == n and n > 0
    ok, n = con.execute(
        f"""
        SELECT sum((n_tokens = CASE WHEN trim(text)='' THEN 0
          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)::int), count(*)
        FROM read_parquet('{shards}')"""
    ).fetchone()
    assert ok == n


def test_export_decontaminates(spark, export_out, tmp_path):
    """A benchmark built from exact slices of some survivors must
    remove exactly those survivors from the export."""
    import pandas as pd

    _, _, run_root = export_out
    from pyspark.sql import functions as F

    from webfilter.tables import ParquetCatalog

    kept = ParquetCatalog(spark, run_root).read("kept_pages")
    leak = (
        kept.orderBy("url").limit(5)
        .select(F.substring("scrubbed_text", 1, 300).alias("text"), "url")
        .toPandas()
    )
    bench_path = str(tmp_path / "bench.parquet")
    spark.createDataFrame(leak[["text"]]).write.parquet(bench_path)

    import contextlib
    import io

    import jobs.export_training as job

    out = str(tmp_path / "clean_shards")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        job.main(
            [
                "--in", run_root, "--export", out, "--benchmark", bench_path,
                "--capacity", "512", "--buckets", "8",
            ]
        )
    stats = json.loads(
        [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    )
    # every leaked doc has >= 300 chars of verbatim overlap -> dropped
    # (other docs sharing the slice's 8-grams may legally drop too)
    assert stats["dropped_contaminated"] >= 5
    con = duckdb.connect()
    out_urls = {
        r[0]
        for r in con.execute(
            f"SELECT url FROM read_parquet('{out}/shards.parquet/*/*/*.parquet')"
        ).fetchall()
    }
    assert not (set(leak["url"]) & out_urls)


def test_packs_do_not_straddle_splits(spark, export_out):
    """Pack integrity (code-review r4c9 finding #1): within each
    (split, pack_bucket), doc token spans tile contiguously —
    start_off resumes exactly where the previous doc ended (mod
    capacity) — which only holds when packing runs AFTER the split
    assignment."""
    _stats, out, _run = export_out
    shards = spark.read.parquet(f"{out}/shards.parquet")
    rows = shards.select(
        "split", "pack_bucket", "pack_id", "start_off", "n_tokens", "url"
    ).collect()
    capacity = 512  # the fixture's --capacity
    by_stream: dict = {}
    for r in rows:
        by_stream.setdefault((r["split"], r["pack_bucket"]), []).append(r)
    checked = 0
    for (_sp, _b), docs in by_stream.items():
        docs.sort(key=lambda r: (r["pack_id"], r["start_off"], r["url"]))
        cum = 0
        for r in docs:
            assert r["pack_id"] == cum // capacity, r
            assert r["start_off"] == cum % capacity, r
            cum += r["n_tokens"]
            checked += 1
    assert checked == len(rows) > 0
