"""Structured-Streaming surface: incremental ingest with checkpoint
replay protection + watermarked windowed metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webfilter import streaming, synth


@pytest.fixture(scope="module")
def stream_src(spark, synth_dir, tmp_path_factory):
    """pages parquet split into several files = several micro-batches."""
    d = tmp_path_factory.mktemp("stream_src")
    pages = spark.read.parquet(f"{synth_dir}/pages.parquet")
    pages.repartition(6).write.mode("overwrite").parquet(str(d / "pages"))
    return str(d / "pages")


def test_ingest_stream_drains_and_upserts(spark, stream_src, tmp_path):
    out = tmp_path / "out"
    cp = tmp_path / "cp"
    streaming.run_ingest_stream(spark, stream_src, str(out), str(cp))
    got = spark.read.parquet(f"{out}/pages_stream.parquet")
    src = spark.read.parquet(stream_src)
    # every url arrived; within-batch dups collapsed by the monotonic rule
    assert got.select("url").distinct().count() == src.select("url").distinct().count()

    # re-run with same checkpoint: no new files -> no new rows (replay protection)
    n_before = got.count()
    streaming.run_ingest_stream(spark, stream_src, str(out), str(cp))
    assert spark.read.parquet(f"{out}/pages_stream.parquet").count() == n_before


def test_windowed_metrics(spark, stream_src, tmp_path):
    streaming.run_metrics_stream(spark, stream_src, "ingest_metrics", str(tmp_path / "cp2"))
    m = spark.sql("SELECT * FROM ingest_metrics")
    assert m.count() > 0
    src_n = spark.read.parquet(stream_src).count()
    # watermark append-mode may hold back the tail window; totals are
    # bounded by the source count and must cover most of it
    tot = m.agg(F.sum("n_pages")).collect()[0][0]
    assert 0 < tot <= src_n
    assert m.filter(F.col("bytes_in") <= 0).count() == 0


def test_file_metadata_virtual_columns(spark, synth_dir):
    """S2: _metadata.file_path/_modification_time/_size project into
    real provenance columns on a file-source scan."""
    from webfilter.streaming import with_file_provenance

    df = with_file_provenance(spark.read.parquet(f"{synth_dir}/pages.parquet"))
    row = df.select("src_file", "src_mtime", "src_size").first()
    assert row["src_file"].endswith(".parquet")
    assert row["src_size"] > 0
    assert row["src_mtime"] is not None
