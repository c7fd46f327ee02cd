"""Keyed monotonic MERGE-upsert semantics + dedup order-insensitivity
property (SURVEY §5 item 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webfilter import dedup
from webfilter.tables import ParquetCatalog, merge_upsert_pages


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts string, html binary, text string, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))


def test_merge_upsert_monotonic(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    merge_upsert_pages(cat, _df(spark, [
        ("u1", "2024-01-01 00:00:00", b"v1", "", "en"),
        ("u2", "2024-01-01 00:00:00", b"v1", "", "en"),
    ]))
    # newer u1 wins; older u2 is a no-op; u3 inserts
    merge_upsert_pages(cat, _df(spark, [
        ("u1", "2024-02-01 00:00:00", b"v2", "", "en"),
        ("u2", "2023-12-01 00:00:00", b"v0", "", "en"),
        ("u3", "2024-01-15 00:00:00", b"v1", "", "en"),
    ]))
    got = {r["url"]: bytes(r["html"]) for r in cat.read("pages").collect()}
    assert got == {"u1": b"v2", "u2": b"v1", "u3": b"v1"}
    # replay of the same batch changes nothing (idempotent)
    merge_upsert_pages(cat, _df(spark, [
        ("u1", "2024-02-01 00:00:00", b"v2", "", "en"),
    ]))
    again = {r["url"]: bytes(r["html"]) for r in cat.read("pages").collect()}
    assert again == got


def test_exact_dedup_order_insensitive(spark):
    rows = [(i, f"text {i % 7}") for i in range(50)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, text string").repartition(7)
    kept_a = sorted(r["doc_id"] for r in dedup.exact_dedup(a).collect())
    kept_b = sorted(r["doc_id"] for r in dedup.exact_dedup(b).collect())
    assert kept_a == kept_b
    assert len(kept_a) == 7


def test_merge_touches_only_affected_buckets(spark, tmp_path):
    """VERDICT r1 #5: the upsert must be a per-bucket merge, not a
    full-table rewrite — bucket partitions absent from the update
    batch keep their exact files."""
    import os

    cat = ParquetCatalog(spark, str(tmp_path))
    seed = _df(spark, [
        (f"http://h{i}.example/p", "2024-01-01 00:00:00", b"v1", "", "en")
        for i in range(40)
    ])
    merge_upsert_pages(cat, seed, n_buckets=8)
    root = cat.path("pages")
    before = {
        d: sorted((f, os.path.getmtime(f"{root}/{d}/{f}")) for f in os.listdir(f"{root}/{d}"))
        for d in os.listdir(root) if d.startswith("bucket_id=")
    }
    assert len(before) > 2  # several buckets exist

    # one-url update -> exactly one bucket rewritten
    merge_upsert_pages(cat, _df(spark, [
        ("http://h0.example/p", "2024-02-01 00:00:00", b"v2", "", "en"),
    ]), n_buckets=8)
    after = {
        d: sorted((f, os.path.getmtime(f"{root}/{d}/{f}")) for f in os.listdir(f"{root}/{d}"))
        for d in os.listdir(root) if d.startswith("bucket_id=")
    }
    changed = [d for d in before if before[d] != after.get(d)]
    assert len(changed) == 1, f"rewrote {changed}"
    # and the merge result is still correct
    got = {r["url"]: bytes(r["html"]) for r in cat.read("pages").collect()}
    assert got["http://h0.example/p"] == b"v2"
    assert len(got) == 40


def test_snapshot_history_log(spark, tmp_path):
    """S15: every table commit lands in the catalog snapshot log,
    newest first, monotonic ids — the parquet mirror of Iceberg's
    <table>.snapshots metadata table."""
    cat = ParquetCatalog(spark, str(tmp_path))
    merge_upsert_pages(cat, _df(spark, [("u1", "2024-01-01 00:00:00", b"v1", "", "en")]), n_buckets=4)
    merge_upsert_pages(cat, _df(spark, [("u1", "2024-02-01 00:00:00", b"v2", "", "en")]), n_buckets=4)
    h = cat.history("pages")
    assert len(h) == 2
    assert all(r["operation"] == "overwrite_partitions" for r in h)
    assert h[0]["snapshot_id"] > h[1]["snapshot_id"]  # newest first
    assert h[0]["committed_at"] >= h[1]["committed_at"]
    assert cat.history("nonexistent") == []


def test_layout_sort_gives_rowgroup_skipping(spark, synth_dir, tmp_path):
    """layout_sort clusters each bucket file on the sort column, so
    parquet row-group min/max stats become non-overlapping ranges —
    the property a reader's range predicate skips on. Also proves the
    sort changes ONLY row order: decision content is identical to the
    unsorted run."""
    import glob

    import pyarrow.parquet as pq

    from webfilter import pipeline

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    # force several small row groups per bucket file
    hconf.set("parquet.block.size", str(16 * 1024))
    try:
        for name, ls in (("plain", None), ("sorted", ["perplexity"])):
            pipeline.run_filter(
                spark, f"{synth_dir}/pages.parquet", str(tmp_path / name),
                n_buckets=4, run_id=name, layout_sort=ls,
            )
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)

    def rg_ranges(root):
        out = []
        for f in sorted(glob.glob(f"{root}/decisions.parquet/*/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            rgs = []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx["perplexity"]).statistics
                rgs.append((st.min, st.max))
            out.append(rgs)
        return out

    sorted_files = rg_ranges(tmp_path / "sorted")
    multi = [rgs for rgs in sorted_files if len(rgs) > 1]
    assert multi, "test needs >1 row group per file; shrink block size"
    for rgs in multi:  # clustered: ranges are non-overlapping, ascending
        for (lo1, hi1), (lo2, hi2) in zip(rgs, rgs[1:]):
            assert hi1 <= lo2, f"overlapping row groups {((lo1, hi1), (lo2, hi2))}"

    # content identical, only order differs
    a = spark.read.parquet(str(tmp_path / "plain" / "decisions.parquet"))
    b = spark.read.parquet(str(tmp_path / "sorted" / "decisions.parquet"))
    cols = [c for c in a.columns if c != "run_id"]
    assert a.select(cols).exceptAll(b.select(cols)).isEmpty()
    assert b.select(cols).exceptAll(a.select(cols)).isEmpty()


def _files_of(path: str) -> dict[str, float]:
    import glob
    import os

    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
    }


def test_compact_unpartitioned_merges_small_files(spark, tmp_path):
    """20 tiny appends -> compact -> 1 file, identical content, a
    'compact' snapshot logged, and a row-count guard that refuses to
    swap in a bad rewrite."""
    cat = ParquetCatalog(spark, str(tmp_path))
    for i in range(20):
        cat.append(spark.range(i * 10, i * 10 + 10).toDF("v"), "t")
    before = sorted(
        r["v"] for r in cat.read("t").collect()
    )
    stats = cat.compact("t")
    assert stats["files_before"] >= 20
    assert stats["files_after"] == 1
    assert stats["rows"] == 200
    after = sorted(r["v"] for r in cat.read("t").collect())
    assert after == before == list(range(200))
    assert cat.history("t")[0]["operation"] == "compact"
    # idempotent: nothing left to do
    again = cat.compact("t")
    assert again["partitions_rewritten"] == 0
    assert again["files_after"] == 1


def test_compact_partitioned_rewrites_only_fragmented(spark, tmp_path):
    """Fragmented partitions collapse to one file each; an untouched
    partition keeps its EXACT files (same paths, same mtimes) — the
    dynamic-overwrite guarantee resume depends on."""
    cat = ParquetCatalog(spark, str(tmp_path))
    big = spark.range(1000).select(
        F.lit(0).alias("b"), F.col("id").alias("v")
    ).coalesce(1)
    cat.overwrite_partitions(big, "t", "b")
    untouched = {
        f: m for f, m in _files_of(cat.path("t")).items() if "/b=0/" in f
    }
    # fragment partitions 1 and 2 with 5 tiny appends each
    for i in range(5):
        for b in (1, 2):
            cat.append(
                spark.range(i * 10, i * 10 + 10).select(
                    F.lit(b).alias("b"), F.col("id").alias("v")
                ),
                "t",
                part_col="b",
            )
    rows_before = cat.read("t").count()
    stats = cat.compact("t", part_col="b")
    assert stats["partitions_rewritten"] == 2
    assert stats["rows"] == rows_before == 1100
    files = _files_of(cat.path("t"))
    per_part = {}
    for f in files:
        part = f.split("/b=")[1].split("/")[0]
        per_part[part] = per_part.get(part, 0) + 1
    assert per_part["1"] == 1 and per_part["2"] == 1
    # partition 0: same files, same mtimes
    now0 = {f: m for f, m in files.items() if "/b=0/" in f}
    assert now0 == untouched
    assert cat.read("t").count() == 1100


def test_iceberg_available_probe_actually_loads(spark):
    """The py4j attribute walk never raises for missing classes (a
    JavaPackage stub comes back), so the probe must force
    Class.forName — in this jar-less sandbox it must say False
    (code-review r4c3 finding #4, reproduced pre-fix)."""
    from webfilter.tables import iceberg_available

    assert iceberg_available(spark) is False


def test_merge_upsert_empty_updates_is_noop(spark, tmp_path):
    """An empty update batch must not create a _SUCCESS-only dir that
    exists() reports as a table but read() cannot infer a schema
    from (code-review r4c3 finding #5)."""
    from webfilter.tables import ParquetCatalog, merge_upsert_pages

    cat = ParquetCatalog(spark, str(tmp_path))
    empty = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    merge_upsert_pages(cat, empty, name="pages")
    assert not cat.exists("pages")
    # and on an existing table: content unchanged
    rows = spark.createDataFrame(
        [("http://a/1", "2024-01-01 00:00:00", b"x", None, "en")],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    merge_upsert_pages(cat, rows, name="pages")
    merge_upsert_pages(cat, empty, name="pages")
    assert cat.read("pages").count() == 1


def test_compact_handles_fragmented_null_partition(spark, tmp_path):
    """compact() on an int partition column with a fragmented NULL
    partition must not crash on int('__HIVE_DEFAULT_PARTITION__')
    (code-review r4c3 finding #6)."""
    from webfilter.tables import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 7)], "id long, part int"
    )
    # two appends -> >=2 small files per partition dir
    cat.append(df, "t", part_col="part")
    cat.append(df, "t", part_col="part")
    before = sorted(tuple(r) for r in cat.read("t").collect())
    stats = cat.compact("t", part_col="part")
    assert stats["partitions_rewritten"] >= 1
    assert sorted(tuple(r) for r in cat.read("t").collect()) == before
