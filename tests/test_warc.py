"""WARC/WET container round trip (webfilter/warc.py): byte-exact
serialize/parse identity, member-level independence, deterministic
container bytes, hostile-input quarantine, and disk ingestion via the
binaryFile source."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest

from pyspark.sql import functions as F

from webfilter import warc as W

TRICKY = [
    # CRLFs, a literal record header inside a body, unicode, empty
    ("https://a.example/1", "2024-03-01T00:00:01", "plain text"),
    ("https://a.example/2", "2024-03-01T00:00:02", "line1\r\nline2\nline3"),
    ("https://a.example/3", "2024-03-01T00:00:03",
     "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nnot a real record"),
    ("https://a.example/4", "2024-03-01T00:00:04", "héllo 世界 \U0001f600"),
    ("https://a.example/5", "2024-03-01T00:00:05", ""),
]


def _records_df(spark):
    df = spark.createDataFrame(
        [(u, pd.Timestamp(ts).to_pydatetime(), t) for u, ts, t in TRICKY],
        "url string, warc_ts timestamp, text string",
    )
    return df


def test_wet_roundtrip_exact(spark):
    files = W.wet_files(_records_df(spark), n_shards=3)
    got = {
        (r.url, pd.Timestamp(r.warc_ts), r.text, r.length)
        for r in W.parse_wet(files).collect()
    }
    want = {
        (u, pd.Timestamp(ts), t, len(t.encode("utf-8"))) for u, ts, t in TRICKY
    }
    assert got == want


def test_members_are_independently_decompressible(spark):
    rows = W.wet_files(_records_df(spark), n_shards=1).collect()
    assert len(rows) == 1 and rows[0].n_records == len(TRICKY)
    members = list(W.iter_members(bytes(rows[0].content)))
    # warcinfo prologue + one member PER record (the CC layout)
    assert len(members) == len(TRICKY) + 1
    assert members[0].startswith(b"WARC/1.0")
    assert b"WARC-Type: warcinfo" in members[0]
    # a single member can be inflated in isolation (range-read use)
    blob = bytes(rows[0].content)
    off = len(gzip.compress(members[0], compresslevel=6, mtime=0))
    assert gzip.decompress(blob[off:]).startswith(b"WARC/1.0")


def test_container_bytes_deterministic_across_partitioning(spark):
    df = _records_df(spark)
    a = {r.file: bytes(r.content) for r in W.wet_files(df, n_shards=2).collect()}
    b = {
        r.file: bytes(r.content)
        for r in W.wet_files(df.repartition(5), n_shards=2).collect()
    }
    assert a == b  # sorted-by-url shards + mtime-pinned gzip


def test_parse_skips_warcinfo_and_strict_raises_on_garbage(spark):
    good = W.wet_files(_records_df(spark), n_shards=1).collect()[0]
    corrupt = bytes(good.content)[: len(good.content) // 2]
    files = spark.createDataFrame(
        [("good.wet.gz", bytes(good.content)), ("bad.wet.gz", corrupt)],
        "file string, content binary",
    )
    # quarantine mode: the bad container drops, the good one parses
    out = W.parse_wet(files, strict=False).collect()
    assert {r.file for r in out} == {"good.wet.gz"}
    assert len(out) == len(TRICKY)
    # strict mode surfaces the corruption instead of hiding it
    with pytest.raises(Exception):
        W.parse_wet(files, strict=True).collect()
    # pure-python framing errors
    with pytest.raises(ValueError):
        list(W.iter_members(b"\x00not gzip at all"))
    assert W.parse_record(b"HTTP/1.1 200 OK\r\n\r\n") is None
    assert W.parse_record(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort") is None


def test_read_wet_from_disk_binaryfile(spark, tmp_path):
    files = W.wet_files(_records_df(spark), n_shards=2).collect()
    for r in files:
        (tmp_path / r.file).write_bytes(bytes(r.content))
    got = W.read_wet(spark, str(tmp_path / "*.warc.wet.gz"))
    assert got.count() == len(TRICKY)
    urls = {r.url for r in got.collect()}
    assert urls == {u for u, _, _ in TRICKY}


def test_warc_response_roundtrip_http_split(spark):
    pages = _records_df(spark).select(
        "url", "warc_ts", F.encode("text", "utf-8").alias("html")
    )
    files = W.warc_files(pages, n_shards=2)
    out = {r.url: r for r in W.parse_warc(files).collect()}
    assert len(out) == len(TRICKY)
    for u, _, t in TRICKY:
        r = out[u]
        assert r.status == 200
        assert r.content_type == "text/html"
        assert bytes(r.html) == t.encode("utf-8")


def test_stream_wet_incremental_discovery(spark, tmp_path):
    """stream_wet is the Auto-Loader-shaped S1 source over WET
    containers: first availableNow trigger lands all existing
    segments; a later trigger picks up ONLY segments that appeared
    since the checkpoint (nothing reprocessed — counts prove it)."""
    src = tmp_path / "wet"
    src.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drop(df, shards, prefix):
        for r in W.wet_files(df, n_shards=shards, prefix=prefix).collect():
            (src / r.file).write_bytes(bytes(r.content))

    def run_trigger():
        q = (
            W.stream_wet(spark, str(src), max_files=2)
            .writeStream.trigger(availableNow=True)
            .format("parquet")
            .option("checkpointLocation", ck)
            .option("path", out)
            .start()
        )
        q.awaitTermination(120)

    drop(_records_df(spark), 2, "SEG-A")
    run_trigger()
    first = spark.read.parquet(out).count()
    assert first == len(TRICKY)

    more = spark.createDataFrame(
        [("https://b.example/9", pd.Timestamp("2024-04-01").to_pydatetime(),
          "late segment")],
        "url string, warc_ts timestamp, text string",
    )
    drop(more, 1, "SEG-B")
    run_trigger()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == first + 1  # only the new segment was parsed
    assert {r.url for r in rows} == {u for u, _, _ in TRICKY} | {
        "https://b.example/9"
    }


# ------------------------------------------------------------- CDX index


def test_cdx_roundtrip_and_surt(spark):
    """CDXJ serialize∘parse is the identity on typed captures, and
    the SURT key makes same-domain urls lexicographic neighbors
    regardless of subdomain order."""
    caps = spark.createDataFrame(
        [
            ("https://News.Example.COM/a?x=1", "2024-03-01 00:00:01",
             "text/html", 200, "d1", 100),
            ("https://example.com/b", "2024-03-01 00:00:02",
             "text/plain", 404, "d2", 50),
            ("https://other.org/z", "2024-03-01 00:00:03",
             "application/pdf", 301, "d3", 9),
        ],
        "url string, warc_ts string, mime string, status int, "
        "digest string, length long",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = {r.url: r for r in W.parse_cdx(W.cdx_lines(caps)).collect()}
    assert len(out) == 3
    r = out["https://News.Example.COM/a?x=1"]
    assert r.surt == "com,example,news)/a?x=1"  # lowercased, reversed
    assert r.status == 200 and r.length == 100 and r.mime == "text/html"
    assert pd.Timestamp(r.capture_ts) == pd.Timestamp("2024-03-01 00:00:01")
    assert out["https://example.com/b"].surt == "com,example)/b"
    # same-domain neighbors under the surt sort
    surts = sorted(v.surt for v in out.values())
    assert surts[0].startswith("com,example") and surts[1].startswith(
        "com,example"
    )


def test_cdx_parse_tolerates_malformed_json(spark):
    lines = spark.createDataFrame(
        [("com,x)/a 20240101000000 {not json",),
         ("com,x)/b 20240101000001 " + '{"url": "https://x.com/b"}',)],
        "line string",
    )
    rows = {r.surt: r for r in W.parse_cdx(lines).collect()}
    assert rows["com,x)/a"].url is None  # PERMISSIVE null, no crash
    assert rows["com,x)/b"].url == "https://x.com/b"
    assert rows["com,x)/b"].status is None  # absent field -> NULL


def test_wet_pipeline_equals_html_pipeline(spark, synth_dir, tmp_path):
    """The 'Common Crawl drop -> decisions' path: serialize the
    golden EXPECTED text as WET containers, run the filter with
    input_format='wet', and every decision (keep label AND scrubbed
    text) must byte-match the html-path golden labels — identical
    text through the same score kernels yields identical decisions."""
    from webfilter import pipeline

    golden = spark.read.parquet(f"{synth_dir}/golden.parquet")
    pages = spark.read.parquet(f"{synth_dir}/pages.parquet").select(
        "url", "warc_ts"
    )
    records = pages.join(
        golden.select("url", F.col("expected_text").alias("text")), "url"
    ).select("url", "warc_ts", "text")
    wet_dir = tmp_path / "wet"
    wet_dir.mkdir()
    for r in W.wet_files(records, n_shards=4).collect():
        (wet_dir / r.file).write_bytes(bytes(r.content))

    out = str(tmp_path / "out")
    res = pipeline.run_filter(
        spark, str(wet_dir / "*.warc.wet.gz"), out, n_buckets=8,
        run_id="wetrun", input_format="wet",
    )
    n_urls = records.select("url").distinct().count()
    # synth pages contain recrawl duplicates of some urls; the
    # latest-per-url stage collapses them exactly as in the html path
    assert res["docs"] == n_urls
    dec = spark.read.parquet(f"{out}/decisions.parquet")
    j = dec.join(
        golden.select(
            "url",
            F.col("keep").alias("gkeep"),
            F.col("expected_scrubbed").alias("gscrub"),
        ),
        "url",
    )
    assert j.count() == n_urls
    assert j.filter(F.col("keep") != F.col("gkeep")).count() == 0
    assert j.filter(F.col("scrubbed_text") != F.col("gscrub")).count() == 0
    assert dec.filter(F.col("extract_err") != "pre_extracted").count() == 0


def test_wet_input_rejects_host_prior(spark, tmp_path):
    from webfilter import pipeline, rules

    with pytest.raises(ValueError):
        pipeline.run_filter(
            spark, str(tmp_path / "*.wet.gz"), str(tmp_path / "o"),
            n_buckets=4, input_format="wet", host_prior=True,
        )
    with pytest.raises(ValueError):
        pipeline.run_filter(
            spark, str(tmp_path / "*.wet.gz"), str(tmp_path / "o2"),
            n_buckets=4, input_format="nope",
        )


def test_quarantine_handles_missing_warc_date(spark):
    """A record without (or with garbage) WARC-Date is quarantined in
    strict=False instead of killing the task (code-review r4c7
    finding #1); strict=True still raises."""
    import gzip

    from webfilter.warc import parse_wet

    good = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://a/1\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 2\r\n"
        b"\r\nhi\r\n\r\n"
    )
    no_date = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://a/2\r\nContent-Length: 2\r\n"
        b"\r\nxx\r\n\r\n"
    )
    bad_date = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://a/3\r\nWARC-Date: n/a\r\n"
        b"Content-Length: 2\r\n\r\nyy\r\n\r\n"
    )
    content = b"".join(gzip.compress(m) for m in (good, no_date, bad_date))
    df = spark.createDataFrame(
        [("f.warc.wet.gz", content)], "file string, content binary"
    )
    rows = parse_wet(df, strict=False).collect()
    assert [r["url"] for r in rows] == ["http://a/1"]
    with pytest.raises(Exception, match="WARC-Date|missing"):
        parse_wet(df, strict=True).collect()


def test_writers_tolerate_null_url_and_ts(spark):
    from webfilter.warc import parse_wet, wet_files

    df = spark.createDataFrame(
        [(None, None, "body text"),
         ("http://a/1", "2024-01-01 00:00:00", "other")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    files = wet_files(df, n_shards=2)
    back = parse_wet(files).collect()
    assert len(back) == 2
