"""Fetch-payload byte cap (RuleConfig.max_payload_bytes): oversize
pages are dropped with first-class lineage and their bytes never
enter an Arrow batch — the OOM guard for the record-count-sliced
pandas-UDF boundary at 10^12 pages."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from webfilter import pipeline, rules

TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

GOOD_HTML = (
    "<html><head><title>t</title></head><body><p>"
    + "the and for with this that from have words more text here now "
    * 12
    + "</p></body></html>"
).encode()


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, TS, h) for u, h in rows], "url string, warc_ts timestamp, html binary"
    )


def test_oversize_page_dropped_with_lineage(spark):
    big = b"<html><body>" + b"x" * 5000 + b"</body></html>"
    df = _pages(
        spark,
        [("http://a.com/big", big), ("http://a.com/ok", GOOD_HTML)],
    )
    cfg = rules.RuleConfig(max_payload_bytes=2000)
    out = {r["url"]: r for r in pipeline.filtered_frame(df, cfg=cfg).collect()}

    bigr = out["http://a.com/big"]
    assert not bigr["keep"]
    # the fetch gate leads the canonical drop_reasons order
    assert bigr["drop_reasons"][0] == "max_payload_bytes"
    assert bigr["extract_err"] == "oversize_payload"
    # extraction never saw the bytes: NULLed before the UDF
    assert bigr["text"] == ""

    okr = out["http://a.com/ok"]
    assert "max_payload_bytes" not in okr["drop_reasons"]
    assert okr["extract_err"] == ""


def test_cap_none_disables_and_defaults_are_invariant(spark):
    big = b"<html><body>" + b"y" * 5000 + b"</body></html>"
    df = _pages(spark, [("http://a.com/big", big), ("http://a.com/ok", GOOD_HTML)])

    uncapped = {
        r["url"]: r
        for r in pipeline.filtered_frame(
            df, cfg=rules.RuleConfig(max_payload_bytes=None)
        ).collect()
    }
    # without the cap the big page is extracted normally
    assert uncapped["http://a.com/big"]["extract_err"] == ""
    assert "max_payload_bytes" not in uncapped["http://a.com/big"]["drop_reasons"]

    # the 4 MiB default never fires on sane pages: decisions equal the
    # uncapped run column-for-column (golden invariance)
    default = {
        r["url"]: r for r in pipeline.filtered_frame(df).collect()
    }
    for url, ur in uncapped.items():
        dr = default[url]
        assert (dr["keep"], list(dr["drop_reasons"]), dr["text"], dr["scrubbed_text"]) == (
            ur["keep"], list(ur["drop_reasons"]), ur["text"], ur["scrubbed_text"]
        )


def test_wet_path_caps_text_bytes(spark):
    # octet_length counts UTF-8 bytes, not codepoints: 1000 'é' chars
    # = 2000 bytes, over a 1500-byte cap even though len() is 1000
    big_text = "é" * 1000
    ok_text = "the and for with this that from have words more text here " * 10
    df = spark.createDataFrame(
        [
            ("http://w.com/big", TS, None, big_text, None),
            ("http://w.com/ok", TS, None, ok_text, None),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    cfg = rules.RuleConfig(max_payload_bytes=1500)
    out = {
        r["url"]: r
        for r in pipeline.filtered_frame(df, cfg=cfg, pre_extracted=True).collect()
    }
    bigr = out["http://w.com/big"]
    assert not bigr["keep"]
    assert bigr["drop_reasons"][0] == "max_payload_bytes"
    assert bigr["extract_err"] == "oversize_payload"
    assert bigr["text"] is None  # bytes never shipped to the scorer
    assert out["http://w.com/ok"]["extract_err"] == "pre_extracted"
    assert "max_payload_bytes" not in out["http://w.com/ok"]["drop_reasons"]


def test_audit_counts_payload_rule_hits(spark, tmp_path):
    big = b"<html><body>" + b"z" * 5000 + b"</body></html>"
    pages = [(f"http://h{i}.com/ok", TS, GOOD_HTML) for i in range(6)] + [
        ("http://h0.com/big", TS, big)
    ]
    df = spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary"
    )
    src = tmp_path / "pages.parquet"
    df.write.parquet(str(src))
    res = pipeline.run_filter(
        spark,
        str(src),
        str(tmp_path / "out"),
        n_buckets=4,
        cfg=rules.RuleConfig(max_payload_bytes=2000),
        run_id="cap",
    )
    assert res["docs"] == 7
    audit = spark.read.parquet(str(tmp_path / "out" / "audit.parquet"))
    hits = 0
    for r in audit.select("reason_counts").collect():
        hits += (r["reason_counts"] or {}).get("max_payload_bytes", 0)
    assert hits == 1
