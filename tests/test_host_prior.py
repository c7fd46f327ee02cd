"""Host-authority prior in the filter pipeline (VERDICT r3 #9):
PageRank over the corpus's own link graph joined as a host_rank
decision column, optionally gating via RuleConfig.min_host_rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webfilter import pipeline, rules


@pytest.fixture(scope="module")
def pages(spark, synth_dir):
    return spark.read.parquet(f"{synth_dir}/pages.parquet")


def test_default_off_golden_unchanged(spark, pages):
    """host_prior off: host_rank is NULL and keep decisions are
    byte-for-byte those of the pre-host-prior pipeline."""
    base = pipeline.filtered_frame(pages)
    assert "host_rank" in base.columns
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("host_rank").alias("non_null"),
    ).collect()[0]
    assert agg["non_null"] == 0 and agg["n"] > 0


def test_host_prior_joins_real_ranks(spark, pages):
    """With the prior on, every doc of a linked host carries its
    host's rank, ranks sum to ~1 across hosts, and hot hosts (the
    synthetic corpus links ~60% of docs to the first hot host)
    outrank cold ones. keep/drop is unchanged without a gate."""
    on = pipeline.filtered_frame(pages, host_prior=True)
    rows = (
        on.select("url", "host_rank", "keep")
        .withColumn("host", F.regexp_extract("url", r"https://([^/]+)/", 1))
        .collect()
    )
    by_host = {}
    for r in rows:
        if r["host_rank"] is not None:
            by_host[r["host"]] = r["host_rank"]
    assert by_host, "no host ranks joined"
    hot = by_host.get("big-portal.example.com")
    assert hot is not None
    top = max(by_host, key=by_host.get)
    assert top == "big-portal.example.com", (top, by_host[top], hot)
    # docs' hosts hold most but not all rank mass: link TARGETS with
    # no pages in the corpus are graph nodes too and keep their share
    assert 0.5 < sum(by_host.values()) <= 1.0 + 1e-9

    base_keep = {
        r["url"]: r["keep"]
        for r in pipeline.filtered_frame(pages).select("url", "keep").collect()
    }
    assert all(base_keep[r["url"]] == r["keep"] for r in rows)


def test_min_host_rank_gates(spark, pages):
    """A threshold above the cold-host rank drops cold-host docs with
    a host_rank reason and keeps hot-host survivors."""
    on = pipeline.filtered_frame(pages, host_prior=True)
    hot_rank = (
        on.filter(F.col("url").contains("big-portal"))
        .select("host_rank")
        .first()["host_rank"]
    )
    cold_max = (
        on.filter(~F.col("url").rlike("big-portal|mega-news|hub\\.example"))
        .agg(F.max("host_rank"))
        .collect()[0][0]
    )
    thr = (cold_max + hot_rank) / 2
    assert cold_max < thr < hot_rank

    cfg = rules.RuleConfig(min_host_rank=thr)
    gated = pipeline.filtered_frame(pages, cfg=cfg)  # auto-enables the join
    out = gated.select("url", "keep", "drop_reasons").collect()
    for r in out:
        if "big-portal" not in r["url"]:
            assert not r["keep"]
            assert "host_rank" in r["drop_reasons"]


def test_prior_join_is_broadcast(spark, pages):
    """The host dim must broadcast — the pages side never shuffles
    for this join."""
    import io
    from contextlib import redirect_stdout

    df = pipeline.filtered_frame(pages, host_prior=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
