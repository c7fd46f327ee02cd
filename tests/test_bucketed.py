"""Bucketed-table co-located joins (H-family physical hint).

The scale contract under test: after `write_bucketed` persists two
tables hash-bucketed by the same key with the same bucket count,
joining or aggregating on that key produces a physical plan with ZERO
Exchange nodes — the 100 TB join never reshuffles either side. A
mismatched bucket count must reintroduce the Exchange (negative
control), proving the assertion has teeth and the zero-Exchange plan
really comes from the catalog bucketing spec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webfilter.partitioning import colocated_join, write_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    pages = spark.range(4000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 97), F.lit(".com/p"), F.col("id"))
        .alias("url"),
        (F.col("id") % 13).alias("score"),
    )
    # per-url dim with partial coverage so outer joins differ from inner
    dim = spark.range(3000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 97), F.lit(".com/p"), F.col("id"))
        .alias("url"),
        (F.col("id") % 7).alias("label"),
    )
    write_bucketed(pages, "bt_pages", "url", 8, str(root / "pages"))
    write_bucketed(dim, "bt_dim", "url", 8, str(root / "dim"))
    write_bucketed(dim, "bt_dim16", "url", 16, str(root / "dim16"))
    yield spark
    for t in ("bt_pages", "bt_dim", "bt_dim16"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_has_zero_exchanges(bucketed):
    spark = bucketed
    j = colocated_join(spark, "bt_pages", "bt_dim", "url")
    plan = _plan(j)
    assert "SortMergeJoin" in plan, plan[:1500]
    assert plan.count("Exchange") == 0, plan[:2000]
    assert j.count() == 3000


def test_colocated_join_matches_plain_join(bucketed):
    spark = bucketed
    got = colocated_join(spark, "bt_pages", "bt_dim", "url", how="left").select(
        "url", "score", "label"
    )
    # same data joined WITHOUT bucket metadata (fresh DataFrames)
    want = (
        spark.table("bt_pages")
        .join(spark.table("bt_dim"), "url", "left")
        .select("url", "score", "label")
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    assert got.count() == 4000


def test_mismatched_bucket_count_reintroduces_exchange(bucketed):
    spark = bucketed
    j = colocated_join(spark, "bt_pages", "bt_dim16", "url")
    plan = _plan(j)
    assert plan.count("Exchange") >= 1, plan[:2000]
    assert j.count() == 3000  # still correct, just shuffled


def test_groupby_on_bucket_key_has_zero_exchanges(bucketed):
    spark = bucketed
    agg = spark.table("bt_pages").groupBy("url").agg(F.sum("score").alias("s"))
    plan = _plan(agg)
    assert plan.count("Exchange") == 0, plan[:2000]
    assert agg.count() == 4000


def test_unbucketed_scan_of_same_files_shuffles(bucketed, tmp_path_factory):
    """Reading the SAME parquet files path-wise (no catalog) loses
    the bucketing spec: the identical join now plans an Exchange —
    the zero-Exchange plans above come from the metadata, not luck."""
    spark = bucketed
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED bt_pages")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    )
    raw = spark.read.parquet(loc.replace("file:", ""))
    j = raw.hint("merge").join(spark.table("bt_dim"), "url")
    assert _plan(j).count("Exchange") >= 1
