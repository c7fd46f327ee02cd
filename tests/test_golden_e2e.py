"""Golden-label end-to-end gates (SURVEY.md §5 item 2, BASELINE.md §2):

* keep/drop F1 >= 0.99 vs golden labels,
* extracted text byte-identical per url,
* scrubbed text byte-identical per url,
* langid accuracy on language-known docs,
* model-rule reason membership for gibberish / non-English docs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webfilter.tables import ParquetCatalog


@pytest.fixture(scope="module")
def joined(spark, synth_dir, pipeline_out):
    golden = spark.read.parquet(f"{synth_dir}/golden.parquet")
    dec = ParquetCatalog(spark, pipeline_out).read("decisions")
    j = dec.alias("d").join(golden.alias("g"), "url").cache()
    j.count()
    return j


def test_row_coverage(joined, spark, synth_dir):
    golden = spark.read.parquet(f"{synth_dir}/golden.parquet")
    assert joined.count() == golden.count()


def test_keep_f1(joined):
    agg = joined.select(
        F.sum((F.col("d.keep") & F.col("g.keep")).cast("int")).alias("tp"),
        F.sum((F.col("d.keep") & ~F.col("g.keep")).cast("int")).alias("fp"),
        F.sum((~F.col("d.keep") & F.col("g.keep")).cast("int")).alias("fn"),
    ).collect()[0]
    precision = agg["tp"] / max(agg["tp"] + agg["fp"], 1)
    recall = agg["tp"] / max(agg["tp"] + agg["fn"], 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} (p={precision:.4f}, r={recall:.4f})"


def test_extracted_text_byte_identical(joined):
    bad = joined.filter(F.col("d.text") != F.col("g.expected_text")).count()
    assert bad == 0


def test_scrubbed_text_byte_identical(joined):
    bad = joined.filter(F.col("d.scrubbed_text") != F.col("g.expected_scrubbed")).count()
    assert bad == 0


def test_langid_accuracy(joined):
    """Language must be recovered from the *text* (the claimed lang
    column is wrong 10% of the time by construction) — on docs whose
    content has a language (skip gibberish)."""
    scored = joined.filter(F.col("g.category") != "gibberish")
    n = scored.count()
    ok = scored.filter(F.col("d.langid") == F.col("g.lang_true")).count()
    assert ok / n >= 0.99, f"langid accuracy {ok / n:.4f}"


def test_model_rule_reasons(joined):
    non_en = joined.filter(F.col("g.category") == "non_en")
    miss = non_en.filter(~F.array_contains("d.drop_reasons", "lang")).count()
    assert miss / max(non_en.count(), 1) <= 0.01
    gib = joined.filter(F.col("g.category") == "gibberish")
    miss = gib.filter(~F.array_contains("d.drop_reasons", "perplexity")).count()
    assert miss / max(gib.count(), 1) <= 0.01


def test_pii_scrubbed_and_kept(joined):
    pii = joined.filter(F.col("g.has_pii"))
    assert pii.count() > 0
    # scrub must have changed the text and the doc must still be kept
    unchanged = pii.filter(F.col("d.scrubbed_text") == F.col("d.text")).count()
    assert unchanged == 0
    dropped = pii.filter(~F.col("d.keep")).count()
    assert dropped / pii.count() <= 0.01


def test_audit_totals(spark, pipeline_out, joined):
    audit = ParquetCatalog(spark, pipeline_out).read("audit")
    tot = audit.agg(F.sum("n_docs").alias("n"), F.sum("n_kept").alias("k")).collect()[0]
    assert tot["n"] == joined.count()
    kept = joined.filter(F.col("d.keep")).count()
    assert tot["k"] == kept


def test_audit_rule_hit_lineage(spark, pipeline_out, joined):
    """The north rule's per-partition 'rule hits' lineage: audit's
    reason_counts map must reproduce the exact per-rule drop counts
    recomputable from the decision rows."""
    audit = ParquetCatalog(spark, pipeline_out).read("audit")
    got: dict[str, int] = {}
    for r in audit.select("reason_counts").collect():
        for rule, n in (r["reason_counts"] or {}).items():
            got[rule] = got.get(rule, 0) + n
    expected = {
        r["reason"]: r["n"]
        for r in (
            joined.select(F.explode("d.drop_reasons").alias("reason"))
            .groupBy("reason")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert expected, "synth corpus must exercise at least one rule"
    assert {k: v for k, v in got.items() if v} == expected


def test_host_audit_covers_hot_hosts(spark, pipeline_out):
    host_audit = ParquetCatalog(spark, pipeline_out).read("host_audit")
    rows = {r["host"]: r["n_rows"] for r in host_audit.collect()}
    from webfilter.synth import HOT_HOSTS

    hot = sum(rows.get(h, 0) for h in HOT_HOSTS)
    assert hot / sum(rows.values()) > 0.25  # skew actually present
