"""Declarative-pipeline (Spark 4.1 SDP) definition of the webfilter
DAG: registration captures the right graph shape action-free, and the
local topological runner materializes every dataset with results
identical to the imperative `pipeline.filtered_frame` path. The real
`spark-pipelines` CLI backend is env-gated (`sdp_available`: no
grpcio/protobuf in this sandbox)."""

from __future__ import annotations

import pytest
from pyspark.pipelines.output import MaterializedView, StreamingTable
from pyspark.sql import functions as F

from webfilter import sdp


@pytest.fixture(scope="module")
def registry_and_run(spark, synth_dir, tmp_path_factory):
    reg = sdp.define_pipeline(spark, f"{synth_dir}/pages.parquet", max_files_per_batch=8)
    cp = tmp_path_factory.mktemp("sdp_cp")
    datasets = sdp.run_pipeline_locally(spark, reg, str(cp))
    yield reg, datasets


def test_graph_shape(registry_and_run):
    reg, _ = registry_and_run
    by_name = {o.name: o for o in reg.outputs}
    assert set(by_name) == {
        "bronze_pages",
        "silver_decisions",
        "gold_host_audit",
        "gold_corpus_audit",
    }
    assert isinstance(by_name["bronze_pages"], StreamingTable)
    for mv in ("silver_decisions", "gold_host_audit", "gold_corpus_audit"):
        assert isinstance(by_name[mv], MaterializedView)
    # every dataset has exactly one flow writing to it
    targets = [f.target for f in reg.flows]
    assert sorted(targets) == sorted(by_name)
    # declaration order is topological: each flow's target precedes
    # any later flow that reads it
    assert targets[0] == "bronze_pages" and targets[1] == "silver_decisions"


def test_definition_is_action_free(spark, synth_dir):
    """Registering the DAG must launch zero Spark jobs (the registry
    rule that applies to entry_queries applies to SDP declaration)."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    sdp.define_pipeline(spark, f"{synth_dir}/pages.parquet")
    assert tracker.getJobIdsForGroup(None) == before


def test_local_run_matches_imperative_pipeline(spark, synth_dir, registry_and_run):
    _, datasets = registry_and_run
    from webfilter.pipeline import filtered_frame

    want = filtered_frame(spark.read.parquet(f"{synth_dir}/pages.parquet")).select(
        "url", "keep", "scrubbed_text"
    )
    got = datasets["silver_decisions"].select("url", "keep", "scrubbed_text")
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_gold_audits_consistent(registry_and_run):
    _, datasets = registry_and_run
    silver = datasets["silver_decisions"]
    hosts = datasets["gold_host_audit"]
    corpus = datasets["gold_corpus_audit"].first()
    n_docs = silver.count()
    assert corpus["n_docs"] == n_docs
    agg = hosts.agg(F.sum("n_docs").alias("d"), F.sum("n_kept").alias("k")).first()
    assert agg["d"] == n_docs and agg["k"] == corpus["n_kept"]
    assert hosts.filter((F.col("keep_rate") < 0) | (F.col("keep_rate") > 1)).isEmpty()


def test_sdp_cli_backend_gated():
    ok, why = sdp.sdp_available()
    if not ok:
        assert "grpc" in why or "protobuf" in why


def test_host_audit_key_matches_rank_and_robots_key(spark):
    """partitioning.host_col IS urls.host_col (code-review r4c6
    finding #1): case, port, userinfo and no-match all key
    identically, so host_audit joins back to host_rank/robots."""
    from webfilter import partitioning, urls

    df = spark.createDataFrame(
        [("HTTPS://Example.COM/x",),
         ("http://example.com:8080/y",),
         ("http://u:p@example.com/z",),
         ("not-a-url",)],
        "url string",
    )
    a = [r[0] for r in df.select(partitioning.host_col(F.col("url"))).collect()]
    b = [r[0] for r in df.select(urls.host_col(F.col("url"))).collect()]
    assert a == b == ["example.com", "example.com", "example.com", None]
