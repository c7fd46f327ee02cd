"""Spark Declarative Pipelines (SDP, Spark 4.1) definition of the
webfilter DAG.

The reference ships its curation as a Databricks notebook-DAG workflow
(biomed_genai: 01_Metadata_Sync -> 03_Curate_Articles ->
04_Chunk_Articles_Content wired by workflow yaml); SDP is the OSS
analog — datasets declared as decorated query functions, dependency
resolution and incremental materialization left to the runner. This
module declares the same bronze -> silver -> gold shape the imperative
`pipeline.run_filter` executes:

* ``bronze_pages`` — STREAMING table fed by the incremental file
  stream (`streaming.read_pages_stream`, the Auto Loader analog).
* ``silver_decisions`` — materialized view: the full pure transform
  (`pipeline.filtered_frame`: latest-per-url window, fused Arrow
  extract+score UDF, heuristic rules, scrub).
* ``gold_host_audit`` / ``gold_corpus_audit`` — per-host keep rates
  and the corpus roll-up, both partition-free aggregations of silver.

Execution backends:

* `run_pipeline_locally` — a minimal topological runner used by the
  tests: batch flows materialize as temp views in registration order,
  streaming flows drain with trigger(availableNow) into an in-memory
  sink of the same name. It proves the declared DAG is runnable and
  its results byte-agree with the imperative pipeline.
* the real ``spark-pipelines run`` CLI — requires the Spark Connect
  python client (grpcio + protobuf wheels), which this sandbox lacks
  (`sdp_available` documents the probe); same gating pattern as the
  jar-blocked Iceberg MERGE and the protobuf-blocked
  transformWithStateInPandas runtime.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.pipelines.flow import Flow
from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)
from pyspark.pipelines.output import Output
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sdp_available() -> tuple[bool, str]:
    """Probe for the `spark-pipelines` execution backend: the CLI
    drives a Spark Connect server, so the python client deps must be
    importable. Observed in this sandbox: grpcio and protobuf are
    both absent and there is no pip/network, so only the local runner
    executes here."""
    try:
        import grpc  # noqa: F401
        from google.protobuf import descriptor  # noqa: F401

        return True, ""
    except ImportError as e:
        return False, f"spark-pipelines needs the Spark Connect client deps: {e}"


class LocalGraphRegistry(GraphElementRegistry):
    """In-process registry capturing the declared graph for the local
    runner (the Connect-backed registry is unusable without grpcio)."""

    def __init__(self) -> None:
        self.outputs: list[Output] = []
        self.flows: list[Flow] = []

    def register_output(self, output: Output) -> None:
        self.outputs.append(output)

    def register_flow(self, flow: Flow) -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path: Path) -> None:
        raise NotImplementedError("webfilter declares its DAG in python")


def define_pipeline(
    spark: SparkSession, pages_path: str, max_files_per_batch: int = 4
) -> LocalGraphRegistry:
    """Register the webfilter DAG and return the captured registry.

    Query functions close over ``spark`` and read upstream datasets
    by NAME (`spark.table`) — dependency edges stay visible to any
    runner, and nothing executes at definition time (the registry
    test asserts construction is action-free)."""
    from pyspark import pipelines as dp

    from .pipeline import filtered_frame
    from .streaming import read_pages_stream

    registry = LocalGraphRegistry()
    with graph_element_registration_context(registry):
        dp.create_streaming_table(
            "bronze_pages",
            comment="incremental crawl ingest (file-stream Auto Loader analog)",
            format="parquet",
        )

        @dp.append_flow(target="bronze_pages", name="ingest_pages")
        def ingest_pages() -> DataFrame:
            return read_pages_stream(spark, pages_path, max_files_per_batch)

        @dp.materialized_view(name="silver_decisions")
        def silver_decisions() -> DataFrame:
            return filtered_frame(spark.table("bronze_pages"))

        @dp.materialized_view(name="gold_host_audit")
        def gold_host_audit() -> DataFrame:
            from .partitioning import host_col, salted_count_by_key

            # salted two-phase agg — the SAME skew discipline as
            # pipeline.run_filter's host_audit: a hot host must not
            # funnel into one reducer (code-review r4c9 finding #6)
            d = spark.table("silver_decisions").withColumn(
                "host", host_col(F.col("url"))
            )
            return salted_count_by_key(
                d, "host",
                aggs={"n_kept": F.sum(F.col("keep").cast("long"))},
                salt_from="url",
            ).select(
                "host",
                F.col("n_rows").alias("n_docs"),
                "n_kept",
                (F.col("n_kept") / F.col("n_rows")).alias("keep_rate"),
            )

        @dp.materialized_view(name="gold_corpus_audit")
        def gold_corpus_audit() -> DataFrame:
            d = spark.table("silver_decisions")
            return d.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("keep").cast("long")).alias("n_kept"),
                F.countDistinct("langid").alias("n_langs"),
            )

    return registry


def run_pipeline_locally(
    spark: SparkSession, registry: LocalGraphRegistry, checkpoint_root: str
) -> dict[str, DataFrame]:
    """Minimal SDP runner: execute flows in registration order (the
    declaration order IS a topological order for this DAG — each MV
    reads only earlier datasets). Streaming flows drain availableNow
    into an in-memory sink named after their target; batch flows
    become temp views. Returns {dataset: DataFrame}.

    ``checkpoint_root`` must be FRESH: the file source's checkpoint
    is durable but the memory sink is not, so resuming an existing
    checkpoint would skip already-seen files into an empty table and
    silently truncate every downstream MV (code-review r4c9 finding
    #2) — refused loudly instead."""
    import os as _os

    for fl in registry.flows:
        name = fl.target.split(".")[-1]
        if _os.path.isdir(f"{checkpoint_root}/{name}"):
            raise ValueError(
                f"checkpoint_root already holds state for {name!r}; "
                "the in-memory sinks start empty every run, so "
                "resuming would silently truncate results — pass a "
                "fresh checkpoint_root"
            )
    out: dict[str, DataFrame] = {}
    for fl in registry.flows:
        df = fl.func()
        name = fl.target.split(".")[-1]
        if df.isStreaming:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", f"{checkpoint_root}/{name}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        else:
            df.createOrReplaceTempView(name)
        out[name] = spark.table(name)
    return out
