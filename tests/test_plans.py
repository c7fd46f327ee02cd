"""Physical-plan shape gates: predicate pushdown, column pruning and
broadcast joins must not silently regress (they are the difference
between a scan that reads 2 columns and one that reads the whole
100 TB table)."""

from __future__ import annotations

import io

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_to_parquet(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(docs.filter(F.col("lang") == "en").select("doc_id"))
    assert "PushedFilters" in plan
    assert "EqualTo(lang,en)" in plan or "lang" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    from webfilter.entry_queries import q_token_counts

    plan = _plan(q_token_counts(spark, SF))
    # the scan must read only doc_id + text, not the whole schema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "source" not in read_schema and "n_chars" not in read_schema


def test_bucket_filter_is_pushed(spark, synth_dir):
    """Resume filtering prunes with a pushed-down IN over the
    partition column of the decisions table."""
    from webfilter import pipeline
    from webfilter.tables import ParquetCatalog

    out = f"{synth_dir}/../plans_out"
    pipeline.run_filter(spark, f"{synth_dir}/pages.parquet", out, n_buckets=8, run_id="p")
    dec = ParquetCatalog(spark, out).read("decisions").filter(
        F.col("bucket_id").isin([1, 2])
    )
    plan = _plan(dec.select("url"))
    # bucket_id is the physical partition column -> partition pruning
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "bucket_id" in seg


def test_broadcast_in_topk(spark):
    from webfilter.entry_queries import q_cosine_topk

    plan = _plan(q_cosine_topk(spark, SF))
    assert "Broadcast" in plan  # probe side broadcast, no shuffle join


def test_single_shuffle_in_filter_transform(spark, synth_dir):
    """The hot path has exactly one wide shuffle (latest-per-url
    window); more means a regression."""
    from webfilter import pipeline

    pages = spark.read.parquet(f"{synth_dir}/pages.parquet")
    plan = _plan(pipeline.filtered_frame(pages))
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2, f"expected <=2 Exchange nodes, got {n_exchanges}\n{plan[:2000]}"


def test_run_filter_shape_is_single_shuffle(spark, synth_dir):
    """The full run_filter frame — bucket repartition, then the
    (bucket_id, url) dedup window — must plan exactly ONE exchange:
    the window's ClusteredDistribution is satisfied by the existing
    HashPartitioning(bucket_id) because bucket_id is a pure function
    of url. A second exchange means the write-alignment re-shuffle of
    finished decision rows is back (the pre-round-4 plan)."""
    from webfilter import pipeline
    from webfilter.partitioning import with_bucket

    pages = with_bucket(spark.read.parquet(f"{synth_dir}/pages.parquet"), 16)
    out = pipeline.filtered_frame(
        pages.repartition(32, "bucket_id"), bucket_clustered=True
    )
    plan = _plan(out)
    # formatted explain prints each node once in the tree and once in
    # the details section -> a single physical node appears twice
    n = plan.count("Exchange hashpartitioning")
    assert n <= 2, f"expected 1 physical Exchange (2 mentions), got:\n{plan[:2000]}"


def test_whole_stage_codegen_covers_rules(spark):
    from webfilter import rules

    df = rules.with_heuristics(
        spark.read.parquet(f"{SF}/documents.parquet")
    )
    plan = _plan(rules.with_decision(
        rules.model_rule_columns(
            df.withColumns({"langid": F.lit("en"), "langid_conf": F.lit(1.0), "perplexity": F.lit(1.0)})
        )
    ))
    # formatted mode marks codegen'd operators with [codegen id : N];
    # higher-order funcs (aggregate/transform lambdas) legitimately
    # stay interpreted, but the scan->project spine must be codegen'd
    assert "codegen id" in plan


def test_asof_join_has_no_cartesian(spark):
    """as-of join must plan as one keyed window, never a range
    cross-join (the naive formulation explodes at scale)."""
    from webfilter.entry_queries import q_asof_join

    plan = _plan(q_asof_join(spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Window" in plan
    # exactly one wide exchange: the per-user window partitioning
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:1500]


def test_lsh_probe_side_is_broadcast(spark):
    from webfilter.entry_queries import q_lsh_topk

    plan = _plan(q_lsh_topk(spark, SF))
    assert "Broadcast" in plan  # probes broadcast; corpus never shuffled for the join


def test_omitted_dim_raises_never_probes(spark):
    """Both simsearch entry points share dedup's contract: omitting
    dim raises at construction instead of running a first() job
    (VERDICT r3 #5 — the modules previously disagreed)."""
    from webfilter.simsearch import lsh_topk, with_hyperplane_bucket, with_norm

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="dim is required"):
        with_hyperplane_bucket(with_norm(emb))
    with pytest.raises(ValueError, match="dim is required"):
        lsh_topk(emb, emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding"))


def test_registry_construction_is_action_free(spark):
    """No registry query may launch a Spark job during CONSTRUCTION
    (VERDICT r2 #5): at 10^12 rows a hidden first()/limit() probe is a
    full-scan-shaped surprise inside what callers treat as plan-only
    code. Two documented exceptions: the IVF codebook index build is
    warmed (and cached) before the probe; pagerank_hosts is an
    ITERATIVE algorithm whose loop checkpoints convert plan segments
    to RDDs at construction, firing the segments' broadcast-exchange
    prepares — bounded node-dimension jobs, so for it the gate checks
    BOUNDEDNESS (every construction stage is tiny) instead of
    zero-jobs, which is the property the rule actually protects."""
    import __spark_entry__ as entry_mod
    from webfilter import entry_queries

    qs = entry_mod.queries()
    entry_queries.q_ivf_topk(spark, SF)  # documented index-build action
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def data_jobs(group: str) -> list[str]:
        """Jobs other than parquet footer/schema inference — that one
        ('parquet at ...', one task per read) is bounded metadata every
        spark.read.parquet performs, not a data probe."""
        bad = []
        for j in tracker.getJobIdsForGroup(group) or []:
            info = tracker.getJobInfo(j)
            for s in info.stageIds if info else []:
                si = tracker.getStageInfo(s)
                if si and not si.name.startswith("parquet at"):
                    bad.append(f"job {j} stage '{si.name}' ({si.numTasks} tasks)")
        return bad

    def big_jobs(group: str, max_tasks: int) -> list[str]:
        bad = []
        for j in tracker.getJobIdsForGroup(group) or []:
            info = tracker.getJobInfo(j)
            for s in info.stageIds if info else []:
                si = tracker.getStageInfo(s)
                if si and si.numTasks > max_tasks:
                    bad.append(f"job {j} stage '{si.name}' ({si.numTasks} tasks)")
        return bad

    try:
        for name, fn in qs.items():
            grp = f"construction_probe_{name}"
            sc.setJobGroup(grp, "registry construction must be plan-only")
            fn(spark, SF)
            if name in (
                "pagerank_hosts",
                "pagerank_personalized",
                "graph_components",
                "kcore_peel",
                "kmeans_assign",  # per-iteration k-row centroid collect
                "semdedup_kmeans",  # same Lloyd training at construction
            ):
                # iterative exception: the lazily-checkpointed loop
                # segments execute at construction, so jobs are
                # allowed but must be node-dim bounded, never
                # corpus-scan-shaped (bound: 2x the 8-way test
                # shuffle width — pagerank stages stay at <= 8,
                # label-prop's union+groupBy coalesces to 9)
                bad = big_jobs(grp, max_tasks=16)
                assert not bad, f"{name} construction ran BIG jobs: {bad}"
            else:
                bad = data_jobs(grp)
                assert not bad, f"{name} construction launched data jobs: {bad}"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)


def test_semdedup_kmeans_pair_join_is_cluster_local(spark):
    """The SemDeDup pair join must be an equi-join on cluster id —
    a cartesian/nested-loop here means the dedup went all-pairs,
    which is the plan that dies at corpus scale."""
    from webfilter.entry_queries import q_semdedup_kmeans

    plan = _plan(q_semdedup_kmeans(spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_minhash_candidate_join_is_equi(spark):
    """Banded LSH candidates come from a hash equi-join on the short
    (band, hash) key — a nested-loop/cartesian here means the banding
    broke and the plan went all-pairs."""
    from webfilter.dedup import lsh_candidate_pairs, minhash_signature_df

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sig = minhash_signature_df(docs, k=2)
    plan = _plan(lsh_candidate_pairs(sig))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_decontaminate_corpus_side_never_shuffles(spark):
    """The 100 TB corpus side must reach the benchmark-gram join via
    broadcast — a SortMergeJoin here means the full exploded gram
    stream shuffles, which is the plan that dies at scale."""
    from webfilter.entry_queries import q_decontaminate

    plan = _plan(q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan
    # wide exchanges: benchmark-gram distinct + per-doc hit count only
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:1500]


def test_frequent_terms_verify_join_is_broadcast(spark):
    """Exact-verify must join the token stream against BROADCAST
    candidates — the full vocabulary never shuffles."""
    from webfilter.entry_queries import q_frequent_terms

    plan = _plan(q_frequent_terms(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan


def test_bloom_anti_probe_is_broadcast_routed(spark):
    """The bitmap reaches probes as a broadcast single row (nested-
    loop cross of 1 row), and the exact anti-join exists only for the
    maybe sliver — the probe table itself must not sort-merge."""
    from webfilter.entry_queries import q_bloom_anti_frontier

    plan = _plan(q_bloom_anti_frontier(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan[:1500]
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_allpairs_join_is_equi_never_cartesian(spark):
    """The AllPairs/PPJoin exact similarity self-join must plan its
    candidate stage as a shingle-keyed equi-join (SortMergeJoin /
    ShuffledHashJoin on w), never a cartesian or nested-loop product
    — at 10^12 docs the cross form is unrunnable; equality with
    brute force is separately proven by the DuckDB oracle."""
    from webfilter.entry_queries import q_allpairs_jaccard

    plan = _plan(q_allpairs_jaccard(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # every join in the plan is hash-keyed (at sf0.01 AQE broadcasts
    # the small sides; at scale the same keys sort-merge)
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_shipping_priority_plan_shape(spark):
    """TPC-H Q3: filters pushed to all three scans, the customer dim
    broadcast, exactly ONE exchange (the grouped-revenue shuffle),
    and top-10 via TakeOrderedAndProject — never a global Sort."""
    from webfilter.entry_queries import q_shipping_priority

    plan = _plan(q_shipping_priority(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # pushed date/segment predicates reach the parquet scans
    assert plan.count("PushedFilters: [") >= 3
    body = plan.split("== Physical Plan ==")[1]
    # formatted plans print each node twice (tree + detail section)
    n_exchanges = (body.count("Exchange") - body.count("BroadcastExchange")) // 2
    assert n_exchanges <= 1, plan


def test_triangle_count_has_no_cartesian(spark):
    from webfilter.entry_queries import q_triangle_counts

    plan = _plan(q_triangle_counts(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_name_pairs_joins_on_variant(spark):
    """The SymSpell self-join must be an equi-join on the variant
    string — a cartesian/nested-loop here means the deletion
    neighborhood stopped doing its job."""
    from webfilter.entry_queries import q_fuzzy_name_pairs

    plan = _plan(q_fuzzy_name_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_centroid_dim_is_broadcast(spark):
    """The ONLY nested-loop join allowed is the deliberate broadcast
    of the k-row centroid dim; the within-cluster pair join must be
    an equi-join on the cluster key."""
    from webfilter.entry_queries import q_semdedup_drops

    plan = _plan(q_semdedup_drops(spark, SF))
    assert "CartesianProduct" not in plan
    # the assignment subtree (with its one centroid crossJoin) feeds
    # BOTH sides of the pair self-join, so the plan duplicates it:
    # 2 BNLJ nodes, each printed twice (tree + detail) = 4 mentions.
    # Anything beyond that means a non-broadcast nested loop crept in.
    assert plan.count("BroadcastNestedLoopJoin") <= 4


def test_minhash_md5_bands_equijoin(spark):
    from webfilter.entry_queries import q_minhash_md5

    plan = _plan(q_minhash_md5(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_plan_shape(spark):
    """BM25: the query-term dim and (N, avgdl) scalar must broadcast,
    the final top-10 must be TakeOrderedAndProject (per-partition
    top-k) — never a global single-task Sort/window over the corpus —
    and nothing may form a CartesianProduct (the 1-row stats join is
    a broadcast nested loop, which is fine)."""
    from webfilter.entry_queries import q_bm25_rank

    plan = _plan(q_bm25_rank(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastExchange") >= 2, plan


def test_pmi_topk_plan_shape(spark):
    """PMI collocations: the two single-row totals must reach the
    candidate set as a broadcast (never a shuffled join), and the
    global top-20 must be TakeOrderedAndProject (per-partition top-k)
    — a full corpus-wide Sort would serialize the vocabulary through
    one task at 100 TB."""
    from webfilter.entry_queries import q_pmi_collocations

    plan = _plan(q_pmi_collocations(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastExchange") >= 1, plan


def test_script_profile_is_map_only(spark):
    """script_profile: pure Column regexp counts over the scan — any
    Exchange would mean a 100-TB corpus shuffles for a per-row
    projection."""
    from webfilter.entry_queries import q_script_profile

    plan = _plan(q_script_profile(spark, SF))
    body = plan.split("== Physical Plan ==")[1]
    assert "Exchange" not in body, plan
    assert "pythonUDF" not in body.lower(), plan


def test_char_entropy_two_uniform_shuffles(spark):
    """char_entropy: exactly the (doc_id, ch) count shuffle and the
    doc_id re-agg — both partial-aggregated map-side; the 512-cp
    prefix bound keeps the explode amplification constant."""
    from webfilter.entry_queries import q_char_entropy

    plan = _plan(q_char_entropy(spark, SF))
    body = plan.split("== Physical Plan ==")[1]
    # formatted explain names each node twice (tree + detail section)
    n_exchanges = (body.count("Exchange") - body.count("BroadcastExchange")) // 2
    assert n_exchanges == 2, plan
    assert body.count("HashAggregate") // 2 == 4, plan  # 2 aggs x partial+final


def test_url_templates_single_count_pipeline(spark):
    """url_templates: skeletonization is map-side; the only shuffles
    are countDistinct's two-phase (host, skeleton, path) ->
    (host, skeleton) cascade, both partial-aggregated. The scan must
    prune to the two columns the synth needs."""
    from webfilter.entry_queries import q_url_templates

    plan = _plan(q_url_templates(spark, SF))
    body = plan.split("== Physical Plan ==")[1]
    n_exchanges = (body.count("Exchange") - body.count("BroadcastExchange")) // 2
    assert n_exchanges == 2, plan
    assert "ReadSchema: struct<doc_id:bigint,source:string>" in body, plan


def test_runtime_shuffle_audit_measures_broadcast_claim(spark):
    """jobs/audit_shuffle.py harvests SQLMetrics from the executed
    plan. Beyond exercising the traversal (AQE stages, broadcast
    wrappers), assert the RUNTIME counterpart of the
    host_lang_outliers plan gate: the corpus rows reach the result
    through a broadcast join, so shuffle records (dim only) stay far
    below scanned rows."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    from audit_shuffle import audit_query

    from webfilter.entry_queries import q_host_lang_outliers

    acc = audit_query(q_host_lang_outliers(spark, SF))
    assert acc["scan_rows"] > 0
    assert acc["n_broadcasts"] >= 1
    # dim-only shuffle: (source, lang) pairs, not corpus rows
    assert acc["shuffle_records"] < acc["scan_rows"] / 2, acc
    assert acc["shuffle_amplification"] < 0.5, acc


def test_host_lang_outliers_one_corpus_pass(spark):
    """host_lang_outliers: the corpus must be scanned exactly twice
    (probe side + ONE dim build — host totals come from a window over
    the aggregated dim, never a second corpus groupBy), and the probe
    side must reach the join without an Exchange (broadcast dim)."""
    from webfilter.entry_queries import q_host_lang_outliers

    plan = _plan(q_host_lang_outliers(spark, SF))
    body = plan.split("== Physical Plan ==")[1]
    assert body.count("Scan parquet") // 2 == 2, plan
    assert "BroadcastHashJoin" in body, plan
    # only the dim build shuffles: the (source, lang) count exchange
    # plus the window's (source) re-key of the ALREADY-AGGREGATED dim
    # — both move host-cardinality rows, never corpus rows
    n_exchanges = (body.count("Exchange") - body.count("BroadcastExchange")) // 2
    assert n_exchanges == 2, plan


def test_zorder_key_is_map_only_over_the_scan(spark):
    """with_zorder: the big side gets the key via a broadcast of the
    one-row min/max agg — no shuffle may touch the scan side (at
    100 TB the key computation must stay map-only; the only range
    shuffle belongs to the WRITE, not the key)."""
    from webfilter.zorder import with_zorder

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(with_zorder(ev, ["user_id", "event_id"], bits=12))
    body = plan.split("== Physical Plan ==")[1]
    assert "CartesianProduct" not in plan
    # the only allowed non-broadcast exchange is the scalar agg's
    # partial->final SinglePartition merge (it moves one 4-value row
    # per input split, never scan data); any hash/range exchange
    # would mean the scan side shuffled
    n_exchanges = (body.count("Exchange") - body.count("BroadcastExchange")) // 2
    n_scalar = body.count("Arguments: SinglePartition")
    assert n_exchanges == n_scalar == 1, plan


def test_crawl_frontier_broadcasts_reputation(spark):
    """crawl_frontier: the host-reputation dim must broadcast into
    the sitemap side (rows ∝ hosts — never a shuffled join), and no
    cartesian product may appear anywhere in the composition."""
    from webfilter.entry_queries import q_crawl_frontier

    plan = _plan(q_crawl_frontier(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_cdx_roundtrip_is_shuffle_free(spark):
    """CDXJ serialize + parse is pure map-side Column work: a 100 TB
    index round-trips as a scan with ZERO exchanges of any kind."""
    from webfilter.entry_queries import q_cdx_roundtrip

    plan = _plan(q_cdx_roundtrip(spark, SF))
    body = plan.split("== Physical Plan ==")[1]
    assert "Exchange" not in body, plan
