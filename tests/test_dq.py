"""Differential data-quality verification (webfilter/dq.py):
constraint evaluation catches planted violations, the per-bucket
state is algebraically mergeable (partition-invariant), and the
differential refresh — recompute ONLY changed buckets, reuse the
rest — equals a full recompute (the ICDE'19 property)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from webfilter.dq import (
    Complete,
    InRange,
    Satisfies,
    Unique,
    bucket_state,
    refresh,
    verify,
)

SUITE = [
    Complete("lang", 0.90),
    InRange("n_chars", 0, 1000, max_violation_fraction=0.0),
    Satisfies("has_text", "length(text) > 0", 0.95),
    Unique("url", 0.90),
]


def _corpus(spark, n=400, null_lang_every=50, dup_every=0, oversize_every=0):
    rows = []
    for i in range(n):
        rows.append(
            Row(
                url=f"https://h{i % 7}.example/p{i if not dup_every or i % dup_every else 0}",
                lang=None if null_lang_every and i % null_lang_every == 0 else "en",
                n_chars=5000 if oversize_every and i % oversize_every == 0 else i % 900,
                text="x" * (1 + i % 5),
                bucket_id=i % 8,
            )
        )
    return spark.createDataFrame(rows)


def _results(df):
    return {
        r["constraint"]: (r["metric"], r["passed"]) for r in df.collect()
    }


def test_all_green_on_clean_corpus(spark):
    df = _corpus(spark, null_lang_every=0)
    got = _results(verify(bucket_state(df, SUITE), SUITE))
    assert set(got) == {
        "complete_lang",
        "in_range_n_chars",
        "satisfies_has_text",
        "unique_url",
    }
    assert all(passed for _v, passed in got.values()), got
    assert got["complete_lang"][0] == 1.0
    assert got["in_range_n_chars"][0] == 0.0


def test_planted_violations_fail_their_constraints(spark):
    df = _corpus(
        spark, null_lang_every=5, dup_every=2, oversize_every=10
    )
    got = _results(verify(bucket_state(df, SUITE), SUITE))
    assert not got["complete_lang"][1]  # 20% nulls < 90% complete
    assert not got["in_range_n_chars"][1]  # oversize rows violate
    assert not got["unique_url"][1]  # half the urls collapse to p0
    assert got["satisfies_has_text"][1]  # text always non-empty


def test_unique_estimate_tracks_exact(spark):
    df = _corpus(spark, null_lang_every=0)
    got = _results(verify(bucket_state(df, SUITE), SUITE))
    exact = df.select("url").distinct().count() / df.count()
    est = got["unique_url"][0]
    assert abs(est - exact) / exact < 0.10  # HLL m=256 ~6.5% rel err


def test_state_is_partition_invariant(spark):
    """The same corpus under a different physical partitioning yields
    the identical verification result — state is algebraic."""
    df = _corpus(spark)
    a = verify(bucket_state(df.repartition(13), SUITE), SUITE)
    b = verify(bucket_state(df.coalesce(1), SUITE), SUITE)
    assert _results(a) == _results(b)


def test_differential_refresh_equals_full_recompute(spark):
    """Mutate buckets {2, 5}, refresh ONLY those states, and compare
    to a full recompute over the mutated corpus."""
    base = _corpus(spark)
    state = bucket_state(base, SUITE)
    # mutation: bucket 2 loses its lang values, bucket 5 gets dups
    changed_rows = (
        base.filter(F.col("bucket_id").isin([2, 5]))
        .withColumn(
            "lang",
            F.when(F.col("bucket_id") == 2, F.lit(None)).otherwise(
                F.col("lang")
            ),
        )
        .withColumn(
            "url",
            F.when(
                F.col("bucket_id") == 5, F.lit("https://dup.example/x")
            ).otherwise(F.col("url")),
        )
    )
    mutated = base.filter(~F.col("bucket_id").isin([2, 5])).unionByName(
        changed_rows
    )
    diff = verify(refresh(state, changed_rows, SUITE, [2, 5]), SUITE)
    full = verify(bucket_state(mutated, SUITE), SUITE)
    assert _results(diff) == _results(full)
    # and the mutation actually flipped a verdict (not a vacuous test)
    before = _results(verify(state, SUITE))
    after = _results(diff)
    assert before["complete_lang"][1] and not after["complete_lang"][1]


def test_refresh_is_metadata_sized(spark):
    """The reused side of a refresh comes from the state frames, not
    the data: verifying a refreshed state never rescans unchanged
    buckets' rows (their plan source is the cached state)."""
    base = _corpus(spark)
    scalars, regs = bucket_state(base, SUITE)
    # materialize state as tables (the persisted-state deployment shape)
    scalars = spark.createDataFrame(scalars.collect(), scalars.schema)
    regs = spark.createDataFrame(regs.collect(), regs.schema)
    changed = base.filter(F.col("bucket_id") == 0)
    out = verify(refresh((scalars, regs), changed, SUITE, [0]), SUITE)
    full = verify(bucket_state(base, SUITE), SUITE)
    assert _results(out) == _results(full)


def test_empty_changed_set_is_identity(spark):
    base = _corpus(spark)
    state = bucket_state(base, SUITE)
    same = refresh(state, base.limit(0), SUITE, [])
    assert _results(verify(same, SUITE)) == _results(verify(state, SUITE))


def test_in_range_requires_a_bound():
    with pytest.raises(AssertionError, match="at least one bound"):
        from webfilter.dq import _scalar_aggs

        _scalar_aggs([InRange("x")])


def test_pipeline_dq_check_flag(spark, synth_dir, tmp_path):
    """--dq-check: the production job verifies its own decisions
    table post-write and records the results as dq_audit lineage;
    default runs are unchanged (no dq key, no table)."""
    from webfilter import pipeline
    from webfilter.tables import ParquetCatalog

    out = tmp_path / "dqrun"
    res = pipeline.run_filter(
        spark,
        f"{synth_dir}/pages.parquet",
        str(out),
        n_buckets=8,
        run_id="dq1",
        dq_check=True,
    )
    assert set(res["dq"]) == {
        "complete_url",
        "complete_keep",
        "in_range_langid_conf",
        "satisfies_pii_scrubbed",
        "unique_url",
    }
    assert all(v["passed"] for v in res["dq"].values()), res["dq"]
    assert res["dq"]["complete_url"]["metric"] == 1.0
    assert res["dq"]["satisfies_pii_scrubbed"]["metric"] == 1.0
    # non-vacuous: the same check over the RAW text fails (the synth
    # corpus plants real emails/SSNs), so a scrub regression would
    # flip the constraint red
    from webfilter.dq import Satisfies, bucket_state as bs, verify as vf

    raw = Satisfies(
        "pii_raw",
        "text NOT RLIKE '[A-Za-z0-9._%+\\\\-]+@[A-Za-z0-9.\\\\-]+"
        "\\\\.[A-Za-z]{2,}'",
        1.0,
    )
    decisions = spark.read.parquet(str(out / "decisions.parquet"))
    rawres = {
        r["constraint"]: r
        for r in vf(bs(decisions, [raw], "bucket_id"), [raw]).collect()
    }
    assert not rawres["satisfies_pii_raw"]["passed"]
    cat = ParquetCatalog(spark, str(out))
    audit = cat.read("dq_audit")
    # 5 constraints x 2 scopes (run + corpus); on a single full run
    # the corpus metrics equal the run metrics
    assert audit.count() == 10
    assert {r["run_id"] for r in audit.collect()} == {"dq1"}
    assert {r["scope"] for r in audit.collect()} == {"run", "corpus"}
    assert res["dq_corpus"] == res["dq"]
    # default path untouched
    out2 = tmp_path / "plain"
    res2 = pipeline.run_filter(
        spark, f"{synth_dir}/pages.parquet", str(out2), n_buckets=8,
        run_id="p1",
    )
    assert "dq" not in res2
    assert not ParquetCatalog(spark, str(out2)).exists("dq_audit")


def test_epochwise_partial_states_accumulate(spark):
    """Online monitoring shape: per-epoch PARTIAL states simply
    append to the state tables — verify() re-aggregates sums and
    re-merges register maxes, so the union of three ingestion
    epochs' states verifies identically to one state over the full
    corpus. No per-epoch re-read of earlier data, ever."""
    full = _corpus(spark, n=300, null_lang_every=5, dup_every=3)
    epochs = [
        full.filter(F.col("n_chars") % 3 == k) for k in range(3)
    ]
    acc_scalars = acc_regs = None
    for e in epochs:
        s, r = bucket_state(e, SUITE)
        acc_scalars = s if acc_scalars is None else acc_scalars.unionByName(s)
        acc_regs = r if acc_regs is None else acc_regs.unionByName(r)
    got = _results(verify((acc_scalars, acc_regs), SUITE))
    want = _results(verify(bucket_state(full, SUITE), SUITE))
    assert got == want
    # the accumulated state holds MULTIPLE rows per bucket (one per
    # epoch that touched it) — that is the point: append-only state
    assert acc_scalars.count() > bucket_state(full, SUITE)[0].count()


def test_unique_only_suite(spark):
    """A uniqueness-only suite must verify (review finding #4: the
    zero-struct explode used to crash star-expansion)."""
    df = _corpus(spark, null_lang_every=0)
    suite = [Unique("url", 0.90)]
    got = _results(verify(bucket_state(df, suite), suite))
    assert set(got) == {"unique_url"}
    assert got["unique_url"][1] is True


def test_refresh_preserves_null_bucket_state(spark):
    """State rows with a NULL bucket survive a differential refresh
    of other buckets (review finding #6: ~isin() is NULL for NULL
    keys and used to silently drop them)."""
    rows = [
        Row(url=f"u{i}", lang="en", n_chars=i, text="x", bucket_id=i % 3)
        for i in range(30)
    ] + [
        Row(url=f"n{i}", lang=None, n_chars=i, text="x", bucket_id=None)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    state = bucket_state(df, SUITE)
    # refresh bucket 1 with unchanged rows: result must equal full
    diff = verify(
        refresh(state, df.filter(F.col("bucket_id") == 1), SUITE, [1]),
        SUITE,
    )
    full = verify(bucket_state(df, SUITE), SUITE)
    assert _results(diff) == _results(full)
    # and the NULL bucket itself is addressable via changed=[None]
    mutated = df.withColumn(
        "lang",
        F.when(F.col("bucket_id").isNull(), F.lit("de")).otherwise(
            F.col("lang")
        ),
    )
    diff2 = verify(
        refresh(
            state,
            mutated.filter(F.col("bucket_id").isNull()),
            SUITE,
            [None],
        ),
        SUITE,
    )
    full2 = verify(bucket_state(mutated, SUITE), SUITE)
    assert _results(diff2) == _results(full2)


def test_corpus_dq_accumulates_across_resumed_runs(
    spark, synth_dir, tmp_path
):
    """The corpus-level scope is O(increment) per run: each run
    persists its buckets' mergeable state, and the corpus verify
    merges ALL runs' states — after two partial runs covering the
    corpus, it equals a single full run's dq, without ever rescanning
    earlier runs' decisions."""
    from webfilter import pipeline
    from webfilter.tables import ParquetCatalog

    out = tmp_path / "split"
    r1 = pipeline.run_filter(
        spark, f"{synth_dir}/pages.parquet", str(out), n_buckets=8,
        run_id="e1", only_buckets=[0, 1, 2, 3], dq_check=True,
    )
    r2 = pipeline.run_filter(
        spark, f"{synth_dir}/pages.parquet", str(out), n_buckets=8,
        run_id="e2", only_buckets=[4, 5, 6, 7], dq_check=True,
    )
    full = pipeline.run_filter(
        spark, f"{synth_dir}/pages.parquet", str(tmp_path / "full"),
        n_buckets=8, run_id="f", dq_check=True,
    )
    # run scopes see only their half; the corpus scope after run 2
    # matches the single full run exactly (state merge == recompute)
    assert r2["dq_corpus"] == full["dq_corpus"] == full["dq"]
    assert r1["dq"] != full["dq"] or r2["dq"] != full["dq"]
    # state lineage: one scalars row per (run, bucket)
    cat = ParquetCatalog(spark, str(out))
    scal = cat.read("dq_state_scalars")
    assert scal.count() == 8
    assert {
        (r["run_id"], r["part"]) for r in scal.collect()
    } == {("e1", b) for b in range(4)} | {("e2", b) for b in range(4, 8)}


def test_dedupe_state_runs_keeps_newest_run_per_part(spark):
    """Crash-retry tolerance: a bucket re-stated under a later run
    (crash between state append and DONE mark) contributes only its
    newest rows to the corpus merge."""
    from datetime import datetime, timezone

    from webfilter.dq import dedupe_state_runs

    t1 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    t2 = datetime(2026, 1, 2, tzinfo=timezone.utc)
    scal = spark.createDataFrame(
        [
            (0, 100, "r1", t1),   # stale: bucket 0 re-stated by r2
            (0, 120, "r2", t2),
            (1, 50, "r1", t1),    # untouched bucket
        ],
        "part int, n long, run_id string, processed_at timestamp",
    )
    regs = spark.createDataFrame(
        [
            (0, "unique_url", 3, 5, "r1", t1),
            (0, "unique_url", 3, 7, "r2", t2),
            (1, "unique_url", 9, 2, "r1", t1),
        ],
        "part int, cname string, reg int, m_j int, run_id string, "
        "processed_at timestamp",
    )
    s2, r2 = dedupe_state_runs(scal, regs)
    assert sorted(
        (r["part"], r["n"], r["run_id"]) for r in s2.collect()
    ) == [(0, 120, "r2"), (1, 50, "r1")]
    assert sorted(
        (r["part"], r["m_j"], r["run_id"]) for r in r2.collect()
    ) == [(0, 7, "r2"), (1, 2, "r1")]


def test_corpus_dq_survives_crash_between_state_and_done(
    spark, synth_dir, tmp_path
):
    """Simulated crash-retry: bucket 3's DONE mark is reverted after
    run e1 (state already persisted), so run e2 reprocesses it and
    re-states it under its own run_id — the corpus verify must count
    bucket 3 exactly once and equal a clean full run."""
    from webfilter import pipeline
    from webfilter.manifest import PENDING, Manifest
    from webfilter.tables import ParquetCatalog

    out = tmp_path / "crash"
    pipeline.run_filter(
        spark, f"{synth_dir}/pages.parquet", str(out), n_buckets=8,
        run_id="e1", only_buckets=[0, 1, 2, 3], dq_check=True,
    )
    # crash simulation: state for bucket 3 persisted but the DONE
    # mark "lost" -> next run reprocesses it
    Manifest(ParquetCatalog(spark, str(out))).mark(
        "e1", "filter", [3], PENDING
    )
    r2 = pipeline.run_filter(
        spark, f"{synth_dir}/pages.parquet", str(out), n_buckets=8,
        run_id="e2", dq_check=True,
    )
    full = pipeline.run_filter(
        spark, f"{synth_dir}/pages.parquet", str(tmp_path / "clean"),
        n_buckets=8, run_id="f", dq_check=True,
    )
    assert r2["dq_corpus"] == full["dq_corpus"]
    # bucket 3 exists under BOTH run_ids in the raw state lineage
    from webfilter.tables import ParquetCatalog

    scal = ParquetCatalog(spark, str(out)).read("dq_state_scalars")
    assert {
        r["run_id"] for r in scal.filter(F.col("part") == 3).collect()
    } == {"e1", "e2"}


def test_in_range_fraction_over_non_null_values(spark):
    """InRange divides by the NON-NULL count (its documented
    contract): 20/100 violations among non-nulls must fail a 0.15
    threshold even when 900 NULL rows would dilute it to 0.02
    (code-review r4c5 finding #2)."""
    rows = [Row(x=None, bucket_id=i % 4) for i in range(900)] + [
        Row(x=float(5 if i < 20 else 1), bucket_id=i % 4)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    suite = [InRange("x", 0.0, 2.0, max_violation_fraction=0.15)]
    got = _results(verify(bucket_state(df, suite), suite))
    metric, passed = got["in_range_x"]
    assert abs(metric - 0.2) < 1e-9 and passed is False


def test_dedupe_state_runs_keeps_null_bucket_regs(spark):
    """The crash-retry dedupe must not drop a NULL bucket's register
    rows (null-safe winner join — code-review r4c5 finding #1)."""
    from datetime import datetime, timezone

    from webfilter.dq import dedupe_state_runs

    t1 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    scal = spark.createDataFrame(
        [(None, 10, "r1", t1), (1, 20, "r1", t1)],
        "part int, n long, run_id string, processed_at timestamp",
    )
    regs = spark.createDataFrame(
        [(None, "unique_url", 3, 5, "r1", t1),
         (1, "unique_url", 4, 2, "r1", t1)],
        "part int, cname string, reg int, m_j int, run_id string, "
        "processed_at timestamp",
    )
    s2, r2 = dedupe_state_runs(scal, regs)
    assert r2.count() == 2
    assert r2.filter(F.col("part").isNull()).count() == 1
